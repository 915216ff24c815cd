package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-level tracing probe behind SCALE.md's skew readings — per-variant
  * wall time plus max/total task time, so the hot-task share is visible
  * (wall-clock alone cannot distinguish "one straggler task" from "all
  * tasks slow"). Not part of the driver contract. This probe is what
  * diagnosed the round-7/8 fixture artifacts: a single-file fixture whose
  * scan serialized into one task (maxTask ≈ wall even on UNIFORM keys),
  * and a mod-correlated salt (stage-1 survivor count 50k vs the ~400k a
  * real salt produces). Run: `sbt "runMain graft.SkewDebug"`. */
object SkewDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    @volatile var maxTaskMs = 0L
    @volatile var sumTaskMs = 0L
    @volatile var nTasks = 0
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val ms = e.taskInfo.duration
        synchronized {
          if (ms > maxTaskMs) maxTaskMs = ms
          sumTaskMs += ms; nTasks += 1
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val dir = "file:/tmp/graft_skew_debug"
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rep", explode(lit((0 until 10).toArray)))
      .withColumn("rid", xxhash64(col("l_orderkey"), col("l_linenumber"), col("rep")))
      // shiftright strips the parity bit hotness consumed — without it
      // only the 50k odd residues appear (see Bench.skewStress)
      .withColumn("k", when(pmod(col("rid"), lit(2L)) === 0, lit(0L))
        .otherwise(pmod(shiftright(col("rid"), 1), lit(100000L))))
      .select(col("k"), col("rid"),
        substring(md5(col("rid").cast("string")), 1, 16).as("payload"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/big")
    // uniform control: same rows, no hot key
    spark.read.parquet(s"$dir/big")
      .withColumn("k", pmod(col("rid"), lit(100000L)))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/uniform")
    val big = spark.read.parquet(s"$dir/big")
    val uni = spark.read.parquet(s"$dir/uniform")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // task-end events arrive on the async listener bus; without waiting
    // for it to drain, prime-run events land after the reset (inflating
    // maxTask) and the timed run's straggler — the one task this probe
    // exists to see — can be read before its event arrives
    def quiesce(): Unit = {
      var prev = -1; var same = 0
      while (same < 3) {
        val cur = listener.synchronized(nTasks)
        if (cur == prev) same += 1 else { same = 0; prev = cur }
        Thread.sleep(100)
      }
    }
    def run(name: String)(f: => Unit): Unit = {
      f // prime
      System.gc()
      quiesce()
      listener.synchronized { maxTaskMs = 0; sumTaskMs = 0; nTasks = 0 }
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      quiesce()
      val (mx, sm, n) = listener.synchronized((maxTaskMs, sumTaskMs, nTasks))
      System.err.println(f"[skewdbg] $name%-28s wall=$wall%6.2fs maxTask=${mx / 1000.0}%6.2fs sumTask=${sm / 1000.0}%7.2fs tasks=$n")
    }

    val ord = Seq(col("rid").desc, col("payload").desc)
    // is the rn=1 filter map-side-pruned? (Spark 3.5+ InferWindowGroupLimit)
    val lpPlan = Dedup.latestPerKey(big, Seq("k"), ord)
      .queryExecution.executedPlan.toString
    System.err.println(s"[skewdbg] latestPerKey has WindowGroupLimit = " +
      lpPlan.contains("WindowGroupLimit"))
    run("window_hot")(sink(Dedup.latestPerKey(big, Seq("k"), ord)))
    run("window_uniform")(sink(Dedup.latestPerKey(uni, Seq("k"), ord)))
    // salt DECORRELATED from k (k = rid mod 100000 and 8 | 100000, so a raw
    // pmod(rid, 8) salt would be a function of k for uniform keys)
    run("window_salted8_hot")(sink(
      Dedup.latestPerKeySalted(big, Seq("k"), ord, xxhash64(col("rid")), salts = 8)))
    run("agg_hot")(sink(Dedup.latestPerKeyAgg(big, Seq("k"), Seq("rid", "payload"))))
    // FULL window output (rank attached to every row, no filter): group-limit
    // pruning cannot apply, the hot key's whole history sorts in one reducer
    def fullRank(df: DataFrame): DataFrame = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(ord: _*)))
    run("window_full_hot")(sink(fullRank(big)))
    run("window_full_uniform")(sink(fullRank(uni)))
    // degenerate edge: CONSTANT order column — every row tied, so the
    // quantile pass collapses and bucketing must fall back to the
    // tie-breaker composite key (Skew.saltedRowNumber round-11 fallback).
    // Without it the salted form degrades to the naive single-task sort.
    val tied = big.withColumn("cts",
      lit(java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
    def fullRankTied(df: DataFrame): DataFrame = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("cts").desc, col("rid").desc)))
    run("tied_window_full_hot")(sink(fullRankTied(tied)))
    run("tied_salted_rank_hot")(sink(graft.core.Skew.saltedRowNumber(
      tied, Seq("k"), col("cts"), descending = true,
      tieBreakers = Seq(col("rid").desc), buckets = 32)))
    // stage-1 survivors of the salted form (decorrelated salt)
    val s1 = big.withColumn("__salt", pmod(xxhash64(col("rid")), lit(8L)))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("__salt")).orderBy(ord: _*)
    run("salted_stage1_only")(sink(
      s1.withColumn("__rn", row_number().over(w1)).filter(col("__rn") === 1)))
    System.err.println(s"[skewdbg] stage1 survivors = " +
      s1.withColumn("__rn", row_number().over(w1)).filter(col("__rn") === 1).count())
    spark.stop()
  }
}
