package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md probe for the schema-drift ingest (VERDICT r17 task 6):
  * proves `SchemaDrift` is METADATA-scale the repo's way — measured,
  * not claimed. Three measurements over a synthetic drifting changelog
  * derived from `events`:
  *
  *   1. facts 1× vs 4× (8 batches, widths drifting 1..8): `evolve`
  *      (footer schemas + lattice) must stay FLAT — it never reads
  *      data; `conform+union+agg` must scale like the plain single-
  *      schema scan of the same rows (the conform projection is free);
  *   2. drifted-column width 4 vs 16 at the same facts: `evolve` may
  *      grow with width (driver metadata), but a 2-column aggregate
  *      over the conformed union must stay FLAT — column pruning
  *      pushes THROUGH the conform projection into each batch scan;
  *   3. the pruning claim is asserted structurally, not just timed:
  *      the optimized plan's parquet ReadSchema must not contain the
  *      untouched drifted columns.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"))

    /** Write a drifting changelog: `nBatches` parquet dirs, batch i
      * carrying `width(i)` extra int columns x_1..x_width (plus a
      * score column that flips int → string at the midpoint — the
      * type-drift case), rows replicated `rep`×. */
    def writeLog(root: String, nBatches: Int, width: Int => Int,
                 rep: Int): Unit = {
      (0 until nBatches).foreach { i =>
        val basePart = events
          .withColumn("r", explode(lit((0 until rep).toArray)))
          .filter(pmod(col("event_id") + col("r"), lit(nBatches)) === i)
          .drop("r")
        val score =
          if (i < nBatches / 2) pmod(col("event_id"), lit(100)).cast("int")
          else concat(lit("s"), pmod(col("event_id"), lit(100)).cast("string"))
        val extras = (1 to width(i)).map(j =>
          pmod(col("event_id"), lit(j + 7)).cast("int").as(s"x_$j"))
        basePart.select(Seq(col("event_id"), col("event_type"),
            score.as("score")) ++ extras: _*)
          .write.mode("overwrite").parquet(f"$root/batch=$i%04d")
      }
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = { time(f); math.min(time(f), time(f)) }

    // ---- measurement 1: facts 1x vs {scale}x, drifting widths 1..8 --
    // Base volume 10x the events table so the data plane is visible
    // over fixed job costs. Source instances are REUSED across timed
    // repeats: footer schemas are read once per nightly run in
    // production, not once per downstream query.
    val nB = 8
    val rep0 = 10
    val log1 = "/tmp/graft_drift_s1"
    val logS = s"/tmp/graft_drift_s$scale"
    writeLog(log1, nB, i => i + 1, rep0)
    writeLog(logS, nB, i => i + 1, rep0 * scale)
    def src(root: String) =
      new graft.source.DriftTolerantChangelogSource(spark, root)
    val src1 = src(log1); val srcS = src(logS)
    def aggAll(s: graft.source.DriftTolerantChangelogSource): Unit = {
      // conform + union + a full-width aggregate (references score and
      // one drifted column, so real parsing happens)
      s.since(None)
        .agg(count(lit(1)), sum(length(col("score"))), sum(col("x_3"))).head()
      ()
    }
    // plain single-schema baseline over the same row mass
    def plainBase(s: graft.source.DriftTolerantChangelogSource,
                  out: String): Unit =
      s.since(None).write.mode("overwrite").parquet(out)
    val plain1 = "/tmp/graft_drift_plain1"
    val plainS = s"/tmp/graft_drift_plain$scale"
    plainBase(src1, plain1); plainBase(srcS, plainS)
    def aggPlain(out: String): Unit = {
      val u = spark.read.parquet(out)
      u.agg(count(lit(1)), sum(length(col("score"))), sum(col("x_3"))).head()
      ()
    }
    // aligned-schema MULTI-BATCH baseline: same 8-dir layout, every
    // batch already carrying the evolved schema — isolates the conform
    // projection's own cost from the multi-scan union's
    val aligned1 = "/tmp/graft_drift_aligned1"
    val evolved1 = graft.source.SchemaDrift.evolvedSchema(src1.batchSchemas)
    (0 until nB).foreach { i =>
      graft.source.SchemaDrift.conform(
          spark.read.parquet(f"$log1/batch=$i%04d"), evolved1)
        .write.mode("overwrite").parquet(f"$aligned1/batch=$i%04d")
    }
    def aggAligned(): Unit = {
      (0 until nB).map(i => spark.read.parquet(f"$aligned1/batch=$i%04d"))
        .reduce(_ union _)
        .agg(count(lit(1)), sum(length(col("score"))), sum(col("x_3"))).head()
      ()
    }
    aggAll(src1); aggPlain(plain1); aggAligned() // warm-up, discarded
    // evolve on FRESH instances: this times listing + footers + lattice
    val tEvolve1 = best { src(log1).batchSchemas; () }
    val tEvolveS = best { src(logS).batchSchemas; () }
    val tAgg1 = best(aggAll(src1))
    val tAggS = best(aggAll(srcS))
    val tPlain1 = best(aggPlain(plain1))
    val tPlainS = best(aggPlain(plainS))
    val tAligned1 = best(aggAligned())
    println(f"""{"query":"drift_facts(probe)","rows1":${100000L * rep0},"evolve1":$tEvolve1%.3f,"evolve$scale":$tEvolveS%.3f,"agg1":$tAgg1%.3f,"agg$scale":$tAggS%.3f,"agg_ratio":${tAggS / tAgg1}%.2f,"plain1":$tPlain1%.3f,"plain$scale":$tPlainS%.3f,"plain_ratio":${tPlainS / tPlain1}%.2f,"aligned8_1":$tAligned1%.3f,"conform_vs_aligned8":${tAgg1 / tAligned1}%.2f,"conform_overhead_at_$scale":${tAggS / tPlainS}%.2f}""")

    // ---- measurement 2: width 4 vs 16 at the same facts -------------
    val logW4 = "/tmp/graft_drift_w4"
    val logW16 = "/tmp/graft_drift_w16"
    writeLog(logW4, nB, _ => 4, rep0)
    writeLog(logW16, nB, _ => 16, rep0)
    val srcW4 = src(logW4); val srcW16 = src(logW16)
    def agg2(s: graft.source.DriftTolerantChangelogSource): Unit = {
      s.since(None)
        .agg(count(col("event_id")), sum(length(col("event_type")))).head()
      ()
    }
    agg2(srcW4) // warm-up
    val tEvW4 = best { src(logW4).batchSchemas; () }
    val tEvW16 = best { src(logW16).batchSchemas; () }
    val tAggW4 = best(agg2(srcW4))
    val tAggW16 = best(agg2(srcW16))

    // ---- measurement 3: pruning pushes THROUGH conform --------------
    val read = srcW16.since(None)
      .agg(count(col("event_id")), sum(length(col("event_type"))))
      .queryExecution.executedPlan.toString
    val pruned = !read.contains("x_9")
    println(f"""{"query":"drift_width(probe)","evolve_w4":$tEvW4%.3f,"evolve_w16":$tEvW16%.3f,"agg2col_w4":$tAggW4%.3f,"agg2col_w16":$tAggW16%.3f,"agg2col_ratio":${tAggW16 / tAggW4}%.2f,"pruned_through_conform":$pruned}""")

    spark.stop()
  }
}
