package graft

import org.apache.spark.sql.functions._

/** Round-17 specs: the ADVICE r16 fixes — star-CC convergence guard +
  * self-loop-singleton parity, incrementalComponents loud
  * non-convergence, writeCompacted uniform sampling + unique temp
  * path, and the severable exact branch in rollingReachFromDaily
  * (state-only production read path). */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  // ---- rolling reach: severable exact branch + state-only read ----

  private def reachEvents = {
    val rows = for {
      d <- 0 until 10
      u <- 0 until (20 + d * 7)
    } yield (s"u${(u * 131 + d * 17) % 90}",
      new java.sql.Timestamp(1704067200000L + d * 86400000L + u * 1000L))
    rows.toDF("user_id", "ts")
  }

  test("rollingReachFromDaily(includeExact=false): sketch columns identical, no exact column") {
    val full = graft.analyze.KmvAlgebra
      .rollingReachFromDaily(reachEvents, "user_id", "ts", windowDays = 3, k = 16)
    val sketchOnly = graft.analyze.KmvAlgebra
      .rollingReachFromDaily(reachEvents, "user_id", "ts", windowDays = 3,
        k = 16, includeExact = false)
    assert(!sketchOnly.columns.contains("exact_reach"))
    val a = full.select("day", "n_sketch", "kth_min", "est_reach")
      .orderBy("day").collect().toSeq
    val b = sketchOnly.select("day", "n_sketch", "kth_min", "est_reach")
      .orderBy("day").collect().toSeq
    assert(a == b, "sketch timeline must be invariant to the exact anchor")
  }

  test("rollingReachFromStates: pure state read — plan never touches the fact relation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reach").toString
    val factPath = s"$dir/facts"
    val statePath = s"$dir/daily_states"
    reachEvents.write.mode("overwrite").parquet(factPath)
    val facts = spark.read.parquet(factPath)
    // nightly writer: the only fact-scale stage
    graft.analyze.KmvAlgebra.dailyReachStates(facts, "user_id", "ts", k = 16)
      .write.mode("overwrite").parquet(statePath)
    val states = spark.read.parquet(statePath)
    val timeline = graft.analyze.KmvAlgebra
      .rollingReachFromStates(states, windowDays = 3, k = 16)
    // the production read's plan scans ONLY the state table
    val scans = timeline.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.nonEmpty)
    val planStr = timeline.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("facts"),
      s"state-only read must not reference the fact relation:\n$planStr")
    // and it reproduces the composed form exactly
    val composed = graft.analyze.KmvAlgebra
      .rollingReachFromDaily(facts, "user_id", "ts", windowDays = 3,
        k = 16, includeExact = false)
      .orderBy("day").collect().toSeq
    assert(timeline.orderBy("day").collect().toSeq == composed)
  }

  // ---- star CC: self-loop singletons + convergence guard ----

  test("connectedComponentsStar: self-loop-only nodes emitted as singletons (contract parity)") {
    import graft.dedup.Dedup
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 7L), (9L, 9L), (3L, 3L))
      .toDF("a", "b")
    val minLabel = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    val star = Dedup.connectedComponentsStar(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(star == minLabel, s"star=$star minLabel=$minLabel")
    assert(star.contains((7L, 7L)) && star.contains((9L, 9L)))
  }

  test("connectedComponentsStar: non-convergence throws instead of returning invalid stars") {
    import graft.dedup.Dedup
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsStar(chain, "a", "b", maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("incrementalComponents: component-chaining delta beyond maxIter fails loudly") {
    import graft.dedup.Dedup
    // 12 stored components {10i, 10i+1}; delta daisy-chains all of
    // them — merged diameter ~3*12 hops, far past maxIter=3 rounds
    val stored = (0L until 12L)
      .flatMap(i => Seq((10 * i, 10 * i), (10 * i + 1, 10 * i)))
      .toDF("id", "cluster_id")
    val delta = (0L until 11L).map(i => (10 * i + 1, 10 * (i + 1)))
      .toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalComponents(stored, delta, "a", "b", maxIter = 3)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same refresh equals the full rebuild
    // (merged diameter ~2 per chained component: needs > default 20)
    val got = Dedup.incrementalComponents(stored, delta, "a", "b",
        maxIter = 60)
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got.forall(_._2 == 0L),
      s"daisy-chained delta must collapse everything to min id 0: $got")
  }

  // ---- writeCompacted: uniform sizing sample + unique temp path ----

  test("writeCompacted: width-correlated input order no longer skews sizing; no sizing leftovers") {
    import graft.source.Layout
    // rows ordered by a width-correlated column: first rows are ~10 B
    // strings, last rows ~1000 B — limit(n)-sizing would read only the
    // narrow prefix and overshoot file sizes ~devastatingly
    val n = 6000
    val df = spark.range(n.toLong).select(col("id"),
        rpad(lit("x"), (col("id") * 990 / n + 10).cast("int"), lit("y"))
          .as("payload"))
      .orderBy("id")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val out = s"$dir/t"
    val target = 256L * 1024
    val stats = Layout.writeCompacted(df, out, target, sampleRows = 500)
    // sizing temp dir cleaned up; nothing matching the old fixed name
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("t__sizing"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // row set untouched
    val back = spark.read.parquet(out)
    assert(back.count() == n.toLong)
    // uniform-sample sizing keeps mean file size within 2x of target
    // (limit-based sizing on this input lands ~5-50x over)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val mean = files.map(_.length).sum.toDouble / files.length
    assert(mean < 2.0 * target && mean > target / 8.0,
      s"mean file bytes $mean vs target $target (${files.length} files, " +
        s"bytesPerRow=${stats.bytesPerRow})")
  }
}
