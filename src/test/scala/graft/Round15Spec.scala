package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-15 specs: the VERDICT r14 task list — abcClassify's automatic
  * salted large-dim path, the Markov driver-solve guard, the cusum
  * overflow guard, and the q186 integer display division. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("abcClassify: salted large-dim path is row-identical to the plain window") {
    // 500 dims with a skewed value distribution + decimal cents + ties
    val facts = spark.range(0, 5000).select(
      (col("id") % 500).cast("string").as("dim"),
      // ties across dims (id%7) and wide magnitude spread (id*id)
      ((col("id") % 7) * 10 + (col("id") % 500) * (col("id") % 500) / 100.0)
        .as("v"))
    val plain = graft.analyze.Stats.abcClassify(facts, "dim", "v",
      saltThreshold = Long.MaxValue)
    val salted = graft.analyze.Stats.abcClassify(facts, "dim", "v",
      saltThreshold = 1L, saltBuckets = 8)
    val p = plain.orderBy("rnk").collect().toSeq
    val s = salted.orderBy("rnk").collect().toSeq
    assert(p == s)
    assert(p.size == 500 && p.map(_.getLong(1)) == (1L to 500L))
  }

  test("abcClassify salted path: no unpartitioned window touches dim rows") {
    val facts = spark.range(0, 2000).select(
      col("id").cast("string").as("dim"), (col("id") % 97).as("v"))
    val salted = graft.analyze.Stats.abcClassify(facts, "dim", "v",
      saltThreshold = 1L, saltBuckets = 8)
    val wins = salted.queryExecution.sparkPlan.collect {
      case w: WindowExec => w }
    assert(wins.nonEmpty)
    // any window whose input still carries the dim column (dim-scale
    // rows) must be hash-partitioned; only the <= buckets-row offset
    // windows may run single-partition
    wins.foreach { w =>
      val touchesDims = w.child.output.exists(_.name == "dim")
      if (touchesDims)
        assert(w.partitionSpec.nonEmpty,
          s"unpartitioned window over dim rows: $w")
    }
  }

  test("abcClassify salted: skewed 50%-hot value mass still splits buckets") {
    // half the dims share ONE total value (the degenerate tie class) —
    // results must still match the plain form exactly
    val facts = spark.range(0, 1000).select(
      col("id").cast("string").as("dim"),
      when(col("id") % 2 === 0, 42.42).otherwise(col("id").cast("double"))
        .as("v"))
    val plain = graft.analyze.Stats.abcClassify(facts, "dim", "v",
      saltThreshold = Long.MaxValue)
    val salted = graft.analyze.Stats.abcClassify(facts, "dim", "v",
      saltThreshold = 1L, saltBuckets = 16)
    assert(plain.orderBy("rnk").collect().toSeq ==
      salted.orderBy("rnk").collect().toSeq)
  }

  test("removalEffects: fact-scale transition input fails fast, never collects") {
    val big = spark.range(0, 5000).select(
      concat(lit("s"), col("id")).as("src"),
      concat(lit("t"), col("id")).as("dst"), lit(1L).as("cnt"))
    val e = intercept[IllegalArgumentException] {
      graft.relational.MarkovAttribution.removalEffects(big, maxChannels = 4)
    }
    assert(e.getMessage.contains("transition edges"))
  }

  test("cusumShift: overflow guard raises instead of silently wrapping") {
    // magnitudes chosen so each per-row product still fits in a long
    // (ANSI stays quiet) but the conservative envelope is exceeded —
    // the guard must fire with ITS message, not a generic ANSI one
    val series = Seq(("k", 1L, Long.MaxValue / 16),
      ("k", 2L, Long.MaxValue / 16),
      ("k", 3L, Long.MaxValue / 16)).toDF("key", "d", "v")
    val e = intercept[Exception] {
      graft.analyze.Timeseries.cusumShift(series, "key", "d", "v", 3, 1)
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("cusumShift overflow"))
    // and the guard does NOT fire on sane magnitudes
    val ok = graft.analyze.Timeseries
      .cusumShift(Seq(("k", 1L, 10L), ("k", 2L, 500L)).toDF("key", "d", "v"),
        "key", "d", "v", 3, 1).collect()
    assert(ok.length == 2)
  }

  test("activeUserLadderSketch: within KMV error of the exact ladder at both SFs") {
    val k = 256
    val tol = 3.0 / math.sqrt(k - 2.0) // 3 sigma of the KMV bound
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.load(spark, sf, "events")
      val exact = graft.analyze.Timeseries
        .activeUserLadder(ev, "user_id", "ts")
        .select(col("day"), col("dau"), col("wau"), col("mau"))
      val sk = graft.analyze.Timeseries
        .activeUserLadderSketch(ev, "user_id", "ts", k)
      val j = exact.join(sk, Seq("day")).collect()
      assert(j.nonEmpty)
      j.foreach { r =>
        val (dau, wau, mau) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val (de, we, me) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(math.abs(de - dau) <= math.max(1, tol * dau),
          s"$sf dau $dau vs est $de")
        assert(math.abs(we - wau) <= math.max(1, tol * wau),
          s"$sf wau $wau vs est $we")
        assert(math.abs(me - mau) <= math.max(1, tol * mau),
          s"$sf mau $mau vs est $me")
        // below k distinct the sketch is EXACT by construction
        if (dau < k) assert(de == dau, s"$sf exact-below-k dau")
      }
    }
  }

  test("KMV state merge is exact vs a direct single-pass sketch") {
    val k = 64
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(date_trunc("week", to_date(col("ts")))).as("week"),
        to_date(col("ts")).as("day"),
        xxhash64(col("user_id").cast("string")).as("h"))
    // rollup of per-day states
    val viaStates = ev.groupBy(col("day"), col("week"))
      .agg(graft.analyze.KmvDistinct.stateUdaf(k)(col("h")).as("st"))
      .groupBy(col("week"))
      .agg(graft.analyze.KmvDistinct.mergeUdaf(k)(col("st")).as("est"))
    // direct sketch over the union
    val direct = ev.groupBy(col("week"))
      .agg(graft.analyze.KmvDistinct.udafFor(k)(col("h")).as("est"))
    val a = viaStates.orderBy("week").collect().map(r => (r.getDate(0), r.getLong(1))).toSeq
    val b = direct.orderBy("week").collect().map(r => (r.getDate(0), r.getLong(1))).toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("shapley: unanimity-game closed form on a hand example") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // conv1 claims {click}; conv2 claims {click, view}
    // phi(click) = 1 + 1/2 = 1.5 -> num 27720 + 13860 = 41580
    // phi(view)  = 1/2         -> num 13860 ; sum = 2 conversions * L
    val ev = Seq(
      (1L, ts(10), "click", 1L), (1L, ts(20), "purchase", 2L),
      (2L, ts(10), "click", 3L), (2L, ts(11), "view", 4L),
      (2L, ts(12), "click", 5L), (2L, ts(20), "purchase", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.relational.Shapley.shapleyAttribution(ev, "user_id",
        "ts", "event_type", "event_id", "purchase", Seq("click", "view"), 100L)
      .orderBy("channel")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 2L, 41580L, 41580.0 / 27720.0),
      ("view", 1L, 13860L, 13860.0 / 27720.0)))
    assert(got.map(_._3).sum == 2L * graft.relational.Shapley.Lcm)
  }

  test("shapley: guards and empty-journey behavior") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq((1L, ts(1), "click", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    intercept[IllegalArgumentException] {
      graft.relational.Shapley.shapleyAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", Seq.empty, 10L)
    }
    intercept[IllegalArgumentException] {
      graft.relational.Shapley.shapleyAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", (1 to 13).map("c" + _), 10L)
    }
    // touches with no conversion produce no credit rows
    assert(graft.relational.Shapley.shapleyAttribution(ev, "user_id", "ts",
      "event_type", "event_id", "purchase", Seq("click"), 10L).count() == 0L)
  }

  test("adstockRegression: zero-variance channel yields null fit; responsive channel positive slope") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00")
    // channel 'a': spend grows with day, conversions track it ->
    // positive slope. channel 'z': never spends -> den = 0 -> nulls.
    val rows = (1 to 20).flatMap { d =>
      Seq(("a", ts(d), d * 100.0)) ++
        (0 until d).map(_ => ("purchase", ts(d), 0.0))
    }
    val ev = rows.zipWithIndex.map { case ((t, time, v), i) =>
      (1L, time, t, i.toLong, v) }
      .toDF("user_id", "ts", "event_type", "event_id", "value")
    val got = graft.analyze.Mmm.adstockRegression(ev,
        channelTypes = Seq("a", "z"), conversionType = "purchase",
        tsCol = "ts", typeCol = "event_type", valueCol = "value")
      .orderBy("channel").collect()
    assert(got.length == 2)
    val a = got(0); val z = got(1)
    assert(a.getString(0) == "a" && a.getLong(1) == 20L)
    assert(a.getDouble(2) > 0 && a.getDouble(4) > 0.5, a.toString)
    assert(z.getString(0) == "z" && z.isNullAt(2) && z.isNullAt(4))
  }

  test("didReadout: hand 2x2, baseline and trend cancel") {
    // T: 10 -> 25 (change 15); C: 20 -> 30 (change 10) -> DiD = 5
    val users = Seq(("treatment", 10.0, 25.0), ("control", 20.0, 30.0))
      .toDF("variant", "pre", "post")
    val r = graft.analyze.Experiment.didReadout(users, "variant",
      "pre", "post").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(6) == 5.0)
    // one-armed input -> null estimator, not NaN
    val one = graft.analyze.Experiment.didReadout(
      Seq(("treatment", 1.0, 2.0)).toDF("variant", "pre", "post"),
      "variant", "pre", "post").head()
    assert(one.isNullAt(6))
  }

  test("qiniTable: mirrored arms give exactly zero qini at every depth") {
    // ids pair up (2k, 2k+1): same score, same outcome, one per arm —
    // each tile holds whole pairs, so cum counts/conversions are
    // identical across arms and the cross-multiplied numerator is 0
    val scored = (0 until 200).map { i =>
      (i.toLong, (i / 2).toLong,
        if ((i / 2) % 7 == 0) 1L else 0L,
        if (i % 2 == 0) "treatment" else "control")
    }.toDF("id", "score", "out", "variant")
    val rows = graft.analyze.Experiment.qiniTable(scored, "id", "score",
      "out", "variant", nTiles = 5).orderBy("tile").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"arm sizes: $r")
      assert(r.getLong(5) == r.getLong(6), s"cum conv: $r")
      assert(r.getLong(7) == 0L && r.getDouble(8) == 0.0 &&
        r.getDouble(9) == 0.0, s"qini: $r")
    }
    // and a treatment-only lift shifts qini positive at full depth
    val uplifted = (0 until 200).map { i =>
      (i.toLong, (i / 2).toLong,
        if (i % 2 == 0 && (i / 2) % 7 == 0) 1L else 0L,
        if (i % 2 == 0) "treatment" else "control")
    }.toDF("id", "score", "out", "variant")
    val fin = graft.analyze.Experiment.qiniTable(uplifted, "id", "score",
      "out", "variant", nTiles = 5).orderBy("tile").collect().last
    assert(fin.getLong(7) > 0L && fin.getDouble(8) > 0.0)
  }

  test("dowSeasonality: uniform weekday mass indexes to exactly 1") {
    // 14 consecutive days, constant 3 events/day for one key ->
    // every dow index is exactly 1 (num == den)
    val ev = (0 until 14).flatMap { d =>
      (1 to 3).map { k =>
        ("a", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$k:00:00"))
      }
    }.toDF("k", "ts")
    val got = graft.analyze.Timeseries.dowSeasonality(ev, "k", "ts")
      .orderBy("dow").collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getLong(2) == 2L && r.getLong(3) == 6L)
      assert(r.getLong(4) == r.getLong(5))
      assert(r.getDouble(6) == 1.0)
    }
    // 2024-01-01 is a Monday -> dow 0 exists and is first
    assert(got.head.getInt(1) == 0)
  }

  test("groupAwareSplit: a group never straddles splits; weights roughly hold") {
    val df = spark.range(0, 3000).select(
      col("id"), (col("id") % 300).cast("string").as("grp"))
    val s = graft.analyze.TextAnalysis.groupAwareSplit(df, col("grp"),
      Seq(("train", 8), ("val", 1), ("test", 1)))
    // leakage check: every group maps to exactly one split
    val perGroup = s.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(perGroup == 1L)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // deterministic: replay equals
    val again = graft.analyze.TextAnalysis.groupAwareSplit(df, col("grp"),
      Seq(("train", 8), ("val", 1), ("test", 1)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("ewmaBacktest: constant series forecasts itself exactly; gaps fill as zero") {
    // 20 consecutive days at 5 events/day: every full-window forecast
    // is 5*(127)/127 = 5 -> zero error, zero MAE/bias
    val flat = (0 until 20).flatMap { d =>
      (1 to 5).map(k =>
        ("a", java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 0$k:00:00")))
    }.toDF("k", "ts")
    val r = graft.analyze.Timeseries.ewmaBacktest(flat, "k", "ts").head()
    assert(r.getLong(1) == 20L && r.getLong(2) == 13L) // 20 days, 20-7 scored
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
    // a missing day is ZERO volume, not skipped: days 1..9 and 11..20
    // observed, day 10 absent -> n_days=19 observed but the dense grid
    // still scores 20-7=13 days and the gap perturbs the errors
    val gap = (0 until 20).filter(_ != 9).flatMap { d =>
      (1 to 5).map(k =>
        ("a", java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 0$k:00:00")))
    }.toDF("k", "ts")
    val g = graft.analyze.Timeseries.ewmaBacktest(gap, "k", "ts").head()
    assert(g.getLong(1) == 19L && g.getLong(2) == 13L)
    assert(g.getLong(3) > 0L) // the zero day and its wake mis-forecast
    // window bound guard
    intercept[IllegalArgumentException] {
      graft.analyze.Timeseries.ewmaBacktest(flat, "k", "ts", window = 17)
    }
  }

  test("dowAnomalies: planted 3x Monday spikes flag only on the spike days") {
    // 4 weeks of 10/day; the last Monday gets 40 (vs its dow mean of
    // 17.5 -> ratio 2.29), pushing the other Mondays to 10/17.5 = 0.57
    // strictly below the 2/3 dip line (not AT it — the rule is strict)
    val base = (0 until 28).flatMap { d =>
      (1 to 10).map(k =>
        ("a", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d ${k + 10}:00:00")))
    }
    val spike = (11 to 40).map(k => // 2024-01-22 is the 4th Monday
      ("a", java.sql.Timestamp.valueOf(f"2024-01-22 ${10 + k % 12}%02d:${k}%02d:00")))
    val out = graft.analyze.Timeseries.dowAnomalies(
      (base ++ spike).toDF("k", "ts"), "k", "ts", num = 3, den = 2)
    val flagged = out.filter(col("spike")).collect()
    assert(flagged.length == 1 &&
      flagged.head.getDate(1).toString == "2024-01-22")
    // the other Mondays (10 vs dow-mean 15) dip below 2/3: 10*4*3 < 60*2
    val dips = out.filter(col("dip")).collect()
    assert(dips.forall(_.getInt(2) == 0) && dips.length == 3)
    // boundary is integer-exact: ratio column never decides
    assert(out.filter(col("spike") &&
      col("cnt") * col("days_dow") * 2 <= col("events_dow") * 3).isEmpty)
  }

  test("reachState merge is entity-grain: cross-shard exposures sum before the histogram") {
    // user u sees 2 events in shard A and 3 in shard B -> ONE entity at
    // freq 5; a histogram-level merge would report two entities (2, 3)
    val a = Seq(("view", "u"), ("view", "u"), ("view", "w"))
      .toDF("t", "e")
    val b = Seq(("view", "u"), ("view", "u"), ("view", "u"))
      .toDF("t", "e")
    import graft.analyze.Reach
    val merged = Reach.mergeReachStates(
      Reach.reachState(a, "e", "t"), Reach.reachState(b, "e", "t"),
      "e", "t")
    val out = Reach.reachFrequencyFromState(merged, "e", "t")
      .orderBy("freq").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L), (5L, 1L))) // w at 1, u at 5
    // and merge == recompute on the union
    val full = Reach.reachFrequency(a.union(b), "e", "t")
      .orderBy("freq").collect()
    assert(out.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("dailySpendState merge reconstructs day totals across shard cuts") {
    import graft.analyze.Timeseries
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // the same day split across shards; plus a day each only in one
    val a = Seq(("c", ts("2024-01-10 01:00:00"), 10.50),
        ("c", ts("2024-01-11 01:00:00"), 1.25))
      .toDF("k", "ts", "v")
    val b = Seq(("c", ts("2024-01-10 23:00:00"), 4.50),
        ("c", ts("2024-01-12 01:00:00"), 2.00))
      .toDF("k", "ts", "v")
    val merged = Timeseries.mergeDailySpend(
      Timeseries.dailySpendState(a, "k", "ts", "v"),
      Timeseries.dailySpendState(b, "k", "ts", "v"), "k")
      .orderBy("day").collect()
    assert(merged.map(r => (r.getDate(1).toString,
      r.getDecimal(2).toPlainString)).toSeq ==
      Seq(("2024-01-10", "15.00"), ("2024-01-11", "1.25"),
        ("2024-01-12", "2.00")))
    // finalize == the batch pacing on the union
    val budgets = Seq(("c", "100.00")).toDF("k", "b")
      .select(col("k"), col("b").cast("decimal(12,2)").as("budget"))
    val inc = Timeseries.pacingFromDaily(
      Timeseries.mergeDailySpend(
        Timeseries.dailySpendState(a, "k", "ts", "v"),
        Timeseries.dailySpendState(b, "k", "ts", "v"), "k"),
      "k", budgets).orderBy("day").collect()
    val batch = Timeseries.budgetPacing(a.union(b), "k", "ts", "v", budgets)
      .orderBy("day").collect()
    assert(inc.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("mdeReadout: SRM flags a biased split; detectable tracks lift vs MDE") {
    import graft.analyze.Experiment
    // balanced 500/500, conv 100 vs 50: chi2 = 0, lift .1 vs MDE
    // 2.8*sqrt(.075*.925*(1/500+1/500)) ~ .0466 -> detectable
    val big = ((0 until 500).map(i => ("treatment", if (i < 100) 1L else 0L)) ++
      (0 until 500).map(i => ("control", if (i < 50) 1L else 0L)))
      .toDF("variant", "conv")
    val r = Experiment.mdeReadout(big, "variant", "conv").head()
    assert(r.getDouble(4) == 0.0 && !r.getBoolean(5)) // srm
    assert(r.getDouble(8) == 100.0 / 500.0 - 50.0 / 500.0) // abs_lift
    assert(r.getBoolean(9)) // lift .1 > mde ~.047
    // same sizes, tiny lift (102 vs 100): not detectable
    val tiny = ((0 until 500).map(i => ("treatment", if (i < 102) 1L else 0L)) ++
      (0 until 500).map(i => ("control", if (i < 100) 1L else 0L)))
      .toDF("variant", "conv")
    val t2 = Experiment.mdeReadout(tiny, "variant", "conv").head()
    assert(!t2.getBoolean(9) && t2.getDouble(7) > 0.004)
    // planted 900/100 SRM: chi2 = 640000/1000 = 640 > 3.841
    val srm = ((0 until 900).map(_ => ("treatment", 0L)) ++
      (0 until 100).map(_ => ("control", 0L))).toDF("variant", "conv")
    val s3 = Experiment.mdeReadout(srm, "variant", "conv").head()
    assert(s3.getDouble(4) == 640.0 && s3.getBoolean(5))
    // one-armed -> null doubles, null detectable
    val one = Experiment.mdeReadout(
      Seq(("treatment", 1L)).toDF("variant", "conv"), "variant", "conv")
      .head()
    assert(one.isNullAt(7) && one.isNullAt(9))
  }

  test("streaming rollup states equal their batch twins; reach state is domain-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingRollup

    // reach: 3 micro-batches, 400 events over 20 entities x 2 types
    val mem = MemoryStream[(String, Long)]
    val q = StreamingRollup.reachStateStream(
        mem.toDF().toDF("t", "e"), "e", "t")
      .writeStream.format("memory").queryName("reach_state")
      .outputMode("complete").start()
    val all = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      for (b <- 0 until 3) {
        val batch = (0 until 400).map(i =>
          (if (i % 2 == 0) "view" else "click", ((b * 7 + i) % 20).toLong))
        all ++= batch
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("reach_state").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.analyze.Reach.reachState(
          all.toSeq.toDF("t", "e"), "e", "t").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      // state rows == key domain (40), not stream length (1200)
      val st = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
      assert(st == 40L, s"state rows = $st")
    } finally q.stop()

    // spend: day windows + decimal sums reproduce the batch state
    val mem2 = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q2 = StreamingRollup.dailySpendStream(
        mem2.toDF().toDF("k", "ts", "v"), "k", "ts", "v", "1 hour")
      .writeStream.format("memory").queryName("spend_state")
      .outputMode("complete").start()
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(("c", ts("2024-01-10 01:00:00"), 10.50),
      ("c", ts("2024-01-10 23:00:00"), 4.50),
      ("c", ts("2024-01-11 01:00:00"), 1.25),
      ("d", ts("2024-01-10 12:00:00"), 2.00))
    try {
      mem2.addData(rows: _*)
      q2.processAllAvailable()
      val streamed = spark.table("spend_state").collect()
        .map(r => (r.getString(0), r.getDate(1).toString,
          r.getDecimal(2).toPlainString)).toSet
      val batch = graft.analyze.Timeseries.dailySpendState(
          rows.toDF("k", "ts", "v"), "k", "ts", "v").collect()
        .map(r => (r.getString(0), r.getDate(1).toString,
          r.getDecimal(2).toPlainString)).toSet
      assert(streamed == batch && streamed.contains(("c", "2024-01-10", "15.00")))
    } finally q2.stop()
  }

  test("frequencyResponse: caps pool the tail; unexposed converters are excluded") {
    import graft.analyze.Reach
    val exposures = Seq(("a", 1L), ("b", 3L), ("c", 7L), ("d", 9L))
      .toDF("e", "freq")
    val converters = Seq("b", "d", "zz").toDF("e") // zz never exposed
    val out = Reach.frequencyResponse(exposures, "e", converters, cap = 5)
      .orderBy("freq_bucket").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 0L), (3L, 1L, 1L), (5L, 2L, 1L))) // 7 and 9 pool at 5+
    assert(out.last.getDouble(3) == 0.5)
    intercept[IllegalArgumentException] {
      Reach.frequencyResponse(exposures, "e", converters, cap = 0)
    }
  }

  test("journeyTransitions mirrors attributeTouches' guards") {
    val ev = Seq((1L, new java.sql.Timestamp(1000L), "click", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    intercept[IllegalArgumentException] {
      graft.relational.MarkovAttribution.journeyTransitions(ev, "user_id",
        "ts", "event_type", "event_id", "purchase", Seq.empty, 10L)
    }
    intercept[IllegalArgumentException] {
      graft.relational.MarkovAttribution.journeyTransitions(ev, "user_id",
        "ts", "event_type", "event_id", "purchase", Seq("click"), 0L)
    }
  }

  // day d of Jan 2024, n events of one type — a daily series
  private def dayEvents(typ: String, counts: Seq[(Int, Int)]) =
    counts.flatMap { case (d, n) =>
      (0 until n).map(i => (typ, java.sql.Timestamp.valueOf(
        f"2024-01-$d%02d 12:${i / 60}%02d:${i % 60}%02d")))
    }.toDF("event_type", "ts")

  test("theilSenTrend: exact linear series recovers the slope; median resists one spike") {
    import graft.analyze.Timeseries
    // pure line: cnt = 2*d + 1 over 6 days -> every pairwise slope = 2
    val lin = dayEvents("a", (1 to 6).map(d => (d, 2 * d + 1)))
    val r = Timeseries.theilSenTrend(lin, "event_type", "ts")
      .collect().head
    assert(r.getAs[Long]("n_days") == 6L &&
      r.getAs[Long]("n_pairs") == 15L)
    assert(r.getAs[Long]("slope_num").toDouble /
      r.getAs[Long]("slope_den") == 2.0)
    assert(r.getAs[Boolean]("trend_up"))
    // same line with day 4 spiked to 100: 5 of 15 pairs are polluted,
    // the median slope stays exactly 2 (the OLS slope would not)
    val spiked = dayEvents("a",
      (1 to 6).map(d => (d, if (d == 4) 100 else 2 * d + 1)))
    val rs = Timeseries.theilSenTrend(spiked, "event_type", "ts")
      .collect().head
    assert(rs.getAs[Long]("slope_num").toDouble /
      rs.getAs[Long]("slope_den") == 2.0)
  }

  test("theilSenTrend: flat series reports zero slope; >31-day span fails loud") {
    import graft.analyze.Timeseries
    val flat = dayEvents("a", (1 to 5).map(d => (d, 7)))
    val r = Timeseries.theilSenTrend(flat, "event_type", "ts")
      .collect().head
    assert(r.getAs[Long]("slope_num") == 0L &&
      !r.getAs[Boolean]("trend_up"))
    // a 32-day gap (Jan 1 .. Feb 2) must raise, not silently mis-key
    // (Feb 1 is dx = 31 — still inside the divisibility envelope)
    val wide = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")),
        ("a", java.sql.Timestamp.valueOf("2024-02-02 12:00:00")))
      .toDF("event_type", "ts")
    val ex = intercept[Exception] {
      Timeseries.theilSenTrend(wide, "event_type", "ts").collect()
    }
    assert(ex.getMessage != null || ex.getCause != null)
  }

  test("theilSenTrend: random series match an exact BigInt-rational reference (3 seeds)") {
    import graft.analyze.Timeseries
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      // 2 keys, ~20 observed days inside a 28-day span, counts with
      // ties and spikes
      val rows = for {
        key <- Seq("a", "b")
        d <- 1 to 28 if rnd.nextDouble() < 0.7
      } yield (key, d,
        rnd.nextInt(49) + 1 + (if (rnd.nextInt(10) == 0) 500 else 0))
      val ev = rows.flatMap { case (k, d, n) =>
        (0 until n).map(i => (k, java.sql.Timestamp.valueOf(
          f"2024-01-$d%02d 09:${i / 60}%02d:${i % 60}%02d")))
      }.toDF("event_type", "ts")
      val got = Timeseries.theilSenTrend(ev, "event_type", "ts")
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den")))).toMap
      // reference: exact rational sort via BigInt cross-mult comparator,
      // ties by (dy, dx), rank-ceil(n/2) pick
      val want = rows.groupBy(_._1).collect {
        case (k, ds) if ds.size >= 2 =>
          val daily = ds.map(x => (x._2.toLong, x._3.toLong)).sortBy(_._1)
          val pairs = for {
            i <- daily.indices; j <- (i + 1) until daily.size
          } yield (daily(j)._2 - daily(i)._2, daily(j)._1 - daily(i)._1)
          val sorted = pairs.sortWith { case ((dy1, dx1), (dy2, dx2)) =>
            val c = (BigInt(dy1) * dx2).compare(BigInt(dy2) * dx1)
            if (c != 0) c < 0
            else if (dy1 != dy2) dy1 < dy2
            else dx1 < dx2
          }
          k -> sorted(((sorted.size + 1) / 2) - 1)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("audienceOverlap: below-k audiences make the sketch columns exact") {
    import graft.analyze.{KmvAlgebra, KmvDistinct}
    // 30 users in A (u0..u29), 20 in B (u20..u39): inter 10, union 40
    val ev = ((0 until 30).map(i => ("A", s"u$i")) ++
      (20 until 40).map(i => ("B", s"u$i")))
      .toDF("seg", "uid")
    val r = KmvAlgebra.audienceOverlap(ev, "uid", "seg", k = 64)
      .collect().head
    assert(r.getAs[Long]("exact_a") == 30L &&
      r.getAs[Long]("exact_b") == 20L &&
      r.getAs[Long]("exact_inter") == 10L &&
      r.getAs[Long]("exact_union") == 40L)
    // n < k: the union sketch IS the union, matches ARE the overlap
    assert(r.getAs[Long]("n_union_sketch") == 40L)
    assert(r.getAs[Long]("inter_matches") == 10L)
    // kth-min = unsigned max of all 40 member hashes
    val hs = ev.select(col("uid")).distinct()
      .select(KmvDistinct.md5Low64(col("uid")).as("h"))
      .collect().map(_.getLong(0))
    assert(r.getAs[Long]("union_kth") ==
      hs.reduce((a, b) =>
        if (java.lang.Long.compareUnsigned(a, b) >= 0) a else b))
    // below k the display estimates are the EXACT answers: the rho
    // denominator is the effective sketch size min(n_union_sketch, k),
    // not the constant k (ADVICE r15 — 10/64·40 = 6.25 was wrong)
    assert(r.getAs[Double]("est_union") == 40.0)
    assert(r.getAs[Double]("est_intersection") == 10.0)
    assert(r.getAs[Double]("jaccard_est") == 0.25)
  }

  test("audienceOverlap: above-k estimates track the exact KMV estimate") {
    import graft.analyze.{KmvAlgebra, KmvDistinct}
    val k = 16
    val ev = ((0 until 400).map(i => ("A", s"x$i")) ++
      (200 until 600).map(i => ("B", s"x$i")))
      .toDF("seg", "uid")
    val r = KmvAlgebra.audienceOverlap(ev, "uid", "seg", k = k)
      .collect().head
    assert(r.getAs[Long]("n_union_sketch") == k.toLong)
    // the union sketch must equal a direct KMV over the union
    // (KmvDistinct's public reduce/finish replay the exact kernel)
    val agg = new KmvDistinct(k)
    val union = ev.select(col("uid")).distinct()
      .select(KmvDistinct.md5Low64(col("uid")).as("h"))
      .collect().map(_.getLong(0))
    val buf = union.foldLeft(agg.zero)(agg.reduce)
    assert(r.getAs[Long]("union_kth") == buf(k - 1))
    val estExact = agg.finish(buf).toDouble
    val estShown = r.getAs[Double]("est_union")
    // the exact form TRUNCATES its integer division; the display
    // double doesn't — they agree to within one unit
    assert(math.abs(estShown - estExact) < 1.0)
  }

  test("kmvStateStream equals the batch sketch; state is O(segments x k)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.analyze.KmvDistinct
    val k = 16
    val mem = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingRollup.kmvStateStream(
        mem.toDF().toDF("seg", "uid"), "uid", "seg", k = k)
      .writeStream.format("memory").queryName("kmv_state")
      .outputMode("complete").start()
    val all = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      for (b <- 0 until 3) {
        val batch = (0 until 300).map(i =>
          (if (i % 3 == 0) "A" else "B", s"u${b * 191 + i}"))
        all ++= batch
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("kmv_state").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
      val batch = all.toSeq.toDF("seg", "uid")
        .select(col("seg"),
          KmvDistinct.md5Low64(col("uid")).as("h"))
        .groupBy(col("seg"))
        .agg(KmvDistinct.stateUdaf(k)(col("h")).as("st"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList))
        .toMap
      assert(streamed == batch)
      // the state arrays are exactly k long (audiences >> k) and the
      // streaming state store holds one row per segment
      assert(streamed.values.forall(_.size == k))
      val st = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
      assert(st == 2L, s"state rows = $st")
    } finally q.stop()
  }

  test("q204 shard-merge states equal from-scratch states on any split") {
    import graft.analyze.KmvDistinct
    val k = 8
    val ev = (0 until 500).map(i =>
      (i.toLong, if (i % 2 == 0) "x" else "y", s"e${i % 113}"))
      .toDF("id", "seg", "ent")
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select(col("seg"), KmvDistinct.md5Low64(col("ent")).as("h"))
      .groupBy(col("seg"))
      .agg(KmvDistinct.stateUdaf(k)(col("h")).as("st"))
    // 3-way split by id residue, merged pairwise through explode+restate
    val parts = (0 until 3).map(r => state(ev.filter(col("id") % 3 === r)))
    val merged = parts.reduce(_ unionByName _)
      .select(col("seg"), explode(col("st")).as("h"))
      .groupBy(col("seg"))
      .agg(KmvDistinct.stateUdaf(k)(col("h")).as("st"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    val full = state(ev)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    assert(merged == full)
  }

  test("funnelStepsWindowed: deadlines stall chains; greedy anchor pinned; boundary inclusive") {
    import graft.relational.Relational
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full chain inside 1h windows
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:30:00"), "b"),
      (1L, ts("2024-01-01 11:00:00"), "c"),
      // u2: b misses the 1h deadline -> stalls at step a
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 11:00:01"), "b"),
      // u3: greedy anchor — first 'a' at 10:00 stalls (b at 12:00 too
      // late for it) even though the 11:30 'a' would have chained;
      // documented greedy-anchor semantics: counts step a only
      (3L, ts("2024-01-01 10:00:00"), "a"),
      (3L, ts("2024-01-01 11:30:00"), "a"),
      (3L, ts("2024-01-01 12:00:00"), "b"),
      // u4: exactly at the deadline boundary (<= is inclusive)
      (4L, ts("2024-01-01 10:00:00"), "a"),
      (4L, ts("2024-01-01 11:00:00"), "b"))
      .toDF("ent", "ts", "et")
    val per = Relational.funnelStepsWindowed(ev, "ent", "ts", "et",
        Seq("a", "b", "c"), stepWindowSeconds = 3600L)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Any](1).map(Option(_)).map(_.isDefined))).toMap
    assert(per(1L) == Seq(true, true, true))
    assert(per(2L) == Seq(true, false, false))
    assert(per(3L) == Seq(true, false, false))
    assert(per(4L) == Seq(true, true, false))
    val counts = Relational.funnelCountsWindowed(ev, "ent", "ts", "et",
        Seq("a", "b", "c"), 3600L)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(counts == Seq(4L, 2L, 1L))
    // the unconstrained funnel reaches b for ALL FOUR entities (u2's
    // late b and u3's post-anchor b both count without deadlines) —
    // the window is exactly what separates 4 from 2
    val free = Relational.funnelCounts(ev, "ent", "ts", "et",
        Seq("a", "b", "c"))
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(free == Seq(4L, 4L, 1L))
  }

  test("matchedMarketReadout: zero-SSE twin wins the match; dark days count as zero; DiD exact") {
    import graft.analyze.Experiment
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    def burst(m: String, day: String, n: Int) =
      (0 until n).map(i => (m, ts(s"2024-01-$day 10:00:${i % 60}")))
    // pre days 01..03: T = (3,2,4); C1 identical; C2 = (3,2,9) (SSE 25
    // — and C2 is dark on no days). C3 dark on day 03 entirely: SSE
    // counts its 0 vs T's 4 (16), plus (0,1) on days 1-2 => SSE > 0.
    // post day 25: T spikes to 10, C1 stays 3 => did = (10-9)-(3-9) = 7
    val ev = (burst("T", "01", 3) ++ burst("T", "02", 2) ++
      burst("T", "03", 4) ++ burst("C1", "01", 3) ++
      burst("C1", "02", 2) ++ burst("C1", "03", 4) ++
      burst("C2", "01", 3) ++ burst("C2", "02", 2) ++
      burst("C2", "03", 9) ++ burst("C3", "01", 4) ++
      burst("C3", "02", 3) ++
      burst("T", "25", 10) ++ burst("C1", "25", 3))
      .toDF("market", "ts")
    val r = Experiment.matchedMarketReadout(ev, "market", "ts",
        treated = Seq("T"), cutoff = lit("2024-01-20").cast("date"))
      .collect().head
    assert(r.getAs[String]("control_market") == "C1")
    assert(r.getAs[Long]("sse_pre") == 0L)
    assert(r.getAs[Long]("did") == 7L)
    // C3's missing day 03 must have scored as 0 (not dropped): its SSE
    // vs T is 1+1+16 = 18, beating C2's 25 — verify via the full matrix
    // by treating C2 as also treated (forces both matches to surface)
    val r2 = Experiment.matchedMarketReadout(ev, "market", "ts",
        treated = Seq("T", "C2"), cutoff = lit("2024-01-20").cast("date"))
      .collect().map(x => (x.getAs[String]("treated_market"),
        (x.getAs[String]("control_market"), x.getAs[Long]("sse_pre"))))
      .toMap
    assert(r2("T") == (("C1", 0L)))
    // C2's own best donor: C3 at SSE 0+1+49=50? no — C1/C3 both
    // candidates; C1 SSE = (0,0,25)=25, C3 SSE = (1,1,81)=83 => C1
    assert(r2("C2")._1 == "C1" && r2("C2")._2 == 25L)
  }

  test("q207 composition: a customer's tier move lands in exactly one migration cell") {
    import graft.analyze.Rfm
    // 10 customers, two periods; customer 1 spends little before and
    // much after — its (code_before, code_after) cell must be a
    // single exact count and every customer lands in exactly one cell
    val ordersA = (1 to 10).map(c =>
      (c.toLong, java.sql.Date.valueOf("1995-06-01"),
        if (c == 1) 10.0 else 100.0 * c))
      .toDF("cust", "d", "amt")
    val ordersB = (1 to 10).map(c =>
      (c.toLong, java.sql.Date.valueOf("1997-06-01"),
        if (c == 1) 5000.0 else 100.0 * c))
      .toDF("cust", "d", "amt")
    def codes(df: org.apache.spark.sql.DataFrame, asOf: String) =
      Rfm.rfmScores(df, "cust", "d", "amt",
          asOf = lit(asOf).cast("date"), nTiles = 5)
        .select(col("cust"), col("rfm_code"))
    val mig = codes(ordersA, "1996-01-01")
      .withColumnRenamed("rfm_code", "code_before")
      .join(codes(ordersB, "2002-01-01")
        .withColumnRenamed("rfm_code", "code_after"), Seq("cust"))
      .groupBy(col("code_before"), col("code_after"))
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(mig.map(_.getAs[Long]("n")).sum == 10L)
    // customer 1: lowest m tier before (m=1), highest after (m=5)
    val c1b = codes(ordersA, "1996-01-01").filter(col("cust") === 1)
      .head().getInt(1) % 10
    val c1a = codes(ordersB, "2002-01-01").filter(col("cust") === 1)
      .head().getInt(1) % 10
    assert(c1b == 1 && c1a == 5)
  }

  test("languageMixProfile: chunk verdicts, dominant tiebreak, empty-doc profile") {
    import graft.analyze.TextAnalysis
    val en = Seq.fill(4)("the and of is with").mkString(" ")   // 20 en toks
    val de = Seq.fill(4)("der die und das ist").mkString(" ")  // 20 de toks
    val docs = Seq(
      (1L, en),                     // 20 toks -> 2 chunks, both en
      (2L, s"$en $de"),             // 40 toks -> 2 en chunks + und? no:
                                    // chunk16 boundaries: c0 en, c1
                                    // en4+de12 -> de, c2 de -> mixed
      (3L, "   "),                  // whitespace-only -> empty profile
      (4L, "zz qq ww"))             // 1 chunk, no markers -> und
      .toDF("doc_id", "text")
    val r = TextAnalysis.languageMixProfile(docs, "doc_id", "text",
        chunkTokens = 16)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getString(3), x.getBoolean(4)))).toMap
    assert(r(1L) == ((2L, 1L, "en", false)))
    assert(r(2L) == ((3L, 2L, "de", true)) ||
      r(2L) == ((3L, 2L, "en", true)))
    assert(r(3L) == ((0L, 0L, null, false)))
    assert(r(4L) == ((1L, 1L, "und", false)))
    // dominant count tie: 1 en chunk + 1 de chunk -> smallest code (de)
    val tie = Seq((9L, s"${Seq.fill(3)("the and of is with").mkString(" ")} " +
        s"x ${Seq.fill(3)("der die und das ist").mkString(" ")} y"))
      .toDF("doc_id", "text")
    val rt = TextAnalysis.languageMixProfile(tie, "doc_id", "text", 16)
      .collect().head
    assert(rt.getLong(1) == 2L && rt.getString(3) == "de" &&
      rt.getBoolean(4))
  }

  test("dayNRetention: exact membership, corpus-end cohort bound, zero-retained offsets") {
    import graft.analyze.Timeseries
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(8)),   // u1: day1 ret, day7 ret
      (2L, ts(1)),                             // u2: churned everywhere
      (3L, ts(14)), (3L, ts(15)),              // u3: day1 ret; day3/7 out of corpus? max day=15; 14+3=17 > 15 -> excluded
      (4L, ts(15)))                            // u4: too recent for all
      .toDF("user_id", "ts")
    val r = Timeseries.dayNRetention(ev, "user_id", "ts", Seq(1, 3, 7))
      .collect().map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    // day1: cohort u1,u2 (first+1<=15: u1 f=1, u2 f=1, u3 f=14 ok) =>
    // u1,u2,u3; retained u1 (day2), u3 (day15)
    assert(r(1) == ((3L, 2L)))
    // day3: cohort u1,u2 (u3's 14+3=17 > 15 excluded); retained none
    assert(r(3) == ((2L, 0L)))
    // day7: cohort u1,u2; retained u1 (day8)
    assert(r(7) == ((2L, 1L)))
  }

  test("funnelStreamWindowed equals the batch windowed fold; deadline stalls persist") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.FunnelEvent
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val steps = Seq("a", "b", "c")
    val batch1 = Seq(
      FunnelEvent(1L, ts("2024-01-01 10:00:00"), "a"),
      FunnelEvent(1L, ts("2024-01-01 10:30:00"), "b"),
      FunnelEvent(2L, ts("2024-01-01 10:00:00"), "a"))
    val batch2 = Seq(
      FunnelEvent(1L, ts("2024-01-01 10:50:00"), "c"),
      // u2's b misses the 1h deadline across batches: stall persists
      FunnelEvent(2L, ts("2024-01-01 11:00:01"), "b"))
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingDedup.funnelStreamWindowed(mem.toDS(), steps, 3600L)
      .writeStream.format("memory").queryName("wfunnel_state")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      import spark.implicits._
      val rows = spark.table("wfunnel_state")
        .as[(Long, Seq[Option[Long]])].collect()
      val latest = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }
      val all = (batch1 ++ batch2).map(e => (e.user, e.ts, e.etype))
        .toDF("user_id", "ts", "event_type")
      val batchGot = graft.relational.Relational.funnelStepsWindowed(
          all, "user_id", "ts", "event_type", steps, 3600L)
        .as[(Long, Seq[Option[Long]])].collect().toMap
      assert(latest(1L) == batchGot(1L) && latest(1L).forall(_.isDefined))
      assert(latest(2L) == batchGot(2L))
      assert(batchGot(2L).map(_.isDefined) == Seq(true, false, false))
    } finally q.stop()
  }

  test("mixtureAllocation: caps bind, freed budget redistributes by weight, floor exact") {
    import graft.analyze.TextAnalysis
    // a=(10,100), w=(1,1), B = 4/5 * 110 = 88: source p saturates at
    // 10, q takes the rest (78)
    val avail = Seq(("p", 10L, 1L), ("q", 100L, 1L))
      .toDF("src", "avail", "w")
    val r = TextAnalysis.mixtureAllocation(avail, "src", "avail", "w", 4, 5)
      .orderBy("src").collect()
    assert(r(0).getAs[Boolean]("saturated") &&
      r(0).getAs[Long]("allocated") == 10L)
    assert(!r(1).getAs[Boolean]("saturated") &&
      r(1).getAs[Long]("allocated") == 78L)
    assert(r.map(_.getAs[Long]("budget")).distinct.toSeq == Seq(88L))
  }

  test("mixtureAllocation drives stratifiedHashSample: budget -> rates -> corpus") {
    import graft.analyze.TextAnalysis
    // 4 sources x 400 docs x ~10 tokens; weights force saturation on
    // the smallest-ratio source at a 1/2 budget
    val docs = (0 until 1600).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, src, Seq.fill(6 + i % 9)("tok").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val avail = docs.groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("at"))
      .withColumn("w",
        when(col("source") === "s0", 9L).otherwise(1L))
    val alloc = TextAnalysis.mixtureAllocation(
        avail, "source", "at", "w", 1, 2)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("available"), r.getAs[Long]("allocated"),
          r.getAs[Boolean]("saturated")))).toMap
    // s0 (weight 9, same availability) must saturate at a 1/2 budget
    assert(alloc("s0")._3 && alloc("s0")._2 == alloc("s0")._1)
    // rates = floor(allocated * M / available); saturated -> M exactly
    val M = 1000
    val rates = alloc.map { case (s, (a, al, _)) =>
      s -> ((BigInt(al) * M) / BigInt(a)).toInt }
    assert(rates("s0") == M)
    val sampled = TextAnalysis.stratifiedHashSample(
        docs, "doc_id", "source", M, rates, defaultKeep = 0)
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("got"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // saturated source keeps its whole mass; unsaturated land within
    // 20% of their allocation (the md5-residue draw at 400 docs/source
    // — s2's fixed draw sits ~2 sigma high; the point is the loop
    // closes deterministically, not the variance of one draw)
    assert(sampled("s0") == alloc("s0")._1)
    for (s <- Seq("s1", "s2", "s3")) {
      val want = alloc(s)._2.toDouble
      assert(math.abs(sampled(s) - want) / want < 0.20,
        s"$s: got ${sampled(s)} want $want")
    }
  }

  test("mixtureAllocation: matches a sequential greedy reference on random inputs") {
    import graft.analyze.TextAnalysis
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 3) {
      val n = 12
      val rows = (0 until n).map(i =>
        (s"s$i", (rnd.nextInt(5000) + 1).toLong, (rnd.nextInt(9) + 1).toLong))
      val (num, den) = (rnd.nextInt(4) + 1, 5)
      val got = TextAnalysis.mixtureAllocation(
          rows.toDF("src", "avail", "w"), "src", "avail", "w", num, den)
        .orderBy("src").collect()
        .map(x => (x.getAs[String]("src"), x.getAs[Long]("allocated"),
          x.getAs[Boolean]("saturated"))).toSeq
      // sequential greedy: repeatedly saturate any source whose fair
      // share exceeds availability, then split the rest by weight
      var budget = rows.map(_._2).sum * num / den
      var active = rows.sortBy(r => (r._2.toDouble / r._3, r._2, r._1))
      var sat = Map.empty[String, Long]
      var changed = true
      while (changed) {
        changed = false
        val wsum = active.map(_._3).sum
        active.find(r => BigInt(r._2) * wsum <= BigInt(budget) * r._3)
          .foreach { r =>
            sat += (r._1 -> r._2); budget -= r._2
            active = active.filterNot(_._1 == r._1); changed = true
          }
      }
      val wsum = active.map(_._3).sum
      val want = rows.map { r =>
        sat.get(r._1) match {
          case Some(a) => (r._1, a, true)
          case None => (r._1, budget * r._3 / wsum, false)
        }
      }.sortBy(_._1)
      assert(got == want, s"mismatch for rows=$rows num=$num")
    }
  }
}
