package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sink.BatchPacker
import graft.transform.Sanity

/** Property tests (SURVEY §5.1): T3 rename bijection, T4 idempotence,
  * T5 output domain, batch-packer invariants. ScalaCheck generators are
  * sampled with fixed seeds (no scalatestplus bridge in the offline
  * dependency set). */
class PropertySpec extends SparkSpec {
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  import spark.implicits._

  test("T5 property: output is null or exactly 10 digits") {
    val inputs = Gen.listOfN(60, Gen.oneOf(
      Gen.numStr, Gen.alphaNumStr,
      Gen.chooseNum(0L, 999999999999L).map(_.toString),
      Gen.chooseNum(0L, 999999999999L).map(n => s"$n.0"))).sample.get
    val got = inputs.toDF("m")
      .select(Sanity.mobileSanity(col("m")).as("v")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) || r.getString(0).matches("[0-9]{10}"), r)
    }
  }

  test("T4 property: int/float/date transforms are idempotent on strings") {
    val inputs = Gen.listOfN(40, Gen.oneOf(
      Gen.numStr.suchThat(_.nonEmpty), Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.const("2021-03-04"), Gen.const("2021-03-04 05:06:07"),
      Gen.const("x9"), Gen.const("-17"), Gen.const("4.75"))).sample.get
    for (kind <- Seq("int", "float", "date")) {
      val once = inputs.toDF("c")
        .select(Sanity.typeTransform(col("c"), kind).as("c"))
      val twice = once.select(Sanity.typeTransform(col("c"), kind).as("c"))
      assert(once.collect().map(_.getString(0)).toSeq ==
        twice.collect().map(_.getString(0)).toSeq, s"kind=$kind")
    }
  }

  test("T3 property: disjoint swap maps rename bijectively") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val swapped = Sanity.swapKeys(df, Map("a" -> "x", "b" -> "y"))
    assert(swapped.columns.toSet == Set("x", "y", "c"))
    val back = Sanity.swapKeys(swapped, Map("x" -> "a", "y" -> "b"))
    assert(back.columns.toSet == df.columns.toSet)
    assert(back.select("a", "b", "c").head == df.head)
  }

  test("BatchPacker properties: partition of input, order preserved, caps hold") {
    val lists = samples(Gen.listOf(Gen.alphaNumStr), 30)
    val ns = samples(Gen.chooseNum(1, 7), 30)
    lists.zip(ns).foreach { case (xs, n) =>
      val batches = BatchPacker.countBound(xs.iterator, n).toSeq
      assert(batches.flatten == xs)
      assert(batches.forall(_.size <= n))
      assert(batches.dropRight(1).forall(_.size == n))
    }
    val caps = samples(Gen.chooseNum(5L, 50L), 30)
    lists.zip(caps).foreach { case (xs0, cap) =>
      val xs = xs0.map(_.take(20))
      val batches = BatchPacker.byteBound(xs.iterator, cap).toSeq
      assert(batches.flatten == xs)
      batches.foreach { b =>
        val bytes = b.map(_.getBytes("UTF-8").length).sum + (b.size - 1).max(0)
        assert(bytes <= cap || b.size == 1)
      }
    }
  }

  test("dotExact property: permutation-invariant (order-independent sum)") {
    // The reproducibility claim behind every oracle-verified vector query:
    // repartitioning/reordering must not change the result bit-for-bit.
    val rnd = new scala.util.Random(11)
    val cases = (0 until 20).map { _ =>
      val n = 1 + rnd.nextInt(96)
      val a = Array.fill(n)(rnd.nextFloat() * 20 - 10)
      val b = Array.fill(n)(rnd.nextFloat() * 20 - 10)
      val perm = rnd.shuffle((0 until n).toList).toArray
      (a, b, perm.map(a), perm.map(b))
    }
    val df = cases.zipWithIndex.map { case ((a, b, ap, bp), i) => (i, a, b, ap, bp) }
      .toDF("i", "a", "b", "ap", "bp")
    val rows = df.select(
        graft.analyze.Similarity.dotExact($"a", $"b").as("d"),
        graft.analyze.Similarity.dotExact($"ap", $"bp").as("dp"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dedup equivalence: window, aggregate, and SQL forms agree (no ties)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val win = graft.dedup.Dedup.latestPerKey(ev, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id").collect().toSet
    val agg = graft.dedup.Dedup.latestPerKeyAgg(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").collect().toSet
    assert(win == agg)
    // the two-stage salted window rewrite must be bit-equivalent for any
    // salt routing: the per-(key,salt) winner set always contains the
    // global per-key winner
    val salted = graft.dedup.Dedup.latestPerKeySalted(ev, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc), xxhash64(col("event_id")), salts = 7)
      .select("user_id", "event_id").collect().toSet
    assert(win == salted)
    // null/negative salt normalization must not drop rows
    val nullSalt = graft.dedup.Dedup.latestPerKeySalted(ev, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc), lit(null).cast("long"), salts = 4)
      .select("user_id", "event_id").collect().toSet
    assert(win == nullSalt)
  }

  test("saltedRowNumber ≡ plain row_number (skewed keys, nulls, degenerate buckets)") {
    // The full-output window rewrite must assign the EXACT same rank to
    // every row as one global per-key sort, for any bucket count — the
    // range-bucket + offset construction is only valid if bucket order
    // aligns with sort order and ties never straddle a boundary.
    val rnd = new scala.util.Random(7)
    // skewed: ~half the rows on key 0, rest over 20 keys; duplicate order
    // values (v = small range) force tie-breaking through the boundary
    // logic; null order values exercise edge-bucket routing; null KEY
    // values exercise the null-safe offsets join (a plain USING join
    // would drop every null-key row — windows group nulls together)
    val rows = (0 until 5000).map { i =>
      val k: java.lang.Integer =
        if (rnd.nextInt(40) == 0) null
        else if (rnd.nextBoolean()) Integer.valueOf(0)
        else Integer.valueOf(1 + rnd.nextInt(20))
      val v: java.lang.Long =
        if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
      (k, v, i)
    }
    val df = rows.toDF("k", "v", "id")
    import org.apache.spark.sql.expressions.Window
    for (desc <- Seq(true, false); buckets <- Seq(1, 4, 7)) {
      val ord = (if (desc) col("v").desc else col("v").asc) +: Seq(col("id").asc)
      val plain = df.withColumn("rn",
          row_number().over(Window.partitionBy(col("k")).orderBy(ord: _*)))
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      val salted = graft.core.Skew.saltedRowNumber(df, Seq("k"), col("v"),
          descending = desc, tieBreakers = Seq(col("id").asc), buckets = buckets)
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      assert(plain.size == rows.size, s"plain dropped rows: desc=$desc buckets=$buckets")
      assert(plain == salted, s"desc=$desc buckets=$buckets")
    }
  }

  test("saltedRowNumber degenerate edge: all-equal and all-null order values stay exact") {
    // The quantile pass collapses when every row is TIED on the order
    // value (constant timestamp) or the cast yields only nulls — the
    // composite fallback must sub-bucket by the first tie-breaker and
    // still reproduce the plain window's rank bit-for-bit, in every
    // (major direction × tie-breaker direction) combination.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      val k: java.lang.Integer =
        if (rnd.nextInt(40) == 0) null
        else if (rnd.nextBoolean()) Integer.valueOf(0)
        else Integer.valueOf(1 + rnd.nextInt(10))
      (k, i)
    }
    val base = rows.toDF("k", "id")
    import org.apache.spark.sql.expressions.Window
    val constTs = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    for ((vcol, label) <- Seq(
           (lit(constTs), "constant-ts"),
           (lit(null).cast("timestamp"), "all-null"),
           // nulls + one dominant value: BOTH span kinds fire at once
           (when(col("id") % 2 === 0, lit(constTs)).otherwise(lit(null)), "half-null-half-const"),
           // null-heavy but clean non-null quantiles: only the null span
           (when(col("id") % 3 === 0, lit(null).cast("timestamp"))
             .otherwise(timestamp_seconds(lit(1704067200L) + col("id"))),
             "third-null-spread"),
           // TWO dominant values (40% each) + a 20% spread tail: multiple
           // fat spans sub-bucket independently in one pass
           (when(col("id") % 5 < 2, lit(constTs))
             .otherwise(when(col("id") % 5 < 4,
               lit(java.sql.Timestamp.valueOf("2024-07-01 00:00:00")))
               .otherwise(timestamp_seconds(lit(1704067200L) + col("id")))),
             "two-fat-values"));
         desc <- Seq(true, false); tbDesc <- Seq(true, false)) {
      val df = base.withColumn("v", vcol)
      val tb = if (tbDesc) col("id").desc else col("id").asc
      val ord = (if (desc) col("v").desc else col("v").asc) +: Seq(tb)
      val plain = df.withColumn("rn",
          row_number().over(Window.partitionBy(col("k")).orderBy(ord: _*)))
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      val salted = graft.core.Skew.saltedRowNumber(df, Seq("k"), col("v"),
          descending = desc, tieBreakers = Seq(tb), buckets = 8)
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      assert(plain == salted, s"$label desc=$desc tbDesc=$tbDesc")
    }
    // unsafe tie-breakers must DISABLE the fallback, never mis-bucket:
    // a string tb sorts "10" < "9" while casting to 10.0 > 9.0, and a
    // non-default null ordering breaks the direction-derived null edge —
    // both still rank exactly (plain single-bucket path)
    val dfS = base.withColumn("v", lit(constTs))
      .withColumn("sid", concat(lit(""), col("id")))
    for ((tb, label) <- Seq(
           (col("sid").asc, "string-tb"),
           (col("id").asc_nulls_last, "nulls-last-tb"))) {
      val ord = Seq(col("v").asc, tb)
      val plain = dfS.withColumn("rn",
          row_number().over(Window.partitionBy(col("k")).orderBy(ord: _*)))
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      val salted = graft.core.Skew.saltedRowNumber(dfS, Seq("k"), col("v"),
          descending = false, tieBreakers = Seq(tb), buckets = 8)
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      assert(plain == salted, label)
    }
  }

  test("saltedRowNumber cast guards: 2^53-lossy int64 range and string range stay exact") {
    // Two ways the double cast can lie about the range column's order:
    // (1) INJECTIVITY — distinct int64 values beyond 2^53 collapse to one
    //     double, so the quantile array reads them as one dominant "tied"
    //     value; sub-bucketing that span by the tie-breaker would
    //     interleave rows the true (v, tb) sort keeps apart. The span
    //     must be detected as a cast collision (distinct typed count > 1)
    //     and left whole.
    // (2) MONOTONICITY — numeric-LOOKING strings sort "10" < "9" but cast
    //     to 10.0 > 9.0, so any bucketing on the cast mis-orders; the
    //     range dtype gate must skip bucketing entirely.
    val rnd = new scala.util.Random(13)
    // v1/v2: adjacent longs at 2^60 (ulp there is 2^7, so both cast to
    // the SAME double); anti-correlated with the tie-breaker so a
    // tb-sub-bucketed collision span WOULD produce wrong ranks: all v1
    // rows sort before every v2 row, but v2 rows hold the SMALL ids.
    val v1 = 1L << 60
    val v2 = v1 + 1L
    assert(v1.toDouble == v2.toDouble, "fixture must actually collide")
    val rows = (0 until 3000).map { i =>
      val k: java.lang.Integer =
        if (rnd.nextInt(40) == 0) null
        else Integer.valueOf(rnd.nextInt(5))
      val v: java.lang.Long =
        if (i < 1200) java.lang.Long.valueOf(v2)          // small ids → v2
        else if (i < 2400) java.lang.Long.valueOf(v1)     // mid ids → v1
        else if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong())       // spread tail
      (k, v, i)
    }
    val df = rows.toDF("k", "v", "id")
    import org.apache.spark.sql.expressions.Window
    for (desc <- Seq(true, false)) {
      val ord = (if (desc) col("v").desc else col("v").asc) +: Seq(col("id").asc)
      val plain = df.withColumn("rn",
          row_number().over(Window.partitionBy(col("k")).orderBy(ord: _*)))
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      val salted = graft.core.Skew.saltedRowNumber(df, Seq("k"), col("v"),
          descending = desc, tieBreakers = Seq(col("id").asc), buckets = 8)
        .select("k", "id", "rn").collect()
        .map(r => (Option(r.get(0)), r.getInt(1)) -> r.getInt(2)).toMap
      assert(plain == salted, s"int64-collision desc=$desc")
    }
    // numeric-looking strings: cast order contradicts lexicographic order
    val dfS = (0 until 2000).map { i =>
      (i % 7, Seq("9", "10", "100", "2", "25")(i % 5), i)
    }.toDF("k", "v", "id")
    val ordS = Seq(col("v").asc, col("id").asc)
    val plainS = dfS.withColumn("rn",
        row_number().over(Window.partitionBy(col("k")).orderBy(ordS: _*)))
      .select("k", "id", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    val saltedS = graft.core.Skew.saltedRowNumber(dfS, Seq("k"), col("v"),
        descending = false, tieBreakers = Seq(col("id").asc), buckets = 8)
      .select("k", "id", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(plainS == saltedS, "string-range")
  }

  test("saltedJoinBy property: ≡ plain inner join (null keys, negative/null salts, 1/7/32 salts)") {
    // Whatever the caller passes as a salt expression — signed 32-bit
    // hash, negative arithmetic, even a constant null — the normalized
    // salt must never drop or duplicate a row: the result is the plain
    // inner join's multiset exactly. Null join keys drop in BOTH forms
    // (null = null is null), which the row-count delta asserts.
    val keyGen: Gen[java.lang.Long] = Gen.frequency(
      1 -> Gen.const(null.asInstanceOf[java.lang.Long]),
      9 -> Gen.chooseNum(0L, 30L).map(java.lang.Long.valueOf))
    val bigRows = samples(keyGen, 400).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
    val big = bigRows.toDF("k", "rid")
    // every OTHER key present: unmatched big rows must vanish identically
    val small = (0L to 30L by 2).map(kk => (kk, s"dim_$kk")).toDF("k", "dim")
    val plain = big.join(small, "k")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(plain.nonEmpty)
    val saltExprs = Seq(
      "hash32" -> hash(col("rid")),              // signed, negative half the time
      "xxhash64" -> xxhash64(col("rid")),
      "negative" -> (col("rid") * -3 - 7),
      "null" -> lit(null).cast("long"))
    for ((label, saltExpr) <- saltExprs; salts <- Seq(1, 7, 32)) {
      val got = graft.core.Skew.saltedJoinBy(big, small, "k", saltExpr, salts)
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == plain, s"salt=$label salts=$salts")
    }
  }

  test("unscaled12 fast path ≡ BigDecimal reference (fuzz + adversarial boundaries)") {
    import graft.functions.ExactDecimal
    val rnd = new scala.util.Random(99)
    // random magnitudes across the float-product range seen by the kernels
    val fuzz = (0 until 200000).map { _ =>
      val mag = math.pow(10.0, rnd.nextInt(24) - 12)
      (rnd.nextDouble() * 2 - 1) * mag
    }
    // adversarial: values AT and NEAR the 12-dp rounding boundaries, where
    // the fast path must detect the boundary and fall back
    val adv = (0 until 5000).flatMap { i =>
      val base = (i - 2500).toLong
      Seq(base * 1e-12, base * 1e-12 + 5e-13, base * 1e-12 + 5e-13 + 1e-25,
        base * 1e-12 - 5e-13, (base.toDouble + 0.5) / 1e12,
        java.lang.Math.nextUp((base.toDouble + 0.5) / 1e12),
        java.lang.Math.nextDown((base.toDouble + 0.5) / 1e12))
    } ++ Seq(0.0, -0.0, 1e-13, -1e-13, 4.999999999999e-13, 5.000000000001e-13)
    (fuzz ++ adv).foreach { d =>
      // overflow (beyond long-exact unscaled range) must THROW in both —
      // the kernels' addExact fallback contract depends on it
      val ref = scala.util.Try(ExactDecimal.unscaled12Reference(d))
      val fast = scala.util.Try(ExactDecimal.unscaled12(d))
      assert(fast.toOption == ref.toOption &&
        fast.isFailure == ref.isFailure,
        s"mismatch at d=$d (bits=${java.lang.Double.doubleToLongBits(d)}): fast=$fast ref=$ref")
    }
    // float products specifically (the kernels multiply float-derived doubles)
    (0 until 100000).foreach { _ =>
      val d = (rnd.nextFloat() * 2 - 1).toDouble * (rnd.nextFloat() * 2 - 1).toDouble
      assert(ExactDecimal.unscaled12(d) == ExactDecimal.unscaled12Reference(d), s"d=$d")
    }
  }

  test("aggregate dedup form plans a partial aggregation (map-side combine)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val df = graft.dedup.Dedup.latestPerKeyAgg(ev, Seq("user_id"), Seq("ts", "event_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial_"), plan)
  }

  test("chunking property: full coverage, stride-spaced starts, bounded lengths") {
    import graft.analyze.TextAnalysis
    val texts = samples(Gen.chooseNum(1, 40), 25).zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(k => s"w$k").mkString(" "))
    }
    for ((win, stride) <- Seq((4, 3), (8, 8), (5, 2))) {
      val chunks = TextAnalysis.chunkTokens(
          texts.toDF("doc_id", "text"), "doc_id", "text", win, stride)
        .select("doc_id", "start_pos", "n_chunk_tokens")
        .as[(Long, Int, Int)].collect().groupBy(_._1)
      for ((id, text) <- texts) {
        val n = text.split(" ").length
        val cs = chunks(id).sortBy(_._2)
        // starts are exactly 1, 1+stride, ... <= n
        assert(cs.map(_._2).toSeq == (1 to n by stride).toSeq, s"doc $id win=$win")
        // every token position is covered; lengths never exceed win
        val covered = cs.flatMap(c => c._2 until (c._2 + c._3)).toSet
        assert(covered == (1 to n).toSet, s"doc $id win=$win")
        assert(cs.forall(c => c._3 >= 1 && c._3 <= win))
      }
    }
  }

  test("decodeAvi property: adversarial bytes terminate fast — decode or IllegalArgument, never hang") {
    import graft.multimodal.MultiModal
    val rnd = new java.util.Random(7)
    val valid = MultiModal.encodeAvi(
      Seq(MultiModal.fakeImageBytes(20, 10, 3, 1),
        MultiModal.fakeImageBytes(20, 10, 3, 2)), 20, 10, fps = 25)
    def attempt(bytes: Array[Byte]): Unit = {
      // executor-safety contract (the round-6 ADVICE hang class): any
      // input either decodes or throws IAE — no infinite walk() loop,
      // no negative allocation, no raw buffer underflow
      val t0 = System.nanoTime()
      try { MultiModal.decodeAvi(bytes); () }
      catch { case _: IllegalArgumentException => () }
      // liveness bound, not a perf bound: the failure mode under test is a
      // HANG (infinite parse loop), so the bound only needs to separate
      // "terminated" from "never returns". 2s proved flaky when another
      // JVM (sbt compile) starved this one — a single ImageIO call was
      // observed at 9.3s wall under contention. 20s keeps the hang
      // detection while surviving a loaded box.
      assert((System.nanoTime() - t0) < 20e9, "decode attempt took > 20s")
    }
    // pure-random buffers (mostly fail the RIFF magic)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(b); attempt(b)
    }
    // mutated VALID containers: magic passes, structure is corrupt —
    // the regime where the old decoder hung or threw NegativeArraySize
    (0 until 500).foreach { _ =>
      val b = valid.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      attempt(b)
    }
    // truncations and pad-byte removals
    (1 until valid.length by 7).foreach(n => attempt(valid.take(n)))
  }

  test("decodeWav/decodeImage property: adversarial bytes terminate fast with a typed failure") {
    import graft.multimodal.MultiModal
    val rnd = new java.util.Random(11)
    val wav = MultiModal.encodeWav(8000, Array.tabulate(256)(i => (i * 7).toShort))
    val png = MultiModal.encodePng(16, 8, 0x336699)
    def attempt(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try f catch {
        case _: IllegalArgumentException => ()
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        case _: java.io.IOException => () // ImageIO/AudioSystem stream errors
      }
      // liveness bound, not a perf bound: the failure mode under test is a
      // HANG (infinite parse loop), so the bound only needs to separate
      // "terminated" from "never returns". 2s proved flaky when another
      // JVM (sbt compile) starved this one — a single ImageIO call was
      // observed at 9.3s wall under contention. 20s keeps the hang
      // detection while surviving a loaded box.
      assert((System.nanoTime() - t0) < 20e9, "decode attempt took > 20s")
    }
    (0 until 150).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b)
      attempt(MultiModal.decodeWav(b))
      attempt(MultiModal.decodeImage(b))
    }
    (0 until 300).foreach { _ =>
      val w = wav.clone(); val p = png.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        w(rnd.nextInt(w.length)) = rnd.nextInt(256).toByte
        p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte }
      attempt(MultiModal.decodeWav(w))
      attempt(MultiModal.decodeImage(p))
    }
    (1 until wav.length by 5).foreach(n => attempt(MultiModal.decodeWav(wav.take(n))))
    (1 until png.length by 5).foreach(n => attempt(MultiModal.decodeImage(png.take(n))))
  }

  test("asofJoinNearest property: equals the brute-force nearest pick on random data") {
    import graft.relational.Relational
    val rnd = new java.util.Random(17)
    // small key space + coarse timestamps force collisions, equal-ts
    // tiebreaks, exact past/future distance ties, and empty sides
    val base = 1700000000000L
    val events = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(20) * 60000L)))
    val orders = (1 to 60).map(i =>
      ((rnd.nextInt(8) + 1).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(20) * 60000L),
        i.toLong, rnd.nextInt(1000).toDouble))
    val got = Relational.asofJoinNearest(
        events.toDF("event_id", "user_id", "ts"),
        orders.toDF("user_id", "odate", "okey", "price"),
        key = "user_id", leftTs = "ts", rightTs = "odate",
        tiebreak = "okey", payload = Seq("okey"))
      .select($"event_id", $"matched_okey")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    events.foreach { case (eid, k, ts) =>
      val mine = orders.filter(_._1 == k)
      // backward: latest odate <= ts, ties to LARGEST okey
      val b = mine.filter(!_._2.after(ts))
        .sortBy(o => (o._2.getTime, o._3)).lastOption
      // forward: earliest odate >= ts, ties to SMALLEST okey
      val f = mine.filter(!_._2.before(ts))
        .sortBy(o => (o._2.getTime, o._3)).headOption
      val expected = (b, f) match {
        case (Some(bo), Some(fo)) =>
          val db = ts.getTime - bo._2.getTime
          val df = fo._2.getTime - ts.getTime
          if (db <= df) Some(bo._3) else Some(fo._3)
        case (Some(bo), None) => Some(bo._3)
        case (None, Some(fo)) => Some(fo._3)
        case _ => None
      }
      assert(got(eid) == expected,
        s"event $eid key $k ts $ts: got ${got(eid)}, expected $expected (b=$b f=$f)")
    }
  }

  test("asofJoinBackward/Forward property: equal the brute-force directional picks") {
    import graft.relational.Relational
    // same collision-heavy generator as the nearest test (coarse
    // timestamps force equal-ts tiebreaks and empty directions), but the
    // DIRECTIONAL operators asserted directly instead of via the
    // nearest composition
    val rnd = new java.util.Random(29)
    val base = 1700000000000L
    val events = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(20) * 60000L)))
    val orders = (1 to 60).map(i =>
      ((rnd.nextInt(8) + 1).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(20) * 60000L),
        i.toLong, rnd.nextInt(1000).toDouble))
    def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select($"event_id", $"matched_okey").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val gotB = collect(Relational.asofJoinBackward(
      events.toDF("event_id", "user_id", "ts"),
      orders.toDF("user_id", "odate", "okey", "price"),
      key = "user_id", leftTs = "ts", rightTs = "odate",
      tiebreak = "okey", payload = Seq("okey")))
    val gotF = collect(Relational.asofJoinForward(
      events.toDF("event_id", "user_id", "ts"),
      orders.toDF("user_id", "odate", "okey", "price"),
      key = "user_id", leftTs = "ts", rightTs = "odate",
      tiebreak = "okey", payload = Seq("okey")))
    events.foreach { case (eid, k, ts) =>
      val mine = orders.filter(_._1 == k)
      // backward: latest odate <= ts, equal-ts ties to LARGEST okey
      val b = mine.filter(!_._2.after(ts))
        .sortBy(o => (o._2.getTime, o._3)).lastOption.map(_._3)
      // forward: earliest odate >= ts, equal-ts ties to SMALLEST okey
      val f = mine.filter(!_._2.before(ts))
        .sortBy(o => (o._2.getTime, o._3)).headOption.map(_._3)
      assert(gotB(eid) == b, s"backward: event $eid key $k ts $ts")
      assert(gotF(eid) == f, s"forward: event $eid key $k ts $ts")
    }
  }

  test("crossDocSpans/strip property: equal a local reference on random corpora") {
    import graft.dedup.Dedup
    val rnd = new java.util.Random(23)
    // tiny vocab forces heavy cross-doc gram sharing; doc lengths span
    // shorter-than-k through many-island shapes
    for (trial <- 0 until 4; k <- Seq(2, 3)) {
      val docs = (1 to 12).map { i =>
        val n = 1 + rnd.nextInt(14)
        (i.toLong, (0 until n).map(_ => "w" + rnd.nextInt(5)).mkString(" "))
      }
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val grams = toks.view.mapValues(_.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toVector).toMap
      val shared = grams.toSeq
        .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
        .groupBy(_._1).collect { case (g, occ)
          if occ.map(_._2).toSet.size >= 2 => g }.toSet
      val marked = grams.map { case (id, gs) =>
        id -> gs.zipWithIndex.collect {
          case (g, i) if shared(g) => i + 1 }.toVector }
      // reference spans: maximal runs of consecutive marked starts
      val expSpans = marked.flatMap { case (id, ps) =>
        ps.foldLeft(Vector.empty[(Long, Long)]) { (acc, p) =>
          acc.lastOption match {
            case Some((s, e)) if p == e + 1 => acc.init :+ (s, p.toLong)
            case _ => acc :+ (p.toLong, p.toLong)
          }
        }.map { case (s, e) => (id, s, e + k - 1, e + k - s) }
      }.toSet
      val df = docs.toDF("doc_id", "text")
      val gotSpans = Dedup.crossDocSpans(df, "doc_id", "text", k, minDocs = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(gotSpans == expSpans, s"trial $trial k=$k spans")
      // reference strip: drop every position under a marked gram
      val gotStrip = Dedup.stripCrossDocSpans(df, "doc_id", "text", k, minDocs = 2)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      docs.foreach { case (id, _) =>
        val cov = marked(id).flatMap(p => p until p + k).toSet
        val keptToks = toks(id).zipWithIndex
          .collect { case (t, i) if !cov(i + 1) => t }
        assert(gotStrip(id) ==
          ((toks(id).size.toLong, cov.size.toLong, keptToks.mkString(" "))),
          s"trial $trial k=$k strip doc $id")
      }
    }
  }

  test("BPE property: segmentation always reconstructs the input words") {
    import graft.analyze.TextAnalysis
    val words = samples(Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)), 8)
      .map(_.mkString(" "))
    val docs = words.toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 6)
    val got = docs.select(TextAnalysis.bpeSegment(col("text"), merges).as("s"),
        col("text")).as[(Seq[String], String)].collect()
    got.foreach { case (segs, text) =>
      // dropping </w> markers and concatenating reconstructs the text
      val rebuilt = segs.mkString("").replace("</w>", " ").trim
      assert(rebuilt == text.toLowerCase.replaceAll("\\s+", " ").trim, s"text=$text segs=$segs")
    }
  }
}
