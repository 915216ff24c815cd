package graft

import org.apache.spark.sql.functions._

/** Round-18 specs: the ADVICE r17 fixes — lossless-or-string decimal
  * widening, genuinely idempotent quarantine-stream replays (per-batch
  * partition overwrite, pinned with a forced crash-replay), the
  * `_change_type` silent-loss guard on the drift-tolerant changelog,
  * unigram seed coverage for rare single characters, and code-point
  * (not UTF-16-unit) Viterbi segmentation. */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  // ---- widen: decimal pairs that cannot merge losslessly ----

  test("SchemaDrift.widen: decimal pairs past 38 digits fall to the string carrier, never a lossy decimal") {
    import graft.source.SchemaDrift.widen
    import org.apache.spark.sql.types._
    // lossless unions still widen to decimal
    assert(widen(DecimalType(10, 2), DecimalType(12, 4)) == DecimalType(12, 4))
    assert(widen(DecimalType(38, 0), DecimalType(38, 0)) == DecimalType(38, 0))
    // 38 integer digits ∨ 25-digit scale needs 63 digits — no decimal
    // holds both; a capped decimal(38,25) would silently null every
    // large decimal(38,0) value on conform
    assert(widen(DecimalType(38, 0), DecimalType(30, 25)) == StringType)
    assert(widen(DecimalType(30, 25), DecimalType(38, 0)) == StringType)
    // integral ∨ very-high-scale decimal: long needs 20 int digits
    assert(widen(LongType, DecimalType(30, 25)) == StringType)
    assert(widen(DecimalType(30, 25), IntegerType) == StringType)
    // boundary: exactly 38 total stays decimal
    assert(widen(DecimalType(20, 0), DecimalType(18, 18)) == DecimalType(38, 18))
  }

  test("SchemaDrift.unionEvolved: an overflow decimal pair survives conform losslessly via string") {
    import org.apache.spark.sql.types._
    val big = new java.math.BigDecimal("99999999999999999999999999999999999999") // 38 nines
    val frac = new java.math.BigDecimal("0.1234567890123456789012345")
    val a = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(big)),
      StructType(Seq(StructField("v", DecimalType(38, 0)))))
    val b = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(frac)),
      StructType(Seq(StructField("v", DecimalType(30, 25)))))
    val u = graft.source.SchemaDrift.unionEvolved(Seq(a, b))
    assert(u.schema("v").dataType == StringType)
    val vals = u.collect().map(_.getString(0)).toSet
    // neither side nulled or truncated
    assert(vals.exists(_.startsWith("9999")), vals.toString)
    assert(vals.exists(_.contains("0.1234567890123456789012345")), vals.toString)
  }

  // ---- quarantine stream: genuine replay idempotency ----

  test("jsonStream: a crash-replayed micro-batch overwrites its own partition — no duplicate clean or quarantined rows") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-qreplay").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/b1.json"),
      """{"id":1,"name":"a"}""" + "\n" + """{broken""" + "\n")
    val q1 = graft.source.QuarantinedRead.jsonStream(spark, src, schema,
      s"$root/clean", s"$root/quar", s"$root/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    // simulate a crash AFTER the batch-0 sink writes but BEFORE the
    // checkpoint commit: delete the commit marker — restart must
    // re-execute batch 0 against the already-written outputs
    // the checkpoint stays registered as in-use until the stopped query
    // fully deregisters — wait it out before restarting on the same dir
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(spark.streams.active.isEmpty, "first query never deregistered")
    val commit = java.nio.file.Paths.get(s"$root/ckpt/commits/0")
    assert(java.nio.file.Files.exists(commit), "expected commit marker for batch 0")
    java.nio.file.Files.delete(commit)
    // the local checksum FS keeps a sibling .crc — a stale one makes the
    // replayed commit's atomic rename fail with a misleading error
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/ckpt/commits/.0.crc"))
    val q2 = graft.source.QuarantinedRead.jsonStream(spark, src, schema,
      s"$root/clean", s"$root/quar", s"$root/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    val clean = spark.read.parquet(s"$root/clean").collect()
    assert(clean.length == 1, s"replayed batch duplicated clean rows: ${clean.length}")
    assert(clean.head.getLong(clean.head.fieldIndex("id")) == 1L)
    val quar = spark.read.parquet(s"$root/quar").collect()
    assert(quar.length == 1, s"replayed batch duplicated quarantine rows: ${quar.length}")
    assert(quar.head.getAs[String]("_corrupt_record") == "{broken")
  }

  // ---- quarantine: column pruning must never hide malformed rows ----

  test("QuarantinedRead.csv: a query referencing a column subset still quarantines rows whose OTHER fields are malformed") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-qprune").toString
    val csv = s"$dir/in.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "id,score,name\n" +
        "1,10,alpha\n" +
        "2,notanint,beta\n" + // malformed in a column the query ignores
        "3,30\n")             // token-count mismatch
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", IntegerType),
      StructField("name", StringType)))
    val q = graft.source.QuarantinedRead.csv(spark, csv, schema)
    // the aggregates reference ONLY id / the corrupt col — before the
    // anti-pruning guard, the parser skipped converting `score`, no
    // row was ever marked corrupt, and the quarantine came back empty
    assert(q.quarantine.agg(count(lit(1))).head().getLong(0) == 2L)
    assert(q.clean.agg(sum(col("id"))).head().getLong(0) == 1L)
  }

  // ---- drift-tolerant changelog: _change_type silent-loss guard ----

  test("DriftTolerantChangelogSource: a batch missing a required downstream-filter column fails loudly") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val root = java.nio.file.Files.createTempDirectory("graft-ctguard").toString
    Seq((1L, "insert", ts("2024-01-01 10:00:00")))
      .toDF("id", "_change_type", "_commit_timestamp")
      .write.parquet(s"$root/log/batch=0001")
    Seq((2L, ts("2024-01-02 10:00:00")))
      .toDF("id", "_commit_timestamp") // _change_type DROPPED
      .write.parquet(s"$root/log/batch=0002")
    val guarded = new graft.source.DriftTolerantChangelogSource(
      spark, s"$root/log", requiredCols = Seq("_change_type"))
    val e = intercept[IllegalArgumentException](guarded.since(None))
    assert(e.getMessage.contains("_change_type"), e.getMessage)
    assert(e.getMessage.contains("batch=0002"), e.getMessage)
    // without the requirement the union itself still works (null-filled)
    val open = new graft.source.DriftTolerantChangelogSource(spark, s"$root/log")
    assert(open.since(None).count() == 2)
  }

  // ---- dirty-nightly composite: the quarantine × drift × incremental
  //      interactions no per-stage gate can see (q225's pins) ----

  test("dirty delta: a QUARANTINED bridge leaves two history clusters unmerged; a clean one merges them; the drift-dropped source column is repaired into the delta") {
    import org.apache.spark.sql.types._
    val d1 = "alpha beta gamma delta epsilon"
    val d2 = "one two three four five"
    val hist = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val bridgeLine = s"""{"doc_id":1000001,"text":"$d1 $d2"}"""
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    def runWith(line: String): (Map[Long, Long], Seq[String]) = {
      val root = java.nio.file.Files.createTempDirectory("graft-dirtyn").toString
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/land"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/land/b.json"), line + "\n")
      // quarantine split with the batch's own (source-less) schema,
      // clean side → parquet changelog batch, drift-tolerant re-read
      graft.source.QuarantinedRead.json(spark, s"$root/land", schema)
        .clean.write.parquet(s"$root/clean/batch=0000")
      val delta = new graft.source.DriftTolerantChangelogSource(
          spark, s"$root/clean").since(None)
      // repair: the drifted (absent → null-filled) source column
      assert(!delta.columns.contains("source"),
        "batch schema never carried source")
      val repaired = delta.withColumn("source", lit("bridge"))
      val docs = hist.withColumn("source", lit("archive"))
        .unionByName(repaired)
      val pairs = graft.dedup.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", shingleN = 3, threshold = 0.3)
      val touches = col("id_a") >= 1000000L || col("id_b") >= 1000000L
      val stored = graft.dedup.Dedup.connectedComponents(
        pairs.filter(!touches), "id_a", "id_b")
      val refreshed = graft.dedup.Dedup.incrementalComponents(
        stored, pairs.filter(touches), "id_a", "id_b")
      val lab = docs.join(refreshed.withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cid"), col("source"))
      val labels = lab.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val deltaSources = lab.filter(col("doc_id") >= 1000000L)
        .select("source").collect().map(_.getString(0)).toSeq
      (labels, deltaSources)
    }

    // clean bridge: history docs 1 and 2 MERGE, bridge carries the
    // repaired source into the cluster
    val (merged, srcs) = runWith(bridgeLine)
    assert(merged(1L) == merged(2L),
      s"clean bridge failed to merge history clusters: $merged")
    assert(merged(1000001L) == merged(1L))
    assert(srcs == Seq("bridge"))

    // truncated (quarantined) bridge: the SAME content arriving
    // malformed must quarantine, so the merge never happens
    val (unmerged, none) = runWith(bridgeLine.dropRight(15))
    assert(unmerged(1L) != unmerged(2L),
      s"quarantined bridge still merged history clusters: $unmerged")
    assert(!unmerged.contains(1000001L) && none.isEmpty,
      "malformed bridge row leaked into the clean corpus")
  }

  test("QuarantinedRead.json: an untypeable field in one column quarantines the row (q225's batch-0 corruption mode)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-juntype").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"doc_id":1,"text":"ok"}""" + "\n" +
        """{"doc_id":"bad2","text":"poisoned"}""" + "\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = graft.source.QuarantinedRead.json(spark, dir, schema)
    assert(q.clean.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val quar = q.quarantine.collect()
    assert(quar.length == 1)
    assert(quar.head.getAs[String]("_corrupt_record").contains("bad2"))
  }

  // ---- composed streaming nightly refresh: stream ≡ batch across a
  //      2-batch split with a forced cluster merge, replay-idempotent ----

  test("NightlyRefresh: two micro-batches (one forcing a cluster merge) end in the same report as a from-scratch batch recompute; a crash-replayed epoch changes nothing") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-nref").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))

    val a1 = "alpha beta gamma delta epsilon"
    val a2 = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six"
    val b2 = "one two three four five six seven"
    val bridge = s"$a1 $b"
    // append-ordered ids: seed < batch0 < batch1 (the changelog contract)
    val seed = Seq((1L, a1, "s1"), (2L, a2, "s1"), (3L, b, "s2"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    def line(id: Long, text: String, source: String) =
      s"""{"doc_id":$id,"text":"$text","n_chars":${text.length},"source":"$source"}"""
    // batch 0: a near-dup joining B's cluster + an exact copy of a1 (dies)
    val f0 = line(101L, b2, "b0") + "\n" + line(102L, a1, "b0") + "\n"
    // batch 1: the BRIDGE — merges the {1,2} and {3,101} clusters, so
    // their stored agg/HDR/KMV states must collide and combine
    val f1 = line(201L, bridge, "br") + "\n"

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("n_chars", LongType),
      StructField("source", StringType)))
    def startQ() = graft.streaming.NightlyRefresh.start(
      spark.readStream.schema(schema).json(src), seed,
      s"$root/state", s"$root/ckpt", shingleN = 3, threshold = 0.3, k = 64)

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/f0.json"), f0)
    val q1 = startQ()
    try {
      q1.processAllAvailable() // epoch 0
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/f1.json"), f1)
      q1.processAllAvailable() // epoch 1: the forced merge
    } finally q1.stop()

    def report(): Seq[Seq[Any]] = {
      val e = graft.streaming.NightlyRefresh.latestEpoch(spark, s"$root/state")
      assert(e.contains(1L), s"expected epochs 0 and 1, latest = $e")
      graft.streaming.NightlyRefresh.currentReport(spark, s"$root/state")
        .collect().map(_.toSeq.toVector).sortBy(_.head.toString).toSeq
    }

    // from-scratch recompute over seed ∪ both batches, same public ops
    val all = seed.unionByName(Seq((101L, b2, "b0"), (102L, a1, "b0"),
        (201L, bridge, "br")).toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long")))
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    val kept = all
      .withColumn("fp", graft.analyze.TextAnalysis.fingerprint(col("text")))
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1).drop("rn")
    val labels = graft.dedup.Dedup.connectedComponents(
      graft.dedup.Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.3),
      "id_a", "id_b")
    val lab = kept.join(labels.select(col("id").as("doc_id"),
        col("cluster_id").as("__c")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__c"), col("doc_id")).as("cluster_id"),
        col("n_chars"), col("source"))
    val agg = graft.relational.Relational
      .aggState(lab, Seq("cluster_id"), "n_chars")
    val kmv = lab.filter(col("source").isNotNull)
      .select(col("cluster_id"),
        graft.analyze.KmvDistinct.md5Low64(col("source")).as("__h"))
      .groupBy(col("cluster_id"))
      .agg(graft.analyze.KmvDistinct.stateUdaf(64)(col("__h")).as("state"))
    val expected = agg.select(col("cluster_id"), col("n").as("n_docs"),
        col("sum_v").cast("long").as("sum_chars"),
        col("min_v").as("min_chars"), col("max_v").as("max_chars"))
      .join(graft.analyze.Hdr.hdrQuantiles(
          graft.analyze.Hdr.hdrState(lab, "cluster_id", "n_chars"),
          "cluster_id", Seq(50))
        .select(col("cluster_id"), col("bin").as("p50_bin"),
          col("q_low").as("p50_low")), Seq("cluster_id"))
      .join(kmv.select(col("cluster_id"),
        size(col("state")).cast("long").as("n_src_sketch"),
        element_at(col("state"), -1).as("src_kth_min")), Seq("cluster_id"))
      .collect().map(_.toSeq.toVector).sortBy(_.head.toString).toSeq

    val got = report()
    assert(got == expected, s"stream $got != batch recompute $expected")
    // the bridge really merged everything surviving into ONE cluster
    assert(got.length == 1 && got.head.head == 1L, got.toString)
    assert(got.head(1) == 5L, s"expected 5 surviving docs: $got")

    // crash-replay epoch 1: delete its commit marker and restart — the
    // replay re-reads epoch 0 and overwrites epoch 1; nothing changes
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(spark.streams.active.isEmpty, "first query never deregistered")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/ckpt/commits/1"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/ckpt/commits/.1.crc"))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(report() == expected, "replayed epoch diverged from the batch recompute")
  }

  test("NightlyRefresh: a third epoch re-keys states through a root that was ITSELF produced by an earlier incremental merge") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-nref3").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
    val a = "alpha beta gamma delta epsilon"
    val b = "one two three four five six"
    val c = "red green blue cyan magenta yellow"
    val seed = Seq((1L, a, "s"), (2L, b, "s"), (3L, c, "s"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    def line(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","n_chars":${text.length},"source":"d"}"""
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("n_chars", LongType),
      StructField("source", StringType)))
    val q = graft.streaming.NightlyRefresh.start(
      spark.readStream.schema(schema).json(src), seed,
      s"$root/state", s"$root/ckpt")
    try {
      // epoch 0: near-dup of A → {1, 101}
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/f0.json"), line(101L, s"$a zeta") + "\n")
      q.processAllAvailable()
      // epoch 1: bridge A–B → merge {1,101} with {2} under root 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/f1.json"), line(201L, s"$a $b") + "\n")
      q.processAllAvailable()
      // epoch 2: bridge B–C — B's state rows are keyed by root 1, a
      // label minted by epoch 1's incrementalComponents, and C's by 3;
      // the rekey must route BOTH into the union's min root
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/f2.json"), line(301L, s"$b $c") + "\n")
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.streaming.NightlyRefresh
      .latestEpoch(spark, s"$root/state").contains(2L))
    val rep = graft.streaming.NightlyRefresh
      .currentReport(spark, s"$root/state").collect()
    assert(rep.length == 1, s"expected ONE merged cluster: ${rep.toSeq}")
    val r = rep.head
    assert(r.getAs[Long]("cluster_id") == 1L)
    assert(r.getAs[Long]("n_docs") == 6L, r.toString)
    // exact decomposable aggregates across the three merges
    val lens = Seq(a, s"$a zeta", b, s"$a $b", c, s"$b $c").map(_.length.toLong)
    assert(r.getAs[Long]("sum_chars") == lens.sum, r.toString)
    assert(r.getAs[Long]("min_chars") == lens.min)
    assert(r.getAs[Long]("max_chars") == lens.max)
    // KMV distinct sources: s, d
    assert(r.getAs[Long]("n_src_sketch") == 2L, r.toString)
  }

  test("NightlyRefresh property: randomized corpora and epoch splits — stream ≡ from-scratch recompute (3 seeds)") {
    import org.apache.spark.sql.types._
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "one", "two", "three", "four", "five", "six", "red", "green", "blue",
      "cyan", "apple", "pear", "plum", "kiwi", "north", "south", "east",
      "west", "stone", "river", "cloud", "ember", "frost", "grove")

    def recompute(all: org.apache.spark.sql.DataFrame): Seq[Vector[Any]] = {
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      val kept = all
        .withColumn("fp", graft.analyze.TextAnalysis.fingerprint(col("text")))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1).drop("rn")
      val labels = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.3),
        "id_a", "id_b")
      val lab = kept.join(labels.select(col("id").as("doc_id"),
          col("cluster_id").as("__c")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__c"), col("doc_id")).as("cluster_id"),
          col("n_chars"), col("source"))
      val agg = graft.relational.Relational
        .aggState(lab, Seq("cluster_id"), "n_chars")
      val kmv = lab.filter(col("source").isNotNull)
        .select(col("cluster_id"),
          graft.analyze.KmvDistinct.md5Low64(col("source")).as("__h"))
        .groupBy(col("cluster_id"))
        .agg(graft.analyze.KmvDistinct.stateUdaf(64)(col("__h")).as("state"))
      agg.select(col("cluster_id"), col("n").as("n_docs"),
          col("sum_v").cast("long").as("sum_chars"),
          col("min_v").as("min_chars"), col("max_v").as("max_chars"))
        .join(graft.analyze.Hdr.hdrQuantiles(
            graft.analyze.Hdr.hdrState(lab, "cluster_id", "n_chars"),
            "cluster_id", Seq(50))
          .select(col("cluster_id"), col("bin").as("p50_bin"),
            col("q_low").as("p50_low")), Seq("cluster_id"))
        .join(kmv.select(col("cluster_id"),
          size(col("state")).cast("long").as("n_src_sketch"),
          element_at(col("state"), -1).as("src_kth_min")), Seq("cluster_id"))
        .collect().map(_.toSeq.toVector).sortBy(_.head.toString).toSeq
    }

    Seq(7L, 23L, 99L).foreach { sd =>
      val rnd = new scala.util.Random(sd)
      def freshDoc() = Seq.fill(4 + rnd.nextInt(5))(
        pool(rnd.nextInt(pool.size))).mkString(" ")
      val seedTexts = Vector.fill(25)(freshDoc())
      // batches mix fresh docs, exact copies (die in stage 1), and
      // near-dup mutants (survive, join clusters) of anything earlier
      var seen = seedTexts
      def batchTexts(m: Int): Vector[String] = Vector.fill(m) {
        val t = rnd.nextInt(10) match {
          case 0 | 1 | 2   => seen(rnd.nextInt(seen.size)) // exact copy
          case 3 | 4 | 5   => seen(rnd.nextInt(seen.size)) + " " +
            pool(rnd.nextInt(pool.size)) // near-dup mutant
          case _           => freshDoc()
        }
        seen = seen :+ t; t
      }
      val b0 = batchTexts(8); val b1 = batchTexts(8)

      val root = java.nio.file.Files
        .createTempDirectory(s"graft-nrefp$sd").toString
      val src = s"$root/src"
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
      val seedDf = seedTexts.zipWithIndex
        .map { case (t, i) => (i + 1L, t, s"s${i % 3}") }
        .toDF("doc_id", "text", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
      def jl(id: Long, t: String, srcTag: String) =
        s"""{"doc_id":$id,"text":"$t","n_chars":${t.length},"source":"$srcTag"}"""
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("n_chars", LongType),
        StructField("source", StringType)))
      val q = graft.streaming.NightlyRefresh.start(
        spark.readStream.schema(schema).json(src), seedDf,
        s"$root/state", s"$root/ckpt")
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$src/f0.json"),
          b0.zipWithIndex.map { case (t, i) => jl(101L + i, t, "b0") }
            .mkString("", "\n", "\n"))
        q.processAllAvailable()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$src/f1.json"),
          b1.zipWithIndex.map { case (t, i) => jl(201L + i, t, "b1") }
            .mkString("", "\n", "\n"))
        q.processAllAvailable()
      } finally q.stop()

      val e = graft.streaming.NightlyRefresh.latestEpoch(spark, s"$root/state")
      assert(e.contains(1L), s"seed $sd: latest epoch $e")
      val got = graft.streaming.NightlyRefresh
        .currentReport(spark, s"$root/state")
        .collect().map(_.toSeq.toVector).sortBy(_.head.toString).toSeq
      val all = seedDf.unionByName(
        (b0.zipWithIndex.map { case (t, i) => (101L + i, t, "b0") } ++
          b1.zipWithIndex.map { case (t, i) => (201L + i, t, "b1") })
          .toDF("doc_id", "text", "source")
          .withColumn("n_chars", length(col("text")).cast("long")))
      val expected = recompute(all)
      assert(got == expected,
        s"seed $sd: stream diverged from recompute\n got=$got\n exp=$expected")
    }
  }

  // ---- unigram seeding: rare singles enter the seed vocab ----

  test("unigramTrainWithStats: a rare single character outside the top-4x substrings still enters the vocab") {
    // 'aaaa' dominates: substrings a/aa/aaa/aaaa fill the top 4 slots
    // at vocabSize=1; 'z' appears once — before the fix it never
    // entered the seed and survived only via the UNK fallback
    val docs = (Seq.fill(100)("aaaa") :+ "z").toDF("text")
    val (vocab, _) = graft.analyze.TextAnalysis
      .unigramTrainWithStats(docs, "text", vocabSize = 1, maxPieceLen = 4,
        emRounds = 1)
    assert(vocab.exists(_._1 == "z"),
      s"rare single 'z' missing from vocab: ${vocab.map(_._1)}")
    assert(vocab.exists(_._1 == "a"))
  }

  // ---- segmentation: code points, not UTF-16 units ----

  test("unigramSegment: non-BMP characters segment as atomic code points, never surrogate halves") {
    val df = Seq("a😀b").toDF("w") // a😀b
    val segs = df.select(graft.functions.TextFunctions
        .unigramSegment(col("w"), Seq("a"), Seq(100L),
          unkCost = 20000L, maxPieceLen = 4).as("s"))
      .head().getSeq[String](0)
    assert(segs == Seq("a", "😀", "b"), segs.toString)
    // every piece is valid UTF-16 (no lone surrogates)
    segs.foreach { p =>
      assert(!p.exists(c => Character.isSurrogate(c) && p.length == 1),
        s"lone surrogate piece: ${p.map(_.toInt)}")
    }
    // round-trips
    assert(segs.mkString == "a😀b")
  }

  test("unigramSegment: a multi-code-point piece containing an emoji is matched whole") {
    val df = Seq("😀😀x").toDF("w") // 😀😀x
    val segs = df.select(graft.functions.TextFunctions
        .unigramSegment(col("w"),
          Seq("😀😀"), Seq(50L),
          unkCost = 20000L, maxPieceLen = 4).as("s"))
      .head().getSeq[String](0)
    // the 2-code-point vocab piece (4 UTF-16 units) must win over two
    // UNK singles: 16*50+1 < 2*(16*20000+1)
    assert(segs == Seq("😀😀", "x"), segs.toString)
  }
}
