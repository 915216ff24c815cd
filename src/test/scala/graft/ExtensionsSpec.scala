package graft

import org.apache.spark.sql.SparkSession

/** SQL registration of the native expressions via SparkSessionExtensions.
  * Needs its own session (extensions are builder-time); stopped after. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("custom expressions callable from spark.sql") {
    val shared = TestSpark.spark // force-create shared session first
    // getOrCreate returns an existing session (ignoring extensions), so
    // clear active/default to get a fresh session on the same context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql("""
        SELECT
          simhash64(array('a','b','c')) AS sh,
          minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 8) AS sig,
          sorted_intersect_size(array(1L,2L,5L), array(2L,3L,5L)) AS isz
      """).head
      assert(row.getAs[Long]("sh") != 0L)
      assert(row.getSeq[Long](row.fieldIndex("sig")).size == 8)
      assert(row.getAs[Long]("isz") == 2L)
      val vec = spark.sql("""
        SELECT
          dot_exact(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                    array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
          lsh_sig(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 16, 2) AS s,
          simhash64(array('a','b'), true) AS shm
      """).head
      assert(vec.getAs[Double]("d") == 4.0)
      assert(vec.getAs[Long]("s") >= 0L)
      // md5-based simhash differs from the xxhash64 default
      assert(vec.getAs[Long]("shm") !=
        spark.sql("SELECT simhash64(array('a','b')) AS v").head.getLong(0))
      val wf = spark.sql(
        "SELECT winnow_fingerprints(array('a','b','c','d','e','f'), 3, 2) AS w")
        .head.getSeq[Long](0)
      assert(wf.nonEmpty && wf.size <= 4)
      val nrm = spark.sql(
        "SELECT l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
        .head.getSeq[Double](0)
      assert(math.abs(nrm(0) - 0.6) < 1e-12 && math.abs(nrm(1) - 0.8) < 1e-12)
      // parity with the Column API
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val viaSql = spark.sql("SELECT simhash64(array('x','y')) AS v").head.getLong(0)
      val viaCol = Seq(Seq("x", "y")).toDF("t")
        .select(graft.functions.HashFunctions.simhash64(col("t"))).head.getLong(0)
      assert(viaSql == viaCol)
    } finally {
      // restore the shared session for the rest of the suite run
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("registerAll: every registered function callable on a live session; spec covers the full list") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    // the RUNTIME path — no builder access needed (q222's route)
    graft.functions.GraftExtensions.registerAll(spark)

    val tested = scala.collection.mutable.Set[String]()
    def q(name: String, sql: String): org.apache.spark.sql.Row = {
      tested += name; spark.sql(sql).head
    }

    assert(q("simhash64", "SELECT simhash64(array('a','b')) v").getLong(0) != 0L)
    assert(q("minhash_sig",
      "SELECT minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 8) v")
      .getSeq[Long](0).size == 8)
    // md5Gram variant differs from the xxhash64 default
    tested += "shingle_hashes"
    assert(spark.sql("SELECT shingle_hashes(array('a','b','c'), 2, true) v")
      .head.getSeq[Long](0) !=
      spark.sql("SELECT shingle_hashes(array('a','b','c'), 2) v")
        .head.getSeq[Long](0))
    assert(q("sorted_intersect_size",
      "SELECT sorted_intersect_size(array(1L,2L,5L), array(2L,5L,9L)) v")
      .getLong(0) == 2L)
    tested += "winnow_fingerprints"
    assert(spark.sql(
      "SELECT winnow_fingerprints(array('a','b','c','d','e','f'), 3, 2, false) v")
      .head.getSeq[Long](0).nonEmpty)
    assert(q("dot_exact",
      "SELECT dot_exact(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) v").getDouble(0) == 4.0)
    assert(q("lsh_sig",
      "SELECT lsh_sig(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 16, 2) v")
      .getLong(0) >= 0L)
    assert(math.abs(q("l2_normalize",
      "SELECT l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) v")
      .getSeq[Double](0).head - 0.6) < 1e-12)
    // deletion_neighborhood: "ab" with 1 delete -> {ab, b, a}
    assert(q("deletion_neighborhood",
      "SELECT deletion_neighborhood('ab', 1) v")
      .getSeq[String](0).toSet == Set("ab", "a", "b"))
    assert(q("nfc_normalize",
      "SELECT nfc_normalize('é') v").getString(0) == "é")
    assert(q("strip_accents",
      "SELECT strip_accents('élève') v").getString(0) == "eleve")
    // hdr_bin / hdr_low parity with the Column API (q216 kernel)
    tested += "hdr_bin"; tested += "hdr_low"
    val binSql = spark.sql("SELECT hdr_bin(1000L, 6) b, hdr_low(hdr_bin(1000L, 6), 6) l").head
    val binCol = Seq(1000L).toDF("v").select(
      graft.analyze.Hdr.hdrBin(col("v"), 6).as("b")).head.getLong(0)
    assert(binSql.getLong(0) == binCol)
    assert(binSql.getLong(1) <= 1000L && binSql.getLong(1) > 0L)
    assert(q("url_normalize",
      "SELECT url_normalize('HTTP://WWW.Example.com:80/a/?b=2&a=1#frag') v")
      .getString(0) == "http://example.com/a?a=1&b=2")
    assert(q("url_host",
      "SELECT url_host('https://www.example.co.uk/x') v")
      .getString(0) == "example.co.uk")
    // nb_classify via the compact model literal (round-trips exactly)
    val model = graft.functions.NbModel.serialize(
      Seq("en", "fr"),
      Seq(Map(1L -> 3L, 9L -> 1L), Map(2L -> 4L)),
      Seq(100L, 50L), Seq(5L, 2L), 64)
    val parsed = graft.functions.NbModel.parse(model)
    assert(parsed == ((Seq("en", "fr"),
      Seq(Map(1L -> 3L, 9L -> 1L), Map(2L -> 4L)),
      Seq(100L, 50L), Seq(5L, 2L), 64)), s"round-trip broke: $parsed")
    tested += "nb_classify"
    val nbSql = spark.sql(
      s"SELECT nb_classify(array('the','a'), '$model') v").head.getString(0)
    val nbCol = Seq(Seq("the", "a")).toDF("t").select(
      graft.functions.TextFunctions.nbClassify(col("t"), Seq("en", "fr"),
        Seq(Map(1L -> 3L, 9L -> 1L), Map(2L -> 4L)),
        Seq(100L, 50L), Seq(5L, 2L), 64)).head.getString(0)
    assert(nbSql == nbCol)

    // unigram_segment via the compact model literal (round-trips)
    val um = graft.functions.UnigramModel.serialize(
      graft.analyze.UnigramFixture.pieces,
      graft.analyze.UnigramFixture.costs,
      graft.analyze.UnigramFixture.unkCost,
      graft.analyze.UnigramFixture.maxPieceLen)
    assert(graft.functions.UnigramModel.parse(um) ==
      ((graft.analyze.UnigramFixture.pieces,
        graft.analyze.UnigramFixture.costs,
        graft.analyze.UnigramFixture.unkCost,
        graft.analyze.UnigramFixture.maxPieceLen)))
    tested += "unigram_segment"
    assert(spark.sql(s"SELECT unigram_segment('window', '$um') v")
      .head.getSeq[String](0).toSeq == Seq("w", "indo", "w"))

    // fingerprint / rolling_hash / token_count: parity with the Column
    // API (the q226 pure-SQL dedup twin rides fingerprint)
    val txt = "  Hello   WORLD  again "
    val trio = q("fingerprint",
      s"SELECT fingerprint('$txt') v").getString(0)
    tested += "rolling_hash"; tested += "token_count"
    val sqlRow = spark.sql(
      s"SELECT rolling_hash('$txt') r, token_count('$txt') t").head
    val colRow = Seq(txt).toDF("x").select(
      graft.analyze.TextAnalysis.fingerprint(col("x")).as("f"),
      graft.analyze.TextAnalysis.rollingHash(col("x")).as("r"),
      graft.analyze.TextAnalysis.tokenCount(col("x")).as("t")).head
    assert(trio == colRow.getAs[String]("f"))
    assert(sqlRow.getLong(0) == colRow.getAs[Long]("r"))
    assert(sqlRow.getInt(1) == 3 && colRow.getAs[Int]("t") == 3)

    // curation kernels: parity with the Column API (q227's family)
    val prose = "The quick brown fox, and the lazy dog. It is fine."
    Seq("stopword_ratio", "punct_ratio", "mean_word_length",
      "quality_score", "lang_id").foreach(tested += _)
    val curSql = spark.sql(
      s"""SELECT stopword_ratio('$prose') sw, punct_ratio('$prose') pr,
          mean_word_length('$prose') mwl, quality_score('$prose') q,
          lang_id('$prose') l""").head
    val curCol = Seq(prose).toDF("x").select(
      graft.analyze.TextAnalysis.stopwordRatio(col("x")).as("sw"),
      graft.analyze.TextAnalysis.punctRatio(col("x")).as("pr"),
      graft.analyze.TextAnalysis.meanWordLength(col("x")).as("mwl"),
      graft.analyze.TextAnalysis.qualityScore(col("x")).as("q"),
      graft.analyze.TextAnalysis.langIdHeuristic(col("x")).as("l")).head
    Seq("sw", "pr", "mwl", "q").foreach { f =>
      assert(curSql.getAs[Double](f) == curCol.getAs[Double](f), f)
    }
    assert(curSql.getAs[String]("l") == "en" &&
      curCol.getAs[String]("l") == "en")

    // ANN kernels via the IvfModel compact literal (q229's route):
    // parity with the Column API's broadcast-relation form
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0), Array(-5.0, 5.0))
    val im = graft.functions.IvfModel.serialize(cents)
    assert(graft.functions.IvfModel.parse(im).map(_.toSeq).toSeq ==
      cents.map(_.toSeq).toSeq, "IvfModel must round-trip bit-exactly")
    val annSql = q("ivf_assign",
      s"""SELECT ivf_assign(array(CAST(9.0 AS FLOAT), CAST(9.5 AS FLOAT)),
            '$im') v""").getInt(0)
    assert(annSql == 1, s"nearest centroid must be cell 1, got $annSql")
    tested += "ivf_probes"
    val probes = spark.sql(
      s"""SELECT ivf_probes(array(CAST(-4.0 AS FLOAT), CAST(4.0 AS FLOAT)),
            '$im', 2) v""").head.getSeq[Int](0)
    assert(probes == Seq(2, 0), s"probe order must be (dist, cell) asc: $probes")
    val annCol = Seq(Seq(9.0f, 9.5f)).toDF("v")
      .crossJoin(broadcast(Seq(Tuple1(cents.map(_.toSeq).toSeq)).toDF("m")))
      .select(graft.functions.VectorFunctions.ivfAssign(col("v"), col("m")))
      .head.getInt(0)
    assert(annCol == annSql,
      "SQL model-literal path must match the broadcast-relation path")

    // completeness: this spec exercises EVERY registered function
    val registered = graft.functions.GraftExtensions.registrations
      .map(_._1.funcName).toSet
    assert(tested.toSet == registered,
      s"untested: ${registered -- tested}; stale: ${tested.toSet -- registered}")
  }
}
