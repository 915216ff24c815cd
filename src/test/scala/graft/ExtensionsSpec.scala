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
}
