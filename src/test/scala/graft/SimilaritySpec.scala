package graft

import org.apache.spark.sql.functions._
import graft.analyze.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def naiveCos(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na * nb > 0) d / (na * nb) else 0.0
  }

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0L until 50L).map(i => i -> Array.fill(16)(rnd.nextFloat() * 2 - 1))
  }

  test("dot/cosine match a local computation") {
    val df = vecs.take(2).toDF("id", "v")
    val a = vecs(0)._2; val b = vecs(1)._2
    val row = df.filter($"id" === 0L).crossJoin(
        df.filter($"id" === 1L).select($"v".as("w")))
      .select(Similarity.dot($"v", $"w").as("d"), Similarity.cosine($"v", $"w").as("c"))
      .head
    assert(math.abs(row.getDouble(0) - a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum) < 1e-9)
    assert(math.abs(row.getDouble(1) - naiveCos(a, b)) < 1e-9)
  }

  test("bruteForceTopK returns the true top-k") {
    val df = vecs.toDF("id", "v")
    val got = Similarity.bruteForceTopK(df, df.filter($"id" < 2L), "id", "v", k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val lookup = vecs.toMap
    for (q <- Seq(0L, 1L)) {
      val expected = vecs.filter(_._1 != q)
        .map { case (i, v) => (i, naiveCos(lookup(q), v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("rerankExact restores exact order over a candidate set and never invents candidates") {
    val df = vecs.toDF("id", "v")
    val lookup = vecs.toMap
    // candidate sets chosen to EXCLUDE some true top neighbors: the
    // re-rank must return the exact-cosine order RESTRICTED to the
    // candidates, not the global top (that's the retriever's job)
    val candidateIds = vecs.map(_._1).filter(i => i % 3 != 0 && i >= 2)
    val cands = (for (q <- Seq(0L, 1L); n <- candidateIds)
      yield (q, n)).toDF("query_id", "neighbor_id")
    val got = Similarity.rerankExact(cands, df, df.filter($"id" < 2L),
        "id", "v", k = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    for (q <- Seq(0L, 1L)) {
      val expected = candidateIds.filter(_ != q)
        .map(i => (i, naiveCos(lookup(q), lookup(i))))
        .sortBy { case (i, c) => (-c, i) }.take(4).map(_._1)
      assert(got(q) == expected, s"query $q")
      assert(got(q).forall(candidateIds.contains), s"query $q invented a row")
    }
  }

  test("topKPerQuery == single global rank, across partitionings and ties") {
    // The two-level rank must be IDENTICAL to the naive one-window form
    // for any input partitioning — including tied scores, where only the
    // total order (score, id) makes either form deterministic. 40 rows,
    // scores drawn from 5 distinct values so ties are guaranteed.
    import org.apache.spark.sql.expressions.Window
    val rows = for (q <- 0 until 3; i <- 0 until 40)
      yield (q.toLong, i.toLong, (i * 7 % 5).toDouble)
    for (parts <- Seq(1, 3, 16)) {
      val scored = rows.toDF("query_id", "id", "score").repartition(parts)
      val naive = scored.withColumn("rank", row_number().over(
          Window.partitionBy($"query_id").orderBy($"score".desc, $"id".asc)))
        .filter($"rank" <= 4)
        .select("query_id", "id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val got = Similarity.topKPerQuery(scored, "query_id",
          Seq($"score".desc, $"id".asc), 4)
        .select("query_id", "id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == naive, s"parts=$parts")
    }
  }

  test("lshTopK candidates are a subset with correct scores; self excluded") {
    val df = vecs.toDF("id", "v")
    val got = Similarity.lshTopK(df, df.filter($"id" < 2L), "id", "v",
      k = 5, bits = 16, bands = 8, dim = 16).collect()
    assert(got.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    val lookup = vecs.toMap
    got.foreach { r =>
      val c = naiveCos(lookup(r.getAs[Long]("query_id")), lookup(r.getAs[Long]("neighbor_id")))
      assert(math.abs(c - r.getAs[Double]("cos")) < 1e-9)
    }
  }

  test("KmvDistinct: exact below k, ~accurate above, merge-order invariant") {
    val agg = new graft.analyze.KmvDistinct(16)
    // spark-side estimate over 1000 distinct values, k=16
    val df = (1 to 1000).map(i => s"v$i").toDF("v")
      .select(graft.analyze.KmvDistinct.md5Low64($"v").as("h"))
    val est = df.agg(graft.analyze.KmvDistinct.udafFor(16)($"h")).head.getLong(0)
    assert(est > 400 && est < 2500, s"estimate $est for 1000 distinct")
    // exact when below k
    val estSmall = (1 to 9).map(i => s"v$i").toDF("v")
      .select(graft.analyze.KmvDistinct.md5Low64($"v").as("h"))
      .agg(graft.analyze.KmvDistinct.udafFor(16)($"h")).head.getLong(0)
    assert(estSmall == 9L)
    // merge is order-invariant (associative/commutative trim-union)
    val rnd = new scala.util.Random(3)
    val raw = Array.fill(200)(rnd.nextLong())
    val a = raw.take(100).foldLeft(agg.zero)(agg.reduce)
    val b = raw.drop(100).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(a, b)) ==
      agg.finish(raw.foldLeft(agg.zero)(agg.reduce)))
    // SQL-surface registration
    graft.analyze.KmvDistinct.register(spark, 16)
    df.createOrReplaceTempView("kmv_in")
    assert(spark.sql("SELECT kmv_distinct_16(h) AS e FROM kmv_in")
      .head.getLong(0) == est)
  }

  test("native expression edge semantics: nulls, length mismatch, bad types") {
    // length mismatch and null arrays → null (the fold's poison semantics)
    val df = Seq(
      (1L, Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))),  // length mismatch
      (2L, None, Some(Array(1f, 2f))),                     // null side
      (3L, Some(Array(1f, 2f)), Some(Array(3f, 4f)))       // fine
    ).toDF("id", "a", "b")
    val got = df.select($"id", Similarity.dotExact($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L).contains(11.0))
    // wrong input type fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(Similarity.dotExact($"a", $"b")).collect()
    }
  }

  test("IVF kernel edge semantics: null elements, dim-mismatched centroids, bad types") {
    import graft.functions.VectorFunctions
    // centroid matrix column: one 2-dim centroid, one 3-dim (skipped for
    // 2-dim vectors), exercised through the same crossJoin shape Ivf uses
    val cm = Seq(Tuple1(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0, 0.5)))).toDF("cmat")
    val vecs = Seq(
      (1L, Some(Array(0.9f, 0.1f))),   // → cell 0 (the only dim-matched centroid)
      (2L, None)                       // null vec → null cell, null probes
    ).toDF("id", "v")
    val out = vecs.crossJoin(cm)
      .select($"id", VectorFunctions.ivfAssign($"v", $"cmat").as("cell"),
        VectorFunctions.ivfProbes($"v", $"cmat", 4).as("probes"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getInt(1))),
         (if (r.isNullAt(2)) None else Some(r.getSeq[Int](2).toList)))).toMap
    assert(out(1L) == ((Some(0), Some(List(0))))) // mismatched centroid absent
    assert(out(2L) == ((None, None)))
    // a null ELEMENT inside the vector poisons the row like dotExact
    val nullElem = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v")
      .crossJoin(cm).select(VectorFunctions.ivfAssign($"v", $"cmat").as("cell"))
      .collect().head
    assert(nullElem.isNullAt(0))
    // wrong matrix type fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      vecs.withColumn("cmat", lit("nope"))
        .select(VectorFunctions.ivfAssign($"v", $"cmat")).collect()
    }
  }

  test("normalizeL2: unit norm after, zero vector unchanged, null poisons") {
    val df = Seq(
      (1L, Some(Array(3f, 4f))),      // norm 5 → (0.6, 0.8)
      (2L, Some(Array(0f, 0f))),      // zero norm → unchanged (as double)
      (3L, None)                      // null vector → null
    ).toDF("id", "v")
    val got = df.select($"id", Similarity.normalizeL2($"v").as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1).toList))).toMap
    assert(got(1L).get.zip(List(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(got(2L).contains(List(0.0, 0.0)))
    assert(got(3L).isEmpty)
    // post-normalization dot ≈ cosine of the originals
    val n = got(1L).get
    assert(math.abs(n.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("meanPool matches a local per-dimension mean") {
    val data = Seq(
      (0L, Array(1f, 2f)), (0L, Array(3f, 4f)),   // grp 0 → (2.0, 3.0)
      (1L, Array(10f, 0f)))                       // grp 1 → (10.0, 0.0)
    val got = Similarity.meanPool(data.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0L, 0) -> 2.0, (0L, 1) -> 3.0, (1L, 0) -> 10.0, (1L, 1) -> 0.0))
  }

  test("cosineNearDups finds planted near-identical vectors") {
    val base = Array.fill(16)(0.5f)
    val tweaked = base.clone(); tweaked(0) = 0.51f
    val noise = new scala.util.Random(9)
    val others = (10L until 30L).map(i => i -> Array.fill(16)(noise.nextFloat() * 2 - 1))
    val df = (Seq(1L -> base, 2L -> tweaked) ++ others).toDF("id", "v")
    val pairs = Similarity.cosineNearDups(df, "id", "v", threshold = 0.999,
      bits = 16, bands = 8, dim = 16).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("annRecall: hit counting, zero-overlap queries, perfect recall") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 21L), (2L, 99L), (3L, 98L), (3L, 99L))
      .toDF("query_id", "neighbor_id")
    val r = Similarity.annRecall(exact, approx, "query_id", "neighbor_id", k = 2)
      .orderBy("query_id").as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 0.5), (3L, 0L, 0.0)))
  }
}
