package graft.analyze

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside LSH (SURVEY §2.4): k-means centroids partition the corpus
  * into `nlist` cells; a query scores only the `nprobe` nearest cells.
  *
  * Build is one MLlib k-means fit + a narrow cell-assignment pass;
  * search shuffles only the probed cells. Centroids are metadata-sized
  * (nlist × dim floats) and ride to executors via a broadcast join of the
  * query→cell probe table.
  */
object Ivf {

  case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit centroids and assign every corpus vector to its cell.
    * `assigned` columns: id, vec (array<float>), cell (int), n2. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int, seed: Long = 42L): Index = {
    val withVec = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("__v", array_to_vector(col("vec")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("id"), col("vec"), col("cell"),
        Similarity.normSq(col("vec")).as("n2"))
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  // ---- exact-decimal helpers (bitwise-reproducible across engines) ----
  // Mirrors Similarity.dotExact: each product rounded to 12 dp HALF_UP
  // (Spark's double→decimal cast), summed exactly, cast back to double.
  private def exactDot(a: Array[Double], b: Array[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < a.length) {
      // valueOf = shortest decimal repr, matching Spark's double→decimal
      // cast (and DotExactExpr.unscaled12)
      acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i))
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue
  }

  /** Deterministic "sampled centroids" build: the `nlist` lowest-id
    * vectors ARE the centroids — the standard cheap bootstrap when a
    * k-means fit isn't warranted, and fully reproducible (no RNG, no
    * iteration), so the whole index is verifiable against a SQL oracle.
    * Assignment = argmin of exact-decimal L2² (n2x + n2c − 2·dot), ties
    * to the lowest cell id, evaluated as one narrow array_min expression.
    */
  def buildSampled(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int): Index = {
    val centroids = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nlist).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n2c = centroids.map(c => exactDot(c, c))
    val withN2 = Similarity.ensureParallelism(
        corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .withColumn("n2", Similarity.dotExact(col("vec"), col("vec")))
    // struct(dist, cell) array_min = lexicographic argmin with cell tiebreak
    val cellExpr = array_min(array(centroids.indices.map { j =>
      struct(
        ((col("n2") + lit(n2c(j))) -
          lit(2.0) * Similarity.dotExact(col("vec"), lit(centroids(j)))).as("d"),
        lit(j).as("cell"))
    }: _*)).getField("cell")
    Index(centroids, withN2.withColumn("cell", cellExpr)
      .select(col("id"), col("vec"), col("cell"), col("n2")))
  }

  /** Approximate top-k cosine: each query probes its `nprobe` nearest
    * cells (computed driver-side — centroids are tiny), then scores only
    * vectors in those cells. Probe selection and scoring use the same
    * exact-decimal math as buildSampled, so a sampled-centroid index
    * searches bitwise-reproducibly. */
  def search(index: Index, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centroids = index.centroids
    // (query vectors are expected to be a small set — same contract as
    // bruteForceTopK's broadcast side)
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probes = qRows.toSeq.flatMap { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      val n2q = exactDot(qd, qd)
      centroids.zipWithIndex.map { case (c, cell) =>
        val d = (n2q + exactDot(c, c)) - 2.0 * exactDot(qd, c)
        (qid, cell, d)
      }.sortBy { case (_, cell, d) => (d, cell) }
        .take(nprobe).map { case (id, cell, _) => (id, cell) }
    }.toDF("query_id", "cell")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Similarity.dotExact(col(vecCol), col(vecCol)).as("qn2"))

    val cand = index.assigned.join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qv"), col("vec")), col("qn2"), col("n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos"), col("rank"))
  }
}
