package graft.analyze

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** Product quantization (Jégou et al., TPAMI'11) — the third ANN scale
  * path beside LSH ([[Similarity]]) and IVF ([[Ivf]]): split each vector
  * into `m` subvectors, quantize each against a per-subspace codebook of
  * `ks` entries, and score queries against the CODES via asymmetric
  * distance computation (ADC) — a per-query lookup table of exact
  * subspace distances, so the corpus is scanned at m bytes per vector
  * instead of dim floats (here 4 codes vs 64 floats = 64× compression).
  *
  * Scale design, mirroring [[Ivf]]:
  *   - Codebooks are metadata-sized (m·ks subvectors) and ride broadcasts;
  *     encoding is a narrow per-row kernel pass (IvfAssignExpr per
  *     subspace on a sliced vector) — no shuffle, no driver loop.
  *   - The ADC lookup table is built DISTRIBUTED: (query, subspace) rows
  *     join the exploded codebook relation — never a driver-side matrix.
  *   - The scoring join keys on (subspace, code): only m·ks distinct
  *     values, so the LUT side must broadcast (a hash-partitioned join on
  *     it would collapse to m·ks partitions); the code table streams.
  *   - All distances are exact-decimal ((n2q + n2c − 2·dot) with 12-dp
  *     dots; the ADC sum accumulates in DECIMAL, order-independent), so
  *     results are bitwise-reproducible and SQL-oracle-verifiable.
  *
  * Deterministic "sampled codebooks" bootstrap (like [[Ivf.buildSampled]]):
  * codebook `s` = the s-th subvectors of the `ks` lowest-id corpus
  * vectors. Swap in per-subspace k-means offline for recall-tuned
  * production codebooks; every downstream shape stays identical.
  */
object Pq {

  /** books(s)(code) = centroid subvector; subDim = dim / m. */
  case class Codebooks(m: Int, subDim: Int, books: Array[Array[Array[Double]]])

  def buildSampled(corpus: DataFrame, idCol: String, vecCol: String,
                   m: Int, ks: Int): Codebooks = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(ks).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { s =>
      sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
    }
    Codebooks(m, subDim, books)
  }

  /** One-row relation carrying all m codebook matrices (array<array<double>>
    * columns) — the [[Ivf]] broadcast pattern: plan size O(1) in m·ks. */
  private def matrixRelation(spark: SparkSession, cb: Codebooks): DataFrame = {
    val schema = StructType((0 until cb.m).map(s =>
      StructField(s"__cb$s", ArrayType(ArrayType(DoubleType)))))
    val row = Row.fromSeq((0 until cb.m).map(s => cb.books(s).map(_.toSeq).toSeq))
    spark.createDataFrame(java.util.Arrays.asList(row), schema)
  }

  /** Exploded codebook rows (s, code, cvec) — m·ks rows, broadcast-sized. */
  private def codebookRows(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until cb.m; c <- cb.books(s).indices)
      yield (s, c, cb.books(s)(c).toSeq)).toDF("s", "code", "cvec")
  }

  /** Encode every vector as m codes, melted long-form: (id, s, code).
    * Argmin per subspace is the IvfAssign kernel on the sliced vector —
    * ties to the lowest code, bit-identical to the SQL oracle. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebooks): DataFrame = {
    val withBooks = Similarity.ensureParallelism(
        corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .crossJoin(broadcast(matrixRelation(corpus.sparkSession, cb)))
    val codeCols = (0 until cb.m).map { s =>
      VectorFunctions.ivfAssign(
        slice(col("vec"), lit(s * cb.subDim + 1), lit(cb.subDim)),
        col(s"__cb$s"))
    }
    withBooks
      .select(col("id"), posexplode(array(codeCols: _*)).as(Seq("s", "code")))
  }

  /** Per-query ADC lookup table (query_id, s, code, dd): exact-decimal
    * d²(query subvector, codebook entry), built distributed (query melt
    * × broadcast codebook rows). n2q + n2c − dot − dot: pure
    * decimal(,12) additions — never ×2, which would push Spark past the
    * 38-digit cap and truncate scale. */
  private def lutFor(queries: DataFrame, idCol: String, vecCol: String,
                     cb: Codebooks): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(30,12)")
    val qsub = queries.select(col(idCol).as("query_id"),
        posexplode(array((0 until cb.m).map(s =>
          slice(col(vecCol), lit(s * cb.subDim + 1), lit(cb.subDim))): _*))
          .as(Seq("s", "qsub")))
    val cbr = codebookRows(queries.sparkSession, cb)
      .withColumn("cn2", Similarity.dotExact(col("cvec"), col("cvec")))
    val qdot = dec(Similarity.dotExact(col("qsub"), col("cvec")))
    qsub.join(broadcast(cbr), Seq("s"))
      .withColumn("dd",
        dec(Similarity.dotExact(col("qsub"), col("qsub")))
          + dec(col("cn2")) - qdot - qdot)
      .select("query_id", "s", "code", "dd")
  }

  /** DECIMAL-summed ADC scores → deterministic top-k rows. */
  /** `twoLevel = true` for corpus-proportional candidate sets (the
    * exhaustive ADC scan — see Similarity.topKPerQuery's applicability
    * note); false for index-bounded ones (IVFPQ: nprobe·(n/nlist) rows
    * per query), where the single window is the cheaper correct form. */
  private def rankTopK(scored: DataFrame, k: Int, twoLevel: Boolean): DataFrame = {
    val order = Seq(col("dist_dec").asc, col("id").asc)
    val ranked =
      if (twoLevel) Similarity.topKPerQuery(scored, "query_id", order, k)
      else {
        val w = Window.partitionBy(col("query_id")).orderBy(order: _*)
        scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      }
    ranked.select(col("query_id"), col("id").as("neighbor_id"),
      col("dist_dec").cast("double").as("dist"), col("rank"))
  }

  /** ADC top-k over the WHOLE code table (exhaustive compressed scan):
    * per query, the LUT joins the codes and subspace distances sum in
    * DECIMAL. Returns (query_id, neighbor_id, dist, rank). */
  def adcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val lut = lutFor(queries, idCol, vecCol, cb)
    rankTopK(
      codes.join(broadcast(lut), Seq("s", "code"))
        .filter(col("id") =!= col("query_id"))
        .groupBy(col("query_id"), col("id"))
        .agg(sum(col("dd")).as("dist_dec")),
      k, twoLevel = true)
  }

  /** IVFPQ (the standard large-scale ANN layout): probe the `nprobe`
    * nearest IVF cells, then ADC-score ONLY vectors assigned to probed
    * cells — candidate volume is nprobe/nlist of the corpus and the scan
    * reads codes, not vectors. Both halves are the independently
    * verified [[Ivf]] and [[Pq]] paths; this is their join: probes and
    * LUT are ids-plus-decimals broadcasts, the big sides (assignments,
    * codes) only ever stream. */
  def ivfpqTopK(ivf: Ivf.Index, cb: Codebooks, codes: DataFrame,
                queries: DataFrame, idCol: String, vecCol: String,
                k: Int, nprobe: Int): DataFrame = {
    val probes = Ivf.probeCells(ivf, queries, idCol, vecCol, nprobe)
    val candIds = ivf.assigned.select(col("id"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
    val lut = lutFor(queries, idCol, vecCol, cb)
    rankTopK(
      candIds.join(codes, Seq("id"))
        .join(broadcast(lut), Seq("query_id", "s", "code"))
        .groupBy(col("query_id"), col("id"))
        .agg(sum(col("dd")).as("dist_dec")),
      k, twoLevel = false)
  }
}
