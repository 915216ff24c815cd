package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `array<float>` embedding columns
  * (SURVEY.md §2.4): brute-force cosine top-k as the correctness baseline,
  * LSH-bucketed approximate search as the 100 TB scale path.
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions — a
  * narrow, codegen'd per-row fold; no UDF, no Python boundary.
  */
object Similarity {

  /** Elementwise dot product of two equal-length float arrays, computed in
    * double as a sequential left fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; 0 for zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = sqrt(normSq(a)) * sqrt(normSq(b))
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Dot product with an exact-decimal accumulator: each elementwise
    * product is computed in double (deterministic), rounded to
    * decimal(30,12), and summed exactly — so the result is independent of
    * addition order and bitwise-reproducible across engines (the DuckDB
    * oracle computes the identical formula). Still a narrow per-row fold. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,12)")),
      lit(0).cast("decimal(25,12)"),
      // (25,12)+(20,12) → (26,12), exact; cast back keeps the fold closed.
      (acc, v) => (acc + v).cast("decimal(25,12)")).cast("double")

  /** Cosine via exact-decimal dot/norms (oracle-reproducible). */
  def cosineExact(a: Column, b: Column): Column = {
    val n = sqrt(dotExact(a, a)) * sqrt(dotExact(b, b))
    when(n > 0, dotExact(a, b) / n).otherwise(lit(0.0))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast); the scan over
    * `corpus` is a single narrow pass per query — the right baseline on a
    * cluster when queries fit in memory. Excludes self-matches by id.
    * Deterministic: ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim):
    * xxhash64 folded into [-1, 1). No RNG state — reproducible across
    * runs and engines that share xxhash64. */
  private def hyperplane(bit: Int, dim: Column): Column =
    (pmod(xxhash64(lit(bit), dim), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0

  /** Random-hyperplane LSH signature (`bits` sign bits) of a vector —
    * a per-row narrow expression. */
  def lshSignature(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * hyperplane(b, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, c) => a.bitwiseOR(c))
  }

  /** LSH-bucketed approximate top-k: bucket corpus and queries by
    * multi-probe banded signatures, score only same-bucket pairs.
    *
    * Scale path: the corpus is hashed once (narrow), the join is on bucket
    * keys (shuffle proportional to candidates, not n×q). Recall < 1 by
    * construction; `bands` trades recall for cost.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    def banded(df: DataFrame, id: String, v: String): DataFrame = {
      val sig = lshSignature(col(vecCol), bits)
      df.select(col(idCol).as(id), col(vecCol).as(v), sig.as("sig"))
        .select(col(id), col(v), explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * width)
              .bitwiseAND(lit((1L << width) - 1)).as("key"))
        }: _*)).as("bucket"))
    }
    val c = banded(corpus, "neighbor_id", "cv")
    val q = banded(queries, "query_id", "qv")
    val cand = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates from
    * shared LSH buckets (linear-ish), verified exactly. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, bits: Int = 16,
                     bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val sigd = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), bits).as("sig"))
    val banded = sigd.select(col("id"), col("v"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bucket"))
    val l = banded.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = banded.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
