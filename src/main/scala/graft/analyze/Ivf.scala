package graft.analyze

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside LSH (SURVEY §2.4): k-means centroids partition the corpus
  * into `nlist` cells; a query scores only the `nprobe` nearest cells.
  *
  * Scale design (the 100 TB posture):
  *   - Centroids never enter the Catalyst tree. They live in a single-row
  *     relation (`array<array<double>>`) that rides ONE broadcast to the
  *     executors; plan size, tree hashing, and codegen are O(1) in
  *     `nlist` (plan-literal centroids were the round-2 anti-pattern —
  *     O(nlist·dim) literals walked by every plan compare).
  *   - Assignment and probe selection are per-row native kernels
  *     (IvfAssignExpr / IvfProbesExpr) — narrow passes, no shuffle, no
  *     driver participation, so they distribute over any corpus or query
  *     table size.
  *   - Search shuffles only probed candidates. The probe table is
  *     (query_id, cell) ids-only and is broadcast: the cell key has just
  *     `nlist` distinct values, so a hash-partitioned join on it would be
  *     inherently skewed; broadcasting the id-pairs sidesteps that and
  *     stays tiny (~12 bytes/query/probe) even at 10⁸ queries. Query
  *     vectors join back by high-cardinality query_id with no forced
  *     strategy — AQE broadcasts them while they are small and falls back
  *     to a shuffle join for huge query tables.
  */
object Ivf {

  case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  private val MatCol = "__graft_cmat"

  /** The 1-row centroid-matrix relation; `broadcast()` + crossJoin plans
    * one BroadcastNestedLoopJoin with a single-row build side. */
  private def centroidRelation(spark: SparkSession,
                               centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(centroids.map(_.toSeq).toSeq)).toDF(MatCol)
  }

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

  /** Deterministic "sampled centroids" build: the `nlist` lowest-id
    * vectors ARE the centroids — the standard cheap bootstrap when a
    * k-means fit isn't warranted, and fully reproducible (no RNG, no
    * iteration), so the whole index is verifiable against a SQL oracle.
    * Assignment = argmin of exact-decimal L2² (n2x + n2c − 2·dot), ties
    * to the lowest cell id, evaluated by a native kernel against the
    * broadcast centroid matrix (see object scaladoc). The centroid
    * collect is metadata-sized (nlist vectors) by construction. */
  def buildSampled(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int): Index = {
    val centroids = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nlist).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    Index(centroids, assign(centroids, corpus, idCol, vecCol))
  }

  /** Assign vectors to a FROZEN centroid set — the incremental-ingest
    * maintenance path: a production index trains once and every daily
    * batch is assigned against the shipped centroids (retraining would
    * re-shuffle the whole 100 TB corpus). Same deterministic kernel as
    * [[buildSampled]] (argmin exact-decimal L2², ties to the lowest
    * cell) against the 1-row broadcast centroid matrix, so new-batch
    * assignment is bitwise identical to what a from-scratch build over
    * the same vectors would produce — which is what lets q95 oracle it.
    * Output columns: id, vec, cell, n2. */
  def assign(centroids: Array[Array[Double]], batch: DataFrame,
             idCol: String, vecCol: String): DataFrame = {
    val withN2 = Similarity.ensureParallelism(
        batch.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .withColumn("n2", Similarity.dotExact(col("vec"), col("vec")))
    withN2
      .crossJoin(broadcast(centroidRelation(batch.sparkSession, centroids)))
      .withColumn("cell", VectorFunctions.ivfAssign(col("vec"), col(MatCol)))
      .select(col("id"), col("vec"), col("cell"), col("n2"))
  }

  /** Index-maintenance drift report: assign a newly-ingested batch to
    * the frozen centroids and compare its per-cell population against
    * the index's — the numbers an operator watches to decide when a
    * daily-ingest index needs retraining (cell share skew growing, or
    * per-cell inertia rising as the batch drifts away from the frozen
    * centroid).
    *
    * Per cell: old_n/new_n counts, old_share/new_share (one IEEE
    * division each over exact integer counts), share_delta, and
    * new_inertia = mean exact-decimal L2² of the batch's vectors to
    * their frozen centroid (per-row dist² from the same decimal-exact
    * parts as assignment; summed as DECIMAL so partitioning can never
    * change the result; rounded and divided once at the end, per the
    * engine-parity policy).
    *
    * Scale shape: one narrow assignment pass over the batch, two
    * partial-aggregated per-cell counts, a broadcast of the nlist-row
    * centroid relation and the 1-row totals — nothing shuffles but the
    * (cell) aggregations, whose key cardinality is nlist. */
  def driftReport(index: Index, batch: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toDF("cell", "cvec")
    val newAssigned = assign(index.centroids, batch, idCol, vecCol)
    val withDist = newAssigned.join(broadcast(cents), Seq("cell"))
      .withColumn("c2", Similarity.dotExact(col("cvec"), col("cvec")))
      .withColumn("dist2",
        col("n2") + col("c2") - lit(2.0) * Similarity.dotExact(col("vec"), col("cvec")))
    val newStats = withDist.groupBy(col("cell")).agg(
      count(lit(1)).as("new_n"),
      sum(col("dist2").cast("decimal(30,12)")).as("__sumd"))
    val oldStats = index.assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("old_n"))
    val totals = index.assigned.agg(count(lit(1)).as("__old_t"))
      .crossJoin(batch.agg(count(lit(1)).as("__new_t")))
    cents.select(col("cell"))
      .join(oldStats, Seq("cell"), "left")
      .join(newStats, Seq("cell"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("old_n", coalesce(col("old_n"), lit(0L)))
      .withColumn("new_n", coalesce(col("new_n"), lit(0L)))
      .withColumn("old_share",
        col("old_n").cast("double") / col("__old_t").cast("double"))
      .withColumn("new_share",
        col("new_n").cast("double") / col("__new_t").cast("double"))
      .withColumn("share_delta", col("new_share") - col("old_share"))
      .withColumn("new_inertia", when(col("new_n") > 0,
          round(col("__sumd"), 4).cast("double") / col("new_n").cast("double"))
        .otherwise(lit(0.0)))
      .select("cell", "old_n", "new_n", "old_share", "new_share",
        "share_delta", "new_inertia")
  }

  /** Centroid refresh — the ACTION [[driftReport]]'s signal points at:
    * recompute each cell's centroid as the per-dimension mean of the
    * batch vectors assigned to it (one k-means update step over the new
    * data, no iteration, no 100 TB retrain). One narrow assignment pass,
    * then a single (cell, dim) aggregation — partial-aggregated map-side,
    * key cardinality nlist × dim, so nothing scales with the batch but
    * the narrow scan.
    *
    * Parity policy (oracle q98): coordinate sums are exact DECIMAL(30,12)
    * over double-cast elements (bitwise the same rounding DuckDB applies,
    * proven by the q95 inertia gate), one final round-4 + IEEE division.
    * `dim` is 1-based to match the oracle's generate_series convention.
    * Cells with no assigned vectors emit no rows (the caller keeps their
    * frozen centroid — see [[recenter]]). Output: cell, dim, n, c. */
  def recenteredCoords(centroids: Array[Array[Double]], batch: DataFrame,
                       idCol: String, vecCol: String): DataFrame =
    assign(centroids, batch, idCol, vecCol)
      .select(col("cell"), posexplode(col("vec")))
      .select(col("cell"), (col("pos") + 1).cast("int").as("dim"),
        col("col").cast("double").as("x"))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(30,12)")).as("__s"))
      .withColumn("c",
        round(col("__s"), 4).cast("double") / col("n").cast("double"))
      .select("cell", "dim", "n", "c")

  /** Materialize [[recenteredCoords]] into a refreshed centroid matrix:
    * cells the batch populated move to the batch mean (inertia against
    * the new data is non-increasing by the k-means argument — the mean
    * minimizes summed L2² within a cell); empty cells keep their frozen
    * centroid. The collect is nlist × dim rows — metadata-sized by
    * construction, the same budget as [[buildSampled]]'s centroid
    * sample. IvfSpec pins the inertia-reduction property on a drifted
    * batch. */
  def recenter(centroids: Array[Array[Double]], batch: DataFrame,
               idCol: String, vecCol: String): Array[Array[Double]] = {
    val out = centroids.map(_.clone)
    recenteredCoords(centroids, batch, idCol, vecCol).collect().foreach { r =>
      out(r.getAs[Int]("cell"))(r.getAs[Int]("dim") - 1) = r.getAs[Double]("c")
    }
    out
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedded corpus — cluster, then drop all but
    * one representative of every near-duplicate group WITHIN each
    * cluster. The clustering is the blocking unit that bounds the
    * quadratic pair work: pairs form only inside a cell, never across
    * the corpus. Keep policy is greedy-by-id (a vector falls if ANY
    * lower-id cell-mate sits at cos ≥ threshold) — deterministic and
    * single-pass, the paper's "keep one per ε-ball" made reproducible.
    *
    * Scale notes: the self-join shuffles on `cell`, whose cardinality is
    * `nlist` — size nlist ~ √N (the IVF norm) so cells stay bounded as
    * the corpus grows and the join keys don't skew; per-cell pair work
    * is then O(N) total. The dropped set is ids-only; survivors come
    * from an anti-join, so vectors themselves never ride the pair
    * explosion twice. */
  def semDedup(index: Index, threshold: Double): DataFrame = {
    val a = index.assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("va"), col("n2").as("na"))
    val b = index.assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vb"), col("n2").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("id")).distinct()
    index.assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("cell"))
  }

  /** Approximate top-k cosine: each query probes its `nprobe` nearest
    * cells, then scores only vectors in those cells. Probe selection runs
    * distributed (a narrow kernel over the query table against the
    * broadcast centroid matrix — no driver collect), with the same
    * exact-decimal math as buildSampled, so a sampled-centroid index
    * searches bitwise-reproducibly at any query-table size. */
  /** (query_id, cell) probe pairs — ids only, one row per probe; the
    * distributed probe-selection pass shared by [[search]] and
    * [[Pq.ivfpqTopK]]. */
  /** Cluster-balanced (diversity-preserving) sampling: keep at most
    * `quota` vectors PER IVF CELL, chosen by ascending md5 hash key —
    * the curation primitive that stops head clusters (boilerplate,
    * near-identical templates) from dominating a sampled corpus the way
    * uniform sampling lets them. Deterministic and engine-reproducible:
    * the hash order is the same md5-derived key as the flat/stratified
    * samplers ([[TextAnalysis.hashSampleKey]]), ties broken by id.
    * Returns (id, cell, rank) with rank 1..quota inside each cell.
    *
    * Scale shape: per-cell bottom-k over corpus-sized data is the same
    * one-reducer-per-group funnel as per-query top-k, so it rides
    * [[Similarity.topKPerQuery]]'s two-level rank (grouped by cell);
    * no per-cell sort of the full corpus, no driver participation. */
  def clusterBalancedSample(index: Index, quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1; got $quota")
    val keyed = index.assigned.select(col("id"), col("cell"),
      TextAnalysis.hashSampleKey(col("id")).as("__hk"))
    Similarity.topKPerQuery(keyed, "cell",
        Seq(col("__hk").asc, col("id").asc), quota)
      .select(col("id"), col("cell"), col("rank"))
  }

  def probeCells(index: Index, queries: DataFrame, idCol: String,
                 vecCol: String, nprobe: Int): DataFrame = {
    val cm = broadcast(centroidRelation(queries.sparkSession, index.centroids))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(cm)
      .select(col("query_id"),
        explode(VectorFunctions.ivfProbes(col("qv"), col(MatCol), nprobe)).as("cell"))
  }

  def search(index: Index, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nprobe: Int): DataFrame = {
    val probes = probeCells(index, queries, idCol, vecCol, nprobe)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Similarity.dotExact(col(vecCol), col(vecCol)).as("qn2"))

    val cand = index.assigned.join(broadcast(probes), Seq("cell"))
      .join(q, Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qv"), col("vec")), col("qn2"), col("n2")))
    // single-level rank ON PURPOSE (contrast Similarity.topKPerQuery):
    // candidates are INDEX-BOUNDED at nprobe·(n/nlist) ≈ nprobe·√n rows
    // per query, so the per-query reducer never sees corpus-proportional
    // data and the two-level form's extra exchange is pure overhead
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos"), col("rank"))
  }
}
