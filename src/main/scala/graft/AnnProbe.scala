package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.{Ivf, Pq, Similarity}

/** Data-dominated ANN scale probe (SCALE.md round-8 entry): the round-7
  * 4×/32× embeddings probe measured exponents of 0.04–0.14 because at
  * ~102k × 64-dim vectors EVERYTHING is overhead — it neither confirmed
  * IVF's sub-linear probing nor exposed a brute-force crossover. This
  * probe generates corpora large enough that brute force costs real
  * seconds (10⁶–10⁷ × 64-dim) and measures the serving regime directly:
  *
  *  - corpus: deterministic hash vectors (xxhash64(id, d) → [0, 1)),
  *    generated distributed, written parquet — NO driver data path. The
  *    8 query vectors are ids 0–7, whose vectors are identical at every
  *    scale (the hash ignores corpus size): constant query set, growing
  *    corpus.
  *  - brute: [[Similarity.bruteForceTopK]] over the full scan — the
  *    linear baseline.
  *  - IVF: [[Ivf.buildSampled]] at nlist = ⌈√n⌉ (cell size √n, the
  *    standard sizing), assignments written PARTITIONED BY CELL and
  *    reloaded, so [[Ivf.search]]'s probe join prunes to the ~nprobe·8
  *    probed cells via dynamic partition pruning — the read itself is
  *    sub-linear, not just the compute. Build time is measured and
  *    reported separately: the serving question is "after how many
  *    query batches does the index pay for itself", and that
  *    break-even count is emitted per scale.
  *  - PQ/ADC (exhaustive compressed scan — linear with a smaller
  *    constant than brute) and IVFPQ (probed + compressed — the
  *    billion-vector layout) over the same prebuilt artifacts, codes
  *    materialized to parquet like the assignments.
  *  - recall@10 of each approximate form vs brute on the same corpus,
  *    so every speed number is tied to the recall it buys (uniform
  *    hash vectors are the WORST case for IVF recall — no cluster
  *    structure — making the reported recall a floor, not a
  *    cherry-pick).
  *
  * Results append as JSON lines to /tmp/ann_results.txt (crash-safe,
  * same convention as ScaleProbe). Args: comma-separated corpus sizes
  * (default "250000,1000000,4000000"); optional second arg = comma-
  * separated nprobe values to SWEEP (e.g. "2,4,8,16") — each sweep
  * point re-times IVF and IVFPQ search at that nprobe and re-measures
  * recall@10 vs the same cached exact answer, emitting one extra JSON
  * line per point. The sweep is the tooling behind SCALE.md's nprobe
  * sizing guidance: recall-vs-nprobe is corpus-dependent, so a user
  * picks nprobe from a measured curve, not folklore. */
object AnnProbe {
  private val Dim = 64
  private val K = 10
  private val NProbe = 8

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("250000,1000000,4000000")
      .split(",").map(_.trim.toLong)
    val sweepNProbes: Array[Int] =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt)
      else Array.empty
    // third arg: corpus shape. "hash" (default) = structure-free uniform
    // vectors — the recall worst case. "clustered" = 250 planted fuzzy
    // clusters (md5-deterministic centers in [0,1)^64, 0.3-amplitude
    // per-vector noise): true neighbors are cluster co-members, and at
    // nlist = √n ≫ 250 each cluster SPLINTERS across ~nlist/250 cells —
    // so recall must climb with nprobe and the sweep shows a real knee,
    // the regime the nprobe guidance is written for. Also the at-scale
    // test of "PQ recalls correctly on structured data" (PqSpec proves
    // it at toy size; the hash fixture floor is 0.13–0.16).
    val mode = if (args.length > 2) args(2) else "hash"
    // fail fast on a typo: an unknown mode would silently fall through
    // to hash vectors while every JSON line carries the typo'd label —
    // a hash-vector curve masquerading as a clustered one
    require(mode == "hash" || mode == "clustered",
      s"corpus mode must be 'hash' or 'clustered'; got '$mode'")
    // fourth arg: re-rank candidate width as a multiple of K (default
    // 10·K). The re-rank can only reorder what ADC retrieved, and ADC
    // breaks within-cluster ties by id — so recall after re-rank is
    // bounded by how much of the TIE SET the width covers. On tightly
    // clustered corpora that means width ≳ cluster occupancy of the
    // best code, not a small constant.
    val rerankMult = if (args.length > 3) args(3).toInt else 10
    val log = new java.io.PrintWriter(
      new java.io.FileWriter("/tmp/ann_results.txt", true), true)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.ui.retainedExecutions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = {
      System.gc(); time(f); math.min(time(f), time(f))
    }
    sizes.foreach { n =>
      val dir =
        if (mode == "hash") s"/tmp/graft_ann_$n"
        else s"/tmp/graft_ann_${mode}_$n"
      // deterministic synthetic corpus, generated distributed
      val u = (salt: String, key: org.apache.spark.sql.Column,
               d: org.apache.spark.sql.Column) =>
        pmod(xxhash64(key, d, lit(salt)), lit(1000000L))
          .cast("double") / lit(1000000.0)
      val vecExpr =
        if (mode == "clustered")
          transform(sequence(lit(0), lit(Dim - 1)), d =>
            (u("c", pmod(col("id"), lit(250L)), d)
              + u("n", col("id"), d) * lit(0.3)).cast("float"))
        else
          transform(sequence(lit(0), lit(Dim - 1)),
            d => (pmod(xxhash64(col("id"), d), lit(1000000L))
              .cast("double") / lit(1000000.0)).cast("float"))
      spark.range(n).select(col("id"), vecExpr.as("vec"))
        .write.mode("overwrite").parquet(s"file:$dir/corpus")
      val corpus = spark.read.parquet(s"file:$dir/corpus")
      val queries = corpus.filter(col("id") < 8)

      val tBrute = best(
        Similarity.bruteForceTopK(corpus, queries, "id", "vec", K).count())

      val nlist = math.max(64, math.ceil(math.sqrt(n.toDouble)).toInt)
      var centroids: Array[Array[Double]] = null
      val tBuild = time {
        val idx = Ivf.buildSampled(corpus, "id", "vec", nlist)
        centroids = idx.centroids
        // one file per cell; cell-partitioned layout is what makes the
        // search read sub-linear (DPP prunes to the probed cells)
        idx.assigned.repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"file:$dir/assigned")
      }
      val index = Ivf.Index(centroids,
        spark.read.parquet(s"file:$dir/assigned"))
      val tIvf = best(
        Ivf.search(index, queries, "id", "vec", K, NProbe).count())

      // same search against a FLAT (non-partitioned) copy of the same
      // assignments: compute is identical, but without the cell layout
      // there is nothing for DPP to prune, so the scan reads the whole
      // index — this isolates the storage-layout share of the win
      spark.read.parquet(s"file:$dir/assigned")
        .write.mode("overwrite").parquet(s"file:$dir/assigned_flat")
      val flatIndex = Ivf.Index(centroids,
        spark.read.parquet(s"file:$dir/assigned_flat"))
      val tIvfFlat = best(
        Ivf.search(flatIndex, queries, "id", "vec", K, NProbe).count())

      // PQ: m=8 subspaces × ks=256 codes, codebooks from the id-ordered
      // sample; codes materialized like the assignments so the timed
      // scans read parquet, not a recomputing lineage
      val cb = Pq.buildSampled(corpus, "id", "vec", m = 8, ks = 256)
      val tEncode = time {
        Pq.encode(corpus, "id", "vec", cb)
          .write.mode("overwrite").parquet(s"file:$dir/codes")
      }
      val codes = spark.read.parquet(s"file:$dir/codes")
      val tAdc = best(
        Pq.adcTopK(codes, queries, "id", "vec", cb, K).count())
      val tIvfpq = best(
        Pq.ivfpqTopK(index, cb, codes, queries, "id", "vec", K, NProbe).count())

      // recall@10 vs brute (ids-only joins; results are 8·K rows each).
      // Every side is cached and forced ONCE: without this each
      // recallOf() re-executes the full brute scan (and the approximate
      // searches) from lineage — three extra corpus passes per scale,
      // the recomputing-lineage trap the materialized artifacts exist
      // to avoid.
      val exact = Similarity.bruteForceTopK(corpus, queries, "id", "vec", K)
        .cache()
      exact.count()
      def recallOf(approx: DataFrame): Double = {
        val a = approx.cache(); a.count()
        val r = Similarity.annRecall(exact, a, "query_id", "neighbor_id", K)
          .agg(avg(col("recall"))).head().getDouble(0)
        a.unpersist(blocking = false)
        r
      }
      val recall = recallOf(Ivf.search(index, queries, "id", "vec", K, NProbe))
      val recallAdc = recallOf(
        Pq.adcTopK(codes, queries, "id", "vec", cb, K))
      val recallIvfpq = recallOf(
        Pq.ivfpqTopK(index, cb, codes, queries, "id", "vec", K, NProbe))

      // nprobe sweep: same index/codes/exact artifacts, one line per
      // requested nprobe — the recall-vs-cost curve a user sizes nprobe
      // from (the headline line above is fixed at nprobe = 8)
      sweepNProbes.foreach { p =>
        val tIvfP = best(
          Ivf.search(index, queries, "id", "vec", K, p).count())
        val rIvfP = recallOf(Ivf.search(index, queries, "id", "vec", K, p))
        val tIvfpqP = best(
          Pq.ivfpqTopK(index, cb, codes, queries, "id", "vec", K, p).count())
        val rIvfpqP = recallOf(
          Pq.ivfpqTopK(index, cb, codes, queries, "id", "vec", K, p))
        // ADC-retrieve wide (10·K) + exact re-rank to K — the production
        // tail that rescues PQ's within-cluster tie collapse; its cost
        // rides the same probed scan plus a candidate-set re-rank
        def reranked() = Similarity.rerankExact(
          Pq.ivfpqTopK(index, cb, codes, queries, "id", "vec",
            K * rerankMult, p),
          corpus, queries, "id", "vec", K)
        val tRerank = best(reranked().count())
        val rRerank = recallOf(reranked())
        log.println(
          f"""{"n":$n,"mode":"$mode","sweep_nprobe":$p,"rerank_mult":$rerankMult,"t_ivf":$tIvfP%.3f,"recall":$rIvfP%.3f,"t_ivfpq":$tIvfpqP%.3f,"recall_ivfpq":$rIvfpqP%.3f,"t_ivfpq_rerank":$tRerank%.3f,"recall_ivfpq_rerank":$rRerank%.3f}""")
      }
      exact.unpersist(blocking = false)

      // break-even: query batches (of 8) until the build cost is repaid
      // by the per-batch saving; Infinity formats unparseably, cap it
      val saving = tBrute - tIvf
      val breakEven =
        if (saving > 0) (tBuild / saving).ceil.toLong else -1L
      log.println(
        f"""{"n":$n,"mode":"$mode","nlist":$nlist,"t_brute":$tBrute%.3f,"t_ivf":$tIvf%.3f,"t_ivf_flat":$tIvfFlat%.3f,"t_build":$tBuild%.3f,"recall":$recall%.3f,"break_even_batches":$breakEven,"t_encode":$tEncode%.3f,"t_adc":$tAdc%.3f,"t_ivfpq":$tIvfpq%.3f,"recall_adc":$recallAdc%.3f,"recall_ivfpq":$recallIvfpq%.3f}""")
    }
    log.close()
    spark.stop()
  }
}
