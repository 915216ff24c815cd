package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-exponent probe for the candidate-join family (SCALE.md round-7
  * entry): build an S× perturbed derivative of sf0.1's documents and
  * time the bucketed dedup/clustering queries at both scales; the
  * per-query exponent is log(tS/t1)/log(S). The perturbation inserts a
  * UNIQUE marker token (hash of doc, replica, position) after every 3rd
  * word, so replicas are NOT near-dups of each other or of the original
  * (shingles differ). Markers are keyed per (doc, replica, position), so
  * the two members of an original near-dup pair draw DIFFERENT markers —
  * dilution shifts Jaccard/hamming similarity downward relative to the
  * raw corpus. Both timings therefore run on marker-perturbed
  * derivatives (t1 on a scale-1 derivative, tS on the scale-S one) so
  * they share the same diluted similarity/candidate structure and the
  * exponent measures SCALE, not a structure change; the null hypothesis
  * is ~linear scaling. Markers must be UNIQUE, not
  * replica-wide: a shared marker repeated every 3rd token dominates the
  * simhash weighted majority and artificially correlates every replica-N
  * signature (measured: it pushed the banded mitigation from ~linear to
  * exponent 2.55). A super-linear exponent flags candidate explosion no
  * single-scale run can see. Results append to /tmp/scale_results.txt
  * line-by-line (crash-safe). */
object ScaleProbe {
  private val Queries = Seq(
    "q40_minhash_neardups", "q41_simhash_neardups", "q42_ngram_jaccard",
    "q53_corpus_prep", "q63_neardup_clusters", "q70_cluster_survivors",
    "q92_dedup_agreement",
    // ANN family: the vec_id < 8 filter keeps the query COUNT at 8 at
    // every scale (at high replication those are near-identical replicas
    // of the lowest originals — fine for timing); corpus grows scale×
    "q33_cosine_topk", "q48_ivf_topk", "q81_pq_topk", "q83_ivfpq_topk")

  // The span family (q103/q104 shapes) is probed by a DEDICATED block on a
  // planted-boilerplate derivative, not via the generic query list: the
  // marker corpus above has ZERO shared 5-grams by construction (a unique
  // marker lands inside every 5-gram window), so the span queries there
  // time the gram aggregation but leave the anchor join, window merge, and
  // strip tail with EMPTY inputs — and a bare count() of the strip output
  // doesn't even run the pipeline (left-join elimination on the unique-key
  // removal side + the 1-row ungrouped-agg shortcut; measured 0.23 s flat
  // across 4×).
  private val SpanProbe = "span_planted"

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = if (args.length > 1) args(1).toInt else 4
    val only = if (args.length > 2) args(2).split(",").map(_.trim).toSet
               else Queries.toSet + SpanProbe
    val out = s"/tmp/graft_scale$scale"
    val base = "/tmp/graft_scale_base1"
    val log = new java.io.PrintWriter(
      new java.io.FileWriter("/tmp/scale_results.txt", true), true)
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
    // One writer for every scale INCLUDING 1: the baseline must carry the
    // identical marker perturbation (rep = 0 only) or the two timings
    // compare different similarity structures, not different scales.
    def writeDerivative(s: Int, dir: String): Unit = {
      Tables.load(spark, sf, "documents")
        .withColumn("rep", explode(lit((0 until s).toArray)))
        .select(
          (col("doc_id") * s + col("rep")).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            (w, i) => when(i % 3 === 2,
              concat(w, lit(" zq"),
                abs(xxhash64(col("doc_id"), col("rep"), i)).cast("string")))
              .otherwise(w)), " ").as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("int"))
        .write.mode("overwrite").parquet(s"file:$dir/documents.parquet")
      // embeddings derivative: replicas get a small deterministic per-rep
      // shift (distinct vectors, same distribution); vec_id < 8 still
      // selects exactly 8 query vectors at every scale
      Tables.load(spark, sf, "embeddings")
        .withColumn("rep", explode(lit((0 until s).toArray)))
        .select((col("vec_id") * s + col("rep")).as("vec_id"),
          transform(col("embedding"),
            x => x + col("rep").cast("float") * lit(0.001f)).as("embedding"))
        .write.mode("overwrite").parquet(s"file:$dir/embeddings.parquet")
    }
    writeDerivative(scale, out)
    // the base1 derivative is input-deterministic, so reuse it across
    // runs/scales (delete /tmp/graft_scale_base1 manually if the source
    // sf dir changes); regenerating it every run would also race a
    // concurrent probe timing t1 against the same shared path.
    // Completeness = BOTH tables' _SUCCESS (a crash between the two
    // writes must not pass as complete), and the build goes to a temp
    // dir renamed into place so a partial write can never be reused.
    def complete(dir: String): Boolean =
      new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists() &&
        new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()
    if (!complete(base)) {
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete(); ()
      }
      val tmp = new java.io.File(base + ".tmp")
      rmrf(tmp); rmrf(new java.io.File(base))
      writeDerivative(1, tmp.getPath)
      require(tmp.renameTo(new java.io.File(base)),
        s"rename $tmp -> $base failed")
    } else System.err.println(s"[scaleprobe] reusing existing $base")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = {
      System.gc(); time(f); math.min(time(f), time(f))
    }
    Queries.filter(only.contains).foreach { q =>
      def run(dir: String): Unit = SparkEntry.queries(q)(spark, dir).count()
      val t1 = best(run(base))
      val tS = best(run(out))
      val exp = math.log(tS / t1) / math.log(scale.toDouble)
      log.println(f"""{"query":"$q","t1":$t1%.3f,"t$scale":$tS%.3f,"ratio":${tS / t1}%.2f,"exponent":$exp%.2f}""")
    }
    // the documented mitigation for the radius-8 regime, measured at S×:
    // banded 4×16-bit chunks (2^16 bucket keys vs 2^7) at ~77% recall
    if (only.contains("q41_simhash_neardups")) {
      import graft.dedup.Dedup
      def banded(dir: String): Unit =
        Dedup.simhashNearDupsBanded(Tables.load(spark, dir, "documents"),
          "doc_id", "text", maxHamming = 8, nChunks = 4).count()
      val t1 = best(banded(base))
      val tS = best(banded(out))
      val exp = math.log(tS / t1) / math.log(scale.toDouble)
      log.println(f"""{"query":"q41_banded_4x16(mitigation)","t1":$t1%.3f,"t$scale":$tS%.3f,"ratio":${tS / t1}%.2f,"exponent":$exp%.2f}""")
    }
    // Span family on a PLANTED-boilerplate derivative (see SpanProbe note
    // at the top): same unique-marker body as the main derivative — no
    // accidental cross-doc gram sharing, for the same reason the main
    // derivative uses markers — plus a fixed 40-token passage appended to
    // every 5th doc and a 25-token one to every 7th. Shared-span STRUCTURE
    // is scale-invariant (a constant fraction of docs carries each
    // passage; per-doc cov is bounded by the passage lengths) while the
    // corpus, anchor count, and flagged-doc count all grow S× — the null
    // hypothesis is ~linear. The strip timing forces the full pipeline
    // through a 1-row checksum COLLECTED (not counted) so nothing is
    // eliminated.
    if (only.contains(SpanProbe)) {
      import graft.dedup.Dedup
      val boiler1 = (1 to 40).map(i => s"bp$i").mkString(" ")
      val boiler2 = (1 to 25).map(i => s"lic$i").mkString(" ")
      def writeSpanDerivative(s: Int, dir: String): Unit =
        Tables.load(spark, sf, "documents")
          .withColumn("rep", explode(lit((0 until s).toArray)))
          .withColumn("nid", col("doc_id") * s + col("rep"))
          .select(col("nid").as("doc_id"),
            concat(
              array_join(transform(split(col("text"), " "),
                (w, i) => when(i % 3 === 2,
                  concat(w, lit(" zq"),
                    abs(xxhash64(col("doc_id"), col("rep"), i)).cast("string")))
                  .otherwise(w)), " "),
              when(pmod(col("nid"), lit(5L)) === 0, lit(" " + boiler1))
                .otherwise(lit("")),
              when(pmod(col("nid"), lit(7L)) === 0, lit(" " + boiler2))
                .otherwise(lit(""))).as("text"))
          .write.mode("overwrite").parquet(s"file:$dir/documents.parquet")
      val spanBase = "/tmp/graft_span_base1"
      val spanOut = s"/tmp/graft_span_scale$scale"
      if (!new java.io.File(s"$spanBase/documents.parquet/_SUCCESS").exists())
        writeSpanDerivative(1, spanBase)
      else System.err.println(s"[scaleprobe] reusing existing $spanBase")
      writeSpanDerivative(scale, spanOut)
      def docs(dir: String): DataFrame =
        spark.read.parquet(s"file:$dir/documents.parquet")
      def spans(dir: String): Unit = {
        Dedup.crossDocSpans(docs(dir), "doc_id", "text",
          k = 5, minDocs = 2).count(); ()
      }
      def strip(dir: String): Unit = {
        Dedup.stripCrossDocSpans(docs(dir), "doc_id", "text",
            k = 5, minDocs = 2)
          .select(sum(length(col("clean_text"))), sum(col("n_removed")))
          .collect(); ()
      }
      Seq("q103_spans(planted)" -> (spans _),
          "q104_strip(planted)" -> (strip _)).foreach { case (nm, f) =>
        val t1 = best(f(spanBase))
        val tS = best(f(spanOut))
        val exp = math.log(tS / t1) / math.log(scale.toDouble)
        log.println(f"""{"query":"$nm","t1":$t1%.3f,"t$scale":$tS%.3f,"ratio":${tS / t1}%.2f,"exponent":$exp%.2f}""")
      }
    }
    log.close()
    spark.stop()
  }
}
