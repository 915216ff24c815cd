package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the operator-kernel expressions:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   — or —
  *   spark.conf: spark.sql.extensions=graft.functions.GraftExtensions
  *   — or, on an ALREADY-BUILT session —
  *   GraftExtensions.registerAll(spark)
  *
  * Registers: simhash64(tokens[, md5Based]), minhash_sig(hashes, k),
  * shingle_hashes(tokens, n[, md5Gram]), sorted_intersect_size(a, b),
  * winnow_fingerprints(tokens, n, w[, md5Gram]), dot_exact(a, b),
  * lsh_sig(vec, bits, dim), l2_normalize(vec),
  * deletion_neighborhood(s, maxDeletes), nfc_normalize(s),
  * strip_accents(s), hdr_bin(v, subBits), hdr_low(bin, subBits),
  * url_normalize(u), url_host(u), fingerprint(text),
  * rolling_hash(text), token_count(text), stopword_ratio(text),
  * punct_ratio(text), mean_word_length(text), quality_score(text),
  * lang_id(text), and nb_classify(tokens, model) where
  * `model` is the [[NbModel]] compact literal — so SQL-only users get
  * the same codepaths as the Scala API (q222 is the gated proof: a
  * curation query written entirely in SQL over these functions,
  * hash-matching q41's oracle). The ANN kernels ride the same
  * model-literal discipline: ivf_assign(vec, model) and
  * ivf_probes(vec, model, nprobe) take the [[IvfModel]] compact
  * centroid literal — a parsed literal satisfies the row-constant
  * contract the kernels require by construction (q229 gates the whole
  * SQL IVF search against q48's oracle). The Bloom kernel stays
  * unregistered: its sketch is a runtime binary relation, not a
  * carryable literal. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def strArg(e: Expression, fn: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string argument, got $other")
  }

  /** Wrap a Column→Column library function as an expression builder.
    * EAGER conversion is required: the lazy bridge survives to codegen
    * inside a SQL function tree (see ColumnBridge.eagerExpression). */
  private def viaColumn(f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column)(e: Expression): Expression =
    ColumnBridge.eagerExpression(f(ColumnBridge.column(e)))

  /** The single registration list both surfaces share. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash64Expr(t)
        case Seq(t, Literal(md5: Boolean, _)) => SimHash64Expr(t, md5)
        case other => throw new IllegalArgumentException(
          s"simhash64(tokens[, md5Based]) got ${other.size} args")
      }),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "minhash_sig"))),
    (new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n) => ShingleHashExpr(t, intArg(n, "shingle_hashes"))
        case Seq(t, n, Literal(md5: Boolean, _)) =>
          ShingleHashExpr(t, intArg(n, "shingle_hashes"), md5)
        case other => throw new IllegalArgumentException(
          s"shingle_hashes(tokens, n[, md5Gram]) got ${other.size} args")
      }),
    (new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName,
        "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSizeExpr(args.head, args(1))),
    (new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n, w) => WinnowExpr(t,
          intArg(n, "winnow_fingerprints"), intArg(w, "winnow_fingerprints"))
        case Seq(t, n, w, Literal(md5: Boolean, _)) => WinnowExpr(t,
          intArg(n, "winnow_fingerprints"), intArg(w, "winnow_fingerprints"),
          md5)
        case other => throw new IllegalArgumentException(
          s"winnow_fingerprints(tokens, n, w[, md5Gram]) got ${other.size} args")
      }),
    (new FunctionIdentifier("dot_exact"),
      new ExpressionInfo(classOf[DotExactExpr].getName, "dot_exact"),
      (args: Seq[Expression]) => DotExactExpr(args.head, args(1))),
    (new FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[LshSigExpr].getName, "lsh_sig"),
      (args: Seq[Expression]) => LshSigExpr(args.head,
        intArg(args(1), "lsh_sig"), intArg(args(2), "lsh_sig"))),
    (new FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2NormalizeExpr].getName, "l2_normalize"),
      (args: Seq[Expression]) => L2NormalizeExpr(args.head)),
    (new FunctionIdentifier("deletion_neighborhood"),
      new ExpressionInfo(classOf[DeletionNeighborhoodExpr].getName,
        "deletion_neighborhood"),
      (args: Seq[Expression]) => DeletionNeighborhoodExpr(args.head,
        intArg(args(1), "deletion_neighborhood"))),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args.head)),
    (new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      (args: Seq[Expression]) => StripAccentsExpr(args.head)),
    (new FunctionIdentifier("nb_classify"),
      new ExpressionInfo(classOf[NbClassifyExpr].getName, "nb_classify"),
      (args: Seq[Expression]) => {
        val (labels, counts, toks, docs, buckets) =
          NbModel.parse(strArg(args(1), "nb_classify"))
        NbClassifyExpr(args.head, labels, counts, toks, docs, buckets)
      }),
    (new FunctionIdentifier("unigram_segment"),
      new ExpressionInfo(classOf[UnigramSegmentExpr].getName,
        "unigram_segment"),
      (args: Seq[Expression]) => {
        val (pieces, costs, unk, maxLen) =
          UnigramModel.parse(strArg(args(1), "unigram_segment"))
        UnigramSegmentExpr(args.head, pieces, costs, unk, maxLen)
      }),
    (new FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[IvfAssignExpr].getName, "ivf_assign"),
      (args: Seq[Expression]) => IvfAssignExpr(args.head,
        IvfModel.literal(strArg(args(1), "ivf_assign")))),
    (new FunctionIdentifier("ivf_probes"),
      new ExpressionInfo(classOf[IvfProbesExpr].getName, "ivf_probes"),
      (args: Seq[Expression]) => IvfProbesExpr(args.head,
        IvfModel.literal(strArg(args(1), "ivf_probes")),
        intArg(args(2), "ivf_probes"))),
    (new FunctionIdentifier("hdr_bin"),
      new ExpressionInfo(graft.analyze.Hdr.getClass.getName, "hdr_bin"),
      (args: Seq[Expression]) => viaColumn(
        graft.analyze.Hdr.hdrBin(_, intArg(args(1), "hdr_bin")))(args.head)),
    (new FunctionIdentifier("hdr_low"),
      new ExpressionInfo(graft.analyze.Hdr.getClass.getName, "hdr_low"),
      (args: Seq[Expression]) => viaColumn(
        graft.analyze.Hdr.hdrLow(_, intArg(args(1), "hdr_low")))(args.head)),
    (new FunctionIdentifier("url_normalize"),
      new ExpressionInfo(UrlFunctions.getClass.getName, "url_normalize"),
      (args: Seq[Expression]) => viaColumn(UrlFunctions.urlNormalize)(args.head)),
    (new FunctionIdentifier("url_host"),
      new ExpressionInfo(UrlFunctions.getClass.getName, "url_host"),
      (args: Seq[Expression]) => viaColumn(UrlFunctions.urlHost)(args.head)),
    (new FunctionIdentifier("fingerprint"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "fingerprint"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.fingerprint)(args.head)),
    (new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "rolling_hash"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.rollingHash)(args.head)),
    (new FunctionIdentifier("token_count"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "token_count"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.tokenCount)(args.head)),
    (new FunctionIdentifier("stopword_ratio"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "stopword_ratio"),
      (args: Seq[Expression]) =>
        viaColumn(c => graft.analyze.TextAnalysis.stopwordRatio(c))(args.head)),
    (new FunctionIdentifier("punct_ratio"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "punct_ratio"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.punctRatio)(args.head)),
    (new FunctionIdentifier("mean_word_length"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "mean_word_length"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.meanWordLength)(args.head)),
    (new FunctionIdentifier("quality_score"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "quality_score"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.qualityScore)(args.head)),
    (new FunctionIdentifier("lang_id"),
      new ExpressionInfo(graft.analyze.TextAnalysis.getClass.getName,
        "lang_id"),
      (args: Seq[Expression]) =>
        viaColumn(graft.analyze.TextAnalysis.langIdHeuristic)(args.head)))

  /** Runtime registration on a live session — for sessions the caller
    * did not build (notebooks, the driver's Verify session). Idempotent:
    * re-registering replaces the same entries. */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      ColumnBridge.registerFunction(spark, name, info, builder)
    }
}
