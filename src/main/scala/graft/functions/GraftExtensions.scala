package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native expressions (SparkSessionExtensions):
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   — or —
  *   spark.conf: spark.sql.extensions=graft.functions.GraftExtensions
  *
  * Registers: simhash64(tokens[, md5Based]), minhash_sig(hashes, k),
  * shingle_hashes(tokens, n), sorted_intersect_size(a, b),
  * dot_exact(a, b), lsh_sig(vec, bits, dim), l2_normalize(vec) — so
  * SQL-only users get the same codepaths as the Scala API. The IVF and
  * Bloom kernels are deliberately NOT registered: their second child
  * must be row-constant (a broadcast relation column), a contract SQL
  * cannot enforce. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash64Expr(t)
        case Seq(t, Literal(md5: Boolean, _)) => SimHash64Expr(t, md5)
        case other => throw new IllegalArgumentException(
          s"simhash64(tokens[, md5Based]) got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "minhash_sig"))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashExpr(args.head, intArg(args(1), "shingle_hashes"))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSizeExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => WinnowExpr(args.head,
        intArg(args(1), "winnow_fingerprints"), intArg(args(2), "winnow_fingerprints"))))
    ext.injectFunction((
      new FunctionIdentifier("dot_exact"),
      new ExpressionInfo(classOf[DotExactExpr].getName, "dot_exact"),
      (args: Seq[Expression]) => DotExactExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[LshSigExpr].getName, "lsh_sig"),
      (args: Seq[Expression]) => LshSigExpr(args.head,
        intArg(args(1), "lsh_sig"), intArg(args(2), "lsh_sig"))))
    ext.injectFunction((
      new FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2NormalizeExpr].getName, "l2_normalize"),
      (args: Seq[Expression]) => L2NormalizeExpr(args.head)))
  }
}
