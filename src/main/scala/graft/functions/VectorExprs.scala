package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expressions for the vector-similarity hot path (SURVEY §2.4).
  *
  * The exact-decimal dot product is also expressible as a zip_with +
  * aggregate fold over decimal casts (see Similarity.dotExact's history),
  * but HOF lambdas evaluate one expression tree per element — at 64 dims
  * × millions of candidate pairs the Decimal boxing dominates. These run
  * the loop imperatively while preserving BIT-FOR-BIT the fold's
  * semantics (and therefore DuckDB-oracle parity):
  *
  *   per-element product in double → round to 12 dp exactly like Spark's
  *   double→decimal cast (shortest-repr BigDecimal, HALF_UP) → exact sum
  *   → double. The sum is order-independent, so plans may reorder rows
  *   freely.
  */
private object ExactDecimal {
  /** Unscaled 12-dp value of `d`, identical to CAST(d AS DECIMAL(_,12)).
    * Spark's cast goes through BigDecimal.decimal(d) = valueOf(d)
    * (shortest decimal representation), then HALF_UP at scale 12. */
  def unscaled12(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def elem(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def checkArrayNumeric(t: DataType, what: String): TypeCheckResult = t match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what expects array<float|double>, got $other")
  }
}

/** Exact-decimal dot product of two numeric arrays → double.
  * Null result when lengths differ or any touched element is null —
  * matching the zip_with/aggregate fold (null poisons the sum). */
case class DotExactExpr(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegen {
  import ExactDecimal._
  override protected def resultJava: String = "java.lang.Double"
  override protected def resultNullable: Boolean = true
  override protected def unbox(boxed: String): String = s"$boxed.doubleValue()"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArrayNumeric(left.dataType, "dot_exact")
    if (l.isFailure) l else checkArrayNumeric(right.dataType, "dot_exact")
  }
  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L // unscaled at 12 dp; exact-overflow fallback below
    var i = 0
    try {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        sum = Math.addExact(sum,
          unscaled12(elem(x, leftFloat, i) * elem(y, rightFloat, i)))
        i += 1
      }
      java.math.BigDecimal.valueOf(sum, 12).doubleValue()
    } catch {
      case _: ArithmeticException => // unscaled overflow: exact big-int path
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < n) {
          if (x.isNullAt(j) || y.isNullAt(j)) return null
          acc = acc.add(java.math.BigDecimal
            .valueOf(elem(x, leftFloat, j) * elem(y, rightFloat, j))
            .setScale(12, java.math.RoundingMode.HALF_UP))
          j += 1
        }
        acc.doubleValue()
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExactExpr =
    copy(left = l, right = r)
}

/** Deterministic md5-derived hyperplane weights, reproducible in SQL
  * engines: w(b,d) = ((first 8 md5 hex chars of "b_d" as an integer) mod
  * 2000001) / 1e6 − 1 ∈ [−1, 1]. */
object LshWeights {
  def hyperplane(bit: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      md.reset()
      val hx = md.digest(s"${bit}_${d}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hx, 16) % 2000001L).toDouble / 1000000.0 - 1.0
    }
  }
  def planes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits)(b => hyperplane(b, dim))
}

/** Random-hyperplane LSH signature: bit b of the result is set iff the
  * exact-decimal projection of the vector onto LshWeights.hyperplane(b)
  * is >= 0. One imperative pass per row; bit-identical to `bits`
  * DotExactExpr sign tests (and the SQL oracle's per-bit decimal sums).
  *
  * The weights are DERIVED from (bits, dim) inside the expression rather
  * than stored as tree data: embedding 2048 doubles in a case-class field
  * makes every Catalyst tree comparison / hash / plan-string walk them,
  * which measurably drags whole-query planning (observed: multi-second
  * per-run overhead growing with plan reuse). */
case class LshSigExpr(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  import ExactDecimal._
  override protected def resultJava: String = "java.lang.Long"
  override protected def unbox(boxed: String): String = s"$boxed.longValue()"
  require(bits >= 1 && bits <= 64)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayNumeric(child.dataType, "lsh_sig")
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val w: Array[Array[Double]] = LshWeights.planes(bits, dim)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < w.length) {
      val wb = w(b)
      // null element / length mismatch → null projection → bit unset
      // (matches when(proj >= 0, ...).otherwise(0) on a null proj)
      if (x.numElements() == wb.length) {
        var sum = 0L
        var i = 0
        var ok = true
        var overflow = false
        while (ok && !overflow && i < wb.length) {
          if (x.isNullAt(i)) ok = false
          else {
            try sum = Math.addExact(sum, unscaled12(elem(x, isFloat, i) * wb(i)))
            catch { case _: ArithmeticException => overflow = true }
            i += 1
          }
        }
        if (ok && overflow) { // exact big-decimal fallback for this bit
          var acc = java.math.BigDecimal.ZERO
          var j = 0
          while (ok && j < wb.length) {
            if (x.isNullAt(j)) ok = false
            else {
              acc = acc.add(java.math.BigDecimal
                .valueOf(elem(x, isFloat, j) * wb(j))
                .setScale(12, java.math.RoundingMode.HALF_UP))
              j += 1
            }
          }
          if (ok && acc.signum() >= 0) sig |= (1L << b)
        } else if (ok && sum >= 0L) sig |= (1L << b)
      }
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): LshSigExpr =
    copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge
  def dotExact(a: Column, b: Column): Column =
    ColumnBridge.column(DotExactExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def lshSig(vec: Column, bits: Int, dim: Int): Column =
    ColumnBridge.column(LshSigExpr(ColumnBridge.expression(vec), bits, dim))
}
