package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** doGenCode mixins for the native expressions.
  *
  * CodegenFallback keeps a stage inside whole-stage codegen, but its
  * generated stub materializes `INPUT_ROW` and re-evaluates the child
  * expression tree interpreted per call. These mixins instead let the
  * children evaluate in generated code and invoke only the imperative
  * kernel (`nullSafeEval`, bridged publicly as `kernelEval` for Janino)
  * through a bound reference — no row construction, no interpreted child
  * eval, null handling inherited from nullSafeCodeGen.
  *
  * `resultJava` is the Java type the kernel returns boxed;
  * `resultNullable` adds a null check for kernels that can return null
  * (e.g. DotExactExpr on length-mismatched arrays).
  */
trait UnaryKernelCodegen extends UnaryExpression {
  protected def resultJava: String
  protected def resultNullable: Boolean = false
  protected def unbox(boxed: String): String = boxed

  /** Public bridge so generated Java can reach the protected kernel. */
  final def kernelEval(v: Any): Any = nullSafeEval(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[UnaryKernelCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("kres")
      val assign = s"${ev.value} = ${unbox(s"(($resultJava) $tmp)")};"
      if (resultNullable)
        s"""Object $tmp = $ref.kernelEval($c);
           |if ($tmp == null) { ${ev.isNull} = true; } else { $assign }
           |""".stripMargin
      else
        s"""Object $tmp = $ref.kernelEval($c);
           |$assign
           |""".stripMargin
    })
  }
}

trait BinaryKernelCodegen extends BinaryExpression {
  protected def resultJava: String
  protected def resultNullable: Boolean = false
  protected def unbox(boxed: String): String = boxed

  /** Public bridge so generated Java can reach the protected kernel. */
  final def kernelEval(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[BinaryKernelCodegen].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("kres")
      val assign = s"${ev.value} = ${unbox(s"(($resultJava) $tmp)")};"
      if (resultNullable)
        s"""Object $tmp = $ref.kernelEval($a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; } else { $assign }
           |""".stripMargin
      else
        s"""Object $tmp = $ref.kernelEval($a, $b);
           |$assign
           |""".stripMargin
    })
  }
}
