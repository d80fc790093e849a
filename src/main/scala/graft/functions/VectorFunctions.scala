package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector math for the embedding operators (ANN search, cosine
  * near-dup). Spark's array higher-order functions (`aggregate`,
  * `zip_with`, `transform`) are CodegenFallback — interpreted, one
  * closure dispatch per element — which made per-pair dot products the
  * hot path of every similarity operator (the same trap the shingle
  * and IVF pipelines hit; see `llm/Dedup.scala` scaladoc). `VecDot`
  * is the fix at the right layer: a scalar Catalyst expression whose
  * generated code is one static call into a tight primitive loop, so
  * a million-pair verify stage stays inside whole-stage codegen.
  *
  * Determinism contract: the loop accumulates `acc += a(i) * b(i)` in
  * element order — bit-identical to the sequential
  * `aggregate(zip_with(...))` fold it replaces AND to DuckDB's
  * `list_cosine_similarity` inner loop, which the correctness oracle
  * compares against (ref for the operator surface:
  * `utils/funcexp/` scalar function framework).
  */
object VectorFunctions {

  /** Dot product of two array<double> columns, in element order.
    * NULL if either array is NULL, lengths differ, or any element is
    * NULL (the same results the zip_with/aggregate fold produced). */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_dot"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override def nullSafeEval(a: Any, b: Any): Any =
      VecDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // NOTE: the kernel must be a TOP-LEVEL object — Scala emits the
      // static forwarders generated Java code can call only on
      // top-level mirror classes; a nested object's method is
      // invisible to Janino and the whole stage silently falls back
      // to the interpreter (the exact regression this expression
      // exists to fix).
      val cls = "graft.functions.VecDotKernel"
      val d = ctx.freshName("vecDot")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double $d = $cls.dot($a, $b);
           |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d.doubleValue(); }
         """.stripMargin
      })
    }
  }
}

/** Top-level (static-forwarder-visible) kernel shared by VecDot's
  * interpreted eval and generated code. Sequential accumulation order
  * is part of the contract — do not reorder (no pairwise/Kahan
  * summation) or oracle bit-equality breaks. */
object VecDotKernel {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
