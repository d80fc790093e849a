package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native kernels for the multimodal payload operators. The first
  * aHash implementation was a nested array-HOF pipeline
  * (hex → 256-way conv → 64 slice/aggregate folds) — interpreted,
  * ~4 s for 2 000 payloads at sf0.1 and the two slowest queries in
  * the whole bench. Same lesson as SimHash64/VecDot: one scalar
  * Catalyst expression whose generated code is a static call into a
  * tight primitive loop keeps the per-payload cost at O(n) bytes
  * inside whole-stage codegen. Semantics are bit-identical to the
  * HOF pipeline and to the DuckDB oracle replay (all-integer stripe
  * means + 64·cell > Σcells bit rule).
  */
object MediaFunctions {

  /** aHash-style 64-bit perceptual fingerprint of a binary payload:
    * 64 stripe floor-means vs the global cell sum — bit i set iff
    * 64·cell_i > Σcells. NULL for payloads under 64 bytes (no full
    * stripe coverage) — callers filter on length first. Robust to
    * per-byte re-encode noise, not to truncation; a DCT pHash slots
    * into the same contract in production. */
  case class AHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "ahash64"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any =
      MediaKernels.ahash(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.freshName("ahash")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |java.lang.Long $h = graft.functions.MediaKernels.ahash($c);
           |if ($h == null) { ${ev.isNull} = true; } else { ${ev.value} = $h.longValue(); }
         """.stripMargin
      })
    }
  }

  /** Deterministic re-encode stand-in: every 50th byte perturbed by
    * +3 mod 256 — the "same media, different encoder settings" noise
    * profile the perceptual hash is designed to see through. */
  case class ReencodeNoise(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "reencode_noise"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any =
      MediaKernels.reencodeNoise(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.MediaKernels.reencodeNoise($c);")
  }
}

/** Top-level (static-forwarder-visible) kernels — see VecDotKernel's
  * note: nested objects are invisible to Janino and silently drop the
  * whole stage to the interpreter. */
object MediaKernels {
  /** Bit-identical to the retired HOF pipeline AND the DuckDB oracle:
    * stripe bounds ⌊i·n/64⌋, floor-mean cells, 64·cell > Σcells. */
  def ahash(b: Array[Byte]): java.lang.Long = {
    val n = b.length
    if (n < 64) return null
    val cells = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val lo = (i.toLong * n / 64).toInt
      val hi = ((i + 1).toLong * n / 64).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (b(j) & 0xFF); j += 1 }
      cells(i) = s / (hi - lo)
      i += 1
    }
    var tot = 0L
    i = 0
    while (i < 64) { tot += cells(i); i += 1 }
    var h = 0L
    i = 0
    while (i < 64) { if (cells(i) * 64 > tot) h |= 1L << i; i += 1 }
    h
  }

  def reencodeNoise(b: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(b, b.length)
    var i = 0
    while (i < out.length) {
      out(i) = (((out(i) & 0xFF) + 3) % 256).toByte
      i += 50
    }
    out
  }
}
