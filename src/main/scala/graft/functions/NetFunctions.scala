package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** INET_ATON / INET_NTOA (ref `utils/funcexp/func_inet_aton.cpp`,
  * `func_inet_ntoa.cpp`) as NATIVE codegen expressions — unlike the
  * JSON family (cold-path document surgery under CodegenFallback),
  * address conversion is a scan-hot scalar, so these implement
  * `doGenCode` and fuse into whole-stage codegen like a built-in.
  *
  * The kernels live in the TOP-LEVEL `NetKernels` object: generated
  * Java reaches Scala methods only through the static forwarders of
  * top-level mirror classes — a nested object's method is invisible
  * to Janino and the stage silently falls back to the interpreter
  * (found the hard way; see the codegen-fallback spec in
  * FunctionsSpec).
  */
object NetFunctions {

  /** Dotted-quad string → long; NULL on malformed input (MySQL
    * semantics, incl. short forms like 'a.b' = a<<24 | b). */
  case class InetAton(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "inet_aton"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any =
      NetKernels.inetAton(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("aton")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |java.lang.Long $r = graft.functions.NetKernels.inetAton($c.toString());
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         """.stripMargin
      })
    }
  }

  /** Long → dotted-quad string; NULL for out-of-range input. */
  case class InetNtoa(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "inet_ntoa"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[Long]
      if (v < 0 || v > 0xFFFFFFFFL) null
      else UTF8String.fromString(NetKernels.inetNtoa(v))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |if ($c < 0L || $c > 4294967295L) { ${ev.isNull} = true; }
           |else { ${ev.value} = UTF8String.fromString(graft.functions.NetKernels.inetNtoa($c)); }
         """.stripMargin
      })
  }
}

/** Top-level (static-forwarder-visible) kernels shared by the
  * expressions' interpreted eval and generated code. */
object NetKernels {
  def inetAton(s: String): java.lang.Long = {
    val parts = s.split("\\.", -1)
    if (parts.isEmpty || parts.length > 4) return null
    var acc = 0L
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      val v = p.toInt
      if (v > 255) return null
      // MySQL: last part fills the remaining low bytes
      val shift = if (i == parts.length - 1) 0 else (3 - i) * 8
      acc |= v.toLong << shift
      i += 1
    }
    acc
  }

  def inetNtoa(v: Long): String =
    s"${(v >> 24) & 0xFF}.${(v >> 16) & 0xFF}.${(v >> 8) & 0xFF}.${v & 0xFF}"
}
