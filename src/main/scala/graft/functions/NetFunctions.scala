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
      InetAton.parse(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = NetFunctions.getClass.getName.stripSuffix("$") + "$InetAton"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |java.lang.Long _r = $cls.parse($c.toString());
           |if (_r == null) { ${ev.isNull} = true; } else { ${ev.value} = _r.longValue(); }
         """.stripMargin
      })
    }
  }

  object InetAton {
    /** Shared by interpreted eval and generated code. */
    def parse(s: String): java.lang.Long = {
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
      else UTF8String.fromString(InetNtoa.render(v))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = NetFunctions.getClass.getName.stripSuffix("$") + "$InetNtoa"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |if ($c < 0L || $c > 4294967295L) { ${ev.isNull} = true; }
           |else { ${ev.value} = UTF8String.fromString($cls.render($c)); }
         """.stripMargin
      })
    }
  }

  object InetNtoa {
    def render(v: Long): String =
      s"${(v >> 24) & 0xFF}.${(v >> 16) & 0xFF}.${(v >> 8) & 0xFF}.${v & 0xFF}"
  }
}
