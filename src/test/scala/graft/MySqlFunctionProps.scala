package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the driver-side-computable pieces of the
  * MySQL-compat layer — the role of the reference's
  * `tests/mcs_decimal-tests.cpp` / dataconvert gtests: pure-function
  * invariants checked over generated inputs (no SparkSession).
  */
object MySqlFunctionProps extends Properties("MySqlFunctions") {
  import graft.functions.MySqlFunctions.translateDatePattern

  // ---- period arithmetic model (mirrors the Column implementation) ----
  private def periodToMonths(p: Long): Long = (p / 100) * 12 + (p % 100) - 1
  private def monthsToPeriod(m: Long): Long = (m / 12) * 100 + (m % 12) + 1

  private val genPeriod: Gen[Long] = for {
    y <- Gen.choose(1000, 9998); m <- Gen.choose(1, 12)
  } yield y * 100L + m

  property("period: months<->period roundtrip") = forAll(genPeriod) { p =>
    monthsToPeriod(periodToMonths(p)) == p
  }

  property("period: add n then diff gives n") =
    forAll(genPeriod, Gen.choose(-500, 500)) { (p, n) =>
      val added = monthsToPeriod(periodToMonths(p) + n)
      (periodToMonths(added) - periodToMonths(p)) == n.toLong
    }

  property("period: add is associative over months") =
    forAll(genPeriod, Gen.choose(0, 100), Gen.choose(0, 100)) { (p, a, b) =>
      monthsToPeriod(periodToMonths(monthsToPeriod(periodToMonths(p) + a)) + b) ==
        monthsToPeriod(periodToMonths(p) + a + b)
    }

  // ---- date pattern translator ----
  private val specifiers = Seq(
    "%Y", "%y", "%m", "%c", "%d", "%e", "%H", "%k", "%h", "%I", "%l",
    "%i", "%s", "%S", "%f", "%p", "%M", "%b", "%a", "%W", "%j", "%T", "%r", "%%")
  private val genPattern: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.oneOf(specifiers),
      Gen.oneOf("-", "/", ":", " ", ".", ",").map(identity[String])
    )).map(_.mkString)

  property("translator: total on supported specifiers") = forAll(genPattern) { p =>
    translateDatePattern(p); true
  }

  property("translator: deterministic") = forAll(genPattern) { p =>
    translateDatePattern(p) == translateDatePattern(p)
  }

  property("translator: literal letters are always quoted") =
    forAll(Gen.choose(1, 19).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))) { s =>
      translateDatePattern(s) == s"'$s'"
    }

  // ---- sec_to_time model ----
  private def secToTimeModel(s: Long): String = {
    val sign = if (s < 0) "-" else ""
    val a = math.abs(s)
    f"$sign${a / 3600}%02d:${(a % 3600) / 60}%02d:${a % 60}%02d"
  }

  property("sec_to_time: parseable back to seconds") =
    forAll(Gen.choose(-200000L, 200000L)) { s =>
      val t = secToTimeModel(s)
      val neg = t.startsWith("-")
      val parts = (if (neg) t.drop(1) else t).split(":").map(_.toLong)
      val back = (parts(0) * 3600 + parts(1) * 60 + parts(2)) * (if (neg) -1 else 1)
      back == s
    }

  // ---- JSON path parser ----
  import graft.functions.JsonFunctions.parsePath

  private val genKey: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  private val genLeg: Gen[Either[String, Int]] = Gen.oneOf(
    genKey.map(Left(_)), Gen.choose(0, 999).map(Right(_)))
  private val genLegs: Gen[List[Either[String, Int]]] = Gen.listOf(genLeg)

  property("json path: render->parse roundtrip") = forAll(genLegs) { legs =>
    val rendered = "$" + legs.map {
      case Left(k) => s".$k"
      case Right(i) => s"[$i]"
    }.mkString
    parsePath(rendered) == Some(legs)
  }

  property("json path: rejects non-$ prefix") = forAll(genKey) { k =>
    parsePath(k).isEmpty || k.startsWith("$")
  }
}
