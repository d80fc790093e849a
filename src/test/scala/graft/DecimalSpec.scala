package graft

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** DECIMAL(38) / int128-ceiling edge semantics (ref
  * `datatypes/mcs_decimal.h:214-270` DecomposedDecimal rounding +
  * scale divisors; `datatypes/mcs_datatype_basic.h:53-86` unsigned
  * widening). The reference stores wide decimals as int128 with
  * explicit scale; Spark stores Decimal(38,s) the same way
  * (UnsafeRow 16-byte representation). These properties pin the
  * engine's scale-propagation and rounding behavior against an
  * independent java.math.BigDecimal model over ScalaCheck-generated
  * inputs (deterministic seed), evaluated in ONE Spark job per
  * property — not one per sample.
  */
class DecimalSpec extends SparkSpec {

  /** Deterministic sample list from a Gen (the scalatest-scalacheck
    * bridge isn't on the classpath; a fixed seed keeps CI stable). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Seed(42L), List.empty[A])) { case (seed, acc) =>
      g.apply(params, seed) match {
        case Some(a) => (seed.next, a :: acc)
        case None => (seed.next, acc)
      }
    }.dropWhile(_._2.size < n).next()._2.take(n)
  }

  /** Random decimal with up to `digits` significant digits at `scale`. */
  private def genDec(digits: Int, scale: Int): Gen[JBigDecimal] = for {
    nDigits <- Gen.choose(1, digits)
    s <- Gen.listOfN(nDigits, Gen.numChar).map(_.mkString)
    neg <- Gen.oneOf(true, false)
  } yield new JBigDecimal(new java.math.BigInteger(if (neg) "-" + s else s), scale)

  test("division at p=38: result type DECIMAL(38,6+) and HALF_UP value model") {
    // DECIMAL(38,10) / DECIMAL(38,2): Spark's allowPrecisionLoss rule
    // gives intDigits = (38-10) + 2 = 30, scale = max(38-30, 6) = 8
    val pairs = samples(for {
      a <- genDec(38, 10)
      b <- genDec(20, 2) if b.signum != 0
    } yield (a, b), 200)
    val schema = StructType(Seq(
      StructField("a", DecimalType(38, 10)), StructField("b", DecimalType(38, 2))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) => Row(a, b) }, 4), schema)
    val out = df.select(col("a"), col("b"), (col("a") / col("b")).as("q"))
    val qt = out.schema("q").dataType.asInstanceOf[DecimalType]
    assert(qt == DecimalType(38, 8), s"div result type was $qt")
    out.collect().foreach { r =>
      val (a, b, q) = (r.getDecimal(0), r.getDecimal(1), r.getDecimal(2))
      val expect = a.divide(b, new MathContext(38)).setScale(8, RoundingMode.HALF_UP)
      // overflow of the 38-digit ceiling surfaces as null (checked in
      // the overflow property below); here divisors ≥ 0.01 keep q small
      assert(q != null && q.compareTo(expect) == 0, s"$a / $b = $q, expected $expect")
    }
  }

  test("avg at p=38: scale widens by 4 and matches sum/count HALF_UP") {
    val vals = samples(genDec(36, 10), 300)
    val schema = StructType(Seq(StructField("v", DecimalType(38, 10))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 8), schema)
    val out = df.agg(avg(col("v")).as("a"))
    val at = out.schema("a").dataType.asInstanceOf[DecimalType]
    assert(at == DecimalType(38, 14), s"avg result type was $at")
    val got = out.collect()(0).getDecimal(0)
    val sum = vals.reduce(_.add(_))
    val expect = sum.divide(new JBigDecimal(vals.size), 14, RoundingMode.HALF_UP)
    assert(got.compareTo(expect) == 0, s"avg was $got, expected $expect")
  }

  test("multiplication at the ceiling: type caps at 38 and overflow is an ANSI error") {
    // DECIMAL(38,10) * DECIMAL(38,10) → ideal (77, 20) → capped (38, 6)
    val schema = StructType(Seq(
      StructField("a", DecimalType(38, 10)), StructField("b", DecimalType(38, 10))))
    def df(rows: Seq[(JBigDecimal, JBigDecimal)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }, 2), schema)
    val small = samples(for {
      a <- genDec(18, 10); b <- genDec(18, 10)
    } yield (a, b), 200)
    val out = df(small).select(col("a"), col("b"), (col("a") * col("b")).as("m"))
    val mt = out.schema("m").dataType.asInstanceOf[DecimalType]
    assert(mt == DecimalType(38, 6), s"mul result type was $mt")
    out.collect().foreach { r =>
      val (a, b, m) = (r.getDecimal(0), r.getDecimal(1), r.getDecimal(2))
      val expect = a.multiply(b).setScale(6, RoundingMode.HALF_UP)
      assert(m.compareTo(expect) == 0, s"$a * $b = $m, expected $expect")
    }
    // two near-ceiling operands cannot round into 38 digits: ANSI error
    // (the reference likewise errors via IDB-class overflow checks
    // rather than saturating; mcs_decimal.h int128 ceiling)
    val big = new JBigDecimal(new java.math.BigInteger("9" * 38), 10)
    val err = intercept[Exception] {
      df(Seq((big, big))).select((col("a") * col("b")).as("m")).collect()
    }
    val msg = (err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("numeric_value_out_of_range") || msg.contains("overflow"),
      s"expected an out-of-range error, got: $msg")
  }

  test("UBIGINT widening: DECIMAL(20,0) round-trips the full uint64 range") {
    import graft.sources.TypeMapper
    assert(TypeMapper.toSparkType("BIGINT UNSIGNED") == DecimalType(20, 0))
    val boundaries = Seq(
      "0", "1", "9223372036854775806", "9223372036854775807", // int64 max
      "9223372036854775808", // int64 max + 1 (sign-bit flip in a naive cast)
      "18446744073709551614", "18446744073709551615" // uint64 max
    ).map(new JBigDecimal(_))
    val schema = StructType(Seq(StructField("u", DecimalType(20, 0))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(boundaries.map(Row(_)), 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_ubig").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("u").dataType == DecimalType(20, 0))
    val got = back.orderBy(col("u")).collect().map(_.getDecimal(0))
    assert(got.map(_.toPlainString).toSeq == boundaries.map(_.toPlainString))
    // aggregate over the boundary values stays exact (sum type widens)
    val s = back.agg(sum(col("u"))).collect()(0).getDecimal(0)
    assert(s.compareTo(boundaries.reduce(_.add(_))) == 0)
  }
}
