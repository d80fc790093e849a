package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The UDF/UDAF SDK surface — the analog of the reference's
  * `mcsv1_UDAF` C++ SDK (`utils/udfsdk/mcsv1_udaf.h:224,461-521`:
  * init/reset/nextValue/subEvaluate/evaluate), whose distributed
  * partial→merge contract maps 1:1 onto Spark's `Aggregator[IN,BUF,OUT]`
  * (zero=init/reset, reduce=nextValue, merge=subEvaluate,
  * finish=evaluate). The examples mirror the SDK's shipped samples:
  * ssq.cpp, median.cpp, distinct_count.cpp, allnull.cpp.
  *
  * Scalar UDFs register through `spark.udf.register` (the udfsdk.cpp
  * path) — but note the engine's own function layer prefers native
  * Catalyst expressions (`MySqlFunctions`, `JsonFunctions`) because
  * UDFs are codegen black boxes; the SDK exists for END USERS
  * extending the engine, exactly like the reference's.
  */
object UdfSdk {

  /** Sum of squares (ref `utils/udfsdk/ssq.cpp`). Values are scaled
    * to exact 2-decimal fixed point so the distributed sum is
    * order-independent — the engine's exact-DECIMAL discipline. */
  val ssq: Aggregator[Double, (Long, Long), Double] =
    new Aggregator[Double, (Long, Long), Double] {
      def zero: (Long, Long) = (0L, 0L) // (count, sum of squared cents)
      def reduce(b: (Long, Long), x: Double): (Long, Long) = {
        val cents = math.round(x * 100)
        (b._1 + 1, b._2 + cents * cents)
      }
      def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Long, Long)): Double = b._2 / 10000.0
      def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Exact median (ref `utils/udfsdk/median.cpp`): buffers all values
    * per group — an EXAMPLE of the SDK's power, not the 100 TB path
    * (use percentile_approx there; the reference's median.cpp has the
    * same per-group memory caveat). */
  val medianExact: Aggregator[Double, Seq[Double], Double] =
    new Aggregator[Double, Seq[Double], Double] {
      def zero: Seq[Double] = Vector.empty
      def reduce(b: Seq[Double], x: Double): Seq[Double] = b :+ x
      def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = a ++ b
      def finish(b: Seq[Double]): Double =
        if (b.isEmpty) Double.NaN
        else {
          val s = b.sorted
          val n = s.length
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
        }
      def bufferEncoder: Encoder[Seq[Double]] = Encoders.kryo[Seq[Double]]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Distinct count via buffered set (ref `utils/udfsdk/distinct_count.cpp`). */
  val distinctCount: Aggregator[Long, Set[Long], Long] =
    new Aggregator[Long, Set[Long], Long] {
      def zero: Set[Long] = Set.empty
      def reduce(b: Set[Long], x: Long): Set[Long] = b + x
      def merge(a: Set[Long], b: Set[Long]): Set[Long] = a ++ b
      def finish(b: Set[Long]): Long = b.size.toLong
      def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Register the SDK examples for the SQL surface. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("udaf_ssq", udaf(ssq))
    spark.udf.register("udaf_median", udaf(medianExact))
    spark.udf.register("udaf_distinct_count", udaf(distinctCount))
    // scalar UDF registration path (udfsdk.cpp analog); prefer native
    // expressions for engine-internal functions
    spark.udf.register("udf_reverse_words",
      (s: String) => if (s == null) null else s.split("\\s+").reverse.mkString(" "))
  }
}
