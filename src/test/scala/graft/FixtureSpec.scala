package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schema-drift canary over the driver-generated testdata.
  *
  * Round 7 lost 13 correctness entries and its entire bench because the
  * driver silently regenerated `events.parquet` with `ts` re-encoded
  * from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the reader
  * hard-coded the old contract. This suite reads the actual parquet
  * footers and asserts the engine's expected logical types, so the next
  * regeneration fails HERE with a named diff — one red spec naming the
  * drifted column — instead of as a pile of absent correctness rows.
  */
class FixtureSpec extends SparkSpec {

  private def footerFields(table: String): Map[String, String] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet"), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getFileMetaData.getSchema.getFields.asScala.map { f =>
        if (f.isPrimitive) {
          val prim = f.asPrimitiveType()
          val logical = Option(prim.getLogicalTypeAnnotation)
            .map(_.toString).getOrElse("")
          f.getName ->
            s"${prim.getPrimitiveTypeName}${if (logical.nonEmpty) s"($logical)" else ""}"
        } else {
          // nested group (e.g. embeddings.embedding LIST<FLOAT>) —
          // contract-checked by its rendered structure
          f.getName -> s"GROUP(${Option(f.asGroupType().getLogicalTypeAnnotation)
            .map(_.toString).getOrElse("")})"
        }
      }.toMap
    } finally r.close()
  }

  // The stable contract: column -> parquet primitive type. Timestamp
  // columns are asserted separately (unit may legitimately vary).
  private val contract: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "INT32", "r_name" -> "BINARY(STRING)"),
    "nation" -> Seq("n_nationkey" -> "INT32", "n_name" -> "BINARY(STRING)",
      "n_regionkey" -> "INT32"),
    "customer" -> Seq("c_custkey" -> "INT64", "c_name" -> "BINARY(STRING)",
      "c_nationkey" -> "INT32", "c_acctbal" -> "DOUBLE",
      "c_mktsegment" -> "BINARY(STRING)"),
    "supplier" -> Seq("s_suppkey" -> "INT64", "s_name" -> "BINARY(STRING)",
      "s_nationkey" -> "INT32", "s_acctbal" -> "DOUBLE"),
    "part" -> Seq("p_partkey" -> "INT64", "p_name" -> "BINARY(STRING)",
      "p_brand" -> "BINARY(STRING)", "p_type" -> "BINARY(STRING)",
      "p_size" -> "INT32", "p_retailprice" -> "DOUBLE"),
    "orders" -> Seq("o_orderkey" -> "INT64", "o_custkey" -> "INT64",
      "o_orderstatus" -> "BINARY(STRING)", "o_totalprice" -> "DOUBLE",
      "o_orderpriority" -> "BINARY(STRING)"),
    "lineitem" -> Seq("l_orderkey" -> "INT64", "l_partkey" -> "INT64",
      "l_suppkey" -> "INT64", "l_linenumber" -> "INT32",
      "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
      "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "BINARY(STRING)", "l_linestatus" -> "BINARY(STRING)"),
    "events" -> Seq("event_id" -> "INT64", "user_id" -> "INT64",
      "event_type" -> "BINARY(STRING)", "value" -> "DOUBLE",
      "props" -> "BINARY(STRING)"),
    "documents" -> Seq("doc_id" -> "INT64", "text" -> "BINARY(STRING)",
      "lang" -> "BINARY(STRING)", "source" -> "BINARY(STRING)",
      "n_chars" -> "INT64"),
    "embeddings" -> Seq("vec_id" -> "INT64", "label" -> "INT32",
      "embedding" -> "GROUP(LIST)")
  )

  // Timestamp columns the engine reads: any parquet TIMESTAMP unit is
  // acceptable (Tables.t branches on the loaded dtype) but a non-
  // timestamp re-encoding must fail with a named diff.
  private val timestampCols: Seq[(String, String)] = Seq(
    "orders" -> "o_orderdate", "lineitem" -> "l_shipdate", "events" -> "ts")

  for ((table, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table") {
      val actual = footerFields(table)
      val diffs = cols.flatMap { case (name, expected) =>
        actual.get(name) match {
          case None => Some(s"$table.$name: MISSING (expected $expected)")
          case Some(a) if a != expected =>
            Some(s"$table.$name: drifted to $a (expected $expected)")
          case _ => None
        }
      }
      assert(diffs.isEmpty, s"\nTESTDATA SCHEMA DRIFT:\n${diffs.mkString("\n")}")
    }
  }

  test("testdata contract: timestamp columns are parquet TIMESTAMP (any unit)") {
    val diffs = timestampCols.flatMap { case (table, col) =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet"), new Configuration())
      val r = ParquetFileReader.open(in)
      try {
        val f = r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .find(_.getName == col)
        f match {
          case None => Some(s"$table.$col: MISSING")
          case Some(field) =>
            field.asPrimitiveType().getLogicalTypeAnnotation match {
              case _: TimestampLogicalTypeAnnotation => None
              case other => Some(s"$table.$col: logical type is " +
                s"${Option(other).map(_.toString).getOrElse("<none>")} " +
                "(expected TIMESTAMP(any unit))")
            }
        }
      } finally r.close()
    }
    assert(diffs.isEmpty, s"\nTESTDATA SCHEMA DRIFT:\n${diffs.mkString("\n")}")
  }

  test("engine contract: Tables.t normalizes events.ts to TIMESTAMP") {
    // Whatever the file encodes (nanos-as-long, micros NTZ, micros LTZ),
    // the engine exposes exactly one type downstream.
    val df = Tables.t(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts loaded as ${df.schema("ts").dataType}, engine contract is TIMESTAMP")
    assert(df.limit(1).count() == 1)
  }
}
