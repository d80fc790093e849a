package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.JsonFunctions

/** JSON edge-semantics matrix (round-8 autopilot wave): unicode
  * escapes, escaped solidus, control-char quoting, deep paths, empty
  * containers, big-integer fidelity, quote/unquote round-trips and
  * whitespace normalization — the corners the earlier json waves
  * sample but don't pin row by row. Oracle expectations are either
  * DuckDB's independent JSON reader or ground truth by construction
  * (the expected string assembled with ||). */
object JsonEdgeQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_fn_json4" -> ((s, dir) => {
      JsonFunctions.register(s)
      val st = col("o_orderstatus")
      val k = col("o_orderkey")
      t(s, dir, "orders").filter(k < 300)
        .select(
          k.as("o_orderkey"),
          // \u escape decodes through extraction (the JSON text holds
          // the 6-char escape; the reader must decode it)
          get_json_object(
            concat(lit("{\"u\":\"caf\\u00e9 "), st, lit("\"}")), "$.u")
            .as("j_unicode"),
          // escaped solidus decodes to '/'
          get_json_object(
            concat(lit("{\"p\":\"a\\/"), st, lit("\"}")), "$.p")
            .as("j_solidus"),
          // control chars escape on quote
          call_function("json_quote", concat(lit("a\n"), st, lit("\tb")))
            .as("j_ctrl"),
          // 8-deep path extraction
          get_json_object(
            concat(lit("{\"a\":{\"b\":{\"c\":{\"d\":{\"e\":{\"f\":{\"g\":{\"h\":"),
              k % 10, lit("}}}}}}}}")), "$.a.b.c.d.e.f.g.h").as("j_deep"),
          // empty containers
          json_array_length(lit("[]")).cast("int").as("j_empty_arr"),
          to_json(json_object_keys(lit("{}"))).as("j_empty_keys"),
          // 20-digit integer survives extraction verbatim
          get_json_object(lit("{\"n\":12345678901234567890}"), "$.n")
            .as("j_bignum"),
          // quote/unquote round-trip on quote+backslash content
          call_function("json_unquote",
            call_function("json_quote", concat(lit("x\""), st, lit("\\"))))
            .as("j_roundtrip"),
          // whitespace + key-order normalization
          call_function("json_normalize",
            concat(lit("{ \"b\" : \""), st, lit("\" , \"a\" : [ 1 , "),
              k % 5, lit(" ] }"))).as("j_ws_norm"))
        .orderBy(col("o_orderkey"))
    }))

  val oracle: Map[String, String] = Map(
    "q_fn_json4" ->
      """SELECT o_orderkey,
        |  ('{"u":"café ' || o_orderstatus || '"}') ->> '$.u' AS j_unicode,
        |  ('{"p":"a\/' || o_orderstatus || '"}') ->> '$.p' AS j_solidus,
        |  to_json('a' || chr(10) || o_orderstatus || chr(9) || 'b') AS j_ctrl,
        |  ('{"a":{"b":{"c":{"d":{"e":{"f":{"g":{"h":' || (o_orderkey % 10)
        |    || '}}}}}}}}') ->> '$.a.b.c.d.e.f.g.h' AS j_deep,
        |  CAST(json_array_length('[]') AS INT) AS j_empty_arr,
        |  CAST(json_keys('{}') AS VARCHAR) AS j_empty_keys,
        |  '12345678901234567890' AS j_bignum,
        |  'x"' || o_orderstatus || '\' AS j_roundtrip,
        |  ('{"a":[1,' || (o_orderkey % 5) || '],"b":"' || o_orderstatus || '"}')
        |    AS j_ws_norm
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin)
}
