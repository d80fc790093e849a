package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.JsonFunctions

/** JSON function family queries — Spark builtins plus the custom
  * MySQL-compat expressions in `graft.functions.JsonFunctions`
  * (ref `utils/funcexp/func_json_*.cpp`, ~30 functions).
  *
  * Each row builds a JSON document from table columns with identical
  * SQL on both engines, then applies the function under test. The
  * DuckDB oracle expresses MySQL mutation semantics via
  * `json_merge_patch` (RFC 7396: null removes, object inserts) where
  * DuckDB lacks the direct function. Array-path mutations
  * (`$.arr[1]`) are not merge-patch-expressible — those are covered
  * by the ScalaTest spec instead.
  */
object JsonQueries {
  import Q._

  // Per-row JSON document, same text both engines: the Spark side uses
  // concat(), the oracle uses ||.
  private val sparkDoc =
    "concat('{\"a\":', o_orderkey % 10, ',\"b\":{\"c\":\"', o_orderstatus, '\"},\"arr\":[1,2,', o_orderkey % 5, ']}')"
  private val duckDoc =
    "('{\"a\":' || (o_orderkey % 10) || ',\"b\":{\"c\":\"' || o_orderstatus || '\"},\"arr\":[1,2,' || (o_orderkey % 5) || ']}')"

  val queries: Map[String, QFn] = Map(
    // ---- Spark-builtin JSON surface (extraction side) ----
    "q_fn_json" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_id") < 500)
        .selectExpr(
          "event_id",
          "get_json_object(props, '$.k') AS j_k",
          "cast(get_json_object(props, '$.k') AS BIGINT) AS j_kint",
          "to_json(struct(event_id % 10 AS a, event_type AS b)) AS j_obj",
          "cast(json_array_length(concat('[1,2,', event_id % 5, ']')) AS INT) AS j_arrlen",
          "to_json(json_object_keys(props)) AS j_keys",
          "from_json(props, 'k INT').k AS j_fromjson")
        .orderBy(col("event_id"))
    }),

    // ---- custom MySQL-compat surface (mutation + inspection) ----
    "q_fn_json2" -> ((s, dir) => {
      JsonFunctions.register(s)
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          s"$sparkDoc AS j_doc",
          s"json_merge_patch($sparkDoc, '{\"b\":null,\"z\":9}') AS j_patch",
          s"json_insert($sparkDoc, '$$.x', cast(o_orderkey % 7 AS STRING)) AS j_ins",
          s"json_set($sparkDoc, '$$.a', cast(o_orderkey % 7 + 100 AS STRING)) AS j_set",
          s"json_replace($sparkDoc, '$$.missing', '1') AS j_repl_noop",
          s"json_remove($sparkDoc, '$$.b') AS j_rm",
          "json_depth(CASE WHEN o_orderkey % 2 = 0 THEN '{\"d\":{\"e\":{\"f\":1}}}' ELSE '{\"d\":1}' END) AS j_depth",
          s"cast(json_contains_doc($sparkDoc, concat('{\"a\":', o_orderkey % 10, '}')) AS INT) AS j_contains",
          s"json_type($sparkDoc) AS j_type_obj",
          "json_type(concat('\"', o_orderstatus, '\"')) AS j_type_str",
          "json_type(cast(o_orderkey % 10 AS STRING)) AS j_type_int",
          s"cast(json_valid($sparkDoc) AS INT) AS j_valid",
          "cast(json_valid(concat('{bad', o_orderstatus)) AS INT) AS j_invalid",
          "json_quote(o_orderstatus) AS j_quote",
          "json_unquote(json_quote(o_orderstatus)) AS j_unquote")
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS j_k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS j_kint,
        |  to_json({a: event_id % 10, b: event_type}) AS j_obj,
        |  CAST(json_array_length('[1,2,' || (event_id % 5) || ']') AS INT) AS j_arrlen,
        |  to_json(json_keys(props)) AS j_keys,
        |  CAST(json_extract(props, '$.k') AS INT) AS j_fromjson
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,
    "q_fn_json2" ->
      s"""SELECT o_orderkey,
         |  $duckDoc AS j_doc,
         |  CAST(json_merge_patch($duckDoc, '{"b":null,"z":9}') AS VARCHAR) AS j_patch,
         |  CAST(json_merge_patch($duckDoc, '{"x":' || (o_orderkey % 7) || '}') AS VARCHAR) AS j_ins,
         |  ('{"a":' || (o_orderkey % 7 + 100) || ',"b":{"c":"' || o_orderstatus || '"},"arr":[1,2,' || (o_orderkey % 5) || ']}') AS j_set,
         |  CAST(json($duckDoc) AS VARCHAR) AS j_repl_noop,
         |  CAST(json_merge_patch($duckDoc, '{"b":null}') AS VARCHAR) AS j_rm,
         |  CASE WHEN o_orderkey % 2 = 0 THEN 4 ELSE 2 END AS j_depth,
         |  CAST(json_contains($duckDoc, '{"a":' || (o_orderkey % 10) || '}') AS INT) AS j_contains,
         |  'OBJECT' AS j_type_obj,
         |  CASE json_type('"' || o_orderstatus || '"') WHEN 'VARCHAR' THEN 'STRING' END AS j_type_str,
         |  CASE WHEN json_type(CAST(o_orderkey % 10 AS VARCHAR)) IN ('UBIGINT','BIGINT') THEN 'INTEGER' END AS j_type_int,
         |  CAST(json_valid($duckDoc) AS INT) AS j_valid,
         |  CAST(json_valid('{bad' || o_orderstatus) AS INT) AS j_invalid,
         |  CAST(to_json(o_orderstatus) AS VARCHAR) AS j_quote,
         |  o_orderstatus AS j_unquote
         |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin
  )
}
