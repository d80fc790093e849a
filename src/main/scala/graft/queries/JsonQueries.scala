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
    }),

    // ---- round 4: the remaining func_json_* surface (keys/length/
    // exists/contains_path/equals/normalize/overlaps/array_append/
    // array_insert/search/value/query/merge_preserve/object/array).
    // Docs are constructed per row so every oracle expectation is an
    // exact string/int expression in DuckDB.
    // JSON_COMPACT / JSON_LOOSE rendering (ref func_json_format.cpp):
    // the roundtrip column proves compact∘loose is identity on the
    // constructed doc; the literal column proves ','/':' INSIDE string
    // values are untouched and empty containers render bare.
    "q_fn_json_format" -> ((s, dir) => {
      JsonFunctions.register(s)
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          s"json_compact(json_loose($sparkDoc)) AS j_rt",
          s"json_loose($sparkDoc) AS j_loose",
          """json_loose('{"s": "x, y: z", "e": {}, "ea": []}') AS j_strsafe""")
        .orderBy(col("o_orderkey"))
    }),
    "q_fn_json3" -> ((s, dir) => {
      JsonFunctions.register(s)
      val varArr = "concat('[', repeat('7,', cast(o_orderkey % 4 AS INT)), '9]')"
      val reordered =
        "concat('{\"b\":{\"c\":\"', o_orderstatus, '\"},\"a\":', o_orderkey % 10, ',\"arr\":[1,2,', o_orderkey % 5, ']}')"
      val twoStr =
        "concat('{\"x\":\"', o_orderstatus, '\",\"y\":{\"z\":\"', o_orderstatus, '\"}}')"
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          s"json_keys($sparkDoc) AS j_keys",
          s"json_keys($sparkDoc, '$$.b') AS j_keys_b",
          s"cast(json_length($sparkDoc) AS INT) AS j_len",
          s"cast(json_length($varArr) AS INT) AS j_len_arr",
          s"cast(json_length($sparkDoc, '$$.a') AS INT) AS j_len_scalar",
          s"cast(json_exists($sparkDoc, concat('$$.arr[', o_orderkey % 10, ']')) AS INT) AS j_exists",
          s"cast(json_contains_path($sparkDoc, 'one', '$$.z', '$$.b.c') AS INT) AS j_cpath_one",
          s"cast(json_contains_path($sparkDoc, 'all', '$$.z', '$$.b.c') AS INT) AS j_cpath_all",
          s"cast(json_equals($reordered, $sparkDoc) AS INT) AS j_eq",
          "cast(json_equals('{\"n\": 1.0}', '{\"n\": 1}') AS INT) AS j_eq_num",
          s"json_normalize($reordered) AS j_norm",
          s"cast(json_overlaps(concat('[1,2,', o_orderkey % 5, ']'), concat('[', o_orderkey % 7, ',99]')) AS INT) AS j_overlap",
          s"json_array_append($sparkDoc, '$$.arr', 'X') AS j_arrapp",
          s"json_array_insert($sparkDoc, '$$.arr[1]', cast(o_orderkey % 10 AS STRING)) AS j_arrins",
          s"json_search($sparkDoc, 'one', o_orderstatus) AS j_search_one",
          s"json_search($twoStr, 'all', o_orderstatus) AS j_search_all",
          s"json_search($sparkDoc, 'one', 'ZZZ_nomatch') AS j_search_none",
          s"json_value($sparkDoc, '$$.b.c') AS j_value",
          s"json_value($sparkDoc, '$$.a') AS j_value_num",
          s"json_value($sparkDoc, '$$.b') AS j_value_container",
          s"json_query($sparkDoc, '$$.b') AS j_query",
          s"json_query($sparkDoc, '$$.a') AS j_query_scalar",
          s"json_merge_preserve($sparkDoc, '{\"a\":5,\"arr\":[8]}') AS j_mergep",
          "json_object_mysql('k1', o_orderstatus, 'k2', o_orderkey % 10) AS j_object",
          "json_array_mysql(o_orderkey % 10, o_orderstatus) AS j_array")
        .orderBy(col("o_orderkey"))
    }),
    "q_json_table" -> ((s, dir) => {
      // JSON_TABLE (MariaDB 10.6 front end): a per-row document with a
      // variable-length array relationalizes into scalar COLUMNS + one
      // NESTED PATH row per element with FOR ORDINALITY. The document
      // is built with to_json (guaranteed well-formed) from event
      // columns; tags has 1..3 elements so the fan-out is ragged.
      val e = col("event_id")
      val tags = slice(array(e % 7, e % 5, e % 3), lit(1), (e % 3 + 1).cast("int"))
      val src = t(s, dir, "events").filter(e < 300)
        .select(to_json(struct(e.as("id"), tags.as("tags"),
          col("event_type").as("name"))).as("doc"))
      JsonFunctions.jsonTable(src, col("doc"),
          "id BIGINT, name STRING, tags ARRAY<BIGINT>", "tags",
          ordCol = "ord", valueCol = "tag")
        .select(col("id"), col("name"), col("ord"), col("tag"))
        // (id, ord) is unique — total order for the driver hash
        .orderBy(col("id"), col("ord"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_json_format" ->
      s"""SELECT o_orderkey,
        |  $duckDoc AS j_rt,
        |  ('{"a": ' || (o_orderkey % 10) || ', "b": {"c": "' || o_orderstatus ||
        |   '"}, "arr": [1, 2, ' || (o_orderkey % 5) || ']}') AS j_loose,
        |  '{"s": "x, y: z", "e": {}, "ea": []}' AS j_strsafe
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
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
         |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_json3" ->
      s"""SELECT o_orderkey,
         |  CAST(to_json(json_keys($duckDoc)) AS VARCHAR) AS j_keys,
         |  CAST(to_json(json_keys($duckDoc, '$$.b')) AS VARCHAR) AS j_keys_b,
         |  3 AS j_len,
         |  CAST(json_array_length('[' || repeat('7,', o_orderkey % 4) || '9]') AS INT) AS j_len_arr,
         |  1 AS j_len_scalar,
         |  CASE WHEN o_orderkey % 10 <= 2 THEN 1 ELSE 0 END AS j_exists,
         |  1 AS j_cpath_one,
         |  0 AS j_cpath_all,
         |  1 AS j_eq,
         |  1 AS j_eq_num,
         |  ('{"a":' || (o_orderkey % 10) || ',"arr":[1,2,' || (o_orderkey % 5) || '],"b":{"c":"' || o_orderstatus || '"}}') AS j_norm,
         |  CASE WHEN o_orderkey % 7 IN (1, 2, o_orderkey % 5) THEN 1 ELSE 0 END AS j_overlap,
         |  ('{"a":' || (o_orderkey % 10) || ',"b":{"c":"' || o_orderstatus || '"},"arr":[1,2,' || (o_orderkey % 5) || ',"X"]}') AS j_arrapp,
         |  ('{"a":' || (o_orderkey % 10) || ',"b":{"c":"' || o_orderstatus || '"},"arr":[1,' || (o_orderkey % 10) || ',2,' || (o_orderkey % 5) || ']}') AS j_arrins,
         |  '"$$.b.c"' AS j_search_one,
         |  '["$$.x","$$.y.z"]' AS j_search_all,
         |  CAST(NULL AS VARCHAR) AS j_search_none,
         |  o_orderstatus AS j_value,
         |  CAST(o_orderkey % 10 AS VARCHAR) AS j_value_num,
         |  CAST(NULL AS VARCHAR) AS j_value_container,
         |  ('{"c":"' || o_orderstatus || '"}') AS j_query,
         |  CAST(NULL AS VARCHAR) AS j_query_scalar,
         |  ('{"a":[' || (o_orderkey % 10) || ',5],"b":{"c":"' || o_orderstatus || '"},"arr":[1,2,' || (o_orderkey % 5) || ',8]}') AS j_mergep,
         |  ('{"k1":"' || o_orderstatus || '","k2":' || (o_orderkey % 10) || '}') AS j_object,
         |  ('[' || (o_orderkey % 10) || ',"' || o_orderstatus || '"]') AS j_array
         |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    // JSON_TABLE replay: same ragged tags array, relationalized via a
    // bounded ordinal join (u.ord <= len) — ordinality is explicit on
    // both sides, rows compare order-insensitively.
    "q_json_table" ->
      """WITH src AS (
        |  SELECT event_id AS id, event_type AS name,
        |    ([event_id % 7, event_id % 5, event_id % 3])
        |      [:CAST(event_id % 3 + 1 AS INT)] AS tags
        |  FROM events WHERE event_id < 300)
        |SELECT id, name, CAST(u.ord AS INT) AS ord,
        |  tags[CAST(u.ord AS INT)] AS tag
        |FROM src JOIN (SELECT unnest([1,2,3]) AS ord) u
        |  ON u.ord <= len(tags)
        |ORDER BY id, ord""".stripMargin
  )
}
