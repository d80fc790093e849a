package graft

import org.apache.spark.sql.functions._
import graft.functions.{ConcatAggs, JsonFunctions, MySqlFunctions => M}

/** Unit coverage for the MySQL-compat function layer: the date-format
  * translator, the JSON mutation expressions (incl. the array paths
  * the DuckDB oracle cannot express), and the GROUP_CONCAT aggregate's
  * modifier semantics. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(colExpr).collect()(0).get(0)

  test("date pattern translator maps MySQL specifiers and escapes literals") {
    assert(M.translateDatePattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(M.translateDatePattern("%d/%m/%Y %H:%i:%s") == "dd/MM/yyyy HH:mm:ss")
    assert(M.translateDatePattern("%W %M %e, %Y") == "EEEE MMMM d, yyyy")
    assert(M.translateDatePattern("at %H o'clock") == "'at 'HH' o''clock'")
    assert(M.translateDatePattern("100%%") == "100%")
    intercept[IllegalArgumentException](M.translateDatePattern("%X-%V"))
  }

  test("week modes 0-3 match MySQL's documented golden values") {
    // golden values from the MySQL WEEK()/DATE_FORMAT() documentation
    // (modes: 0 Sunday/0-53, 1 Monday/4day/0-53, 2 Sunday/1-53, 3 ISO)
    val cases = Seq(
      // date, mode0, mode1, mode2, mode3(ISO), %X, %x
      ("2008-02-20", 7, 8, 7, 8, 2008, 2008),
      ("2000-01-01", 0, 0, 52, 52, 1999, 1999),
      ("1997-01-01", 0, 1, 52, 1, 1996, 1997),
      ("2008-12-31", 52, 53, 52, 1, 2008, 2009),
      ("2008-01-06", 1, 1, 1, 1, 2008, 2008))
    for ((d, m0, m1, m2, m3, xx, x) <- cases) {
      val dc = to_date(lit(d))
      assert(one(M.weekMySql(dc, 0)) == m0, s"$d mode 0")
      assert(one(M.weekMySql(dc, 1)) == m1, s"$d mode 1")
      assert(one(M.weekMySql(dc, 2)) == m2, s"$d mode 2")
      assert(one(M.weekMySql(dc, 3)) == m3, s"$d mode 3")
      assert(one(M.sundayWeekYear(dc)) == xx, s"$d %X")
      assert(one(M.isoWeekYear(dc)) == x, s"$d %x")
    }
    // segmented DATE_FORMAT: week specifiers interleaved with plain runs
    assert(one(M.dateFormat(to_date(lit("2008-12-31")), "%x-W%v (%U/%u/%V of %X) %Y")) ==
      "2009-W01 (52/53/52 of 2008) 2008")
  }

  test("period arithmetic: add/diff are inverse") {
    val df = Seq(199501, 199512, 200001, 202312).toDF("p")
    val r = df.select(col("p"), M.periodDiff(M.periodAdd(col("p"), lit(37)), col("p")))
      .as[(Int, Long)].collect()
    assert(r.forall(_._2 == 37L))
    assert(one(M.periodAdd(lit(199512), lit(1))) == 199601L)
    assert(one(M.periodDiff(lit(199603), lit(199512))) == 3L)
  }

  test("to_days/from_days roundtrip and known values") {
    assert(one(M.toDays(to_date(lit("1970-01-01")))) == 719528L)
    assert(one(M.toDays(to_date(lit("2007-10-07")))) == 733321L) // MySQL doc example
    val r = Seq("1995-03-01", "2000-02-29", "2024-12-31").toDF("d")
      .select(M.fromDays(M.toDays(to_date(col("d")))).cast("string"), col("d"))
      .as[(String, String)].collect()
    assert(r.forall(t => t._1 == t._2))
  }

  test("sec_to_time/time_to_sec roundtrip incl. negatives and >24h") {
    assert(one(M.secToTime(lit(3661))) == "01:01:01")
    assert(one(M.secToTime(lit(-90))) == "-00:01:30")
    assert(one(M.secToTime(lit(90000))) == "25:00:00")
    val secs = Seq(0, 1, 59, 3600, 86399, 90061, -5, -86400).toDF("s")
    val r = secs.select(col("s"), M.timeToSec(M.secToTime(col("s")))).as[(Int, Long)].collect()
    assert(r.forall(t => t._1.toLong == t._2))
  }

  test("lenient casts: string prefix parse and half-away rounding") {
    assert(one(M.castSigned(lit("  12abc"))) == 12L)
    assert(one(M.castSigned(lit("-7x"))) == -7L)
    assert(one(M.castSigned(lit("abc"))) == 0L)
    assert(one(M.castSignedRound(lit(2.5))) == 3L)
    assert(one(M.castSignedRound(lit(-2.5))) == -3L)
    assert(one(M.castSignedRound(lit(2.4))) == 2L)
  }

  test("json mutation expressions: array paths, modes, invalid input") {
    JsonFunctions.register(spark)
    def j(e: String): Any = spark.sql(s"SELECT $e").collect()(0).get(0)
    assert(j("""json_remove('{"a":[1,2,3]}', '$.a[1]')""") == """{"a":[1,3]}""")
    assert(j("""json_set('{"a":[1,2]}', '$.a[5]', '9')""") == """{"a":[1,2,9]}""")
    assert(j("""json_replace('{"a":[1,2]}', '$.a[0]', '9')""") == """{"a":[9,2]}""")
    assert(j("""json_insert('{"a":1}', '$.a', '9')""") == """{"a":1}""")
    assert(j("""json_merge_patch('{"a":{"b":1,"c":2}}', '{"a":{"b":null}}')""") == """{"a":{"c":2}}""")
    assert(j("""json_depth('[[[1]]]')""") == 4)
    assert(j("""json_unquote('not json')""") == "not json")
    assert(j("""json_valid('{]')""") == false)
    assert(j("""json_type('true')""") == "BOOLEAN")
    assert(j("""json_merge_patch('{bad', '{}')""") == null)
  }

  test("json path parser handles nesting, rejects malformed") {
    import graft.functions.JsonFunctions.parsePath
    assert(parsePath("$.a.b[2].c") == Some(List(Left("a"), Left("b"), Right(2), Left("c"))))
    assert(parsePath("$") == Some(Nil))
    assert(parsePath("a.b").isEmpty)
    assert(parsePath("$.a[x]").isEmpty)
    assert(parsePath("$.").isEmpty)
  }

  test("native kernels compile under codegen (no interpreter fallback)") {
    // Regression: the kernels originally lived as NESTED objects, whose
    // methods get no static forwarders — Janino failed to compile every
    // generated call and each stage silently fell back to the
    // interpreter (spark.sql.codegen.fallback=false does NOT surface
    // this; the executor just logs an ERROR). CodegenProbe re-compiles
    // the actual generated source and throws on failure.
    import org.apache.spark.sql.execution.CodegenProbe
    val df = spark.range(100).selectExpr(
        "id",
        "cast(id as string) as s",
        "array(cast(id as double), 2.0d, 3.0d) as v")
      .selectExpr("vec_dot(v, v) as d", "token_fingerprint(s) as f",
        "bpe_token_count(s) as b", "simhash64(s) as sh",
        "inet_ntoa(id * 16909060L) as ip", "inet_aton('10.1.2.3') as aton")
    assert(CodegenProbe.compileWholeStage(df) >= 1)
    assert(df.collect().length == 100)
    // multiple vec_dot calls in ONE projection (fresh-name regression)
    val multi = spark.range(10).selectExpr("array(cast(id as double), 1.0d) as v")
      .selectExpr("vec_dot(v, v) + vec_dot(v, v) as d2")
    assert(CodegenProbe.compileWholeStage(multi) >= 1)
    assert(multi.collect().length == 10)
  }

  test("json round-4 surface: search/equals/overlaps/array ops/pretty edges") {
    JsonFunctions.register(spark)
    def j(e: String): Any = spark.sql(s"SELECT $e").collect()(0).get(0)
    // search: 'all' with a single hit collapses to a plain path string
    assert(j("""json_search('{"x":"hit","y":"miss"}', 'all', 'hit')""") == "\"$.x\"")
    // search inside arrays, LIKE wildcards, no match
    assert(j("""json_search('{"a":["p","q"]}', 'one', 'q')""") == "\"$.a[1]\"")
    assert(j("""json_search('{"ab":"xyz"}', 'one', 'x%')""") == "\"$.ab\"")
    assert(j("""json_search('{"ab":"xyz"}', 'one', 'x_z')""") == "\"$.ab\"")
    assert(j("""json_search('{"a":"b"}', 'one', 'nope')""") == null)
    // equals: representation-insensitive numbers, order-insensitive keys
    assert(j("""json_equals('{"a":1.0,"b":[1,2]}', '{"b":[1,2],"a":1}')""") == true)
    assert(j("""json_equals('[1,2]', '[2,1]')""") == false)
    // overlaps: object member vs array element semantics
    assert(j("""json_overlaps('{"a":1}', '{"a":1,"b":2}')""") == true)
    assert(j("""json_overlaps('{"a":1}', '{"a":2}')""") == false)
    assert(j("""json_overlaps('3', '[1,2,3]')""") == true)
    // array_append wraps a non-array target; array_insert shifts
    assert(j("""json_array_append('{"a":1}', '$.a', '2')""") == """{"a":[1,2]}""")
    assert(j("""json_array_insert('{"a":[1,3]}', '$.a[1]', '2')""") == """{"a":[1,2,3]}""")
    assert(j("""json_array_insert('{"a":[1]}', '$.a[9]', '2')""") == """{"a":[1,2]}""")
    // merge_preserve wraps scalars into arrays
    assert(j("""json_merge_preserve('1', '2')""") == "[1,2]")
    assert(j("""json_merge_preserve('{"a":1}', '{"a":2}')""") == """{"a":[1,2]}""")
    // keys/length on missing paths are NULL
    assert(j("""json_keys('{"a":1}', '$.z')""") == null)
    assert(j("""json_length('{"a":1}', '$.z')""") == null)
    // value/query scalar-vs-container contract
    assert(j("""json_value('{"a":{"b":1}}', '$.a')""") == null)
    assert(j("""json_query('{"a":{"b":1}}', '$.a')""") == """{"b":1}""")
    // normalize sorts keys recursively
    assert(j("""json_normalize('{"b":{"d":1,"c":2},"a":3}')""") == """{"a":3,"b":{"c":2,"d":1}}""")
    // pretty: jackson default 2-space style, stable
    assert(j("""json_pretty('{"a":[1]}')""").toString.contains("\n"))
    assert(j("""json_contains_path('{"a":{"b":1}}', 'one', '$.a.b', '$.z')""") == true)
    assert(j("""json_contains_path('{"a":{"b":1}}', 'all', '$.a.b', '$.z')""") == false)
  }

  test("group_concat: order, desc, distinct, separator, truncation, empty->null") {
    ConcatAggs.register(spark)
    Seq((1, "b", 2.0), (1, "a", 3.0), (1, "c", 1.0), (1, "a", 0.5), (2, "z", 1.0))
      .toDF("g", "s", "k").createOrReplaceTempView("gc")
    val r = spark.sql(
      """SELECT g, group_concat(s, k, ','), group_concat_desc(s, s, '-'),
        |       group_concat_distinct(s, s, '+')
        |FROM gc GROUP BY g ORDER BY g""".stripMargin)
      .as[(Int, String, String, String)].collect()
    assert(r(0) == ((1, "a,c,b,a", "c-b-a-a", "a+b+c")))
    assert(r(1) == ((2, "z", "z", "z")))
    // truncation at maxLen
    Seq((1, "aaaa"), (1, "bbbb")).toDF("g", "s").createOrReplaceTempView("gt")
    val tr = spark.sql("SELECT group_concat_maxlen(s, s, ',', 6) FROM gt GROUP BY g")
      .collect()(0).getString(0)
    assert(tr == "aaaa,b")
    // json_arrayagg
    val ja = spark.sql("SELECT json_arrayagg(s, k) FROM gc WHERE g = 1")
      .collect()(0).getString(0)
    assert(ja == """["a","c","b","a"]""")
  }

  test("group_concat survives the sort-based (spill) aggregation fallback") {
    ConcatAggs.register(spark)
    Tables.t(spark, sfDir, "supplier").createOrReplaceTempView("supp_gc")
    val q = """SELECT s_nationkey, group_concat(s_name, s_name, ',') AS names
              |FROM supp_gc GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
    val normal = spark.sql(q).collect().toSeq
    // force ObjectHashAggregate to fall back to sort-based aggregation
    // after 1 in-memory group — exercises the TypedImperativeAggregate
    // serialize/merge path the way a 100 TB spill would
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    try {
      val spilled = spark.sql(q).collect().toSeq
      assert(spilled == normal)
    } finally spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
  }

  test("inet_aton/inet_ntoa: parse edges and real whole-stage codegen") {
    import graft.functions.NetKernels
    assert(NetKernels.inetAton("192.168.1.9") == 0xC0A80109L)
    assert(NetKernels.inetAton("1.2") == (1L << 24 | 2)) // MySQL short form
    assert(NetKernels.inetAton("256.1.1.1") == null)
    assert(NetKernels.inetAton("1..2.3") == null)
    assert(NetKernels.inetAton("a.b.c.d") == null)
    val r = spark.sql(
      """SELECT inet_ntoa(inet_aton('10.20.30.40')) AS rt,
        |       inet_aton('0.0.1.0') AS v, inet_aton('bogus') AS bad,
        |       inet_ntoa(4294967296) AS oob""".stripMargin).collect()(0)
    assert(r.getString(0) == "10.20.30.40")
    assert(r.getLong(1) == 256L)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("jsonTable: ragged fan-out, ordinality, empty-array and malformed docs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      """{"id":1,"name":"a","tags":[10,20]}""",
      """{"id":2,"name":"b","tags":[]}""",   // empty NESTED PATH -> one NULL row
      """{"id":3,"name":"c"}""",             // missing array -> one NULL row
      """not json at all"""                  // NULL ON ERROR -> all-NULL row
    ).toDF("doc")
    val out = graft.functions.JsonFunctions.jsonTable(docs, col("doc"),
      "id BIGINT, name STRING, tags ARRAY<BIGINT>", "tags",
      ordCol = "ord", valueCol = "tag")
      .select("id", "name", "ord", "tag")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out == Set(
      (Some(1L), Some("a"), Some(1), Some(10L)),
      (Some(1L), Some("a"), Some(2), Some(20L)),
      (Some(2L), Some("b"), None, None),
      (Some(3L), Some("c"), None, None),
      (None, None, None, None)))
  }

  test("unicode_normalize: all four forms + NULL + idempotence") {
    // inputs as Scala literals: Spark SQL's char(n) wraps at 256
    // (chr(769) = chr(1)), unlike DuckDB's codepoint chr()
    val r = Seq(1).toDF("x").selectExpr(
        "unicode_normalize('Café', 'NFC')  AS nfc",
        "unicode_normalize('Caf\\u00e9', 'NFD')   AS nfd",
        "unicode_normalize('\\ufb01t \\u00b2', 'NFKC') AS nfkc",
        "unicode_normalize('\\ufb01t', 'NFKD')    AS nfkd",
        "unicode_normalize(CAST(NULL AS STRING)) AS nul",
        "unicode_normalize('plain ascii')        AS asc")
      .collect()(0)
    assert(r.getString(0) == "Caf\u00e9")          // composes
    assert(r.getString(1) == "Café")         // decomposes
    assert(r.getString(2) == "fit 2")              // compatibility folds
    assert(r.getString(3) == "fit")
    assert(r.isNullAt(4))
    assert(r.getString(5) == "plain ascii")        // identity on ASCII
  }

  test("digest family matches published test vectors (ref func_crc32/func_sha)") {
    // DuckDB has no crc32/sha1/sha512, so the oracle can't cross-check
    // these — pin them to the published CRC-32 (ISO 3309) and NIST FIPS
    // 180 vectors instead.
    val r = Seq(1).toDF("x").selectExpr(
      "crc32('')", "crc32('abc')",
      "crc32('The quick brown fox jumps over the lazy dog')",
      "sha1('')", "sha1('abc')", "sha2('abc', 512)", "sha2('abc', 224)",
      "md5('abc')").collect()(0)
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 891568578L)             // 0x352441C2
    assert(r.getLong(2) == 1095738169L)            // 0x414FA339
    assert(r.getString(3) == "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    assert(r.getString(4) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(5) == ("ddaf35a193617abacc417349ae20413112e6fa4e89a97ea2" +
      "0a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"))
    assert(r.getString(6) == "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getString(7) == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("json_compact / json_loose render MariaDB's documented formats") {
    JsonFunctions.register(spark)
    val doc = """{ "a" : [ 1, 2 , {"b" : "x, y: z"} ] , "c": {} }"""
    val r = Seq(doc).toDF("j")
      .selectExpr("json_compact(j)", "json_loose(j)",
        "json_compact('not json')").collect()(0)
    assert(r.getString(0) == """{"a":[1,2,{"b":"x, y: z"}],"c":{}}""")
    assert(r.getString(1) == """{"a": [1, 2, {"b": "x, y: z"}], "c": {}}""")
    assert(r.isNullAt(2))                          // malformed -> NULL
  }

  test("nondeterministic tail: RAND(seed) reproducible, SYSDATE/NOW sane") {
    // The reference's only nondeterministic scalars (func_rand.cpp,
    // sysdate in the MariaDB front end). Seeded RAND re-evaluates to
    // the same per-partition stream — the property callers rely on
    // for reproducible sampling; an oracle hash-compare is
    // definitionally impossible, so this spec is the evidence.
    val a = spark.sql("SELECT rand(42) AS r FROM range(5)")
      .collect().map(_.getDouble(0)).toSeq
    val b = spark.sql("SELECT rand(42) AS r FROM range(5)")
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b, "seeded RAND must reproduce across executions")
    assert(a.forall(x => x >= 0.0 && x < 1.0))
    assert(a.distinct.size > 1, "stream varies within the partition")
    val now = spark.sql("SELECT current_timestamp()")
      .collect()(0).getTimestamp(0)
    assert(math.abs(now.getTime - System.currentTimeMillis()) < 60000,
      "SYSDATE/current_timestamp tracks wall clock")
  }
}
