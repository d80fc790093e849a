package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MySqlFunctions._

/** The scalar-function surface, oracle-tested family by family — the
  * analog of the reference's funcexp registry (196 entries,
  * `utils/funcexp/funcexp.cpp`, 134 func_*.cpp files, ~32k LoC).
  *
  * Spark side: built-in SQL functions via selectExpr (the codegen'd
  * registry surface) plus the MySQL-compat builders from
  * `graft.functions.MySqlFunctions` for functions Spark lacks
  * (PERIOD_ADD/DIFF, TO_DAYS/FROM_DAYS, SEC_TO_TIME, TRUNCATE,
  * DATE_FORMAT pattern translation, lenient casts). Oracle side:
  * the same semantics spelled in DuckDB's dialect.
  *
  * Cross-engine determinism rules learned the hard way:
  *  - transcendentals (exp/ln/trig) are libm-dependent → wrap in
  *    ROUND(x, 6); ties cannot occur at ulp distances.
  *  - ROUND(double, n) itself DIVERGES between engines (DuckDB rounds
  *    the printed representation, Spark rounds the BigDecimal) → only
  *    round decimals, or round as noise-trimming after a
  *    transcendental.
  *  - DuckDB CAST(double AS BIGINT) rounds, Spark truncates → spell
  *    trunc()/floor() explicitly.
  *  - integer widths: DuckDB SUM/length/instr widen differently →
  *    CAST both sides to the same type.
  */
object FunctionQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    // ---- string family (ref utils/funcexp/func_concat.cpp, func_substr.cpp, ...) ----
    "q_fn_string" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") < 500)
        .selectExpr(
          "p_partkey",
          "concat(p_name, '|', p_brand) AS c_concat",
          "concat_ws('-', p_brand, p_type) AS c_cws",
          "upper(p_name) AS c_upper",
          "lower(p_brand) AS c_lower",
          "cast(length(p_name) AS INT) AS c_len",
          "substr(p_name, 2, 5) AS c_substr",
          "lpad(p_brand, 12, '*') AS c_lpad",
          "rpad(p_brand, 12, '#') AS c_rpad",
          "trim(concat('  ', p_type, ' ')) AS c_trim",
          "ltrim(concat('  ', p_type)) AS c_ltrim",
          "rtrim(concat(p_type, '  ')) AS c_rtrim",
          "replace(p_name, ' ', '_') AS c_repl",
          "reverse(p_type) AS c_rev",
          "left(p_name, 4) AS c_left",
          "right(p_name, 3) AS c_right",
          "repeat(p_brand, 2) AS c_rept",
          "cast(instr(p_name, 'a') AS BIGINT) AS c_instr",
          "cast(ascii(p_type) AS INT) AS c_ascii",
          "chr(65 + cast(p_partkey % 26 AS INT)) AS c_chr",
          "md5(p_name) AS c_md5",
          "sha2(p_name, 256) AS c_sha",
          "hex(p_partkey) AS c_hex")
        .orderBy(col("p_partkey"))
    }),

    // ---- TO_BASE64/FROM_BASE64 (MariaDB registry; MySQL chunks the
    // output with newlines every 76 chars — inputs here stay under 57
    // bytes so the RFC form both engines and MySQL agree on is what's
    // pinned) + binary padding edges via constructed byte strings ----
    "q_fn_base64" -> ((s, dir) => {
      val nm = substring(col("p_name"), 1, 40)
      // 1/2/3-byte tails exercise all '=' padding forms
      val tail = col("p_name").substr(lit(1), (col("p_partkey") % 3 + 1).cast("int"))
      t(s, dir, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          base64(nm.cast("binary")).as("b64"),
          base64(tail.cast("binary")).as("b64_pad"),
          decode(unbase64(base64(nm.cast("binary"))), "UTF-8").as("rt"),
          base64(unhex(lpad(hex(col("p_partkey") * 2654435761L), 16, "0")))
            .as("b64_bin"))
        .orderBy(col("p_partkey"))
    }),

    // ---- string family 2: MySQL-specific (func_substring_index.cpp,
    // func_elt.cpp, func_find_in_set.cpp, func_quote.cpp, func_insert.cpp) ----
    "q_fn_string2" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") < 500)
        .selectExpr(
          "p_partkey", "p_name", "p_type",
          "substring_index(p_name, ' ', 1) AS c_si1",
          "substring_index(p_name, ' ', -1) AS c_si2",
          "elt(1 + cast(p_partkey % 3 AS INT), 'alpha', 'beta', 'gamma') AS c_elt",
          "cast(find_in_set(p_type, 'SMALL,MEDIUM,LARGE,PROMO') AS INT) AS c_fis",
          "concat(space(3), p_type) AS c_space")
        .select(col("*"),
          graft.functions.MySqlFunctions.quote(col("p_name")).as("c_quote"),
          insertStr(col("p_name"), lit(2), lit(3), lit("XY")).as("c_ins"),
          castSigned(concat(lit("  12"), col("p_type"))).as("c_castsig"))
        .drop("p_name", "p_type")
        .orderBy(col("p_partkey"))
    }),

    "q_fn_unicode" -> ((s, dir) => {
      // Unicode NFC normalization (UnicodeNormalize expression) — the
      // canonical first pass of multilingual corpus cleaning. Input is
      // document text salted with DECOMPOSED sequences (e +
      // U+0301 combining acute; A + U+030A combining ring) so the
      // normalizer has real work; oracle = DuckDB nfc_normalize (an
      // independent UAX #15 implementation) + unicode-aware lower.
      val mixed = concat(lit("Cafe\u0301 A\u030A "),
        substring(col("text"), 1, 40))
      t(s, dir, "documents")
        .select(col("doc_id"),
          call_function("unicode_normalize", mixed).as("nfc_text"),
          length(mixed).as("len_raw"),
          length(call_function("unicode_normalize", mixed)).as("len_nfc"),
          lower(lit("CAFE\u0301")).as("lower_acc"))
        .orderBy(col("doc_id"))
    }),

    "q_fn_url" -> ((s, dir) => {
      // URL dissection (parse_url family) — the provenance pass of a
      // web-corpus pipeline (host/registrable-domain/path/query-param
      // feed dedup keys, domain mixtures, and blocklists). Testdata
      // carries no URLs, so canonical ones are synthesized from
      // columns; the oracle recomputes each part from the SAME
      // columns — ground truth by construction, so the hash match
      // pins parse_url's component semantics.
      val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id"), lit("?ref="), col("lang"), lit("&v=2#sec"))
      t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
        .selectExpr("doc_id", "url",
          "parse_url(url, 'HOST') AS host",
          "parse_url(url, 'PATH') AS path",
          "parse_url(url, 'QUERY') AS query",
          "parse_url(url, 'QUERY', 'ref') AS ref",
          "parse_url(url, 'REF') AS frag",
          "parse_url(url, 'PROTOCOL') AS proto",
          "substring_index(parse_url(url, 'HOST'), '.', -2) AS domain")
        .orderBy(col("doc_id"))
    }),

    // ---- math family (func_abs.cpp ... func_truncate.cpp) ----
    "q_fn_math" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          "abs(o_totalprice - 150000.0) AS m_abs",
          "cast(ceil(o_totalprice) AS BIGINT) AS m_ceil",
          "cast(floor(o_totalprice) AS BIGINT) AS m_floor",
          "o_orderkey % 7 AS m_mod",
          "cast(power(2, o_orderkey % 10) AS DOUBLE) AS m_pow",
          "round(exp(o_totalprice / 100000.0), 6) AS m_exp",
          "round(ln(o_totalprice), 6) AS m_ln",
          "round(log10(o_totalprice), 6) AS m_log10",
          "round(log2(o_totalprice), 6) AS m_log2",
          "round(sqrt(o_totalprice), 6) AS m_sqrt",
          "cast(sign(o_totalprice - 150000.0) AS INT) AS m_sign",
          "round(sin(o_orderkey % 10), 6) AS m_sin",
          "round(cos(o_orderkey % 10), 6) AS m_cos",
          "round(atan2(o_totalprice, 1000.0), 6) AS m_atan2",
          "round(tan(o_orderkey % 10), 6) AS m_tan",
          "round(atan(o_orderkey % 10), 6) AS m_atan",
          "round(cot(1 + o_orderkey % 7), 6) AS m_cot",
          "round(degrees(1.0), 6) AS m_deg",
          "round(radians(180.0), 6) AS m_rad",
          "round(pi(), 6) AS m_pi",
          "o_totalprice")
        .select(col("*"), truncateNum(col("o_totalprice"), 1).as("m_trunc1"))
        .drop("o_totalprice")
        .orderBy(col("o_orderkey"))
    }),

    // ---- date/time family, Spark-builtin part (func_year.cpp ...) ----
    "q_fn_date" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          "cast(year(o_orderdate) AS INT) AS d_year",
          "cast(quarter(o_orderdate) AS INT) AS d_quarter",
          "cast(month(o_orderdate) AS INT) AS d_month",
          "cast(day(o_orderdate) AS INT) AS d_day",
          "cast(dayofweek(o_orderdate) AS INT) AS d_dow",
          "cast(dayofyear(o_orderdate) AS INT) AS d_doy",
          "cast(weekofyear(o_orderdate) AS INT) AS d_week",
          "last_day(cast(o_orderdate AS DATE)) AS d_lastday",
          "o_orderdate + INTERVAL 3 MONTH AS d_add3m",
          "o_orderdate - INTERVAL 45 DAY AS d_sub45d",
          "cast(datediff(cast(o_orderdate AS DATE), DATE '1995-01-01') AS INT) AS d_diff",
          "cast(date_trunc('month', o_orderdate) AS DATE) AS d_trunc",
          "unix_timestamp(o_orderdate) AS d_epoch",
          // cast to NTZ: the oracle's TIMESTAMP is naive, and the session
          // runs UTC, so LTZ→NTZ is value-preserving here
          "cast(timestamp_millis(unix_timestamp(o_orderdate) * 1000 + 500) AS TIMESTAMP_NTZ) AS d_frommillis",
          "cast(o_orderdate AS DATE) AS d_date")
        .orderBy(col("o_orderkey"))
    }),

    // ---- date/time family, MySQL-compat customs (func_date_format.cpp,
    // func_period_add.cpp, func_to_days.cpp, func_sec_to_time.cpp,
    // func_makedate.cpp; pattern language utils/dataconvert/) ----
    "q_fn_date2" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          dateFormat(col("o_orderdate"), "%Y-%m-%d").as("d_fmt1"),
          dateFormat(col("o_orderdate"), "%d/%m/%Y %H:%i:%s").as("d_fmt2"),
          dateFormat(col("o_orderdate"), "%W %M %e, %Y").as("d_fmt3"),
          strToDate(dateFormat(col("o_orderdate"), "%Y-%m-%d"), "%Y-%m-%d")
            .cast("timestamp_ntz").as("d_parse"),
          periodAdd(lit(199611), col("o_orderkey") % 5).as("d_padd"),
          periodDiff(lit(199703), lit(199611) + col("o_orderkey") % 5).as("d_pdiff"),
          toDays(col("o_orderdate")).as("d_todays"),
          fromDays(lit(730000L) + col("o_orderkey") % 100).as("d_fromdays"),
          secToTime(col("o_orderkey") % 90000).as("d_sectime"),
          timeToSec(secToTime(col("o_orderkey") % 90000)).as("d_roundtrip"),
          makedate(lit(1996) + (col("o_orderkey") % 3).cast("int"),
            lit(1) + (col("o_orderkey") % 365).cast("int")).as("d_makedate"),
          yearweekIso(col("o_orderdate")).cast("bigint").as("d_yearweek"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- MySQL week modes 0-3 + week-year specifiers
    // (sql/time.cc calc_week; ref utils/dataconvert/dataconvert.cpp).
    // The oracle re-derives every mode from DuckDB's OWN calendar
    // primitives (dayofweek Sunday=0, isoyear), so this cross-checks
    // the formulas, not just their transcription. ----
    "q_fn_week" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          dateFormat(col("o_orderdate"), "%x-W%v-%U%u%V %X").as("w_fmt"),
          weekMySql(col("o_orderdate"), 0).cast("int").as("w_mode0"),
          weekMySql(col("o_orderdate"), 1).cast("int").as("w_mode1"),
          weekMySql(col("o_orderdate"), 2).cast("int").as("w_mode2"),
          weekMySql(col("o_orderdate"), 3).cast("int").as("w_mode3"),
          sundayWeekYear(col("o_orderdate")).cast("int").as("w_xyear"),
          isoWeekYear(col("o_orderdate")).cast("int").as("w_isoyear"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- sql_mode=ORACLE variants (func_concat_oracle.cpp,
    // func_replace_oracle.cpp, func_ltrim_oracle.cpp,
    // func_decode_oracle.cpp — NULL/empty-string divergences) ----
    "q_fn_oracle" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .select(
          col("c_custkey"),
          concatOracle(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-"),
            col("c_name")).as("o_concat"),
          replaceOracle(col("c_name"), lit("Customer"), lit("Cust")).as("o_repl"),
          replaceOracle(col("c_name"), lit(null).cast("string"), lit("Z")).as("o_repl_null"),
          trimOracle(when(col("c_custkey") % 10 === 0, lit("   "))
            .otherwise(concat(lit("  "), col("c_mktsegment"), lit(" ")))).as("o_trim"),
          ltrimOracle(concat(lit("  "), col("c_mktsegment"))).as("o_ltrim"),
          rtrimOracle(when(col("c_custkey") % 10 === 0, lit("  "))
            .otherwise(concat(col("c_mktsegment"), lit("  ")))).as("o_rtrim"),
          decodeOracle(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit(null).cast("string"), lit("was-building"),
            lit("MACHINERY"), lit("mach"),
            lit("other")).as("o_decode"))
        .orderBy(col("c_custkey"))
    }),

    // ---- control flow / null handling (func_case.cpp, func_if.cpp,
    // func_ifnull.cpp, func_coalesce.cpp, func_greatest.cpp, ...) ----
    "q_fn_ctrl" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          "CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS c_case",
          "if(o_orderstatus = 'F', 'done', 'open') AS c_if",
          "ifnull(nullif(o_orderstatus, 'P'), 'PENDING') AS c_ifnull",
          "coalesce(nullif(o_orderpriority, '5-LOW'), nullif(o_orderstatus, 'O'), 'both-null') AS c_coalesce",
          "greatest(o_totalprice, 150000.0) AS c_greatest",
          "least(o_totalprice, 150000.0) AS c_least",
          "cast(nullif(o_orderstatus, 'P') IS NULL AS INT) AS c_isnull",
          "nullif(o_orderstatus, 'F') AS c_nullif")
        .orderBy(col("o_orderkey"))
    }),

    // ---- regexp family (func_regexp.cpp; PCRE in the reference,
    // Java regex here, RE2 in DuckDB — patterns kept in the common
    // subset) ----
    "q_fn_regexp" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .selectExpr(
          "c_custkey",
          "cast(c_name rlike '^Customer#[0-9]+$' AS INT) AS r_match",
          "regexp_extract(c_name, '([0-9]+)', 1) AS r_extract",
          "regexp_replace(c_name, '[0-9]', '#') AS r_replace",
          "cast(regexp_count(c_name, '0') AS INT) AS r_count",
          "regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS r_word")
        .orderBy(col("c_custkey"))
    }),

    // ---- registry tail: regexp_instr/regexp_substr, SUBTIME,
    // octet_length, IS [NOT] TRUE (func_regexp.cpp instr/substr
    // entries, func_add_time.cpp sign path, funcexp.cpp
    // istrue/isnottrue; MySQL ENCODE/DECODE obfuscation crypto is
    // deliberately NOT cloned — deprecated upstream, keystream is
    // implementation-defined) ----
    "q_fn_regexp2" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .selectExpr(
          "c_custkey",
          "cast(regexp_instr(c_name, '[0-9]+') AS INT) AS r2_instr",
          "regexp_substr(c_name, '[0-9]+') AS r2_substr",
          "cast(octet_length(concat(c_mktsegment, 'é')) AS INT) AS r2_octets",
          "cast((c_custkey > 250) IS TRUE AS INT) AS r2_istrue",
          "cast((c_custkey > 250) IS NOT TRUE AS INT) AS r2_isnottrue")
        .select(col("*"),
          subTime(lit("10:30:00"), secToTime(col("c_custkey") % 86400)).as("r2_subtime"),
          subTime(secToTime(col("c_custkey") % 60), lit("00:00:30")).as("r2_subtime_neg"))
        .orderBy(col("c_custkey"))
    }),

    // ---- bitwise family (func_bitwise.cpp) ----
    "q_fn_bitwise" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          "o_orderkey & 255 AS b_and",
          "o_orderkey | 4096 AS b_or",
          "o_orderkey ^ 255 AS b_xor",
          "shiftleft(o_orderkey % 16, 3) AS b_shl",
          "shiftright(o_orderkey, 2) AS b_shr",
          "~o_orderkey AS b_not",
          "cast(bit_count(o_orderkey) AS INT) AS b_cnt")
        .orderBy(col("o_orderkey"))
    }),

    // ---- cast family, incl. MySQL lenient semantics (func_cast.cpp) ----
    "q_fn_cast" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .selectExpr(
          "o_orderkey",
          "cast(cast(o_totalprice AS DECIMAL(18,2)) AS STRING) AS t_decstr",
          "cast(o_orderkey AS DOUBLE) AS t_dbl",
          "cast('42' AS BIGINT) AS t_strint",
          "cast('3.9' AS DOUBLE) AS t_strdbl",
          "cast(o_orderdate AS DATE) AS t_date",
          "cast(cast(o_orderdate AS DATE) AS STRING) AS t_datestr",
          "cast(o_totalprice > 100000 AS INT) AS t_boolint",
          "o_orderstatus", "o_totalprice")
        .select(col("*"),
          castSigned(concat(lit("9"), col("o_orderstatus"))).as("t_lenient"),
          castSignedRound(col("o_totalprice") / 1000).as("t_mysqlround"))
        .drop("o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderkey"))
    }),
    // TIME-range saturation: SEC_TO_TIME and TIME arithmetic clamp at
    // ±838:59:59 (MySQL TIME bound; ref dataconvert.h limits) — the
    // seconds ramp spans ±3.5M so both clamp branches and the
    // in-range path are exercised, and the roundtrip pins that
    // TIME_TO_SEC sees the SATURATED value.
    "q_fn_timesat" -> ((s, dir) => {
      import graft.functions.MySqlFunctions._
      val o = t(s, dir, "orders")
      val sec = (col("o_orderkey") * 13 % 7000000) - lit(3500000L)
      o.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          secToTime(sec).as("t_sat"),
          timeToSec(secToTime(sec)).as("t_roundtrip"),
          addTime(secToTime(sec), lit("72:30:15")).as("t_addsat"),
          secToTime(lit(3020399L)).as("t_max"),
          secToTime(lit(-3020400L)).as("t_minclamp"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_week" ->
      """SELECT o_orderkey,
        |  (CAST(w_isoyear AS VARCHAR) || '-W' || lpad(CAST(w_mode3 AS VARCHAR), 2, '0') || '-' ||
        |   lpad(CAST(w_mode0 AS VARCHAR), 2, '0') || lpad(CAST(w_mode1 AS VARCHAR), 2, '0') ||
        |   lpad(CAST(w_mode2 AS VARCHAR), 2, '0') || ' ' || CAST(w_xyear AS VARCHAR)) AS w_fmt,
        |  CAST(w_mode0 AS INT) AS w_mode0, CAST(w_mode1 AS INT) AS w_mode1,
        |  CAST(w_mode2 AS INT) AS w_mode2, CAST(w_mode3 AS INT) AS w_mode3,
        |  CAST(w_xyear AS INT) AS w_xyear, CAST(w_isoyear AS INT) AS w_isoyear
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN doy0 < offs THEN 0 ELSE (doy0 - offs) // 7 + 1 END AS w_mode0,
        |    (doy0 + dowmon) // 7 + CASE WHEN dowmon <= 3 THEN 1 ELSE 0 END AS w_mode1,
        |    CASE WHEN doy0 < offs
        |      THEN (CASE WHEN pdoy0 < poffs THEN 0 ELSE (pdoy0 - poffs) // 7 + 1 END)
        |      ELSE (doy0 - offs) // 7 + 1 END AS w_mode2,
        |    weekofyear(d) AS w_mode3,
        |    CASE WHEN doy0 < offs THEN year(d) - 1 ELSE year(d) END AS w_xyear,
        |    isoyear(d) AS w_isoyear
        |  FROM (
        |    SELECT o_orderkey, d, dayofyear(d) - 1 AS doy0,
        |      (7 - dayofweek(date_trunc('year', d))) % 7 AS offs,
        |      (dayofweek(date_trunc('year', d)) + 6) % 7 AS dowmon,
        |      dayofyear(date_trunc('year', d) - 1) - 1 AS pdoy0,
        |      (7 - dayofweek(date_trunc('year', date_trunc('year', d) - 1))) % 7 AS poffs
        |    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |          FROM orders WHERE o_orderkey < 500)))
        |ORDER BY o_orderkey""".stripMargin,
    "q_fn_oracle" ->
      """SELECT c_custkey,
        |  concat(nullif(c_mktsegment, 'BUILDING'), '-', c_name) AS o_concat,
        |  replace(c_name, 'Customer', 'Cust') AS o_repl,
        |  c_name AS o_repl_null,
        |  nullif(trim(CASE WHEN c_custkey % 10 = 0 THEN '   '
        |    ELSE '  ' || c_mktsegment || ' ' END), '') AS o_trim,
        |  nullif(ltrim('  ' || c_mktsegment), '') AS o_ltrim,
        |  nullif(rtrim(CASE WHEN c_custkey % 10 = 0 THEN '  '
        |    ELSE c_mktsegment || '  ' END), '') AS o_rtrim,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL THEN 'was-building'
        |       WHEN nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY' THEN 'mach'
        |       ELSE 'other' END AS o_decode
        |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin,
    "q_fn_string" ->
      """SELECT p_partkey,
        |  p_name || '|' || p_brand AS c_concat,
        |  concat_ws('-', p_brand, p_type) AS c_cws,
        |  upper(p_name) AS c_upper, lower(p_brand) AS c_lower,
        |  CAST(length(p_name) AS INT) AS c_len,
        |  substring(p_name, 2, 5) AS c_substr,
        |  lpad(p_brand, 12, '*') AS c_lpad, rpad(p_brand, 12, '#') AS c_rpad,
        |  trim('  ' || p_type || ' ') AS c_trim,
        |  ltrim('  ' || p_type) AS c_ltrim, rtrim(p_type || '  ') AS c_rtrim,
        |  replace(p_name, ' ', '_') AS c_repl,
        |  reverse(p_type) AS c_rev,
        |  left(p_name, 4) AS c_left, right(p_name, 3) AS c_right,
        |  repeat(p_brand, 2) AS c_rept,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS c_instr,
        |  CAST(ascii(p_type) AS INT) AS c_ascii,
        |  chr(65 + CAST(p_partkey % 26 AS INT)) AS c_chr,
        |  md5(p_name) AS c_md5,
        |  sha256(p_name) AS c_sha,
        |  hex(p_partkey) AS c_hex
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "q_fn_base64" ->
      """SELECT p_partkey,
        |  to_base64(encode(substring(p_name, 1, 40))) AS b64,
        |  to_base64(encode(substring(p_name, 1,
        |    CAST(p_partkey % 3 + 1 AS INT)))) AS b64_pad,
        |  CAST(from_base64(to_base64(encode(substring(p_name, 1, 40))))
        |    AS VARCHAR) AS rt,
        |  to_base64(unhex(lpad(to_hex(p_partkey * 2654435761), 16, '0')))
        |    AS b64_bin
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "q_fn_string2" ->
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS c_si1,
        |  split_part(p_name, ' ', -1) AS c_si2,
        |  (['alpha','beta','gamma'])[1 + CAST(p_partkey % 3 AS INT)] AS c_elt,
        |  CAST(COALESCE(list_position(string_split('SMALL,MEDIUM,LARGE,PROMO', ','), p_type), 0) AS INT) AS c_fis,
        |  repeat(' ', 3) || p_type AS c_space,
        |  '''' || replace(replace(p_name, '\', '\\'), '''', '\''') || '''' AS c_quote,
        |  CASE WHEN 2 < 1 OR 2 > length(p_name) THEN p_name
        |       ELSE left(p_name, 1) || 'XY' || substring(p_name, 5) END AS c_ins,
        |  CAST(COALESCE(CAST(NULLIF(regexp_extract('  12' || p_type, '^\s*[+-]?[0-9]+'), '') AS BIGINT), 0) AS BIGINT) AS c_castsig
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "q_fn_unicode" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    'Cafe' || chr(769) || ' A' || chr(778) || ' ' || substr(text, 1, 40) AS mixed
        |  FROM documents)
        |SELECT doc_id,
        |  nfc_normalize(mixed) AS nfc_text,
        |  CAST(length(mixed) AS INT) AS len_raw,
        |  CAST(length(nfc_normalize(mixed)) AS INT) AS len_nfc,
        |  lower('CAFE' || chr(769)) AS lower_acc
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/docs/' || doc_id
        |    || '?ref=' || lang || '&v=2#sec' AS url,
        |  source || '.example.com' AS host,
        |  '/docs/' || doc_id AS path,
        |  'ref=' || lang || '&v=2' AS query,
        |  lang AS ref,
        |  'sec' AS frag,
        |  'https' AS proto,
        |  'example.com' AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fn_math" ->
      """SELECT o_orderkey,
        |  abs(o_totalprice - 150000.0) AS m_abs,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS m_ceil,
        |  CAST(floor(o_totalprice) AS BIGINT) AS m_floor,
        |  o_orderkey % 7 AS m_mod,
        |  CAST(pow(2, o_orderkey % 10) AS DOUBLE) AS m_pow,
        |  round(exp(o_totalprice / 100000.0), 6) AS m_exp,
        |  round(ln(o_totalprice), 6) AS m_ln,
        |  round(log10(o_totalprice), 6) AS m_log10,
        |  round(log2(o_totalprice), 6) AS m_log2,
        |  round(sqrt(o_totalprice), 6) AS m_sqrt,
        |  CAST(sign(o_totalprice - 150000.0) AS INT) AS m_sign,
        |  round(sin(o_orderkey % 10), 6) AS m_sin,
        |  round(cos(o_orderkey % 10), 6) AS m_cos,
        |  round(atan2(o_totalprice, 1000.0), 6) AS m_atan2,
        |  round(tan(o_orderkey % 10), 6) AS m_tan,
        |  round(atan(o_orderkey % 10), 6) AS m_atan,
        |  round(cot(1 + o_orderkey % 7), 6) AS m_cot,
        |  round(degrees(1.0), 6) AS m_deg,
        |  round(radians(180.0), 6) AS m_rad,
        |  round(pi(), 6) AS m_pi,
        |  CAST(trunc(o_totalprice * 10) AS BIGINT) / 10.0 AS m_trunc1
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS d_year,
        |  CAST(quarter(o_orderdate) AS INT) AS d_quarter,
        |  CAST(month(o_orderdate) AS INT) AS d_month,
        |  CAST(day(o_orderdate) AS INT) AS d_day,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS d_dow,
        |  CAST(dayofyear(o_orderdate) AS INT) AS d_doy,
        |  CAST(weekofyear(o_orderdate) AS INT) AS d_week,
        |  last_day(CAST(o_orderdate AS DATE)) AS d_lastday,
        |  o_orderdate + INTERVAL 3 MONTH AS d_add3m,
        |  o_orderdate - INTERVAL 45 DAY AS d_sub45d,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS d_diff,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS d_trunc,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS d_epoch,
        |  epoch_ms(CAST(epoch(o_orderdate) AS BIGINT) * 1000 + 500) AS d_frommillis,
        |  CAST(o_orderdate AS DATE) AS d_date
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_date2" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_fmt1,
        |  strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS d_fmt2,
        |  strftime(o_orderdate, '%A %B %-d, %Y') AS d_fmt3,
        |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP) AS d_parse,
        |  ((1996 * 12 + 11 - 1 + o_orderkey % 5) // 12) * 100 + ((1996 * 12 + 11 - 1 + o_orderkey % 5) % 12) + 1 AS d_padd,
        |  (1997 * 12 + 3 - 1) - ((199611 + o_orderkey % 5) // 100 * 12 + (199611 + o_orderkey % 5) % 100 - 1) AS d_pdiff,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 719528 AS d_todays,
        |  DATE '1970-01-01' + CAST(730000 + o_orderkey % 100 - 719528 AS INT) AS d_fromdays,
        |  printf('%02d:%02d:%02d', (o_orderkey % 90000) // 3600,
        |         ((o_orderkey % 90000) % 3600) // 60, (o_orderkey % 90000) % 60) AS d_sectime,
        |  o_orderkey % 90000 AS d_roundtrip,
        |  make_date(CAST(1996 + o_orderkey % 3 AS INT), 1, 1) + CAST(o_orderkey % 365 AS INT) AS d_makedate,
        |  isoyear(CAST(o_orderdate AS DATE)) * 100 + weekofyear(o_orderdate) AS d_yearweek
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_ctrl" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS c_case,
        |  if(o_orderstatus = 'F', 'done', 'open') AS c_if,
        |  ifnull(nullif(o_orderstatus, 'P'), 'PENDING') AS c_ifnull,
        |  coalesce(nullif(o_orderpriority, '5-LOW'), nullif(o_orderstatus, 'O'), 'both-null') AS c_coalesce,
        |  greatest(o_totalprice, 150000.0) AS c_greatest,
        |  least(o_totalprice, 150000.0) AS c_least,
        |  CAST(nullif(o_orderstatus, 'P') IS NULL AS INT) AS c_isnull,
        |  nullif(o_orderstatus, 'F') AS c_nullif
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_regexp" ->
      """SELECT c_custkey,
        |  CAST(regexp_matches(c_name, '^Customer#[0-9]+$') AS INT) AS r_match,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS r_extract,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS r_replace,
        |  CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS r_count,
        |  regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS r_word
        |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin,
    // r2_instr re-derived from DuckDB primitives: strpos of the
    // matched text — equal to the match position on this corpus
    // (digits in c_name occur only at the match site)
    "q_fn_regexp2" ->
      """SELECT c_custkey,
        |  CAST(strpos(c_name, regexp_extract(c_name, '[0-9]+')) AS INT) AS r2_instr,
        |  regexp_extract(c_name, '[0-9]+') AS r2_substr,
        |  CAST(strlen(c_mktsegment || 'é') AS INT) AS r2_octets,
        |  CAST(c_custkey > 250 AS INT) AS r2_istrue,
        |  CAST(NOT (c_custkey > 250) AS INT) AS r2_isnottrue,
        |  printf('%02d:%02d:%02d', (37800 - sec) // 3600,
        |    ((37800 - sec) % 3600) // 60, (37800 - sec) % 60) AS r2_subtime,
        |  CASE WHEN (c_custkey % 60) - 30 < 0 THEN '-' ELSE '' END ||
        |    printf('%02d:%02d:%02d', abs((c_custkey % 60) - 30) // 3600,
        |      (abs((c_custkey % 60) - 30) % 3600) // 60,
        |      abs((c_custkey % 60) - 30) % 60) AS r2_subtime_neg
        |FROM (SELECT *, c_custkey % 86400 AS sec FROM customer WHERE c_custkey < 500)
        |ORDER BY c_custkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4096 AS b_or,
        |  xor(o_orderkey, 255) AS b_xor,
        |  (o_orderkey % 16) << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  ~o_orderkey AS b_not,
        |  CAST(bit_count(o_orderkey) AS INT) AS b_cnt
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_cast" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS t_decstr,
        |  CAST(o_orderkey AS DOUBLE) AS t_dbl,
        |  CAST('42' AS BIGINT) AS t_strint,
        |  CAST('3.9' AS DOUBLE) AS t_strdbl,
        |  CAST(o_orderdate AS DATE) AS t_date,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS t_datestr,
        |  CAST(o_totalprice > 100000 AS INT) AS t_boolint,
        |  CAST(COALESCE(CAST(NULLIF(regexp_extract('9' || o_orderstatus, '^\s*[+-]?[0-9]+'), '') AS BIGINT), 0) AS BIGINT) AS t_lenient,
        |  CAST(CASE WHEN o_totalprice / 1000 >= 0 THEN floor(o_totalprice / 1000 + 0.5)
        |            ELSE ceil(o_totalprice / 1000 - 0.5) END AS BIGINT) AS t_mysqlround
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_timesat" ->
      """WITH b AS (SELECT o_orderkey,
        |    (o_orderkey * 13 % 7000000) - 3500000 AS sec
        |  FROM orders WHERE o_orderkey < 2000),
        |c AS (SELECT o_orderkey,
        |    CASE WHEN sec > 3020399 THEN 3020399
        |         WHEN sec < -3020399 THEN -3020399 ELSE sec END AS cs FROM b),
        |d AS (SELECT *, CASE WHEN cs + 261015 > 3020399 THEN 3020399
        |         ELSE cs + 261015 END AS asum FROM c)
        |SELECT o_orderkey,
        |  CASE WHEN cs < 0 THEN '-' ELSE '' END ||
        |    printf('%02d:%02d:%02d', abs(cs) // 3600,
        |      (abs(cs) % 3600) // 60, abs(cs) % 60) AS t_sat,
        |  cs AS t_roundtrip,
        |  CASE WHEN asum < 0 THEN '-' ELSE '' END ||
        |    printf('%02d:%02d:%02d', abs(asum) // 3600,
        |      (abs(asum) % 3600) // 60, abs(asum) % 60) AS t_addsat,
        |  '838:59:59' AS t_max,
        |  '-838:59:59' AS t_minclamp
        |FROM d ORDER BY o_orderkey""".stripMargin
  )
}
