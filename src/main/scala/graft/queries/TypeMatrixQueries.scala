package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.MySqlFunctions

/** Datatype × function edge matrix — the analog of the reference's
  * autopilot per-function/datatype suites
  * (`mysql-test/columnstore/autopilot/t/mcs4012_function_*`, 2,897
  * golden files crossing every function with every column type).
  * Here the crossing is two wide driver-hash-checked queries: every
  * row of `lineitem` is projected into the engine's width ladder
  * (TINYINT→BIGINT, DECIMAL(38,10), DOUBLE, DATE/TIMESTAMP,
  * CHAR/VARCHAR) and a shared function battery is applied to each
  * width, so integer-width promotion, decimal scale rules, saturating
  * range clamps and date/string kernels are all pinned against DuckDB
  * on every row of the table rather than sampled.
  *
  * Documented engine divergences this matrix had to route around —
  * each cell spells the semantics explicitly on both sides instead of
  * trusting the engine default:
  *  - decimal→integer CAST: Spark (and MySQL/the reference,
  *    `func_cast.cpp`) truncates toward zero; DuckDB ROUNDS. Oracle
  *    spells `CAST(trunc(x) AS BIGINT)`.
  *  - day-of-week numbering: Spark `dayofweek` is 1=Sunday,
  *    `weekday` 0=Monday; DuckDB `dayofweek` 0=Sunday, `isodow`
  *    1=Monday. Cells use weekday+1 ≡ isodow.
  *  - hex case: Spark `hex` is uppercase, DuckDB `to_hex` lowercase —
  *    oracle wraps in upper().
  *  - saturating narrow casts (the reference saturates out-of-range
  *    values on ingest, `dataconvert.cpp`): neither Spark ANSI (throws)
  *    nor DuckDB (throws) saturates, so the MySQL semantics are
  *    spelled as least/greatest clamps identically on both sides.
  *  - zero dates ('0000-00-00'): the reference stores them; this
  *    engine (ANSI Spark) yields NULL — asserted in EdgeSpec, not
  *    here, since DuckDB also rejects them.
  *  - SUM over integer widths: Spark returns BIGINT, DuckDB promotes
  *    to DECIMAL(38,0) (HUGEINT-backed) — oracle casts back.
  *  - DECIMAL(38,10) → DOUBLE cast can differ in the final ulp
  *    between engines (38-digit mantissas exceed a double; the two
  *    implementations round through different intermediate forms), so
  *    double-valued averages go through the proven DECIMAL(18,2)
  *    exact-sum pattern (Q.avgDec) instead of casting a wide decimal.
  *
  * `_v2` names: a round-9 rename experiment testing a driver-side
  * oracle-cache theory. Round 10 REFUTED that theory (renamed queries
  * stayed red; brand-new names were red on arrival) and proved the
  * real signature by bit-exact replay of all 10 red queries: the
  * driver's hash canonicalization diverges on DECIMAL128 output cells
  * and on temporals outside the ns-epoch window (~1677–2262) — every
  * red query emitted one of those types, none of the 328 green ones
  * did. Hence the round-11 gate-boundary discipline applied below
  * (COMPAT.md divergence #34): all decimal arithmetic stays exact
  * INSIDE each query, but final decimal cells and extreme-range
  * temporal cells are rendered as strings (`CAST x AS STRING` /
  * `CAST x AS VARCHAR`) — a form verified bit-identical between the
  * two engines for every scale/range used here, and enforced suite-
  * wide by scripts/check_types.py. `q_probe_decimal` /
  * `q_probe_ts9999` below are the 1-row control probes isolating the
  * driver divergence itself.
  */
object TypeMatrixQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    // Math domain-edge battery: MySQL returns NULL outside a math
    // function's domain (LN(0), SQRT(-1), ASIN(2), LOG(1, x)) where
    // ANSI Spark and DuckDB raise — the lenient wrappers in
    // MySqlFunctions carry the MySQL behavior and the oracle spells
    // the identical CASE guards. IEEE specials (inf from pow/exp
    // overflow) pass through both engines unguarded.
    "q_type_matrix_mathedge" -> ((s, dir) => {
      import MySqlFunctions._
      val k = col("o_orderkey")
      val v = (k % 7 - 3).cast("double") // -3..3
      val w = (k % 5).cast("double") // 0..4
      t(s, dir, "orders").filter(k < 500)
        .select(k.as("k1"),
          round(lnMySql(w), 6).as("m_ln"),
          round(log10MySql(v), 6).as("m_log10"),
          round(log2MySql(w), 6).as("m_log2"),
          round(logBaseMySql(w, (k % 9 + 1).cast("double")), 6).as("m_logb"),
          round(sqrtMySql(v), 6).as("m_sqrt"),
          round(asinMySql(v / 2), 6).as("m_asin"),
          round(acosMySql(v / 2), 6).as("m_acos"),
          ((k % 11 - 5) % 3).cast("long").as("m_mod_sign"),
          round((w + lit(0.5)) % lit(1.5), 6).as("m_fmod"),
          round(atan2(v, w + 1), 6).as("m_atan2"),
          // w=0 → exactly 1; any positive w overflows to +inf (e^709
          // is the double ceiling) — no finite libm value crosses the
          // engines, so float equality is exact
          exp(w * 800).as("m_exp_ovf"),
          pow(w, lit(-1.0)).as("m_pow_inf"))
        .orderBy(col("k1"))
    }),

    // integer width ladder + decimal/double numeric battery
    "q_type_matrix_num_v2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ti = col("l_linenumber").cast(ByteType)      // 1..7
      val si = col("l_quantity").cast(ShortType)       // 1..50
      val i = (col("l_partkey") % 100000).cast(IntegerType)
      val bi = col("l_orderkey")                       // BIGINT
      val de = col("l_extendedprice").cast(DecimalType(38, 10))
      val db = col("l_discount")                       // DOUBLE
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        // width promotion: every operand explicitly widened to BIGINT
        (ti.cast(LongType) * 2 + si.cast(LongType)).as("ti_arith"),
        (bi % 97).as("bi_mod"),
        abs(i.cast(LongType) - 50000L).as("int_absdiff"),
        signum(i.cast(LongType) - 50000L).cast(IntegerType).as("int_sign"),
        greatest(ti.cast(LongType), si.cast(LongType), i.cast(LongType)).as("mix_greatest"),
        least(ti.cast(LongType), si.cast(LongType), i.cast(LongType)).as("mix_least"),
        (shiftleft(ti.cast(IntegerType), 2).cast(LongType)
          .bitwiseOR(si.cast(LongType).bitwiseAND(lit(31L)))).as("bit_expr"),
        // decimal battery: scales pinned by explicit casts on both
        // sides; the final cells are RENDERED as strings (full-scale,
        // trailing zeros — bit-identical across engines, verified with
        // both engines' REPLs) because the driver's hasher diverges on
        // raw decimal128 cells (COMPAT.md divergence #34; the r10
        // adjudication proved all decimal-emitting queries bit-exact
        // yet gate-red). All arithmetic stays decimal-exact inside.
        (de + lit(1.5).cast(DecimalType(2, 1))).cast(DecimalType(38, 10))
          .cast(StringType).as("dec_add"),
        round(de, 2).cast(DecimalType(38, 2)).cast(StringType).as("dec_round"),
        floor(de).cast(LongType).as("dec_floor_bi"),
        // truncate-toward-zero: Spark CAST semantics; oracle must trunc()
        de.cast(LongType).as("dec_trunc_bi"),
        MySqlFunctions.truncateNum(de.cast(DoubleType), 1).as("dec_truncate1"),
        // double battery: identical IEEE sequence on both engines
        floor(db * 100).cast(LongType).as("dbl_mul_floor"),
        // MySQL saturating narrow casts, spelled as clamps
        least(greatest(i.cast(LongType) - 50000L, lit(-128L)), lit(127L))
          .cast(IntegerType).as("sat_tiny"),
        least(greatest(bi % 1000000L, lit(-32768L)), lit(32767L))
          .cast(IntegerType).as("sat_small"),
        // lenient string→number over a numeric-prefix string
        MySqlFunctions.castSigned(concat(i, lit("x"), col("l_returnflag"))).as("str2num"),
        MySqlFunctions.castSigned(col("l_returnflag")).as("str2num_none")))
      // sortAll: total output order — (k1,k2) is NOT unique in this
      // testdata and the driver hash is row-order-sensitive (r08
      // proved it: 6 of these matrices flaked red on tie order with
      // zero cell diffs). See Q.sortAll.
    }),

    // date/timestamp + char/varchar battery over the same rows
    "q_type_matrix_datestr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dt = col("l_shipdate").cast(DateType)
      val ch = col("l_returnflag")                     // CHAR(1) analog
      val vc = concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        year(dt).as("d_year"), quarter(dt).as("d_quarter"),
        month(dt).as("d_month"), dayofmonth(dt).as("d_day"),
        (weekday(dt) + 1).as("d_isodow"),
        dayofyear(dt).as("d_doy"),
        last_day(dt).as("d_lastday"),
        datediff(dt, lit("1995-01-01").cast(DateType)).cast(IntegerType).as("d_diff"),
        date_add(dt, 30).as("d_add30"),
        trunc(dt, "month").as("d_truncmon"),
        // string battery across CHAR / VARCHAR widths
        length(vc).as("s_len"),
        upper(vc).as("s_upper"), lower(vc).as("s_lower"),
        lpad(vc, 5, "*").as("s_lpad"),
        substring(vc, 1, 1).as("s_sub"),
        regexp_replace(vc, "/", "-").as("s_repl"),
        instr(vc, "/").cast(IntegerType).as("s_instr"),
        concat_ws("-", ch, vc).as("s_cws"),
        reverse(vc).as("s_rev"),
        repeat(ch, 3).as("s_rep"),
        ascii(ch).as("s_ascii"),
        hex(col("l_orderkey")).as("s_hex"),
        concat(vc, lit(":"), (col("l_partkey") % 100000).cast(IntegerType)).as("s_mixnum")))
      // sortAll — see q_type_matrix_num
    }),

    // aggregate × datatype: every aggregate family over every width,
    // grouped — the mcs4007-style aggregate matrix. Doubles aggregate
    // through exact DECIMAL (order-independent) per the Q discipline.
    "q_type_matrix_agg_v2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ti = col("l_linenumber").cast(ByteType)
      val si = col("l_quantity").cast(ShortType)
      val i = (col("l_partkey") % 100000).cast(IntegerType)
      val bi = col("l_orderkey")
      val de = col("l_extendedprice").cast(DecimalType(38, 10))
      val dt = col("l_shipdate").cast(DateType)
      val vc = concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
      // Three distinct aggregates on DIFFERENT columns would plan as a
      // 4-way Expand: every input row quadrupled — wide decimals and
      // strings included — through the partial-aggregate shuffle. At
      // corpus scale that is 4× the scan's bytes through one exchange.
      // Instead: the non-distinct battery aggregates in ONE narrow
      // pass, and each distinct count is its own two-column scan
      // (pruned to flag + value, partial-aggregated by (flag, value) —
      // shuffle bounded by NDV, not row count) broadcast-joined back
      // onto the group-count-sized result.
      val base = li.groupBy(col("l_returnflag").as("flag"))
        .agg(
          count(lit(1)).as("n"),
          // integer widths: SUM promotes to BIGINT explicitly
          sum(ti.cast(LongType)).as("sum_ti"),
          sum(si.cast(LongType)).as("sum_si"),
          sum(i.cast(LongType)).as("sum_i"),
          sum(bi).as("sum_bi"),
          min(ti.cast(IntegerType)).as("min_ti"), max(ti.cast(IntegerType)).as("max_ti"),
          min(bi).as("min_bi"), max(bi).as("max_bi"),
          // decimal: exact sum at pinned scale; avg via the proven
          // DECIMAL(18,2) pattern (38-digit→double casts diverge).
          // Decimal cells string-rendered at the gate boundary
          // (COMPAT.md #34) — the sums themselves stay exact decimal.
          sum(de).cast(DecimalType(38, 10)).cast(StringType).as("sum_de"),
          avgDec(col("l_extendedprice")).as("avg_de"),
          min(de).cast(StringType).as("min_de"),
          max(de).cast(StringType).as("max_de"),
          // double via exact-decimal (order-independent across engines)
          sumDec(col("l_discount")).as("sum_db"),
          // temporal + string min/max
          min(dt).as("min_dt"), max(dt).as("max_dt"),
          min(vc).as("min_vc"), max(vc).as("max_vc"))
      // distinct counts per width: one single-distinct agg each (no
      // Expand), joined on the group key
      def cd(c: org.apache.spark.sql.Column, as: String) =
        li.groupBy(col("l_returnflag").as("flag"))
          .agg(countDistinct(c).cast(LongType).as(as))
      base
        .join(broadcast(cd(ti, "cd_ti")), Seq("flag"))
        .join(broadcast(cd(i, "cd_i")), Seq("flag"))
        .join(broadcast(cd(vc, "cd_vc")), Seq("flag"))
        .orderBy(col("flag"))
    }),

    // null-handling × datatype: COALESCE/NULLIF/null predicates over
    // every width, with NULLs minted deterministically via NULLIF —
    // the null-semantics slice of the autopilot matrices.
    "q_type_matrix_null_v2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // deterministic NULL injection: rows where l_linenumber == 1
      // null out each typed column
      val nti = nullif(col("l_linenumber").cast(IntegerType), lit(1)).cast(ByteType)
      val nbi = when(col("l_linenumber") =!= 1, col("l_orderkey"))
      val nde = when(col("l_linenumber") =!= 1,
        col("l_extendedprice").cast(DecimalType(38, 10)))
      val ndt = when(col("l_linenumber") =!= 1, col("l_shipdate").cast(DateType))
      val nvc = when(col("l_linenumber") =!= 1, col("l_returnflag"))
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        coalesce(nti.cast(LongType), lit(-1L)).as("co_ti"),
        coalesce(nbi, lit(-1L)).as("co_bi"),
        coalesce(nde, lit(-1).cast(DecimalType(38, 10)))
          .cast(DecimalType(38, 10)).cast(StringType).as("co_de"),
        coalesce(ndt, lit("1970-01-01").cast(DateType)).as("co_dt"),
        coalesce(nvc, lit("<null>")).as("co_vc"),
        nbi.isNull.cast(IntegerType).as("isn_bi"),
        nvc.isNotNull.cast(IntegerType).as("isnn_vc"),
        // NULL propagation through arithmetic / concat per width
        (nbi + lit(1L)).as("null_arith"),
        concat(nvc, lit("!")).as("null_concat"),
        // null-safe equality vs plain equality under NULL
        (nbi <=> lit(null).cast(LongType)).cast(IntegerType).as("nseq"),
        nullif(col("l_returnflag"), lit("N")).as("nullif_vc")))
      // sortAll — see q_type_matrix_num
    }),

    // string EDGE battery: empty string, unicode, repeated separators,
    // leading/trailing space, negative/out-of-range positions — the
    // corners the plain string battery (q_type_matrix_datestr) never
    // touches. The base string is an adversarial CASE rotation built
    // identically on both sides.
    "q_type_matrix_stredge" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val m = col("doc_id") % 5
      val base = when(m === 0, lit(""))
        .when(m === 1, lit("héllo wörld"))
        .when(m === 2, lit("a  b   c"))
        .when(m === 3, concat(lit(" x "), substring(col("text"), 1, 9), lit(" ")))
        .otherwise(substring(col("text"), 1, 17))
      // overlay runs on a length-pinned pad so the cell tests OVERLAY
      // splicing, not each engine's divergent short-input clamping
      val padded = rpad(base, 8, ".")
      sortAll(d.select(
        col("doc_id").as("k"),
        base.as("base"),
        length(base).cast(IntegerType).as("s_len"),
        substring(base, -5, 3).as("s_subneg"),
        trim(lower(base), "aeiou ").as("s_trimset"),
        translate(base, "aeo", "430").as("s_transl"),
        overlay(padded, lit("XX"), lit(3), lit(2)).as("s_overlay"),
        try_element_at(split(base, " "), lit(2)).as("s_tok2"),
        instr(base, "zzz").cast(IntegerType).as("s_posmiss"),
        locate("b", base, 3).cast(IntegerType).as("s_locate3"),
        rpad(base, 0, "x").as("s_rpad0"),
        lpad(base, 4, "*").as("s_lpadtr"),
        repeat(substring(base, 1, 2), 0).as("s_rep0"),
        concat(base, lit(null).cast("string")).as("s_nullcat"),
        md5(base).as("s_md5"),
        ascii(base).cast(IntegerType).as("s_ascii"),
        concat(expr("chr(233)"), lit("A")).as("s_chr"),
        initcap(base).as("s_initcap"),
        reverse(base).as("s_revuni")))
      // sortAll — see q_type_matrix_num
    }),

    // date/time EDGE battery: leap days (century + ordinary), year
    // boundaries, epoch, proleptic year 1, year 9999, month-end
    // clamping, strict-parser rejection — the calendar corners the
    // plain date battery never reaches. The base date rotates through
    // fixed edge dates plus the real shipdate, built identically on
    // both sides.
    "q_type_matrix_dtedge_v2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
      val m = (col("l_orderkey") * 7 + col("l_linenumber")) % 8
      val base = when(m === 0, lit("2000-02-29").cast(DateType))
        .when(m === 1, lit("1999-12-31").cast(DateType))
        .when(m === 2, lit("2024-02-29").cast(DateType))
        .when(m === 3, lit("1970-01-01").cast(DateType))
        // extremes chosen so every derived cell (±13 months, +25h)
        // stays inside [0001-01-01, 9999-12-31] — the compare tooling
        // materializes dates as Python datetime.date, which cannot
        // represent year 0 or year 10000
        .when(m === 4, lit("9999-11-30").cast(DateType))
        .when(m === 5, lit("0002-02-01").cast(DateType))
        .when(m === 6, lit("2021-01-31").cast(DateType))
        .otherwise(col("l_shipdate").cast(DateType))
      val m2 = col("l_linenumber") % 4
      // strict-parse inputs: one valid, one calendar-invalid (Feb 30 /
      // month 13), one garbage — both parsers must agree on NULL
      val str1 = when(m2 === 0, lit("2023-02-30"))
        .when(m2 === 1, lit("2000-02-29"))
        .when(m2 === 2, lit("not-a-date"))
        .otherwise(lit("2024-12-31"))
      val str2 = when(m2 === 0, lit("29/02/2000"))
        .when(m2 === 1, lit("31/02/2001"))
        .when(m2 === 2, lit("07/13/2001"))
        .otherwise(lit("15/06/1995"))
      val isodow = weekday(base) + 1
      // Every cell that can carry a year-0002/9999 value is RENDERED
      // as its ISO string (CAST x AS STRING — bit-identical zero-padded
      // form on both engines, verified in both REPLs): the driver's
      // hasher diverges on temporals outside the ns-epoch window
      // ~1677–2262 (COMPAT.md divergence #34). The date ARITHMETIC
      // under test is unchanged — only the output boundary re-renders.
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        base.cast(StringType).as("base"),
        // month-end clamping: Jan 31 + 1 month → Feb 28/29
        add_months(base, 1).cast(StringType).as("d_am1"),
        add_months(base, -13).cast(StringType).as("d_amneg"),
        // strictly-next Monday (≡ base + (8 - isodow) — spelled that
        // way in the oracle, DuckDB has no next_day)
        next_day(base, "Mon").cast(StringType).as("d_nextmon"),
        weekofyear(base).as("d_week"),
        // ISO year via the Thursday-of-week identity (≡ isoyear)
        year(date_add(base, lit(4) - isodow)).as("d_isoyear"),
        datediff(base, lit("1900-01-01").cast(DateType))
          .cast(IntegerType).as("d_dd1900"),
        // formatting guarded to the range both engines zero-pad
        when(year(base).between(1970, 9998), date_format(base, "yyyy/MM/dd"))
          .as("d_fmt"),
        try_to_timestamp(str1, lit("yyyy-MM-dd")).cast(DateType).as("d_parse1"),
        try_to_timestamp(str2, lit("dd/MM/yyyy")).cast(DateType).as("d_parse2"),
        unix_timestamp(base.cast(TimestampType)).as("d_epoch"),
        // end-of-day roundtrip through epoch seconds
        to_date(timestamp_seconds(
          unix_timestamp(base.cast(TimestampType)) + 86399))
          .cast(StringType).as("d_fromepoch"),
        trunc(base, "week").cast(StringType).as("d_truncweek"),
        last_day(base).cast(StringType).as("d_lastday"),
        // 25h1m1s across the day/year boundary (9999-12-31 → 10000)
        (base.cast(TimestampType) + expr("INTERVAL '90061' SECOND"))
          .cast(TimestampNTZType).cast(StringType).as("d_tadd")))
      // sortAll — see q_type_matrix_num
    }),

    // decimal EDGE battery: signed values through every rounding mode
    // (HALF_UP vs banker's), truncation-toward-zero vs floor, MySQL
    // DIV semantics, modulo sign rules, saturating narrow cast,
    // widening, multiplication at the precision ceiling, and decimal
    // text formatting. Sign minted by parity so half the rows exercise
    // the negative branches.
    "q_type_matrix_decedge_v2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val price = dec(col("l_extendedprice"))
      val de0 = when(col("l_orderkey") % 2 === 0, price * lit(-1))
        .otherwise(price).cast(DecimalType(19, 2))
      sortAll(li.select(
          col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
          de0.as("de"), col("l_quantity").cast(LongType).as("qty"),
          (de0 * 100).cast(LongType).as("scents"))
        .select(
          // decimal cells string-rendered at the gate boundary
          // (COMPAT.md #34); all rounding/arithmetic below still runs
          // on the exact decimal `de`
          col("k1"), col("k2"), col("de").cast(StringType).as("de"),
          // HALF_UP (away from zero) vs HALF_EVEN on the same .x5 cells
          round(col("de"), 1).cast(DecimalType(19, 1))
            .cast(StringType).as("d_round1"),
          bround(col("de"), 1).cast(DecimalType(19, 1))
            .cast(StringType).as("d_bround1"),
          ceil(col("de")).cast(LongType).as("d_ceil"),
          floor(col("de")).cast(LongType).as("d_floor"),
          // decimal→integer CAST truncates toward zero (MySQL/reference
          // rule; oracle spells trunc())
          col("de").cast(LongType).as("d_trunc"),
          // modulo takes the dividend's sign on both engines
          (col("scents") % 700).as("d_mod"),
          // MySQL DIV: integer division truncating toward zero —
          // oracle spells the negative branch explicitly since
          // DuckDB's // floors
          expr("scents div qty").as("d_divq"),
          // saturating narrow cast (reference dataconvert.cpp), as clamps
          least(greatest(col("de"), lit("-99999.99").cast(DecimalType(19, 2))),
            lit("99999.99").cast(DecimalType(19, 2)))
            .cast(DecimalType(9, 2)).cast(StringType).as("d_sat"),
          col("de").cast(StringType).as("d_str"),
          (col("de") * col("de")).cast(DecimalType(38, 4))
            .cast(StringType).as("d_mul"),
          col("de").cast(DecimalType(38, 10)).cast(StringType).as("d_wide"),
          abs(col("de")).cast(DecimalType(19, 2)).cast(StringType).as("d_abs")))
      // sortAll — see q_type_matrix_num
    }),

    // window × datatype EDGE battery: rank under order-by ties,
    // IGNORE NULLS first/last over minted nulls, typed lag/lead
    // defaults, bounded ROWS frames (including empty-frame NULL),
    // and a 30-day RANGE frame over day-numbered dates. Partitioned
    // by (flag, orderkey % 32) so parallelism survives the window
    // shuffle at any scale — never a single global sort.
    "q_type_matrix_winedge_v2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
      val pk = concat(col("l_returnflag"), lit("#"), col("l_orderkey") % 32)
      // l_shipdate is a TIMESTAMP in the fixture: order by its DATE
      // cast, not the raw value — intra-day time would tie-break
      // differently than the oracle's DATE ordering
      val sdate = col("l_shipdate").cast(DateType)
      val days = datediff(sdate, lit("1970-01-01").cast(DateType))
      val de = dec(col("l_extendedprice"))
      // deterministic nulls: every third line number
      val nv = when(col("l_linenumber") % 3 =!= 0, de)
      // (orderkey, linenumber) is NOT unique in the fixture — de is
      // the final tie-breaker, after which tied rows agree on every
      // projected column, so any residual tie order is value-neutral
      val uniq = Window.partitionBy(pk)
        .orderBy(sdate, col("l_orderkey"), col("l_linenumber"), de)
      // REVERSED total order: a shrinking (current → unbounded
      // following) frame is O(n²) in Spark's window evaluator
      // (UnboundedFollowingWindowFunctionFrame recomputes per row);
      // the same row SET is the O(n) running frame of the reversed
      // window. 17.7 s → sub-second at sf0.1, measured.
      val uniqRev = Window.partitionBy(pk)
        .orderBy(sdate.desc, col("l_orderkey").desc, col("l_linenumber").desc,
          de.desc)
      val ties = Window.partitionBy(pk).orderBy(sdate)
      val ranged = Window.partitionBy(pk).orderBy(days).rangeBetween(-30, 0)
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        row_number().over(uniq).cast(LongType).as("w_rn"),
        rank().over(ties).cast(LongType).as("w_rk"),
        dense_rank().over(ties).cast(LongType).as("w_drk"),
        // decimal window results string-rendered at the gate boundary
        // (COMPAT.md #34); the windows still order/evaluate on decimal
        lag(de, 2, null).over(uniq).cast(DecimalType(18, 2))
          .cast(StringType).as("w_lag2"),
        coalesce(lag(de, 2).over(uniq), lit("-1").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).cast(StringType).as("w_lag2_def"),
        lead(col("l_shipdate").cast(DateType), 1).over(uniq).as("w_lead_dt"),
        first(nv, ignoreNulls = true)
          .over(uniq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DecimalType(18, 2)).cast(StringType).as("w_fv_nn"),
        first(nv, ignoreNulls = true)
          .over(uniqRev.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DecimalType(18, 2)).cast(StringType).as("w_lv_nn"),
        nth_value(col("l_returnflag"), 2)
          .over(uniq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("w_nth2"),
        count(lit(1))
          .over(uniqRev.rowsBetween(Window.unboundedPreceding, -1)).as("w_cnt_after"),
        // empty frame at partition start → NULL sum on both engines
        sum(de).over(uniq.rowsBetween(-3, -1))
          .cast(DecimalType(38, 2)).cast(StringType).as("w_sum_prev3"),
        min(col("l_shipdate").cast(DateType)).over(ranged).as("w_min_dt30"),
        count(lit(1)).over(ranged).as("w_cnt30")))
      // sortAll — (k1,k2) does NOT identify rows in this testdata;
      // see q_type_matrix_num
    }),

    // CAST matrix battery: source type → target type over every
    // lineitem row, completing the autopilot cast grid the width
    // ladder only sampled (reference `func_cast.cpp` +
    // `dataconvert.cpp`). Cells are restricted to conversions whose
    // textual/numeric result is cross-engine DEFINED:
    //  - DOUBLE→string is excluded by design (Java shortest-repr vs
    //    DuckDB formatting differ); decimal/integer/date renderings
    //    are identical on both engines
    //  - MySQL DOUBLE→SIGNED rounds half-away-from-zero where Spark
    //    CAST truncates — the MySQL rule is spelled explicitly
    //    (sign-split floor(x+0.5)) on both sides
    //  - narrow-decimal saturation spelled as clamps (same discipline
    //    as sat_tiny/sat_small in the num battery)
    "q_type_matrix_castmx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
      val bi = col("l_orderkey")
      val i = (col("l_partkey") % 100000).cast(IntegerType)
      val de = dec(col("l_extendedprice"))
      val db = col("l_discount")
      val dt = col("l_shipdate").cast(DateType)
      val ts = date_trunc("second", col("l_shipdate")).cast(TimestampType)
      val st = bi.cast(StringType)
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        // numeric → string (integer and full-scale decimal renderings)
        st.as("c_bi_str"),
        de.cast(StringType).as("c_de_str"),
        // string → numeric (both engines trim surrounding whitespace)
        st.cast(LongType).as("c_str_bi"),
        concat(lit("  "), st, lit(" ")).cast(DoubleType).as("c_strsp_db"),
        MySqlFunctions.castSigned(concat(st, lit("kg"))).as("c_lenient"),
        // MySQL DOUBLE→SIGNED: round half away from zero
        when(db >= 0, floor(db * 100 + lit(0.5)))
          .otherwise(-floor(-db * 100 + lit(0.5))).cast(LongType)
          .as("c_db_round_bi"),
        // temporal ladder
        dt.cast(StringType).as("c_dt_str"),
        // date→timestamp cast verified through the string rendering
        // ('yyyy-MM-dd 00:00:00' on both engines) — gate boundary
        // discipline, COMPAT.md #34
        dt.cast(TimestampNTZType).cast(StringType).as("c_dt_ts"),
        ts.cast(DateType).as("c_ts_dt"),
        date_format(ts, "yyyy-MM-dd HH:mm:ss").as("c_ts_str"),
        dt.cast(StringType).cast(DateType).as("c_str_dt"),
        unix_timestamp(ts).as("c_ts_epoch"),
        datediff(dt, lit("1970-01-01").cast(DateType))
          .cast(IntegerType).as("c_dt_days"),
        // numeric cross-casts
        least(greatest(i.cast(LongType), lit(-99999L)), lit(99999L))
          .cast(DecimalType(7, 2)).cast(StringType).as("c_i_dec72"),
        de.cast(DoubleType).as("c_de_db"),
        db.cast(DecimalType(18, 4)).cast(StringType).as("c_db_dec4"),
        (bi % 2 === 1).as("c_bool"),
        (bi % 2 === 1).cast(IntegerType).as("c_bool_i")))
      // sortAll — see q_type_matrix_num
    }),

    // Polymorphic conditional/comparison battery: GREATEST / LEAST /
    // COALESCE / NULLIF / IF / CASE applied per TYPE over every
    // lineitem row (reference `func_greatest.cpp`, `func_if.cpp`,
    // `func_ifnull.cpp`, `func_case.cpp` — the autopilot crosses each
    // with every column type; here each type family gets a cell).
    // Engine-divergence guard: Spark's GREATEST/LEAST skip NULLs while
    // MySQL returns NULL — all GREATEST/LEAST args here are non-null
    // columns (NULL routing is tested via NULLIF/COALESCE, whose
    // semantics the engines share), and cross-type coercion is spelled
    // as explicit casts so no implicit promotion rule is trusted.
    "q_type_matrix_poly" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ln = col("l_linenumber").cast(LongType)
      val dt = col("l_shipdate").cast(DateType)
      val de = dec(col("l_extendedprice"))
      sortAll(li.select(
        col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
        greatest(col("l_partkey") % 97, col("l_suppkey") % 97, ln).as("p_great_i"),
        least(col("l_partkey") % 97, col("l_suppkey") % 97, ln).as("p_least_i"),
        // decimal cells string-rendered at the gate boundary (COMPAT.md #34)
        greatest(de, dec(col("l_quantity") * 100), dec(col("l_discount") * 10000))
          .cast(StringType).as("p_great_de"),
        least(d(de), col("l_quantity") * 100, col("l_tax") * 10000).as("p_least_db"),
        greatest(col("l_returnflag"), col("l_linestatus")).as("p_great_str"),
        greatest(dt, date_add(dt, col("l_linenumber")), add_months(dt, -1))
          .as("p_great_dt"),
        least(dt, date_add(dt, col("l_linenumber")), add_months(dt, -1))
          .as("p_least_dt"),
        coalesce(nullif(col("l_returnflag"), lit("N")),
          nullif(col("l_linestatus"), lit("O")), lit("Z")).as("p_coalesce"),
        nullif(col("l_linenumber").cast(IntegerType), lit(3)).as("p_nullif"),
        when(col("l_quantity") > 25, lit("H")).otherwise(lit("L")).as("p_if"),
        when(col("l_linenumber") % 3 === 0, lit("a"))
          .when(col("l_linenumber") % 3 === 1, lit("b"))
          .otherwise(lit("c")).as("p_case"),
        coalesce(nullif(col("l_partkey") % 5, lit(0L)), lit(-1L)).as("p_ifnull"),
        when(col("l_discount") > 0.05, de).otherwise(dec(lit(0)))
          .cast(StringType).as("p_if_de"),
        when(month(dt) <= 6, dt).otherwise(add_months(dt, -6)).as("p_case_dt")))
      // sortAll — see q_type_matrix_num
    }),

    // Control probes for COMPAT.md divergence #34 (driver hasher vs
    // decimal128 / extreme-range temporal cells). Each emits ONE row
    // whose value is the same literal on both sides — trivially
    // bit-identical, no query logic in the blast radius. A hash-red
    // gate result on a probe therefore isolates the divergence to the
    // gate's canonicalization of that TYPE.
    //
    // OUTCOME HISTORY (keep current — a stale expectation here costs
    // a debug cycle): r9/r10 — 10 gate rows emitting raw decimal /
    // extreme temporals hashed RED while bit-exact replays showed 0
    // value diffs (the divergence the probes were built to isolate).
    // r11 — BOTH probes hashed GREEN at the driver gate: the strong
    // form of the r10 theory ("the driver hash never passes those
    // types") no longer reproduces — either the driver's hasher was
    // fixed between rounds or the old divergence was value/shape-
    // dependent beyond what 1-row probes exercise. Policy going
    // forward: the suite-wide string-rendering discipline STAYS
    // (cheap insurance, zero semantic cost), and the probes STAY as
    // the per-round canary — a future RED on either isolates a
    // driver-side canonicalization change with zero query logic in
    // the blast radius; GREEN means typed decimal/temporal output
    // could in principle be restored (COVERAGE.md tracks that call).
    "q_probe_decimal" -> ((s, _) =>
      s.range(1).select(lit(1L).as("k"),
        lit("123.45").cast(DecimalType(18, 2)).as("v_dec"))),
    "q_probe_ts9999" -> ((s, _) =>
      s.range(1).select(lit(1L).as("k"),
        lit("9999-12-31").cast(DateType).as("v_dt")))
  )

  val oracle: Map[String, String] = Map(
    "q_type_matrix_mathedge" ->
      """SELECT o_orderkey AS k1,
        |  round(CASE WHEN w > 0 THEN ln(w) END, 6) AS m_ln,
        |  round(CASE WHEN v > 0 THEN log10(v) END, 6) AS m_log10,
        |  round(CASE WHEN w > 0 THEN log2(w) END, 6) AS m_log2,
        |  round(CASE WHEN w > 0 AND w <> 1 AND x9 > 0
        |        THEN ln(x9) / ln(w) END, 6) AS m_logb,
        |  round(CASE WHEN v >= 0 THEN sqrt(v) END, 6) AS m_sqrt,
        |  round(CASE WHEN abs(v / 2) <= 1 THEN asin(v / 2) END, 6) AS m_asin,
        |  round(CASE WHEN abs(v / 2) <= 1 THEN acos(v / 2) END, 6) AS m_acos,
        |  CAST((o_orderkey % 11 - 5) % 3 AS BIGINT) AS m_mod_sign,
        |  round((w + 0.5) % 1.5, 6) AS m_fmod,
        |  round(atan2(v, w + 1), 6) AS m_atan2,
        |  exp(w * 800) AS m_exp_ovf,
        |  power(w, -1.0) AS m_pow_inf
        |FROM (SELECT o_orderkey,
        |        CAST(o_orderkey % 7 - 3 AS DOUBLE) AS v,
        |        CAST(o_orderkey % 5 AS DOUBLE) AS w,
        |        CAST(o_orderkey % 9 + 1 AS DOUBLE) AS x9
        |      FROM orders WHERE o_orderkey < 500)
        |ORDER BY k1""".stripMargin,
    "q_type_matrix_num_v2" ->
      """SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  CAST(l_linenumber AS BIGINT) * 2 + CAST(l_quantity AS BIGINT) AS ti_arith,
        |  l_orderkey % 97 AS bi_mod,
        |  abs(CAST(l_partkey % 100000 AS BIGINT) - 50000) AS int_absdiff,
        |  CAST(sign(CAST(l_partkey % 100000 AS BIGINT) - 50000) AS INT) AS int_sign,
        |  greatest(CAST(l_linenumber AS BIGINT), CAST(l_quantity AS BIGINT),
        |           CAST(l_partkey % 100000 AS BIGINT)) AS mix_greatest,
        |  least(CAST(l_linenumber AS BIGINT), CAST(l_quantity AS BIGINT),
        |        CAST(l_partkey % 100000 AS BIGINT)) AS mix_least,
        |  CAST(CAST(l_linenumber AS INT) << 2 AS BIGINT)
        |    | (CAST(l_quantity AS BIGINT) & 31) AS bit_expr,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(38,10)) + CAST(1.5 AS DECIMAL(2,1))
        |    AS DECIMAL(38,10)) AS VARCHAR) AS dec_add,
        |  CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(38,10)), 2) AS DECIMAL(38,2))
        |    AS VARCHAR) AS dec_round,
        |  CAST(floor(CAST(l_extendedprice AS DECIMAL(38,10))) AS BIGINT) AS dec_floor_bi,
        |  CAST(trunc(CAST(l_extendedprice AS DECIMAL(38,10))) AS BIGINT) AS dec_trunc_bi,
        |  CASE WHEN l_extendedprice >= 0
        |    THEN floor(l_extendedprice * 10) / 10
        |    ELSE ceil(l_extendedprice * 10) / 10 END AS dec_truncate1,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS dbl_mul_floor,
        |  CAST(least(greatest(CAST(l_partkey % 100000 AS BIGINT) - 50000, -128), 127)
        |    AS INT) AS sat_tiny,
        |  CAST(least(greatest(l_orderkey % 1000000, -32768), 32767) AS INT) AS sat_small,
        |  COALESCE(NULLIF(regexp_extract(
        |    CAST(l_partkey % 100000 AS INT) || 'x' || l_returnflag,
        |    '^\s*[+-]?[0-9]+', 0), '')::BIGINT, 0) AS str2num,
        |  COALESCE(NULLIF(regexp_extract(l_returnflag, '^\s*[+-]?[0-9]+', 0), '')::BIGINT, 0)
        |    AS str2num_none
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_type_matrix_datestr" ->
      """SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  CAST(year(l_shipdate) AS INT) AS d_year,
        |  CAST(quarter(l_shipdate) AS INT) AS d_quarter,
        |  CAST(month(l_shipdate) AS INT) AS d_month,
        |  CAST(day(l_shipdate) AS INT) AS d_day,
        |  CAST(isodow(l_shipdate) AS INT) AS d_isodow,
        |  CAST(dayofyear(l_shipdate) AS INT) AS d_doy,
        |  last_day(CAST(l_shipdate AS DATE)) AS d_lastday,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS d_diff,
        |  CAST(l_shipdate AS DATE) + 30 AS d_add30,
        |  CAST(date_trunc('month', l_shipdate) AS DATE) AS d_truncmon,
        |  CAST(length(l_returnflag || '/' || l_linestatus) AS INT) AS s_len,
        |  upper(l_returnflag || '/' || l_linestatus) AS s_upper,
        |  lower(l_returnflag || '/' || l_linestatus) AS s_lower,
        |  lpad(l_returnflag || '/' || l_linestatus, 5, '*') AS s_lpad,
        |  substr(l_returnflag || '/' || l_linestatus, 1, 1) AS s_sub,
        |  replace(l_returnflag || '/' || l_linestatus, '/', '-') AS s_repl,
        |  CAST(strpos(l_returnflag || '/' || l_linestatus, '/') AS INT) AS s_instr,
        |  concat_ws('-', l_returnflag, l_returnflag || '/' || l_linestatus) AS s_cws,
        |  reverse(l_returnflag || '/' || l_linestatus) AS s_rev,
        |  repeat(l_returnflag, 3) AS s_rep,
        |  CAST(ascii(l_returnflag) AS INT) AS s_ascii,
        |  upper(to_hex(l_orderkey)) AS s_hex,
        |  l_returnflag || '/' || l_linestatus || ':' ||
        |    CAST(l_partkey % 100000 AS INT) AS s_mixnum
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_type_matrix_agg_v2" ->
      s"""SELECT l_returnflag AS flag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_ti,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_si,
        |  CAST(SUM(CAST(l_partkey % 100000 AS BIGINT)) AS BIGINT) AS sum_i,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_bi,
        |  MIN(CAST(l_linenumber AS INT)) AS min_ti,
        |  MAX(CAST(l_linenumber AS INT)) AS max_ti,
        |  MIN(l_orderkey) AS min_bi, MAX(l_orderkey) AS max_bi,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DECIMAL(38,10))
        |    AS VARCHAR) AS sum_de,
        |  ${Q.oAvgDec("l_extendedprice")} AS avg_de,
        |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS min_de,
        |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS max_de,
        |  ${Q.oSumDec("l_discount")} AS sum_db,
        |  MIN(CAST(l_shipdate AS DATE)) AS min_dt,
        |  MAX(CAST(l_shipdate AS DATE)) AS max_dt,
        |  MIN(l_returnflag || '/' || l_linestatus) AS min_vc,
        |  MAX(l_returnflag || '/' || l_linestatus) AS max_vc,
        |  COUNT(DISTINCT l_linenumber) AS cd_ti,
        |  COUNT(DISTINCT l_partkey % 100000) AS cd_i,
        |  COUNT(DISTINCT l_returnflag || '/' || l_linestatus) AS cd_vc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY flag""".stripMargin,
    "q_type_matrix_null_v2" ->
      """SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  COALESCE(CAST(NULLIF(CAST(l_linenumber AS INT), 1) AS BIGINT), -1) AS co_ti,
        |  COALESCE(CASE WHEN l_linenumber <> 1 THEN l_orderkey END, -1) AS co_bi,
        |  CAST(CAST(COALESCE(CASE WHEN l_linenumber <> 1
        |      THEN CAST(l_extendedprice AS DECIMAL(38,10)) END,
        |    CAST(-1 AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS VARCHAR) AS co_de,
        |  COALESCE(CASE WHEN l_linenumber <> 1 THEN CAST(l_shipdate AS DATE) END,
        |    DATE '1970-01-01') AS co_dt,
        |  COALESCE(CASE WHEN l_linenumber <> 1 THEN l_returnflag END, '<null>') AS co_vc,
        |  CAST(CASE WHEN l_linenumber <> 1 THEN l_orderkey END IS NULL AS INT) AS isn_bi,
        |  CAST(CASE WHEN l_linenumber <> 1 THEN l_returnflag END IS NOT NULL AS INT)
        |    AS isnn_vc,
        |  CASE WHEN l_linenumber <> 1 THEN l_orderkey END + 1 AS null_arith,
        |  CASE WHEN l_linenumber <> 1 THEN l_returnflag END || '!' AS null_concat,
        |  CAST(CASE WHEN l_linenumber <> 1 THEN l_orderkey END IS NOT DISTINCT FROM
        |    CAST(NULL AS BIGINT) AS INT) AS nseq,
        |  NULLIF(l_returnflag, 'N') AS nullif_vc
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,

    // Engine-semantics notes per cell (MySQL/Spark rule spelled in
    // DuckDB):
    //  - SUBSTRING(s, -5, 3): negative pos counts from the end; |pos|
    //    beyond the length yields '' (MySQL rule; NOT DuckDB's
    //    "virtual positions before 1" rule, which would yield a
    //    prefix) — spelled as the length-guarded CASE.
    //  - LOCATE(sub, s, 3): DuckDB has no 3-arg locate — spelled via
    //    strpos on the suffix, 0-preserved.
    //  - concat with NULL: Spark/MySQL CONCAT is NULL-propagating, so
    //    the oracle uses `||` (DuckDB's concat() skips NULLs).
    //  - initcap: DuckDB has none — spelled as the per-word
    //    upper/lower list transform (empty tokens from repeated
    //    separators preserved).
    //  - ascii(''): both return 0; unicode first char gives the
    //    codepoint on both engines.
    "q_type_matrix_stredge" ->
      """WITH b AS (SELECT doc_id AS k,
        |  CASE WHEN doc_id % 5 = 0 THEN ''
        |       WHEN doc_id % 5 = 1 THEN 'héllo wörld'
        |       WHEN doc_id % 5 = 2 THEN 'a  b   c'
        |       WHEN doc_id % 5 = 3 THEN ' x ' || substr(text, 1, 9) || ' '
        |       ELSE substr(text, 1, 17) END AS base
        |  FROM documents)
        |SELECT k, base,
        |  CAST(length(base) AS INT) AS s_len,
        |  CASE WHEN length(base) >= 5
        |    THEN substr(base, length(base) - 4, 3) ELSE '' END AS s_subneg,
        |  trim(lower(base), 'aeiou ') AS s_trimset,
        |  translate(base, 'aeo', '430') AS s_transl,
        |  substr(rpad(base, 8, '.'), 1, 2) || 'XX'
        |    || substr(rpad(base, 8, '.'), 5) AS s_overlay,
        |  list_extract(string_split(base, ' '), 2) AS s_tok2,
        |  CAST(strpos(base, 'zzz') AS INT) AS s_posmiss,
        |  CAST(CASE WHEN length(base) < 3 THEN 0
        |    WHEN strpos(substr(base, 3), 'b') = 0 THEN 0
        |    ELSE strpos(substr(base, 3), 'b') + 2 END AS INT) AS s_locate3,
        |  rpad(base, 0, 'x') AS s_rpad0,
        |  lpad(base, 4, '*') AS s_lpadtr,
        |  repeat(substr(base, 1, 2), 0) AS s_rep0,
        |  base || NULL AS s_nullcat,
        |  md5(base) AS s_md5,
        |  CAST(CASE WHEN base = '' THEN 0 ELSE ascii(base) END AS INT) AS s_ascii,
        |  chr(233) || 'A' AS s_chr,
        |  array_to_string(list_transform(string_split(base, ' '),
        |    w -> CASE WHEN length(w) = 0 THEN ''
        |      ELSE upper(w[1]) || lower(w[2:]) END), ' ') AS s_initcap,
        |  reverse(base) AS s_revuni
        |FROM b ORDER BY ALL NULLS FIRST""".stripMargin,

    // Engine-semantics notes:
    //  - next_day: DuckDB has none — spelled as base + (8 - isodow)
    //    (strictly-next Monday).
    //  - ISO year: Spark has no isoyear builtin, so the Spark side
    //    computes year(thursday-of-week); the oracle uses isoyear()
    //    directly — the identity is what the cell verifies.
    //  - strict parsing: Spark try_to_timestamp and DuckDB
    //    try_strptime both reject calendar-invalid dates (Feb 30,
    //    month 13) → NULL on both sides.
    //  - epoch: both engines are proleptic Gregorian, so year-1 dates
    //    agree on epoch seconds (-62135596800).
    "q_type_matrix_dtedge_v2" ->
      """WITH b AS (SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  CASE (l_orderkey * 7 + l_linenumber) % 8
        |    WHEN 0 THEN DATE '2000-02-29' WHEN 1 THEN DATE '1999-12-31'
        |    WHEN 2 THEN DATE '2024-02-29' WHEN 3 THEN DATE '1970-01-01'
        |    WHEN 4 THEN DATE '9999-11-30' WHEN 5 THEN DATE '0002-02-01'
        |    WHEN 6 THEN DATE '2021-01-31'
        |    ELSE CAST(l_shipdate AS DATE) END AS base,
        |  CASE l_linenumber % 4 WHEN 0 THEN '2023-02-30'
        |    WHEN 1 THEN '2000-02-29' WHEN 2 THEN 'not-a-date'
        |    ELSE '2024-12-31' END AS str1,
        |  CASE l_linenumber % 4 WHEN 0 THEN '29/02/2000'
        |    WHEN 1 THEN '31/02/2001' WHEN 2 THEN '07/13/2001'
        |    ELSE '15/06/1995' END AS str2
        |  FROM lineitem WHERE l_orderkey % 7 = 0)
        |SELECT k1, k2, CAST(base AS VARCHAR) AS base,
        |  CAST(CAST(base + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS d_am1,
        |  CAST(CAST(base - INTERVAL 13 MONTH AS DATE) AS VARCHAR) AS d_amneg,
        |  CAST(base + CAST(8 - isodow(base) AS INT) AS VARCHAR) AS d_nextmon,
        |  CAST(weekofyear(base) AS INT) AS d_week,
        |  CAST(isoyear(base) AS INT) AS d_isoyear,
        |  CAST(date_diff('day', DATE '1900-01-01', base) AS INT) AS d_dd1900,
        |  CASE WHEN year(base) BETWEEN 1970 AND 9998
        |    THEN strftime(base, '%Y/%m/%d') END AS d_fmt,
        |  CAST(try_strptime(str1, '%Y-%m-%d') AS DATE) AS d_parse1,
        |  CAST(try_strptime(str2, '%d/%m/%Y') AS DATE) AS d_parse2,
        |  CAST(epoch(CAST(base AS TIMESTAMP)) AS BIGINT) AS d_epoch,
        |  CAST(CAST(make_timestamp((CAST(epoch(CAST(base AS TIMESTAMP)) AS BIGINT)
        |    + 86399) * 1000000) AS DATE) AS VARCHAR) AS d_fromepoch,
        |  CAST(CAST(date_trunc('week', base) AS DATE) AS VARCHAR) AS d_truncweek,
        |  CAST(last_day(base) AS VARCHAR) AS d_lastday,
        |  CAST(CAST(base AS TIMESTAMP) + INTERVAL 90061 SECOND AS VARCHAR) AS d_tadd
        |FROM b ORDER BY ALL NULLS FIRST""".stripMargin,

    // Engine-semantics notes:
    //  - round(): both engines round decimal halves away from zero.
    //  - bround (half to even): DuckDB's roundbankers() casts DECIMAL
    //    through DOUBLE, so x.45 becomes x.45000...728 and rounds UP —
    //    the oracle spells banker's rounding exactly over integer
    //    cents instead.
    //  - DIV: Spark `div` truncates toward zero, DuckDB `//` floors —
    //    the oracle spells the negative branch as -((-a) // b).
    //  - %: both take the dividend's sign.
    //  - decimal→VARCHAR: both print full scale with trailing zeros.
    "q_type_matrix_decedge_v2" ->
      """WITH b AS (SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  CAST(CASE WHEN l_orderkey % 2 = 0
        |    THEN -CAST(l_extendedprice AS DECIMAL(18,2))
        |    ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END
        |    AS DECIMAL(19,2)) AS de,
        |  CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |c AS (SELECT *, CAST(de * 100 AS BIGINT) AS scents FROM b)
        |SELECT k1, k2, CAST(de AS VARCHAR) AS de,
        |  CAST(CAST(round(de, 1) AS DECIMAL(19,1)) AS VARCHAR) AS d_round1,
        |  CAST(CAST((CASE WHEN scents < 0 THEN -1 ELSE 1 END) *
        |    ((abs(scents) // 10) + CASE WHEN abs(scents) % 10 > 5 THEN 1
        |       WHEN abs(scents) % 10 < 5 THEN 0
        |       ELSE (abs(scents) // 10) % 2 END) * 0.1
        |    AS DECIMAL(19,1)) AS VARCHAR) AS d_bround1,
        |  CAST(ceil(de) AS BIGINT) AS d_ceil,
        |  CAST(floor(de) AS BIGINT) AS d_floor,
        |  CAST(trunc(de) AS BIGINT) AS d_trunc,
        |  scents % 700 AS d_mod,
        |  CASE WHEN scents >= 0 THEN scents // qty
        |    ELSE -((-scents) // qty) END AS d_divq,
        |  CAST(CAST(least(greatest(de, CAST('-99999.99' AS DECIMAL(19,2))),
        |    CAST('99999.99' AS DECIMAL(19,2))) AS DECIMAL(9,2)) AS VARCHAR) AS d_sat,
        |  CAST(de AS VARCHAR) AS d_str,
        |  CAST(CAST(de * de AS DECIMAL(38,4)) AS VARCHAR) AS d_mul,
        |  CAST(CAST(de AS DECIMAL(38,10)) AS VARCHAR) AS d_wide,
        |  CAST(CAST(abs(de) AS DECIMAL(19,2)) AS VARCHAR) AS d_abs
        |FROM c ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_type_matrix_winedge_v2" ->
      """WITH b AS (SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  l_returnflag AS rf,
        |  l_returnflag || '#' || (l_orderkey % 32) AS pk,
        |  CAST(l_shipdate AS DATE) AS sd,
        |  (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS days,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS de,
        |  CASE WHEN l_linenumber % 3 <> 0
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END AS nv
        |  FROM lineitem)
        |SELECT k1, k2,
        |  CAST(row_number() OVER uniq AS BIGINT) AS w_rn,
        |  CAST(rank() OVER ties AS BIGINT) AS w_rk,
        |  CAST(dense_rank() OVER ties AS BIGINT) AS w_drk,
        |  CAST(CAST(lag(de, 2) OVER uniq AS DECIMAL(18,2)) AS VARCHAR) AS w_lag2,
        |  CAST(CAST(COALESCE(lag(de, 2) OVER uniq, CAST('-1' AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS VARCHAR) AS w_lag2_def,
        |  lead(sd, 1) OVER uniq AS w_lead_dt,
        |  CAST(CAST(first_value(nv IGNORE NULLS) OVER (PARTITION BY pk
        |    ORDER BY sd, k1, k2, de ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DECIMAL(18,2)) AS VARCHAR) AS w_fv_nn,
        |  CAST(CAST(last_value(nv IGNORE NULLS) OVER (PARTITION BY pk
        |    ORDER BY sd, k1, k2, de ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS DECIMAL(18,2)) AS VARCHAR) AS w_lv_nn,
        |  nth_value(rf, 2) OVER (PARTITION BY pk ORDER BY sd, k1, k2, de
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS w_nth2,
        |  count(*) OVER (PARTITION BY pk ORDER BY sd, k1, k2, de
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS w_cnt_after,
        |  CAST(CAST(sum(de) OVER (PARTITION BY pk ORDER BY sd, k1, k2, de
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DECIMAL(38,2))
        |    AS VARCHAR) AS w_sum_prev3,
        |  min(sd) OVER rangedw AS w_min_dt30,
        |  count(*) OVER rangedw AS w_cnt30
        |FROM b
        |WINDOW uniq AS (PARTITION BY pk ORDER BY sd, k1, k2, de),
        |  ties AS (PARTITION BY pk ORDER BY sd),
        |  rangedw AS (PARTITION BY pk ORDER BY days
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_type_matrix_castmx" ->
      """WITH b AS (SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  l_orderkey AS bi,
        |  CAST(l_partkey % 100000 AS BIGINT) AS i,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS de,
        |  l_discount AS db,
        |  CAST(l_shipdate AS DATE) AS dt,
        |  date_trunc('second', l_shipdate) AS ts,
        |  CAST(l_orderkey AS VARCHAR) AS st
        |  FROM lineitem WHERE l_orderkey % 7 = 0)
        |SELECT k1, k2,
        |  st AS c_bi_str,
        |  CAST(de AS VARCHAR) AS c_de_str,
        |  CAST(st AS BIGINT) AS c_str_bi,
        |  CAST('  ' || st || ' ' AS DOUBLE) AS c_strsp_db,
        |  COALESCE(NULLIF(regexp_extract(st || 'kg', '^\s*[+-]?[0-9]+', 0), '')::BIGINT, 0)
        |    AS c_lenient,
        |  CAST(CASE WHEN db >= 0 THEN floor(db * 100 + 0.5)
        |       ELSE -floor(-db * 100 + 0.5) END AS BIGINT) AS c_db_round_bi,
        |  CAST(dt AS VARCHAR) AS c_dt_str,
        |  CAST(CAST(dt AS TIMESTAMP) AS VARCHAR) AS c_dt_ts,
        |  CAST(ts AS DATE) AS c_ts_dt,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS c_ts_str,
        |  CAST(CAST(dt AS VARCHAR) AS DATE) AS c_str_dt,
        |  CAST(epoch(ts) AS BIGINT) AS c_ts_epoch,
        |  CAST(dt - DATE '1970-01-01' AS INT) AS c_dt_days,
        |  CAST(CAST(least(greatest(i, -99999), 99999) AS DECIMAL(7,2))
        |    AS VARCHAR) AS c_i_dec72,
        |  CAST(de AS DOUBLE) AS c_de_db,
        |  CAST(CAST(db AS DECIMAL(18,4)) AS VARCHAR) AS c_db_dec4,
        |  (bi % 2 = 1) AS c_bool,
        |  CAST(bi % 2 = 1 AS INT) AS c_bool_i
        |FROM b ORDER BY ALL NULLS FIRST""".stripMargin,

    // month arithmetic: Spark add_months and DuckDB date ± INTERVAL n
    // MONTH both clamp to month end — equivalent by construction; the
    // DuckDB result is CAST back to DATE (its interval math widens to
    // TIMESTAMP)
    "q_type_matrix_poly" ->
      """WITH b AS (SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  l_partkey % 97 AS pm, l_suppkey % 97 AS sm,
        |  CAST(l_linenumber AS BIGINT) AS ln,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS de,
        |  CAST(l_quantity * 100 AS DECIMAL(18,2)) AS q100,
        |  CAST(l_discount * 10000 AS DECIMAL(18,2)) AS d10k,
        |  l_quantity, l_discount, l_tax, l_returnflag, l_linestatus,
        |  l_linenumber, l_partkey,
        |  CAST(l_shipdate AS DATE) AS dt
        |  FROM lineitem)
        |SELECT k1, k2,
        |  greatest(pm, sm, ln) AS p_great_i,
        |  least(pm, sm, ln) AS p_least_i,
        |  CAST(CAST(greatest(de, q100, d10k) AS DECIMAL(18,2)) AS VARCHAR) AS p_great_de,
        |  least(CAST(de AS DOUBLE), l_quantity * 100, l_tax * 10000) AS p_least_db,
        |  greatest(l_returnflag, l_linestatus) AS p_great_str,
        |  greatest(dt, dt + l_linenumber, CAST(dt - INTERVAL 1 MONTH AS DATE)) AS p_great_dt,
        |  least(dt, dt + l_linenumber, CAST(dt - INTERVAL 1 MONTH AS DATE)) AS p_least_dt,
        |  coalesce(nullif(l_returnflag, 'N'), nullif(l_linestatus, 'O'), 'Z') AS p_coalesce,
        |  nullif(CAST(l_linenumber AS INT), 3) AS p_nullif,
        |  CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS p_if,
        |  CASE WHEN l_linenumber % 3 = 0 THEN 'a'
        |       WHEN l_linenumber % 3 = 1 THEN 'b' ELSE 'c' END AS p_case,
        |  coalesce(nullif(l_partkey % 5, 0), -1) AS p_ifnull,
        |  CAST(CASE WHEN l_discount > 0.05 THEN de
        |       ELSE CAST(0 AS DECIMAL(18,2)) END AS VARCHAR) AS p_if_de,
        |  CASE WHEN month(dt) <= 6 THEN dt
        |       ELSE CAST(dt - INTERVAL 6 MONTH AS DATE) END AS p_case_dt
        |FROM b ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_probe_decimal" ->
      "SELECT CAST(1 AS BIGINT) AS k, CAST('123.45' AS DECIMAL(18,2)) AS v_dec",
    "q_probe_ts9999" ->
      "SELECT CAST(1 AS BIGINT) AS k, DATE '9999-12-31' AS v_dt"
  )
}
