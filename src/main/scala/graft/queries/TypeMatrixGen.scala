package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GENERATED function × datatype crossings — the autopilot principle
  * of the reference's per-function/datatype suites
  * (`mysql-test/columnstore/autopilot/t/mcs4012_function_*`, which
  * cross every funcexp entry with every column type of
  * `regression_create_datatypetestm.inc`) applied mechanically: each
  * battery below is built from ONE cell table holding, per cell, the
  * Spark expression and its DuckDB twin, and a Scala loop emits both
  * the projection and the oracle SQL from that single source of
  * truth. Cross-engine consistency is therefore by construction —
  * adding a (function, type) pair is one table row, not two
  * hand-kept texts.
  *
  * Scope discipline (learned over r8–r10, spelled in docs/COMPAT.md):
  *  - only functions with PROVEN cross-engine parity enter the menu
  *    (no transcendentals except correctly-rounded sqrt; no
  *    double→string rendering; no locale-dependent names);
  *  - gate-boundary types follow divergence #34: integer results
  *    render BIGINT/INT, decimal results render STRING, temporals
  *    stay in sane ranges;
  *  - every battery carries the Q.sortAll total order.
  */
object TypeMatrixGen {
  import Q._

  /** One output cell: column name + Spark expression + DuckDB twin. */
  final case class Cell(name: String, spark: Column, duck: String)

  // left/right have no Scala-functions wrapper; resolved by name
  private def expr_left(s: Column): Column = call_function("left", s, lit(3))
  private def expr_right(s: Column): Column = call_function("right", s, lit(3))

  private def keys: Seq[Cell] = Seq(
    Cell("k1", col("l_orderkey"), "l_orderkey"),
    Cell("k2", col("l_linenumber").cast("int"), "CAST(l_linenumber AS INT)"))

  /** Numeric menu × the signed integer width ladder (TINYINT→BIGINT
    * value ranges), plus exact-decimal and exact-double families.
    * Sign is minted from orderkey parity so negative branches of
    * abs/sign/mod/ceil/floor/bit ops run on half the rows. */
  private def numCells: Seq[Cell] = {
    val sgn = when(col("l_orderkey") % 2 === 0, lit(-1L)).otherwise(lit(1L))
    val oSgn = "(CASE WHEN l_orderkey % 2 = 0 THEN -1 ELSE 1 END)"
    // integer ladder: every value explicitly BIGINT on both sides
    val intTys: Seq[(String, Column, String)] = Seq(
      ("ti", col("l_linenumber").cast("long") * sgn,
        s"CAST(l_linenumber AS BIGINT) * $oSgn"),
      ("si", col("l_quantity").cast("long") * sgn,
        s"CAST(l_quantity AS BIGINT) * $oSgn"),
      ("i", (col("l_partkey") % 100000 - 50000).cast("long"),
        "CAST(l_partkey % 100000 - 50000 AS BIGINT)"),
      ("bi", col("l_orderkey") * sgn,
        s"l_orderkey * $oSgn"))
    // menu: (suffix, spark fn, duck template) — parity notes:
    // mod takes the dividend's sign on both engines (COMPAT #14);
    // sqrt is IEEE correctly-rounded (bit-exact across libm);
    // DuckDB ~ / xor() mirror Spark bitwiseNOT / ^ on BIGINT.
    val intFns: Seq[(String, Column => Column, String => String)] = Seq(
      ("neg", v => (-v).cast("long"), e => s"CAST(-($e) AS BIGINT)"),
      ("abs", v => abs(v).cast("long"), e => s"CAST(abs($e) AS BIGINT)"),
      ("sign", v => signum(v).cast("int"), e => s"CAST(sign($e) AS INT)"),
      ("mod7", v => (v % 7).cast("long"), e => s"CAST(($e) % 7 AS BIGINT)"),
      ("p3t2", v => (v * 2 + 3).cast("long"), e => s"CAST(($e) * 2 + 3 AS BIGINT)"),
      ("gmid", v => greatest(v, lit(5L)).cast("long"),
        e => s"CAST(greatest($e, 5) AS BIGINT)"),
      ("lmid", v => least(v, lit(5L)).cast("long"),
        e => s"CAST(least($e, 5) AS BIGINT)"),
      ("sqra", v => sqrt(abs(v.cast("double"))),
        e => s"sqrt(abs(CAST($e AS DOUBLE)))"),
      ("bnot", v => bitwise_not(v.cast("long")).cast("long"),
        e => s"CAST(~($e) AS BIGINT)"),
      ("xor5", v => v.cast("long").bitwiseXOR(lit(5L)),
        e => s"CAST(xor($e, 5) AS BIGINT)"))
    val intCross = for {
      (tn, sv, dv) <- intTys
      (fn, sf, df) <- intFns
    } yield Cell(s"n_${fn}_$tn", sf(sv), df(dv))

    // exact-decimal family — results rendered STRING (divergence #34)
    val de = (dec(col("l_extendedprice")) * sgn).cast(DecimalType(19, 2))
    val oDe = s"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * $oSgn AS DECIMAL(19,2))"
    val decCross = Seq(
      Cell("d_neg_de", (-de).cast(DecimalType(19, 2)).cast(StringType),
        s"CAST(CAST(-($oDe) AS DECIMAL(19,2)) AS VARCHAR)"),
      Cell("d_abs_de", abs(de).cast(DecimalType(19, 2)).cast(StringType),
        s"CAST(CAST(abs($oDe) AS DECIMAL(19,2)) AS VARCHAR)"),
      Cell("d_madd_de", (de * 2 + 1).cast(DecimalType(24, 2)).cast(StringType),
        s"CAST(CAST(($oDe) * 2 + 1 AS DECIMAL(24,2)) AS VARCHAR)"),
      Cell("d_ceil_de", ceil(de).cast("long"), s"CAST(ceil($oDe) AS BIGINT)"),
      Cell("d_floor_de", floor(de).cast("long"), s"CAST(floor($oDe) AS BIGINT)"),
      Cell("d_trunc_de", de.cast("long"), s"CAST(trunc($oDe) AS BIGINT)"),
      Cell("d_gz_de", greatest(de, lit(0).cast(DecimalType(19, 2)))
          .cast(DecimalType(19, 2)).cast(StringType),
        s"CAST(CAST(greatest($oDe, CAST(0 AS DECIMAL(19,2))) AS DECIMAL(19,2)) AS VARCHAR)"))

    // exact-double family — only operations whose IEEE result is the
    // same bit pattern on both engines (negate/abs/compare/scale by
    // powers of two/exact fmod/correctly-rounded sqrt); no rendering
    val db = col("l_discount") - lit(0.05)
    val oDb = "(l_discount - 0.05)"
    val dblCross = Seq(
      Cell("f_neg_db", -db, s"-($oDb)"),
      Cell("f_abs_db", abs(db), s"abs($oDb)"),
      Cell("f_sign_db", signum(db).cast("int"), s"CAST(sign($oDb) AS INT)"),
      Cell("f_ceil_db", ceil(db).cast("long"), s"CAST(ceil($oDb) AS BIGINT)"),
      Cell("f_floor_db", floor(db).cast("long"), s"CAST(floor($oDb) AS BIGINT)"),
      Cell("f_x4_db", db * 4, s"($oDb) * 4"),
      // DuckDB's fmod() FLOORS on negative dividends; its `%`/mod()
      // keep the dividend sign like Spark's `%` (probed live) — the
      // operator, not fmod, is the parity form
      Cell("f_fmod_db", db % lit(0.25), s"($oDb) % 0.25"),
      Cell("f_sqra_db", sqrt(abs(db)), s"sqrt(abs($oDb))"))

    intCross ++ decCross ++ dblCross
  }

  /** String menu × string renderings of every type family (the
    * autopilot's implicit-coercion axis: string functions receive
    * CHAR, VARCHAR, numeric and temporal inputs alike). Each type
    * first renders through its proven CAST-to-string form, then the
    * whole menu applies — so the cross checks both the coercion and
    * the function. Double inputs are excluded by design (shortest-
    * repr vs DuckDB formatting, COMPAT/castmx note). */
  private def strCells: Seq[Cell] = {
    val tys: Seq[(String, Column, String)] = Seq(
      ("vc", concat(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey").cast("string")),
        "l_returnflag || l_linestatus || CAST(l_orderkey AS VARCHAR)"),
      ("ch", col("l_returnflag"), "l_returnflag"),
      ("is", (col("l_partkey") % 100000 - 50000).cast("long").cast("string"),
        "CAST(CAST(l_partkey % 100000 - 50000 AS BIGINT) AS VARCHAR)"),
      ("des", dec(col("l_extendedprice")).cast("string"),
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)"),
      ("dts", col("l_shipdate").cast(DateType).cast("string"),
        "CAST(CAST(l_shipdate AS DATE) AS VARCHAR)"))
    val fns: Seq[(String, Column => Column, String => String)] = Seq(
      ("len", s => length(s).cast("int"), e => s"CAST(length($e) AS INT)"),
      ("rev", s => reverse(s), e => s"reverse($e)"),
      ("up", s => upper(s), e => s"upper($e)"),
      ("low", s => lower(s), e => s"lower($e)"),
      ("sub", s => substring(s, 1, 4), e => s"substr($e, 1, 4)"),
      ("lpad", s => lpad(s, 10, "0"), e => s"lpad($e, 10, '0')"),
      ("rpad", s => rpad(s, 6, "."), e => s"rpad($e, 6, '.')"),
      ("pos5", s => instr(s, "5").cast("int"), e => s"CAST(strpos($e, '5') AS INT)"),
      ("repl", s => regexp_replace(s, "5", "#"), e => s"replace($e, '5', '#')"),
      ("cws", s => concat_ws("-", s, lit("z")), e => s"concat_ws('-', $e, 'z')"),
      ("md5", s => md5(s), e => s"md5($e)"),
      ("asc", s => ascii(s).cast("int"), e => s"CAST(ascii($e) AS INT)"),
      // trim family runs over a space-padded composition so there is
      // actually whitespace to strip (raw inputs have none)
      ("trmw", s => trim(concat(lit("  "), s, lit(" "))),
        e => s"trim('  ' || $e || ' ')"),
      ("ltrm", s => ltrim(concat(lit("  "), s, lit(" "))),
        e => s"ltrim('  ' || $e || ' ')"),
      ("rtrm", s => rtrim(concat(lit("  "), s, lit(" "))),
        e => s"rtrim('  ' || $e || ' ')"),
      ("rep2", s => repeat(s, 2), e => s"repeat($e, 2)"),
      ("lft3", s => expr_left(s), e => s"left($e, 3)"),
      ("rgt3", s => expr_right(s), e => s"right($e, 3)"),
      ("tr5", s => translate(s, "5E", "#x"), e => s"translate($e, '5E', '#x')"),
      ("spl5", s => split_part(s, lit("5"), lit(1)),
        e => s"split_part($e, '5', 1)"))
    for {
      (tn, sv, dv) <- tys
      (fn, sf, df) <- fns
    } yield Cell(s"s_${fn}_$tn", sf(sv), df(dv))
  }

  /** Temporal menu × temporal representations (DATE column, TIMESTAMP
    * column, ISO-string re-parse, epoch-seconds roundtrip): the
    * extraction/trunc/arith menu applies to each representation, so a
    * divergent coercion path cannot hide behind a green sibling.
    * All values stay in the fixture's sane 1992–1998 range. */
  private def dtCells: Seq[Cell] = {
    val tys: Seq[(String, Column, String)] = Seq(
      ("dt", col("l_shipdate").cast(DateType), "CAST(l_shipdate AS DATE)"),
      ("str", to_date(col("l_shipdate").cast(DateType).cast("string")),
        "CAST(CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS DATE)"),
      ("ep", to_date(timestamp_seconds(
        unix_timestamp(col("l_shipdate").cast(DateType).cast(TimestampType)))),
        "CAST(make_timestamp(CAST(epoch(CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)) AS BIGINT) * 1000000) AS DATE)"))
    val fns: Seq[(String, Column => Column, String => String)] = Seq(
      ("yr", d => year(d), e => s"CAST(year($e) AS INT)"),
      ("qtr", d => quarter(d), e => s"CAST(quarter($e) AS INT)"),
      ("mon", d => month(d), e => s"CAST(month($e) AS INT)"),
      ("dom", d => dayofmonth(d), e => s"CAST(day($e) AS INT)"),
      ("doy", d => dayofyear(d), e => s"CAST(dayofyear($e) AS INT)"),
      ("idow", d => weekday(d) + 1, e => s"CAST(isodow($e) AS INT)"),
      ("wk", d => weekofyear(d), e => s"CAST(weekofyear($e) AS INT)"),
      ("eom", d => last_day(d), e => s"last_day($e)"),
      ("a45", d => date_add(d, 45), e => s"$e + 45"),
      ("s45", d => date_sub(d, 45), e => s"$e - 45"),
      ("tmon", d => trunc(d, "month"), e => s"CAST(date_trunc('month', $e) AS DATE)"),
      ("tyr", d => trunc(d, "year"), e => s"CAST(date_trunc('year', $e) AS DATE)"),
      ("dd90", d => datediff(d, lit("1990-01-01").cast(DateType)).cast("int"),
        e => s"CAST(date_diff('day', DATE '1990-01-01', $e) AS INT)"))
    val reprCross = for {
      (tn, sv, dv) <- tys
      (fn, sf, df) <- fns
    } yield Cell(s"t_${fn}_$tn", sf(sv), df(dv))
    // timestamp-only extractions on the truncated-second event time
    val ts = date_trunc("second", col("l_shipdate")).cast(TimestampType)
    val oTs = "date_trunc('second', l_shipdate)"
    val tsOnly = Seq(
      Cell("t_hr_ts", hour(ts), s"CAST(hour($oTs) AS INT)"),
      Cell("t_min_ts", minute(ts), s"CAST(minute($oTs) AS INT)"),
      Cell("t_sec_ts", second(ts), s"CAST(second($oTs) AS INT)"),
      Cell("t_tday_ts", date_trunc("day", ts).cast(DateType),
        s"CAST(date_trunc('day', $oTs) AS DATE)"),
      Cell("t_ep_ts", unix_timestamp(ts), s"CAST(epoch($oTs) AS BIGINT)"))
    reprCross ++ tsOnly
  }

  /** Conditional / control-flow menu × every type family, with
    * deterministic NULL injection (the autopilot's CNX_if/ifnull/
    * nullif/coalesce/greatest/least suites crossed with the
    * datatypetestm column ladder). Each family supplies a pair of
    * same-typed operands — `v` NULL where l_linenumber=1, `w` NULL
    * where l_linenumber=2 — plus a constant fallback, so every menu
    * entry exercises null-hit, null-miss and both-null rows.
    * GREATEST/LEAST run WITH the NULL-injected operands: Spark and
    * DuckDB both skip NULLs (COMPAT divergence #30 — it is MySQL that
    * returns NULL), so the skip semantics themselves are gated here.
    * DuckDB promotes GREATEST/LEAST over DECIMAL to DOUBLE (#29) —
    * the oracle casts back to the declared scale before rendering. */
  private def condCells: Seq[Cell] = {
    val ln = col("l_linenumber")
    def inj(n: Int, v: Column): Column = when(ln === n, lit(null)).otherwise(v)
    def oInj(n: Int, e: String): String =
      s"(CASE WHEN l_linenumber = $n THEN NULL ELSE $e END)"
    // (suffix, v, oV, w, oW, fallback, oFallback, renderString)
    val tys: Seq[(String, Column, String, Column, String, Column, String, Boolean)] = Seq(
      ("bi",
        inj(1, col("l_orderkey")), oInj(1, "l_orderkey"),
        inj(2, (col("l_partkey") % 1000).cast("long")),
        oInj(2, "CAST(l_partkey % 1000 AS BIGINT)"),
        lit(-1L), "CAST(-1 AS BIGINT)", false),
      ("vc",
        inj(1, concat(col("l_returnflag"), col("l_orderkey").cast("string"))),
        oInj(1, "l_returnflag || CAST(l_orderkey AS VARCHAR)"),
        inj(2, col("l_linestatus")), oInj(2, "l_linestatus"),
        lit("zz"), "'zz'", false),
      ("dt",
        inj(1, col("l_shipdate").cast(DateType)),
        oInj(1, "CAST(l_shipdate AS DATE)"),
        inj(2, date_add(col("l_shipdate").cast(DateType), 30)),
        oInj(2, "CAST(l_shipdate AS DATE) + 30"),
        lit("1995-06-15").cast(DateType), "DATE '1995-06-15'", false),
      ("des", // exact DECIMAL(18,2) inside; STRING at the boundary (#34)
        inj(1, dec(col("l_extendedprice"))),
        oInj(1, "CAST(l_extendedprice AS DECIMAL(18,2))"),
        inj(2, (dec(col("l_extendedprice")) + 1).cast(DecimalType(18, 2))),
        oInj(2, "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) + 1 AS DECIMAL(18,2))"),
        lit("0.00").cast(DecimalType(18, 2)), "CAST('0.00' AS DECIMAL(18,2))", true),
      ("db", // IEEE ops only — same parquet bits in, same op, same bits out
        inj(1, col("l_discount") - lit(0.05)), oInj(1, "(l_discount - 0.05)"),
        inj(2, col("l_discount") * 2), oInj(2, "(l_discount * 2)"),
        lit(0.5), "0.5", false))
    val fns: Seq[(String, (Column, Column, Column) => Column,
        (String, String, String) => String)] = Seq(
      ("ifgt", (v, w, _) => when(v > w, v).otherwise(w),
        (v, w, _) => s"CASE WHEN $v > $w THEN $v ELSE $w END"),
      ("nvl", (v, _, fb) => coalesce(v, fb),
        (v, _, fb) => s"coalesce($v, $fb)"),
      ("nvl2", (v, w, fb) => when(v.isNotNull, w).otherwise(fb),
        (v, w, fb) => s"CASE WHEN $v IS NOT NULL THEN $w ELSE $fb END"),
      ("nulif", (v, w, _) => nullif(v, w), (v, w, _) => s"nullif($v, $w)"),
      ("coal3", (v, w, fb) => coalesce(v, w, fb),
        (v, w, fb) => s"coalesce($v, $w, $fb)"),
      ("grt", (v, w, _) => greatest(v, w), (v, w, _) => s"greatest($v, $w)"),
      ("lst", (v, w, _) => least(v, w), (v, w, _) => s"least($v, $w)"),
      ("case3", (v, w, fb) => when(v.isNull, fb).when(v > w, v).otherwise(w),
        (v, w, fb) =>
          s"CASE WHEN $v IS NULL THEN $fb WHEN $v > $w THEN $v ELSE $w END"))
    val cross = for {
      (tn, v, oV, w, oW, fb, oFb, asStr) <- tys
      (fn, sf, df) <- fns
    } yield {
      val sCol = sf(v, w, fb)
      val dSql = df(oV, oW, oFb)
      if (asStr) Cell(s"c_${fn}_$tn", sCol.cast(DecimalType(18, 2)).cast(StringType),
        s"CAST(CAST($dSql AS DECIMAL(18,2)) AS VARCHAR)")
      else Cell(s"c_${fn}_$tn", sCol, dSql)
    }
    // IS NULL itself, once per family (result type is INT regardless)
    val isn = tys.map { case (tn, v, oV, _, _, _, _, _) =>
      Cell(s"c_isn_$tn", v.isNull.cast("int"), s"CAST(($oV) IS NULL AS INT)")
    }
    cross ++ isn
  }

  /** Function results as GROUP BY keys — the context axis the
    * projection batteries cannot cover: computed keys flow through
    * partial/final hash aggregation (hashing + equality on the
    * function's result type), the path a 100 TB rollup actually
    * exercises. Key domains are small (≤7×3×7×4×3×4 combinations) so
    * the output is scale-free; aggregates render BIGINT on both
    * sides (COMPAT #6: DuckDB SUM(INT) is HUGEINT). */
  private def grpBattery: (QFn, String) = {
    val sgn = when(col("l_orderkey") % 2 === 0, lit(-1L)).otherwise(lit(1L))
    val oSgn = "(CASE WHEN l_orderkey % 2 = 0 THEN -1 ELSE 1 END)"
    val gks: Seq[(String, Column, String)] = Seq(
      ("g_mod7", col("l_orderkey") % 7, "l_orderkey % 7"),
      ("g_sgnq", signum(col("l_quantity").cast("long") * sgn).cast("int"),
        s"CAST(sign(CAST(l_quantity AS BIGINT) * $oSgn) AS INT)"),
      ("g_yr", year(col("l_shipdate").cast(DateType)),
        "CAST(year(CAST(l_shipdate AS DATE)) AS INT)"),
      ("g_qtr", quarter(col("l_shipdate").cast(DateType)),
        "CAST(quarter(CAST(l_shipdate AS DATE)) AS INT)"),
      ("g_flag", upper(col("l_returnflag")), "upper(l_returnflag)"),
      ("g_dcls", floor(dec(col("l_extendedprice")) / 20000).cast("long"),
        "CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) / 20000) AS BIGINT)"))
    val q: QFn = (s, dir) =>
      sortAll(t(s, dir, "lineitem")
        .groupBy(gks.map { case (n, c, _) => c.as(n) }: _*)
        .agg(count(lit(1)).as("cnt"),
          min(col("l_orderkey")).as("min_k"),
          max(col("l_orderkey")).as("max_k"),
          sum(col("l_quantity").cast("long")).as("sum_q")))
    val o = gks.map { case (n, _, d) => s"  $d AS $n" }
      .mkString("SELECT\n", ",\n", """,
  CAST(count(*) AS BIGINT) AS cnt,
  min(l_orderkey) AS min_k,
  max(l_orderkey) AS max_k,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
FROM lineitem
GROUP BY """ + (1 to gks.size).mkString(", ") + s"\n${Q.oSortAll}")
    (q, o)
  }

  /** Function results under WHERE — the predicate-context axis:
    * every menu entry drives a filter whose population is counted in
    * ONE single-pass aggregate row (sum-of-CASE, no expand), so the
    * battery proves predicate-side evaluation (codegen'd filters over
    * the scan) at a fixed output size. */
  private def whereBattery: (QFn, String) = {
    val de = dec(col("l_extendedprice"))
    val oDe = "CAST(l_extendedprice AS DECIMAL(18,2))"
    val dt = col("l_shipdate").cast(DateType)
    val oDt = "CAST(l_shipdate AS DATE)"
    val vc = concat(col("l_returnflag"), col("l_orderkey").cast("string"))
    val oVc = "l_returnflag || CAST(l_orderkey AS VARCHAR)"
    val preds: Seq[(String, Column, String)] = Seq(
      ("w_mod7", col("l_orderkey") % 7 === 3, "l_orderkey % 7 = 3"),
      ("w_abs", abs(col("l_partkey") - 50000) < 10000,
        "abs(l_partkey - 50000) < 10000"),
      ("w_sqrt", sqrt(col("l_quantity").cast("double")) > 5.0,
        "sqrt(CAST(l_quantity AS DOUBLE)) > 5.0"),
      ("w_great", greatest(col("l_quantity").cast("long"), lit(25L)) === 25L,
        "greatest(CAST(l_quantity AS BIGINT), 25) = 25"),
      ("w_len", length(vc) >= 7, s"length($oVc) >= 7"),
      ("w_sub", substring(vc, 2, 1) === lit("1"), s"substr($oVc, 2, 1) = '1'"),
      ("w_inst", instr(vc, "42") > 0, s"strpos($oVc, '42') > 0"),
      ("w_upper", upper(col("l_linestatus")) === lit("F"),
        "upper(l_linestatus) = 'F'"),
      ("w_rev", reverse(col("l_returnflag")) === col("l_returnflag"),
        "reverse(l_returnflag) = l_returnflag"),
      ("w_yr", year(dt) === 1995, s"year($oDt) = 1995"),
      ("w_mon", month(dt).isin(6, 7, 8), s"month($oDt) IN (6, 7, 8)"),
      ("w_dow", weekday(dt) + 1 <= 5, s"isodow($oDt) <= 5"),
      ("w_eom", last_day(dt) === dt, s"last_day($oDt) = $oDt"),
      ("w_dadd", date_add(dt, 90) > lit("1998-01-01").cast(DateType),
        s"$oDt + 90 > DATE '1998-01-01'"),
      ("w_dceil", ceil(de) > lit(30000), s"ceil($oDe) > 30000"),
      ("w_dmul", (de * 2).cast(DecimalType(24, 2)) > lit(70000),
        s"CAST($oDe * 2 AS DECIMAL(24,2)) > 70000"),
      ("w_coal", coalesce(nullif(col("l_linestatus"), lit("O")), lit("x")) === lit("x"),
        "coalesce(nullif(l_linestatus, 'O'), 'x') = 'x'"),
      ("w_betw", col("l_quantity").cast("long").between(10L, 20L),
        "CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20"))
    val q: QFn = (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_all"),
        preds.map { case (n, p, _) =>
          sum(when(p, lit(1L)).otherwise(lit(0L))).as(n) }: _*)
    val o = preds.map { case (n, _, d) =>
      s"  CAST(sum(CASE WHEN $d THEN 1 ELSE 0 END) AS BIGINT) AS $n" }
      .mkString("SELECT\n  CAST(count(*) AS BIGINT) AS n_all,\n", ",\n",
        "\nFROM lineitem")
    (q, o)
  }

  /** Function results as ORDER-BY keys — the sort-context axis
    * (autopilot `mcs4012_function_*` crosses functions into every
    * clause position; this is the ORDER BY crossing, r12 verdict next
    * #6). The battery's OUTPUT ORDER *is* the function keys (mixed
    * ASC/DESC, NULLS FIRST pinned on both engines, key-column
    * tiebreak for totality), so the driver's row-order-sensitive hash
    * verifies computed-key ordering directly — no sortAll wrapper.
    * The sort is a distributed range sort, not a window. */
  private def orderBattery: (QFn, String) = {
    val vc = concat(col("l_returnflag"), col("l_orderkey").cast("string"))
    val oVc = "l_returnflag || CAST(l_orderkey AS VARCHAR)"
    val dt = col("l_shipdate").cast(DateType)
    val oDt = "CAST(l_shipdate AS DATE)"
    val oks: Seq[(String, Column, String, Boolean)] = Seq(
      ("o_mod", col("l_orderkey") % 7, "l_orderkey % 7", false),
      ("o_abs", abs(col("l_partkey") - 50000), "abs(l_partkey - 50000)", true),
      ("o_len", length(vc).cast("int"), s"CAST(length($oVc) AS INT)", false),
      ("o_rev", reverse(col("l_returnflag")), "reverse(l_returnflag)", false),
      ("o_yr", year(dt), s"CAST(year($oDt) AS INT)", true),
      ("o_eom", last_day(dt), s"last_day($oDt)", false),
      ("o_dcls", floor(dec(col("l_extendedprice")) / 20000).cast("long"),
        "CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) / 20000) AS BIGINT)",
        true))
    val proj = keys ++ oks.map { case (n, c, d, _) => Cell(n, c, d) }
    val q: QFn = (s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .select(proj.map(c => c.spark.as(c.name)): _*)
      val sortCols = oks.map { case (n, _, _, desc) =>
        if (desc) col(n).desc_nulls_first else col(n).asc_nulls_first } ++
        Seq(col("k1").asc_nulls_first, col("k2").asc_nulls_first)
      base.orderBy(sortCols: _*)
    }
    val o = proj.map(c => s"  ${c.duck} AS ${c.name}")
      .mkString("SELECT\n", ",\n",
        "\nFROM lineitem WHERE l_orderkey % 7 = 0\nORDER BY " +
          (oks.map { case (n, _, _, desc) =>
            s"$n ${if (desc) "DESC" else "ASC"} NULLS FIRST" } ++
            Seq("k1 NULLS FIRST", "k2 NULLS FIRST")).mkString(", "))
    (q, o)
  }

  /** Function results as JOIN keys — the join-predicate-context axis
    * (the other `mcs4012` crossing not yet covered): a string-minted
    * FK equality to orders (1:N preserved through concat on BOTH
    * sides), an affine integer key to part, and a date-function
    * comparison inside the aggregate. The rollup is value-checked —
    * any divergence in computed-key join semantics shifts ok_sum /
    * pk_sum, not just counts. */
  private def joinBattery: (QFn, String) = {
    val q: QFn = (s, dir) => {
      val o = t(s, dir, "orders").select(
        concat(lit("O"), col("o_orderkey").cast("string")).as("j_ok"),
        col("o_orderkey"),
        year(col("o_orderdate").cast(DateType)).as("o_yr"))
      val p = t(s, dir, "part").select(
        (col("p_partkey") * 3 + 7).as("j_pk"), col("p_partkey"))
      t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .select(col("l_returnflag"),
          concat(lit("O"), col("l_orderkey").cast("string")).as("j_ok"),
          (col("l_partkey") * 3 + 7).as("j_pk"),
          year(col("l_shipdate").cast(DateType)).as("l_yr"))
        .join(o, "j_ok")
        .join(p, "j_pk")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("ok_sum"),
          sum(col("p_partkey")).as("pk_sum"),
          sum(when(col("l_yr") === col("o_yr"), 1L).otherwise(0L)).as("same_yr"))
        .orderBy(col("l_returnflag"))
    }
    val o =
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS ok_sum,
        |  CAST(sum(p_partkey) AS BIGINT) AS pk_sum,
        |  CAST(sum(CASE WHEN year(CAST(l_shipdate AS DATE)) = year(CAST(o_orderdate AS DATE))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS same_yr
        |FROM lineitem
        |JOIN orders ON 'O' || CAST(l_orderkey AS VARCHAR) = 'O' || CAST(o_orderkey AS VARCHAR)
        |JOIN part ON l_partkey * 3 + 7 = p_partkey * 3 + 7
        |WHERE l_orderkey % 7 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    (q, o)
  }

  /** Function results inside HAVING — the post-aggregation predicate
    * context (autopilot `mcs4012_function_*` crossing, r13 verdict
    * next #6): numeric/string/date/conditional functions applied to
    * AGGREGATES and GROUP KEYS after the groupBy, as group filters.
    * The exact-integer discipline (decimal-sum → BIGINT) keeps every
    * HAVING comparison integer-exact on both engines, so the filter
    * decisions — not just the surviving values — are pinned. The
    * DataFrame form is filter-after-agg, which is precisely the
    * HAVING plan Catalyst produces for SQL. */
  private def havingBattery: (QFn, String) = {
    val q: QFn = (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .groupBy(col("l_returnflag"), (col("l_orderkey") % 10).as("gmod"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("long").as("qty"),
          max(col("l_shipdate").cast(DateType)).as("mx"))
        .filter(col("qty") % 7 < 5 &&
          abs(col("n") - 150) > 3 &&
          month(col("mx")) >= 2 &&
          length(concat(col("l_returnflag"), col("gmod").cast("string"))) === 2 &&
          (when(col("n") % 2 === 0, lit(1)).otherwise(lit(0)) + col("gmod")) =!= 3)
        .orderBy(col("l_returnflag"), col("gmod"))
    val o =
      """SELECT l_returnflag, l_orderkey % 10 AS gmod,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS qty,
        |  max(CAST(l_shipdate AS DATE)) AS mx
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |GROUP BY 1, 2
        |HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) % 7 < 5
        |  AND abs(CAST(count(*) AS BIGINT) - 150) > 3
        |  AND month(max(CAST(l_shipdate AS DATE))) >= 2
        |  AND length(l_returnflag || CAST(l_orderkey % 10 AS VARCHAR)) = 2
        |  AND (CASE WHEN count(*) % 2 = 0 THEN 1 ELSE 0 END) + l_orderkey % 10 <> 3
        |ORDER BY l_returnflag, gmod""".stripMargin
    (q, o)
  }

  /** Function results as window PARTITION keys — the remaining clause
    * position of the `mcs4012` crossing: partition-by expressions are
    * computed (mod, concat, year), so partitioning correctness of the
    * whole window stack rides on function parity. Per-partition
    * aggregates (count, exact-decimal sum) are order-independent;
    * the rank uses dense_rank over (qty DESC, pmod), which is
    * tie-stable — equal keys share a rank — so no row_number
    * nondeterminism enters the gate. Output is totally ordered by
    * sortAll (residual ties are bit-identical rows). */
  private def winPartBattery: (QFn, String) = {
    import org.apache.spark.sql.expressions.Window
    val pmod = col("l_orderkey") % 10
    val pfs = concat(col("l_returnflag"), col("l_linestatus"))
    val pyr = year(col("l_shipdate").cast(DateType))
    val w1 = Window.partitionBy(pmod, pfs)
    val w2 = Window.partitionBy(pyr)
      .orderBy(dec(col("l_quantity")).desc, pmod.asc)
    val q: QFn = (s, dir) =>
      sortAll(t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey").as("k1"),
          col("l_linenumber").cast("int").as("k2"),
          pmod.as("pmod"), pfs.as("pfs"), pyr.as("pyr"),
          count(lit(1)).over(w1).as("w_n"),
          d(sum(dec(col("l_quantity"))).over(w1)).as("w_qty"),
          dense_rank().over(w2).as("w_rnk")))
    val o =
      """SELECT l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |  l_orderkey % 10 AS pmod,
        |  l_returnflag || l_linestatus AS pfs,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS pyr,
        |  CAST(count(*) OVER (PARTITION BY l_orderkey % 10, l_returnflag || l_linestatus) AS BIGINT) AS w_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey % 10, l_returnflag || l_linestatus) AS DOUBLE) AS w_qty,
        |  CAST(dense_rank() OVER (PARTITION BY year(CAST(l_shipdate AS DATE))
        |    ORDER BY CAST(l_quantity AS DECIMAL(18,2)) DESC, l_orderkey % 10) AS INT) AS w_rnk
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |""".stripMargin + Q.oSortAll
    (q, o)
  }

  /** Build the (query, oracle) pair for one generated battery.
    * Rows are scoped by a deterministic 1-in-7 systematic sample on
    * the order key (same predicate on both engines): the battery
    * proves per-cell cross-engine parity, so its cost should scale
    * with the size of the function menu, not the corpus — unsampled,
    * the 62-wide string battery's single-partition gate sort was the
    * most expensive query in the whole sf0.1 bench (10 s). */
  private def battery(cells: Seq[Cell]): (QFn, String) = {
    val all = keys ++ cells
    val q: QFn = (s, dir) =>
      sortAll(t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(all.map(c => c.spark.as(c.name)): _*))
    val o = all.map(c => s"  ${c.duck} AS ${c.name}")
      .mkString("SELECT\n", ",\n",
        s"\nFROM lineitem WHERE l_orderkey % 7 = 0 ${Q.oSortAll}")
    (q, o)
  }

  private lazy val gen: Map[String, (QFn, String)] = Map(
    "q_type_matrix_fnnum" -> battery(numCells),
    "q_type_matrix_fnstr" -> battery(strCells),
    "q_type_matrix_fndt" -> battery(dtCells),
    "q_type_matrix_fncond" -> battery(condCells),
    "q_type_matrix_fngrp" -> grpBattery,
    "q_type_matrix_fnwhere" -> whereBattery,
    "q_type_matrix_fnorder" -> orderBattery,
    "q_type_matrix_fnjoin" -> joinBattery,
    "q_type_matrix_fnhaving" -> havingBattery,
    "q_type_matrix_fnwinpart" -> winPartBattery)

  val queries: Map[String, QFn] = gen.map { case (n, (q, _)) => n -> q }
  val oracle: Map[String, String] = gen.map { case (n, (_, o)) => n -> o }
}
