#!/usr/bin/env python3
"""Produce a driver-format CORRECTNESS json from Verify dumps + DuckDB.

Mirrors the driver gate: for each query in the Verify outDir's
oracle_sql.json (optionally restricted to a name list), run the oracle
SQL in DuckDB over the same parquet tables, then compare the Spark
parquet dump with columns sorted by name, rows sorted by stringified
values, and an md5 over the canonical cell stream. Emits
{"name": {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}} — the CORRECTNESS_r{N}.json shape — so scale-factor
runs (e.g. sf1, VERDICT r11 #2) commit the same adjudicable artifact
the driver produces at sf0.01.

Usage:
  python3 scripts/make_correctness.py <sfDir> <verifyOutDir> <out.json> [names.csv]
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
keep = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    # driver testdata ships single files; Spark-written tables (e.g.
    # the ScaleUp sf1 corpus) are DIRECTORIES of part files
    pat = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def canon_cell(v):
    # match the float bit-exactness the driver cares about: floats via
    # repr (Python repr is shortest-roundtrip, injective on doubles)
    if v is None:
        return "∅"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return "x" + v.hex()
    return str(v)


def canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    rows = [tuple(canon_cell(r[c]) for c in cols) for r in tbl.to_pylist()]
    rows.sort()
    schema = [str(tbl.schema.field(c).type) for c in cols]
    md = hashlib.md5()
    for r in rows:
        for c in r:
            md.update(c.encode())
            md.update(b"\x1f")
        md.update(b"\n")
    return cols, schema, len(rows), md.hexdigest()


report = {}
for name in sorted(oracle):
    if keep is not None and name not in keep:
        continue
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        qdir = os.path.join(outdir, name)
        got = pq.read_table(qdir)
        want = con.execute(oracle[name]).arrow()
        gc, gs, gn, gh = canon(got)
        wc, ws, wn, wh = canon(want)
        rec["spark_rows"], rec["oracle_rows"] = gn, wn
        rec["rows_match"] = gn == wn
        rec["schema_match"] = gc == wc
        rec["hash_match"] = gh == wh and gc == wc and gn == wn
    except Exception as e:
        rec["err"] = str(e)[:300]
    report[name] = rec
    flag = "PASS" if rec["hash_match"] else "FAIL"
    print(f"{flag} {name} spark={rec['spark_rows']} oracle={rec['oracle_rows']}"
          + (f" err={rec['err']}" if rec["err"] else ""))

with open(outjson, "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)
ok = sum(1 for r in report.values() if r["hash_match"])
print(f"{ok} hash-green of {len(report)} -> {outjson}")
sys.exit(0 if ok == len(report) else 1)
