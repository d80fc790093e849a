#!/usr/bin/env python3
"""STRICT local pre-flight for the driver's correctness gate.

Unlike check_oracle.py (which sorts rows), this compares in STORED row
order — the driver's hash is row-order-sensitive, so a query whose
output order is not totally determined can pass the sorted compare and
still flake red at the gate (exactly what happened to 8 rows in r08).
Columns are still name-sorted (driver behavior); values exact; arrow
types reported when they differ.

Usage: python3 scripts/check_oracle_strict.py <sfDir> <verifyOutDir> [name-prefix,...]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir, outdir = sys.argv[1], sys.argv[2]
keep = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    return cols, types, rows


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (a != a and b != b)
    return a == b


n_pass = n_fail = 0
for name in sorted(oracle):
    if keep and not any(name.startswith(p) for p in keep):
        continue
    d = os.path.join(outdir, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no verify output")
        n_fail += 1
        continue
    got = pq.read_table(files[0])
    try:
        want = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        n_fail += 1
        continue
    gc, gt, gr = canon(got)
    wc, wt, wr = canon(want)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}")
        n_fail += 1
        continue
    if len(gr) != len(wr):
        print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}")
        n_fail += 1
        continue
    bad = None
    for i, (x, y) in enumerate(zip(gr, wr)):
        if not all(eq(a, b) for a, b in zip(x, y)):
            bad = (i, x, y)
            break
    tnote = "" if gt == wt else f"  [types differ: " + ", ".join(
        f"{c}: {gt[c]} vs {wt[c]}" for c in gc if gt[c] != wt[c]) + "]"
    if bad:
        i, x, y = bad
        diffc = [c for c, a, b in zip(gc, x, y) if not eq(a, b)]
        print(f"FAIL {name}: row {i} cols {diffc}:\n  spark ={x}\n  duckdb={y}{tnote}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(gr)} rows, row-order exact){tnote}")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
