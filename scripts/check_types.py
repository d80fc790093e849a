#!/usr/bin/env python3
"""Gate-output TYPE guard — enforces COMPAT.md divergence #34.

Round 10 observed (bit-exact replay of all 10 gate-red queries + a
type scan of the full suite) the driver's hash canonicalization
diverging on DECIMAL128 output cells and on temporal cells outside the
nanosecond-epoch window (~1677-09-21 .. 2262-04-11): every red query
emitted one of those, zero of the 328 green ones did. ROUND 11 UPDATE:
both control probes hashed GREEN at the driver gate — the divergence
no longer reproduces in its strong form (driver fixed, or the old
behavior was value/shape-dependent). The rendering discipline is kept
as cheap insurance, and this script still enforces it:

  FAIL if any Verify dump column is a decimal type, or any
  date/timestamp CELL falls outside the ns-representable window.

The two 1-row control probes (q_probe_decimal, q_probe_ts9999) are the
documented EXCEPTIONS — they intentionally emit the historically
forbidden types as the per-round canary: RED on a probe isolates a
driver-side canonicalization change with zero query logic in the
blast radius; sustained GREEN means typed decimal/temporal output
could be restored suite-wide (COVERAGE.md tracks that decision).

Usage: python3 scripts/check_types.py <verifyOutDir>
"""
import sys, os, datetime
import pyarrow.parquet as pq
import pyarrow.compute as pc
import pyarrow as pa

ALLOW = {"q_probe_decimal", "q_probe_ts9999"}
NS_MIN = datetime.datetime(1677, 9, 22)
NS_MAX = datetime.datetime(2262, 4, 11)

outdir = sys.argv[1]
bad = 0
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
def has_nested_decimal(t):
    """Recurse through list/struct/map types — a decimal hidden inside
    collect_list(...) or a struct field hits the same driver-hash
    divergence as a top-level one (mirrors PlanGuardSpec.hasDecimal)."""
    if pa.types.is_decimal(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return has_nested_decimal(t.value_type)
    if pa.types.is_map(t):
        return has_nested_decimal(t.key_type) or has_nested_decimal(t.item_type)
    if pa.types.is_struct(t):
        return any(has_nested_decimal(t.field(i).type) for i in range(t.num_fields))
    return False

for name in names:
    if name in ALLOW:
        continue
    tbl = pq.read_table(os.path.join(outdir, name))
    for field in tbl.schema:
        t = field.type
        if has_nested_decimal(t):
            print(f"FAIL {name}.{field.name}: decimal column ({t})")
            bad += 1
        elif pa.types.is_date(t) or pa.types.is_timestamp(t):
            col = tbl.column(field.name)
            mm = pc.min_max(col).as_py()
            lo, hi = mm["min"], mm["max"]
            def as_dt(v):
                if v is None:
                    return None
                if isinstance(v, datetime.datetime):
                    return v.replace(tzinfo=None)
                return datetime.datetime(v.year, v.month, v.day)
            lo, hi = as_dt(lo), as_dt(hi)
            if lo is not None and (lo < NS_MIN or hi > NS_MAX):
                print(f"FAIL {name}.{field.name}: temporal range "
                      f"[{lo}, {hi}] exceeds ns-epoch window")
                bad += 1
print(f"\n{len(names)} outputs scanned, {bad} type violations")
sys.exit(1 if bad else 0)
