#!/usr/bin/env python3
"""funcexp registry traceability audit (VERDICT r11 item #4).

Parses the reference's fFuncMap registrations and asserts every
registry name appears (as a backticked token) in COVERAGE.md's
"funcexp registry traceability" section — i.e. each of the ~196
entries is traceable to a battery column, a q_fn_* gate row, an alias
row, or a documented exclusion row. "Not in the matrix" must always be
a written decision, never an omission.

Usage: python3 scripts/check_registry.py [referenceDir]
Exit 0 = every entry traceable; 1 = list of missing names.
"""
import re, sys, os

ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
src = os.path.join(ref, "utils/funcexp/funcexp.cpp")
names = sorted(set(re.findall(r'fFuncMap\["([^"]+)"\]', open(src).read())))

cov = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
m = re.search(r"### funcexp registry traceability.*?\n## ", cov, re.S)
if not m:
    print("FAIL: traceability section not found in COVERAGE.md")
    sys.exit(1)
section = m.group(0)
ticked = set(t.replace("\\", "") for t in re.findall(r"`([^`]+)`", section))

missing = [n for n in names if n.strip() not in ticked and n not in ticked]
print(f"registry entries: {len(names)}; traceable: {len(names) - len(missing)}")
if missing:
    print("MISSING:", missing)
    sys.exit(1)
print("OK: every registry entry is traceable in COVERAGE.md")
