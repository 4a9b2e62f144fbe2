#!/usr/bin/env python3
"""Run scaling_check.py on a (base, replica) verify-output pair and write
an INVARIANCE_r{N}-style JSON artifact with per-query check counts.

Usage: invariance_report.py BASE_OUT REPLICA_OUT K OFF OUT_JSON LABEL_BASE LABEL_REPLICA
Exit code mirrors scaling_check.py (non-zero on any violated relation).
"""
import json, os, subprocess, sys
from collections import Counter

base, rep, K, OFF, out_json, lbase, lrep = sys.argv[1:8]
here = os.path.dirname(os.path.abspath(__file__))
p = subprocess.run(
    [sys.executable, os.path.join(here, "scaling_check.py"), base, rep, K, OFF],
    capture_output=True, text=True)
ok, fail = Counter(), Counter()
fail_lines = []
for line in p.stdout.splitlines():
    toks = line.split()
    if not toks:
        continue
    if toks[0] == "OK":
        ok[toks[1].rstrip(":")] += 1
    elif toks[0] == "FAIL":
        fail[toks[1].rstrip(":")] += 1
        fail_lines.append(line)
per_query = {q: ok.get(q, 0) + fail.get(q, 0) for q in sorted(set(ok) | set(fail))}
doc = {
    "pair": {"base": f"{lbase} ({base})", "replica": f"{lrep} ({rep})",
             "K": int(K), "OFF": float(OFF)},
    "script": "scripts/scaling_check.py",
    "summary": {
        "checks": sum(per_query.values()),
        "pass": sum(ok.values()),
        "fail": sum(fail.values()),
        "queries": len(per_query),
    },
    "per_query_checks": per_query,
}
if fail_lines:
    doc["failures"] = fail_lines[:200]
with open(out_json, "w") as f:
    json.dump(doc, f, indent=1)
print(f"{sum(ok.values())}/{sum(per_query.values())} checks pass "
      f"across {len(per_query)} queries -> {out_json}")
if p.returncode:
    print(p.stdout[-3000:])
sys.exit(p.returncode)
