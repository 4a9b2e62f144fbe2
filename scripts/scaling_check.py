#!/usr/bin/env python3
"""Oracle-free correctness gate at scale factors DuckDB can't reach.

`make_sf1.py` replication is FK-consistent and content-preserving, so a
K-fold replica implies EXACT algebraic relations between a query's output
at sf(N) and sf(K*N) — no second engine needed:

 - group-preserving aggregates (q1_agg, q_join_star, q_funnel): same
   group rows, counts and integer-cent money sums exactly xK, double
   sums xK within fp tolerance, averages unchanged;
 - per-entity outputs (q_sessionize, q_topk_per_key): row count exactly
   xK, and the replica-0 slice (keys < OFF) byte-identical to the sf(N)
   output — replication cannot change what happens inside a replica;
 - content-keyed dedup (q_dedup_exact): per-source n_docs xK while
   distinct-content counts follow content multiplicity (each source's
   corpus is copied verbatim K times, so every content group gains K
   copies; n_unique is whatever the query's uniqueness key implies -
   the check asserts n_docs xK exactly and prints the n_unique relation
   for the record).

Usage: scaling_check.py out_sfN out_sfKN [K] [OFF]
Exits non-zero on any violated relation.
"""
import glob, json, sys
from collections import Counter

import pyarrow.parquet as pq

OUT1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
OUTK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = int(float(sys.argv[4])) if len(sys.argv) > 4 else 10**10

fails = []


def load(out, q):
    return pq.read_table(glob.glob(f"{out}/{q}/*.parquet")).to_pydict()


def rows(d):
    cols = sorted(d)
    return {tuple(str(d[c][i]) for c in cols) for i in range(len(d[cols[0]]))}


def rows_ms(d):
    """Row MULTISET — the slice-identity gate is 'byte-identical', so a
    dropped copy of a duplicated row must fail even when a stray row
    elsewhere keeps the set (and the global rowcount) unchanged."""
    cols = sorted(d)
    return Counter(tuple(str(d[c][i]) for c in cols) for i in range(len(d[cols[0]])))


def check(name, ok, detail):
    status = "OK  " if ok else "FAIL"
    print(f"{status} {name}: {detail}")
    if not ok:
        fails.append(name)


def keyed(d, keys):
    n = len(d[keys[0]])
    return {tuple(d[k][i] for k in keys): i for i in range(n)}


# ---- group-preserving aggregates ---------------------------------------
a1, aK = load(OUT1, "q1_agg"), load(OUTK, "q1_agg")
k1, kK = keyed(a1, ["l_returnflag", "l_linestatus"]), keyed(aK, ["l_returnflag", "l_linestatus"])
check("q1_agg groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)} group rows")
for g, i in k1.items():
    if g not in kK:
        continue  # already reported by the groups check
    j = kK[g]
    for c in ["count_order", "sum_qty"]:  # integer-valued: exact xK
        check(f"q1_agg {c}{g}", aK[c][j] == K * a1[c][i], f"{a1[c][i]} -> {aK[c][j]}")
    for c in ["sum_base_price", "sum_disc_price"]:  # double sums: xK within fp
        # RELATIVE tolerance: these sums are ~1e11-1e12, where a fixed
        # 0.05*K bound is the same order as honest fp drift across a
        # different partial-aggregation tree
        check(f"q1_agg {c}{g}",
              abs(aK[c][j] - K * a1[c][i]) < 1e-9 * abs(K * a1[c][i]) + 1e-9,
              f"{a1[c][i]} -> {aK[c][j]}")
    check(f"q1_agg avg_qty{g}", abs(aK["avg_qty"][j] - a1["avg_qty"][i]) < 1e-6,
          f"{a1['avg_qty'][i]} -> {aK['avg_qty'][j]}")

j1, jK = load(OUT1, "q_join_star"), load(OUTK, "q_join_star")
k1, kK = keyed(j1, ["n_name"]), keyed(jK, ["n_name"])
check("q_join_star groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)} nations")
for g, i in k1.items():
    if g not in kK:
        continue
    j = kK[g]
    check(f"q_join_star n_rows{g}", jK["n_rows"][j] == K * j1["n_rows"][i],
          f"{j1['n_rows'][i]} -> {jK['n_rows'][j]}")
    # integer-cent accumulation -> exactly xK to the cent
    check(f"q_join_star revenue{g}",
          round(jK["revenue"][j] * 100) == K * round(j1["revenue"][i] * 100),
          f"{j1['revenue'][i]} -> {jK['revenue'][j]}")

f1, fK = load(OUT1, "q_funnel"), load(OUTK, "q_funnel")
for c in ["n_view", "n_view_click", "n_full_funnel"]:
    check(f"q_funnel {c}", fK[c][0] == K * f1[c][0], f"{f1[c][0]} -> {fK[c][0]}")

# ---- per-entity outputs: xK rows + replica-0 slice identity ------------
# applies to ANY query whose rows are scoped to one keyed entity and whose
# logic never crosses entities (windows partitioned by the key, per-entity
# joins): replication cannot change what happens inside a replica, so the
# slice keyed below OFF must be set-identical to the sf(N) output. Queries
# with GLOBAL-distribution outputs (ntile quartiles, global ranks) are
# deliberately absent - their rows depend on the whole corpus.
PER_ENTITY = [
    ("q_sessionize", "user_id"), ("q_topk_per_key", "o_custkey"),
    ("q_gaps_islands", "o_custkey"), ("q_locf", "user_id"),
    ("q_ewma", "user_id"), ("q_asof", "user_id"),
    ("q_asof_forward", "user_id"), ("q_window", "l_suppkey"),
    ("q_state_runs", "user_id"), ("q_rolling_fp", "doc_id"),
    ("q_interp_linear", "user_id"),
]
import pyarrow.compute as pc
for q, key in PER_ENTITY:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    check(f"{q} rowcount", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    # Arrow-side slice so 60M-row outputs never materialize in Python
    slice0 = tK.filter(pc.less(tK[key], OFF)).to_pydict()
    n_slice = len(slice0[sorted(slice0)[0]]) if slice0 else 0
    check(f"{q} replica-0 slice",
          n_slice == t1.num_rows and rows_ms(slice0) == rows_ms(t1.to_pydict()),
          f"{n_slice} slice rows vs {t1.num_rows}")

# ---- group aggregates over replica-invariant keys ----------------------
# cohort retention counts scale xK; histogram counts xK with invariant
# per-bucket averages (each replica contributes the identical value set)
gr = [("q_retention", ["cohort_week", "week_offset"], ["n_users"], []),
      ("q_histogram", ["bucket"], ["n"], ["avg_disc"])]
for q, keys, xk_cols, inv_cols in gr:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    d1, dK = load(OUT1, q), load(OUTK, q)
    k1, kK = keyed(d1, keys), keyed(dK, keys)
    check(f"{q} groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    for g, i in k1.items():
        if g not in kK:
            continue
        j = kK[g]
        for c in xk_cols:
            check(f"{q} {c}{g}", dK[c][j] == K * d1[c][i], f"{d1[c][i]} -> {dK[c][j]}")
        for c in inv_cols:
            check(f"{q} {c}{g}", abs(dK[c][j] - d1[c][i]) < 1e-9,
                  f"{d1[c][i]} -> {dK[c][j]}")

# ---- content-keyed dedup ----------------------------------------------
d1, dK = load(OUT1, "q_dedup_exact"), load(OUTK, "q_dedup_exact")
k1, kK = keyed(d1, ["source"]), keyed(dK, ["source"])
check("q_dedup_exact sources", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
for g, i in k1.items():
    if g not in kK:
        continue
    j = kK[g]
    check(f"q_dedup_exact n_docs{g}", dK["n_docs"][j] == K * d1["n_docs"][i],
          f"{d1['n_docs'][i]} -> {dK['n_docs'][j]}")
    print(f"     q_dedup_exact n_unique{g}: {d1['n_unique'][i]} -> {dK['n_unique'][j]}"
          f" (ratio {dK['n_unique'][j] / max(1, d1['n_unique'][i]):.2f})")

# ---- dedup cascade: the strongest replication invariant ----------------
# content collapse makes reps and their near-pair graph REPLICATION
# INVARIANT, while doc count scales xK and pair mass (mult_a*mult_b over
# near pairs) scales exactly xK^2
try:
    if not (glob.glob(f"{OUT1}/q_dedup_cascade/*.parquet")
            and glob.glob(f"{OUTK}/q_dedup_cascade/*.parquet")):
        raise FileNotFoundError("q_dedup_cascade outputs absent")
    c1, cK = load(OUT1, "q_dedup_cascade"), load(OUTK, "q_dedup_cascade")
    check("q_dedup_cascade n_docs", cK["n_docs"][0] == K * c1["n_docs"][0],
          f"{c1['n_docs'][0]} -> {cK['n_docs'][0]}")
    check("q_dedup_cascade n_reps invariant", cK["n_reps"][0] == c1["n_reps"][0],
          f"{c1['n_reps'][0]} -> {cK['n_reps'][0]}")
    check("q_dedup_cascade n_near_pairs invariant",
          cK["n_near_pairs"][0] == c1["n_near_pairs"][0],
          f"{c1['n_near_pairs'][0]} -> {cK['n_near_pairs'][0]}")
    check("q_dedup_cascade mass xK^2",
          cK["near_pair_mass"][0] == K * K * c1["near_pair_mass"][0],
          f"{c1['near_pair_mass'][0]} -> {cK['near_pair_mass'][0]}")
except FileNotFoundError:
    print("     q_dedup_cascade outputs absent in one dir - skipped")

print("=" * 40)
print(f"{len(fails)} failures" if fails else "all replication invariants hold")
sys.exit(1 if fails else 0)
