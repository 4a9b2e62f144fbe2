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
import glob, json, os, sys
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
    # round-12 widening: anything whose rows are scoped to one offset-keyed
    # entity and whose cross-row inputs are replication-invariant ratios
    # (e.g. tfidf's ln(N/df): N and df both xK). q_bigram_lm is EXCLUDED
    # on principle: its add-one smoothing (c_xy+1)/(c_x+vocab) is not a
    # pure ratio, so per-doc scores legitimately change under replication.
    ("q_any_value", "c_custkey"), ("q_exists_subq", "c_custkey"),
    ("q_semi_join", "c_custkey"),
    ("q_collect_sorted", "l_orderkey"), ("q_having_countd", "l_orderkey"),
    ("q_dedup_first", "l_orderkey"),
    ("q_array_funcs", "o_custkey"), ("q_minmax_by", "o_custkey"),
    ("q_window_range", "o_orderkey"),
    ("q_anti_join", "p_partkey"), ("q_right_join", "p_partkey"),
    ("q_full_outer", "custkey"), ("q_top_supplier", "s_suppkey"),
    ("q_event_pattern", "user_id"), ("q_zscore_anomaly", "user_id"),
    ("q_scd2", "user_id"),
    ("q_text_stats", "doc_id"), ("q_token_entropy", "doc_id"),
    ("q_quality_gate", "doc_id"), ("q_repetition", "doc_id"),
    ("q_fingerprint", "doc_id"), ("q_chunk_text", "doc_id"),
    ("q_pii_redact", "doc_id"),
    ("q_regex_replace_groups", "doc_id"), ("q_regex_filter", "doc_id"),
    ("q_simhash", "doc_id"), ("q_minhash_sig", "doc_id"),
    ("q_tfidf", "doc_id"), ("q_bpe_tokens", "doc_id"),
    ("q_embed_norms", "vec_id"), ("q_random_projection", "vec_id"),
    # streaming gates: watermarks/session logic are per-user; replication
    # adds whole new users with verbatim event times
    ("q_stream_sessionize", "user_id"), ("q_stream_sessions", "user_id"),
    ("q_stream_alerts", "user_id"), ("q_stream_join", "user_id"),
    # round-12 second widening: scalar-function batteries, per-customer
    # windows (lag/ntile/moving median all PARTITION BY o_custkey), set
    # ops over offset key sets, and the media pipeline (media_id = doc_id)
    ("q_case_when", "o_orderkey"), ("q_date_arith", "o_orderkey"),
    ("q_lead_lag", "o_orderkey"), ("q_moving_median", "o_orderkey"),
    ("q_math_funcs", "l_orderkey"), ("q_unpivot", "l_orderkey"),
    ("q_string_funcs", "p_partkey"), ("q_conv_funcs", "p_partkey"),
    ("q_media_meta", "media_id"), ("q_media_chunks", "media_id"),
    # round-13 widening: per-supplier salted rollup, per-order window
    # batteries (all PARTITION BY o_custkey — replica-local), and the
    # weighted branch merge keyed on user_id
    ("q_salted_agg", "l_suppkey"), ("q_frame_funcs", "o_orderkey"),
    ("q_rank_battery", "o_orderkey"), ("q_weighted_merge", "user_id"),
    # Pareto frontier: dominance is strict-in-one, so the K verbatim
    # copies of a frontier point cannot dominate each other — the
    # frontier is exactly the sf(N) frontier xK copies
    ("q_skyline", "o_orderkey"),
]

# replica-0 slice identity WITHOUT a global xK rowcount: the query's row
# membership depends on key-modulus predicates that offset keys cross
# differently per replica (q_table_diff's %97/%31/%53 release simulation),
# so each replica diffs differently — but replica 0's keys are untouched,
# and its 'added' keys (base + 1e8) stay below OFF, so the slice is exact
SLICE_ONLY = [("q_table_diff", "o_orderkey")]

# pair outputs: the predicate deciding a pair (and its measure) depends
# only on the two members' replication-invariant content, so the
# both-keys-below-OFF slice must be byte-identical to sf(N). No global
# rowcount relation is asserted: cross-replica pairs (exact copies at
# similarity 1.0) legitimately appear at sf(K*N).
PAIR_SLICE = [
    ("q_ngram_jaccard", "doc_a", "doc_b"),
    ("q_ngram_containment", "doc_a", "doc_b"),
    ("q_edit_distance", "doc_a", "doc_b"),
    ("q_cosine_dedup", "vec_a", "vec_b"),
]
# q_jaro_fuzzy moved to a bespoke collapse gate (round 13): its output is
# now rep name-pairs + induced pair mass, same algebra as q_simhash_band

# outputs that must be COMPLETELY identical at both SFs: the query pins a
# fixed replica-0 id range (q_posexplode doc_id<20, q_quantize_embed
# vec_id<1000), so replication adds nothing it can see
FULL_IDENTITY = ["q_posexplode", "q_quantize_embed",
                 # fixed replica-0 id-range subsets / dim-only key sets
                 "q_xml_extract", "q_map_roundtrip", "q_set_ops",
                 # DISTINCT over a content domain (quantities), a union
                 # pinned to the fixed o_orderkey < 50 id range, and the
                 # semantic dedup pinned to vec_id < 500
                 "q_distinct_sort", "q_union_by_name", "q_semdedup",
                 # k-center greedy pinned to vec_id < 300 (replica-0 only)
                 "q_kcenter_seed"]
import pyarrow.compute as pc


def pq_rows(files):
    """Total rowcount from parquet footers — no column data is read."""
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


# Above this base-side rowcount the in-Python multiset compare is swapped
# for a streamed DuckDB digest (count + HUGEINT sum of per-row hashes over
# the sorted stringified columns): same multiset-equality semantics, but
# bounded memory — the ×1000-SF q_math_funcs/q_unpivot outputs OOM-killed
# the pyarrow read_table + Counter path at 130 GB RSS.
SLICE_DIGEST_ROWS = int(os.environ.get("GRAFT_SLICE_DIGEST_ROWS", 20_000_000))
_digest_con = None


def slice_digest(files, pred=""):
    global _digest_con
    if _digest_con is None:
        import duckdb
        _digest_con = duckdb.connect()
        _digest_con.execute("SET memory_limit='40GB'")
    cols = sorted(c.name for c in pq.ParquetFile(files[0]).schema_arrow)
    row = "concat_ws('|', " + ", ".join(
        f"coalesce(CAST(\"{c}\" AS VARCHAR), chr(0))" for c in cols) + ")"
    where = f"WHERE {pred}" if pred else ""
    return _digest_con.execute(
        f"SELECT count(*), sum(hash({row})) FROM read_parquet({files!r}) {where}"
    ).fetchone()


for q, key in PER_ENTITY:
    f1 = glob.glob(f"{OUT1}/{q}/*.parquet")
    fK = glob.glob(f"{OUTK}/{q}/*.parquet")
    if not (f1 and fK):
        print(f"     {q} outputs absent - skipped")
        continue
    n1, nK = pq_rows(f1), pq_rows(fK)
    check(f"{q} rowcount", nK == K * n1, f"{n1} -> {nK}")
    if n1 > SLICE_DIGEST_ROWS:
        d1 = slice_digest(f1)
        dK = slice_digest(fK, f'"{key}" < {OFF}')
        check(f"{q} replica-0 slice digest", d1 == dK, f"{d1} vs {dK}")
        continue
    t1 = pq.read_table(f1)
    tK = pq.read_table(fK)
    # Arrow-side slice so 60M-row outputs never materialize in Python
    slice0 = tK.filter(pc.less(tK[key], OFF)).to_pydict()
    n_slice = len(slice0[sorted(slice0)[0]]) if slice0 else 0
    check(f"{q} replica-0 slice",
          n_slice == t1.num_rows and rows_ms(slice0) == rows_ms(t1.to_pydict()),
          f"{n_slice} slice rows vs {t1.num_rows}")

for q, ka, kb in PAIR_SLICE:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    slice0 = tK.filter(
        pc.and_(pc.less(tK[ka], OFF), pc.less(tK[kb], OFF))).to_pydict()
    n_slice = len(slice0[sorted(slice0)[0]]) if slice0 else 0
    check(f"{q} replica-0 pair slice", rows_ms(slice0) == rows_ms(t1.to_pydict()),
          f"{n_slice} slice rows vs {t1.num_rows}")

for q, key in SLICE_ONLY:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    slice0 = tK.filter(pc.less(tK[key], OFF)).to_pydict()
    n_slice = len(slice0[sorted(slice0)[0]]) if slice0 else 0
    check(f"{q} replica-0 slice", rows_ms(slice0) == rows_ms(t1.to_pydict()),
          f"{n_slice} slice rows vs {t1.num_rows} (no global xK: "
          "key-modulus membership rotates per replica)")

for q in FULL_IDENTITY:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    d1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet")).to_pydict()
    dK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet")).to_pydict()
    check(f"{q} full identity", rows_ms(d1) == rows_ms(dK),
          f"{len(d1[sorted(d1)[0]])} rows byte-identical")

# ---- group aggregates over replica-invariant keys ----------------------
# (q, group_keys, xK_cols, invariant_cols, tolerance_cols):
#  - group keys live in replication-invariant domains (flags, nations,
#    time buckets, ranks), so the group SET must be identical;
#  - xK_cols scale exactly xK (ints exact; double sums within fp);
#  - invariant_cols are byte-identical (counts of distinct content,
#    medians/percentiles of a K-fold-duplicated multiset, argmax rows
#    with scale-invariant deterministic tiebreaks);
#  - tolerance_cols are ratio-derived doubles (averages, shares,
#    probabilities, PMI/PSI/Zipf-slope style log-ratios): mathematically
#    invariant because every count appears in both numerator and
#    denominator, fp-compared at 1e-6 relative.
# keys == [] means a single-row global output.
GROUPED = [
    ("q_retention", ["cohort_week", "week_offset"], ["n_users"], [], []),
    ("q_histogram", ["bucket"], ["n"], [], ["avg_disc"]),
    ("q_union", ["l_returnflag"], ["n_rows", "sum_qty"], [], []),
    ("q_decimal_math", ["l_returnflag"], ["n", "revenue", "total_disc"], [], []),
    ("q_date_parts", ["yr", "mo"], ["n_orders", "revenue"], [], []),
    ("q_date_spine", ["month"], ["n", "total"], [], []),
    ("q_mom_growth", ["month"], ["revenue"], [], ["mom_growth"]),
    ("q_market_share", ["order_year"], ["asia_rev", "total_rev"], [], ["asia_share"]),
    ("q_mode_stat", ["source"], ["n"], ["mode_value"], []),
    ("q_markov_transitions", ["cur_type", "next_type"], ["n_trans"], [], ["p_next"]),
    ("q_lang_id", ["lang", "predicted"], ["n"], [], []),
    # corpus_pipeline dedups to content-unique docs before the rollup, so
    # its per-lang yield is fully replication-INVARIANT, not xK
    ("q_corpus_pipeline", ["lang"], [], ["n_docs", "total_words"], ["avg_words"]),
    ("q_token_count", ["source"], ["n_docs", "total_tokens"], ["n_vocab"], ["avg_tokens"]),
    ("q_vocab_overlap", ["source_a", "source_b"], [], ["n_shared"], ["jaccard"]),
    ("q_zipf", [], [], ["n_terms"], ["zipf_slope", "r2"]),
    ("q_heavy_hitters", ["rank"], ["n"], ["value"], []),
    ("q_key_skew", [], ["n_keys"],
     ["max_n", "heaviest_key", "heaviest_n"], ["avg_n", "skew_factor"]),
    ("q_psi_drift", ["bucket"], ["n_ref", "n_cur"], [], ["psi_contrib"]),
    ("q_mix_weights", ["source"], ["n"], [], ["actual_share", "weight"]),
    # q_cdc_apply lives in the bespoke section below: its change-batch
    # membership is keyed on o_orderkey % 89/41/67, so xK holds exactly
    # IFF the replica offset clears all three moduli (OFF % 244483 == 0;
    # with OFF=1e9 the classes rotated per replica and rows went
    # 150553 -> 1505537, not x10 — that was an OFF artifact, not algebra)
    ("q_attribution", ["touch"], ["n_purchases", "revenue"], [], []),
    ("q_attribution_decay", ["touch"],
     ["attributed_purchases", "attributed_revenue"], [], []),
    ("q_skew_attribution", ["touch"], ["n_purchases", "revenue"], [], []),
    ("q_skew_join_hotonly", ["p_brand"], ["n", "revenue"], [], []),
    ("q_skew_salted_join", ["p_brand"], ["n", "revenue"], [], []),
    ("q_left_join", ["segment"], ["n_orders", "sum_price"], [], []),
    ("q_bucketed_join", ["o_orderpriority"], ["n_items", "revenue"], [], []),
    ("q_incremental_agg", ["o_orderpriority"], ["n", "total"], [], ["avg_price"]),
    ("q_bloom_join", ["o_orderpriority"], ["n", "revenue"], [], []),
    ("q_banded_range", ["band_id"], ["n", "band_revenue"], [], []),
    ("q_range_join", ["band_id"], ["n", "band_revenue"], [], []),
    ("q_null_safe_join", ["priority"], ["n_orders", "revenue"], [], []),
    ("q_crosstab", ["o_orderpriority_l_returnflag"], ["A", "N", "R"], [], []),
    ("q_cube", ["flag", "status"], ["n"], [], []),
    ("q_rollup", ["flag", "status"], ["n", "qty"], [], []),
    ("q_grouping_sets", ["flag", "status"], ["n"], [], []),
    ("q_grouping_id", ["flag", "status", "g_flag", "g_status"], ["n"], [], []),
    ("q_null_semantics", [], ["matched", "unmatched", "null_safe_null"], [], []),
    # k is a modulus bucket of offset keys (OFF clears the modulus), so
    # the bucket set is invariant and multiplicities scale xK
    ("q_intersect_all", ["op", "k"], ["n"], [], []),
    ("q_chunk_roundtrip", ["source"], ["n_docs", "n_exact"], [], []),
    # p25/p75 are deliberately absent: percentile() INTERPOLATES, and the
    # (N-1)q vs (KN-1)q positions can interpolate across a run boundary of
    # the K-fold-duplicated multiset (observed: p25 26913.25 -> 26913.1) —
    # a semantic property of interpolation, not an engine defect
    ("q_percentile_exact", ["l_returnflag"], [], ["p50", "med_qty"], []),
    ("q_weighted_median", ["l_returnflag"], [], [], ["wp25", "wmedian", "wp75"]),
    ("q_histogram_depth", ["bucket"], ["n"], [], ["lo", "hi"]),
    ("q_winsor_mean", ["l_returnflag"], [], [], ["wmean", "mean"]),
    ("q_cross_join", ["r_name", "seg"], ["n_cust"], [], []),
    ("q_listagg", ["r_name"], [], ["nations", "n"], []),
    ("q_recursive_walk", ["n_nationkey"], [], ["root_key", "chain_len"], []),
    ("q_pagerank", ["node"], [], [], ["rank"]),
    # symbols_after counts corpus symbol OCCURRENCES (xK), while the merge
    # choice itself (argmax pair weight, lex tiebreak) is scale-invariant
    ("q_bpe_merges", ["round"], ["pair_weight", "symbols_after"],
     ["left_sym", "right_sym"], []),
    ("q_table_checksum", ["l_returnflag"], ["n_rows"], [], []),
    # streaming: replication adds users with verbatim timestamps, so
    # windowed counts/sums scale xK with the window-key set invariant
    ("q_stream_window", ["bucket", "event_type"], ["n", "sum_value"], [], []),
    ("q_time_bucket", ["bucket", "event_type"], ["n", "sum_value"], [], []),
    ("q_stream_sliding", ["bucket"], ["n"], [], ["avg_value"]),
    ("q_stream_enrich", ["bucket", "segment"], ["n", "sum_value"], [], []),
    ("q_stream_dedup", [], ["n_events", "n_users", "total_value"], [], []),
    # ---- round-13 widening -------------------------------------------
    # group keys in content domains (flags, brands, JSON payload values,
    # rules, languages, sources, words) with xK counts / invariant
    # extrema / pure-ratio doubles
    ("q_pivot", ["l_returnflag"], ["qty_f", "qty_o", "qty_p"], [], []),
    # k comes from the props JSON payload — content, never offset
    ("q_variant", ["k_bucket"], ["n"], ["k_min", "k_max"], []),
    ("q_ceiling_clamp", ["p_brand"], [], ["rounded_size"], []),
    ("q_json_extract", ["k_mod"], ["n"], [], []),
    # median of a K-fold-duplicated multiset is EXACT in both parities:
    # odd n lands inside a copy run; even n's two interpolation
    # neighbors map to the same two runs' boundary values
    ("q_stats", ["l_returnflag"], [], ["median_qty"],
     ["avg_disc", "sd_qty", "corr_qty_price"]),
    ("q_auc", [], ["n_pos", "n_neg"], [], ["auc"]),
    # replicas add identical interval sets at identical times, so the
    # pointwise concurrency is xK everywhere, hence so is its max
    ("q_interval_sweep", ["event_type"], ["peak_concurrent"], [], []),
    ("q_data_tests", ["rule"], ["n_violations"], [], []),
    # s_nationkey is a dim FK (nation is copied, not replicated)
    ("q_salted_join", ["s_nationkey"], ["revenue", "n"], [], []),
    ("q_explode", ["word"], ["n"], [], []),
    # exact_parts = distinct offset partkeys xK; the sketch-validation
    # booleans must stay true at any SF (2% HLL vs 10% bound)
    ("q_approx_sketch", ["l_returnflag"], ["exact_parts"],
     ["parts_in_bound", "p50_in_bound", "p95_in_bound"], []),
    # med/MAD of a K-fold-duplicated multiset are exact (run-boundary
    # argument as q_stats), so the per-row outlier flag is invariant
    ("q_mad_anomaly", ["l_returnflag"], ["n_outliers"], ["med", "mad"], []),
    ("q_stream_restart", [], ["n_events", "n_users", "total_value"], [], []),
    # full-batch GD with a mean gradient: sums and n both scale xK, so
    # the 5-sweep trajectory is identical up to accumulation-order fp
    ("q_logreg_quality", ["fidx"], [], [], ["beta"]),
    # ---- round-15 widening -------------------------------------------
    # split assignment hashes md5(text) — content-derived, so every copy
    # of a text lands in its original split: n_docs/chars xK, and the
    # distinct-fingerprint count per split is exactly invariant
    ("q_split_leakfree", ["split"], ["n_docs", "total_chars"], ["n_clusters"], []),
    # SQL-surface rollup groups on (dim nation, content priority)
    ("q_sql_surface", ["n_name", "o_orderpriority"], ["n_orders", "revenue"], [], []),
]
# sample statistics (n-1 denominators): covar_samp/stddev_samp drift by
# ~(K-1)/(Kn) relative under replication — mathematically REQUIRED, not
# engine noise — so they get a 5e-5 relative band instead of 1e-6
GROUPED_LOOSE = {
    "q_corr_regr": (["l_returnflag"], ["corr_qp", "covar_p", "slope", "intercept"],
                    ["covar_s"]),
}
# predicates keyed on key % 10 (eval/batch splits): every OFF is a power
# of ten >= 1e9, so replica keys keep their mod-10 class and the split
# membership is replica-invariant
if OFF % 10 == 0:
    GROUPED += [
        ("q_dedup_incremental", ["source"], ["n_new", "n_rejected"], [], []),
        ("q_contamination", ["source"], ["n_train", "n_contaminated"], [], ["rate"]),
    ]
else:
    print("     q_dedup_incremental/q_contamination skipped: OFF % 10 != 0")
# q_zorder buckets on (key & 1023): valid only when OFF clears the
# 2^10 mask (1e10, 1e11, ... do; 1e9 carries a 512 residue)
if OFF % 1024 == 0:
    GROUPED += [("q_zorder", ["z_tile"], ["n"],
                 ["x_min", "x_max", "y_min", "y_max"], [])]
else:
    print("     q_zorder skipped: OFF % 1024 != 0 (replica x-buckets shift)")


def dec_places(x):
    s = repr(float(x))
    if "e" in s or "E" in s:
        # 1.01e-04 has 2 mantissa decimals shifted 4 places -> 6 dp; a
        # flat 9 here made col_quantum infer a spuriously fine grid for
        # any column whose small members render in scientific notation
        mant, exp = s.lower().split("e")
        frac = mant.split(".")[1] if "." in mant else ""
        return min(9, max(0, len(frac.rstrip("0")) - int(exp)))
    frac = s.split(".")[1] if "." in s else ""
    return min(9, len(frac.rstrip("0")))


def quantum(a, b):
    """Size of one step of the output's rounding grid. Queries round
    doubles to a fixed decimal count (2 for money, 4-6 for ratios); two
    correct values can sit one grid step apart from fp drift, and a xK
    comparison amplifies the sf(N) value's rounding by K. Inferred from
    the finest decimal representation actually present (zeros carry no
    information, so zero-valued sides are ignored)."""
    ds = [dec_places(v) for v in (a, b) if v not in (None, 0, 0.0)]
    return 10.0 ** -max(ds) if ds else 1e-9


def col_quantum(*cols):
    """Rounding grid of a WHOLE column (finest decimal count across every
    nonzero value in both outputs). A single compared pair can land on
    integral floats — e.g. a 2-dp money sum hitting .0 — which would
    infer a grid of 1.0 and make the xK tolerance (K+1)*0.6 ABSOLUTE
    units, masking genuine drift; any other value in the column showing
    decimals floors the grid for the pair too."""
    ds = [dec_places(v) for c in cols for v in c
          if isinstance(v, float) and v not in (None, 0.0)]
    return 10.0 ** -max(ds) if ds else None


def rel_ok(got, want, tol, ulps=1.1, qpair=None, q=None):
    """qpair: the two values AS OBSERVED in the outputs, for grid
    inference — a derived `want` (e.g. K*a) carries fp noise in its
    decimal representation and would make the inferred grid spuriously
    fine. q: an explicit (column-wide) grid, preferred when known."""
    if got is None and want is None:
        return True
    if got is None or want is None:
        return False
    if q is None:
        q = quantum(*qpair) if qpair else quantum(got, want)
    return abs(got - want) <= tol * abs(want) + ulps * q + 1e-9


for q, keys, xk_cols, inv_cols, tol_cols in GROUPED:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    d1, dK = load(OUT1, q), load(OUTK, q)
    if keys:
        k1, kK = keyed(d1, keys), keyed(dK, keys)
        check(f"{q} groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
        items = [(g, i, kK[g]) for g, i in k1.items() if g in kK]
    else:
        items = [((), 0, 0)]
    qcol = {c: col_quantum(d1[c], dK[c]) for c in xk_cols + tol_cols}
    for g, i, j in items:
        for c in xk_cols:
            a, b = d1[c][i], dK[c][j]
            if isinstance(a, float) or isinstance(b, float):
                # K amplifies the sf(N) side's rounding: K half-steps of
                # the grid plus the sf(K*N) side's own half-step
                check(f"{q} {c}{g} xK",
                      rel_ok(b, None if a is None else K * a, 1e-9,
                             ulps=(K + 1) * 0.6, qpair=(a, b), q=qcol[c]),
                      f"{a} -> {b}")
            else:
                check(f"{q} {c}{g} xK",
                      (a is None and b is None) or (a is not None and b == K * a),
                      f"{a} -> {b}")
        for c in inv_cols:
            check(f"{q} {c}{g} inv", str(d1[c][i]) == str(dK[c][j]),
                  f"{d1[c][i]} -> {dK[c][j]}")
        for c in tol_cols:
            check(f"{q} {c}{g} inv~",
                  rel_ok(dK[c][j], d1[c][i], 1e-6, q=qcol[c]),
                  f"{d1[c][i]} -> {dK[c][j]}")

for q, (keys, tol_cols, loose_cols) in GROUPED_LOOSE.items():
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    d1, dK = load(OUT1, q), load(OUTK, q)
    k1, kK = keyed(d1, keys), keyed(dK, keys)
    check(f"{q} groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    qcol = {c: col_quantum(d1[c], dK[c]) for c in tol_cols + loose_cols}
    for g, i in k1.items():
        if g not in kK:
            continue
        j = kK[g]
        for c in tol_cols:
            check(f"{q} {c}{g} inv~",
                  rel_ok(dK[c][j], d1[c][i], 1e-6, q=qcol[c]),
                  f"{d1[c][i]} -> {dK[c][j]}")
        for c in loose_cols:
            check(f"{q} {c}{g} inv~samp",
                  rel_ok(dK[c][j], d1[c][i], 5e-5, q=qcol[c]),
                  f"{d1[c][i]} -> {dK[c][j]} (n-1 sample denominator)")

# ---- global top-k over offset keys -------------------------------------
# ORDER BY <invariant measure> DESC, <key> LIMIT n: every sf(N) row has K
# copies tied on the measure, the key tiebreak interleaves them, so the
# sf(K*N) result collapses (key % OFF) onto EXACTLY the top n/K sf(N)
# rows, K copies each. Valid only when the sf(N) measure is strictly
# decreasing across the n/K cut (asserted; a tie would legitimately let
# deeper rows displace copies).
GLOBAL_TOPK = [
    ("q_topk", "o_orderkey", "o_totalprice"),
    ("q_shipping_priority", "l_orderkey", "revenue"),
]
for q, key, mcol in GLOBAL_TOPK:
    if not (glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet")):
        print(f"     {q} outputs absent - skipped")
        continue
    d1, dK = load(OUT1, q), load(OUTK, q)
    n1, nK = len(d1[key]), len(dK[key])
    check(f"{q} limit preserved", n1 == nK, f"{n1} vs {nK} rows")
    m = n1 // K
    order1 = sorted(range(n1), key=lambda i: (-d1[mcol][i], d1[key][i]))
    if n1 > m and d1[mcol][order1[m - 1]] == d1[mcol][order1[m]]:
        print(f"     {q} skipped: sf(N) measure ties across the top-{m} cut")
        continue
    cols = sorted(d1)
    want = Counter()
    for i in order1[:m]:
        want[tuple(str(d1[c][i]) for c in cols)] += K
    got = Counter(
        tuple(str(dK[c][i] % OFF if c == key else dK[c][i]) for c in cols)
        for i in range(nK))
    check(f"{q} top-{m} xK collapse", want == got,
          f"{nK} rows collapse onto top-{m} sf(N) rows x{K}")

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

# ---- bespoke algebras --------------------------------------------------
def have(q):
    ok = bool(glob.glob(f"{OUT1}/{q}/*.parquet") and glob.glob(f"{OUTK}/{q}/*.parquet"))
    if not ok:
        print(f"     {q} outputs absent - skipped")
    return ok


# ---- smoothed-score family ---------------------------------------------
# BM25's Robertson idf and DSIR's Laplace ratio change VALUES under xK
# (df -> K*df inside a +0.5 / +1 smoothing term), so pages can't be
# compared to sf(N) values — but every replica copy of a doc shares
# identical (tf, dl, lang) and therefore an identical smoothed score at
# the NEW SF. The top page must partition, on doc_id % OFF, into groups
# of exactly K rows (ids base + r*OFF, r = 0..K-1) sharing one score —
# except groups at the page's minimal score, where the LIMIT cut can
# legitimately land mid-group when distinct contents tie at the rounded
# boundary.
for q, key, mcol in [("q_bm25", "doc_id", "bm25"),
                     ("q_dsir_weights", "doc_id", "dsir_score")]:
    if not have(q):
        continue
    d1, dK = load(OUT1, q), load(OUTK, q)
    n = len(dK[key])
    check(f"{q} limit preserved", n == len(d1[key]),
          f"{len(d1[key])} vs {n} rows")
    check(f"{q} page sorted desc",
          all(dK[mcol][i] >= dK[mcol][i + 1] for i in range(n - 1)),
          "score order violated")
    groups = {}
    for i in range(n):
        groups.setdefault(dK[key][i] % OFF, []).append(i)
    min_score = min(dK[mcol]) if n else None
    bad = []
    for base, idxs in groups.items():
        scores = {dK[mcol][i] for i in idxs}
        if len(scores) != 1:
            bad.append((base, "copies disagree on score"))
        elif len(idxs) != K and scores != {min_score}:
            bad.append((base, f"partial group ({len(idxs)}) above boundary"))
        elif len(idxs) == K and \
                sorted(dK[key][i] // OFF for i in idxs) != list(range(K)):
            bad.append((base, "replica index set broken"))
    check(f"{q} page = xK replica groups", not bad, f"{bad[:3]}")

# add-one smoothing changes q_bigram_lm's per-doc scores under xK, but
# all K copies of a doc see the same content and the same corpus count
# tables, so they must score identically up to one 1e-6 rounding-grid
# step (per-group float sum order differs across copies)
if have("q_bigram_lm"):
    d1, dK = load(OUT1, "q_bigram_lm"), load(OUTK, "q_bigram_lm")
    n1, nK = len(d1["doc_id"]), len(dK["doc_id"])
    check("q_bigram_lm rows xK", nK == K * n1, f"{n1} -> {nK}")
    groups = {}
    for i in range(nK):
        groups.setdefault(dK["doc_id"][i] % OFF, []).append(dK["mean_logprob"][i])
    check("q_bigram_lm base ids preserved",
          set(groups) == set(d1["doc_id"]),
          f"{len(groups)} groups vs {n1} base docs")
    bad = [b for b, v in groups.items()
           if len(v) != K or max(v) - min(v) > 1.0000001e-6]
    check("q_bigram_lm copies score identically", not bad,
          f"{len(bad)} divergent groups, e.g. {bad[:3]}")

# q_ppl_bucket's tercile thresholds move with the smoothed lp values,
# so bucket MEMBERSHIP isn't derivable from sf(N) — but copies share lp
# and the comparisons run on rounded values, so each doc lands all K
# copies in ONE bucket: every n_docs is ≡ 0 (mod K) and they sum to
# K * sf(N) total
if have("q_ppl_bucket"):
    d1, dK = load(OUT1, "q_ppl_bucket"), load(OUTK, "q_ppl_bucket")
    check("q_ppl_bucket buckets", set(dK["bucket"]) == set(d1["bucket"]),
          f"{d1['bucket']} vs {dK['bucket']}")
    bad = [b for i, b in enumerate(dK["bucket"]) if dK["n_docs"][i] % K]
    check("q_ppl_bucket counts mod K", not bad, f"{bad}")
    check("q_ppl_bucket total xK",
          sum(dK["n_docs"]) == K * sum(d1["n_docs"]),
          f"{sum(d1['n_docs'])} -> {sum(dK['n_docs'])}")

# CDC changelog apply: the D/U/I classes are o_orderkey % 89/41/67, so
# when OFF clears all three moduli every replica's log membership is the
# residue-identical image of replica 0 and all four scalars scale xK
# exactly (total is integer-cent accumulated: compare at cents; K*cents
# stays far under 2^53). The 'I' keys (+2e8) never cross replicas while
# OFF > 2e8 + max base key (make_sf1 asserts max key < OFF).
if have("q_cdc_apply"):
    # The stated invariant is OFF % (89*41*67) == 0 AND the inserted
    # keys (base + 2e8) staying inside their replica, i.e.
    # max base key + 2e8 < OFF. The max base key is read from the xK
    # scalar-agg output when present (max_key - (K-1)*OFF recovers it);
    # otherwise fall back to the conservative documented bound.
    max_base = None
    if have("q_scalar_agg"):
        dS = load(OUTK, "q_scalar_agg")
        max_base = dS["max_key"][0] - (K - 1) * OFF
    insert_safe = (max_base is not None and max_base + 2 * 10**8 < OFF) \
        or (max_base is None and OFF > 2 * 10**8)
    if OFF % (89 * 41 * 67) == 0 and insert_safe:
        d1, dK = load(OUT1, "q_cdc_apply"), load(OUTK, "q_cdc_apply")
        for c in ["n_rows", "n_updated", "n_inserted"]:
            check(f"q_cdc_apply {c} xK", dK[c][0] == K * d1[c][0],
                  f"{d1[c][0]} -> {dK[c][0]}")
        c1, cK = round(d1["total"][0] * 100), round(dK["total"][0] * 100)
        check("q_cdc_apply total xK (cents)", cK == K * c1, f"{c1} -> {cK}")
    else:
        print(f"     q_cdc_apply skipped: OFF={OFF} fails moduli or "
              f"insert-containment (max base key {max_base})")

# scalar min/max over offset keys: max lives in the last replica
if have("q_scalar_agg"):
    d1, dK = load(OUT1, "q_scalar_agg"), load(OUTK, "q_scalar_agg")
    check("q_scalar_agg max_key", dK["max_key"][0] == d1["max_key"][0] + (K - 1) * OFF,
          f"{d1['max_key'][0]} -> {dK['max_key'][0]}")
    check("q_scalar_agg min_key inv", dK["min_key"][0] == d1["min_key"][0],
          f"{d1['min_key'][0]} -> {dK['min_key'][0]}")
    check("q_scalar_agg n_orders xK", dK["n_orders"][0] == K * d1["n_orders"][0],
          f"{d1['n_orders'][0]} -> {dK['n_orders'][0]}")

# simhash signature collapse: the 16-bit signature set is content-derived
# and replication-invariant, reps are min doc ids (replica 0), so cross-
# signature rows are invariant with pair mass xK^2; Hamming-0 rows carry
# Kn(Kn-1)/2, including NEW rows (n_pairs == K(K-1)/2) for signatures
# that were singletons at sf(N)
if have("q_simhash_band"):
    d1, dK = load(OUT1, "q_simhash_band"), load(OUTK, "q_simhash_band")
    p1 = {(d1["doc_a"][i], d1["doc_b"][i]): (d1["hamming"][i], d1["n_pairs"][i])
          for i in range(len(d1["doc_a"]))}
    pK = {(dK["doc_a"][i], dK["doc_b"][i]): (dK["hamming"][i], dK["n_pairs"][i])
          for i in range(len(dK["doc_a"]))}
    cross1 = {k: v for k, v in p1.items() if k[0] != k[1]}
    crossK = {k: v for k, v in pK.items() if k[0] != k[1]}
    check("q_simhash_band cross pairs inv", set(cross1) == set(crossK),
          f"{len(cross1)} vs {len(crossK)} rep pairs")
    bad = [k for k in cross1 if k in crossK and
           (crossK[k][0] != cross1[k][0] or crossK[k][1] != K * K * cross1[k][1])]
    check("q_simhash_band cross mass xK^2", not bad, f"{len(bad)} violations")
    zero1 = {k[0]: v[1] for k, v in p1.items() if k[0] == k[1]}
    zeroK = {k[0]: v[1] for k, v in pK.items() if k[0] == k[1]}
    check("q_simhash_band H0 carried", set(zero1) <= set(zeroK),
          f"{len(zero1)} -> {len(zeroK)} rows")
    bad = []
    for rep, pk in zeroK.items():
        if rep in zero1:
            # n(n-1)/2 = p1  ->  n = (1+sqrt(1+8 p1))/2, then Kn(Kn-1)/2
            n = round((1 + (1 + 8 * zero1[rep]) ** 0.5) / 2)
            if pk != (K * n) * (K * n - 1) // 2:
                bad.append(rep)
        elif pk != K * (K - 1) // 2:  # sf(N) singleton signature
            bad.append(rep)
    check("q_simhash_band H0 mass Kn(Kn-1)/2", not bad, f"{len(bad)} violations")

# jaro name collapse (round 13): the (brand, size, name) group set is
# content-derived and replication-invariant, reps are min partkeys
# (replica 0), so cross-name rows are invariant with identical jw and
# pair mass xK^2; intra-name (pk_a == pk_b) rows carry Kn(Kn-1)/2,
# including NEW rows (n_pairs == K(K-1)/2) for names that were unique
# at sf(N)
if have("q_jaro_fuzzy"):
    d1, dK = load(OUT1, "q_jaro_fuzzy"), load(OUTK, "q_jaro_fuzzy")
    p1 = {(d1["pk_a"][i], d1["pk_b"][i]): (d1["jw"][i], d1["n_pairs"][i])
          for i in range(len(d1["pk_a"]))}
    pK = {(dK["pk_a"][i], dK["pk_b"][i]): (dK["jw"][i], dK["n_pairs"][i])
          for i in range(len(dK["pk_a"]))}
    cross1 = {k: v for k, v in p1.items() if k[0] != k[1]}
    crossK = {k: v for k, v in pK.items() if k[0] != k[1]}
    check("q_jaro_fuzzy cross pairs inv", set(cross1) == set(crossK),
          f"{len(cross1)} vs {len(crossK)} rep pairs")
    bad = [k for k in cross1 if k in crossK and
           (crossK[k][0] != cross1[k][0] or crossK[k][1] != K * K * cross1[k][1])]
    check("q_jaro_fuzzy cross mass xK^2", not bad, f"{len(bad)} violations")
    intra1 = {k[0]: v[1] for k, v in p1.items() if k[0] == k[1]}
    intraK = {k[0]: v[1] for k, v in pK.items() if k[0] == k[1]}
    check("q_jaro_fuzzy intra carried", set(intra1) <= set(intraK),
          f"{len(intra1)} -> {len(intraK)} rows")
    bad = []
    for rep, pk in intraK.items():
        if rep in intra1:
            n = round((1 + (1 + 8 * intra1[rep]) ** 0.5) / 2)
            if pk != (K * n) * (K * n - 1) // 2:
                bad.append(rep)
        elif pk != K * (K - 1) // 2:  # name unique at sf(N)
            bad.append(rep)
    check("q_jaro_fuzzy intra mass Kn(Kn-1)/2", not bad, f"{len(bad)} violations")

# LSH buckets (n_docs > 1 filter): content-derived bucket ids are
# invariant; shared buckets scale xK and buckets NEW at sf(K*N) must have
# been singletons, hence carry exactly K docs
if have("q_lsh_buckets"):
    d1, dK = load(OUT1, "q_lsh_buckets"), load(OUTK, "q_lsh_buckets")
    b1 = {(d1["band"][i], d1["bucket"][i]): d1["n_docs"][i]
          for i in range(len(d1["band"]))}
    bK = {(dK["band"][i], dK["bucket"][i]): dK["n_docs"][i]
          for i in range(len(dK["band"]))}
    check("q_lsh_buckets carried", set(b1) <= set(bK), f"{len(b1)} -> {len(bK)}")
    bad = [k for k, n in bK.items()
           if (b1[k] * K if k in b1 else K) != n]
    check("q_lsh_buckets xK / new==K", not bad, f"{len(bad)} violations")

# bucket-graph clustering: replicas attach to the same content-derived
# buckets, so components are invariant and min-id labels live in replica
# 0 — but the output filters to cluster_size >= 2, and replication
# PROMOTES every sf(N) singleton into a K-member cluster of its own
# copies (cluster_id = its own id), so the slice gains exactly those rows
for q in ["q_lsh_clusters", "q_dup_clusters"]:
    if not have(q):
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    d1 = t1.to_pydict()
    s0 = tK.filter(pc.less(tK["doc_id"], OFF)).to_pydict()
    m1 = {d1["doc_id"][i]: (d1["cluster_id"][i], d1["cluster_size"][i])
          for i in range(len(d1["doc_id"]))}
    mK = {s0["doc_id"][i]: (s0["cluster_id"][i], s0["cluster_size"][i])
          for i in range(len(s0["doc_id"]))}
    # replicas are symmetric, so the K slices partition the output evenly
    check(f"{q} rowcount K*slice", tK.num_rows == K * len(mK),
          f"{tK.num_rows} rows = {K} x {len(mK)}")
    check(f"{q} carried labels", set(m1) <= set(mK) and
          all(mK[d][0] == m1[d][0] and mK[d][1] == K * m1[d][1] for d in m1),
          f"{len(m1)} sf(N) rows: labels invariant, sizes xK")
    promoted = set(mK) - set(m1)
    check(f"{q} promoted singletons", all(mK[d] == (d, K) for d in promoted),
          f"{len(promoted)} sf(N)-singletons now own-cluster of {K} copies")

# normalized-content dedup: fp and canonical flags are replica-0-stable,
# cluster populations scale xK
if have("q_dedup_norm"):
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_dedup_norm/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/q_dedup_norm/*.parquet"))
    check("q_dedup_norm rowcount xK", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    d1 = t1.to_pydict()
    s0 = tK.filter(pc.less(tK["doc_id"], OFF)).to_pydict()
    m1 = {d1["doc_id"][i]: (d1["fp"][i], d1["cluster_n"][i], d1["is_canonical"][i])
          for i in range(len(d1["doc_id"]))}
    mK = {s0["doc_id"][i]: (s0["fp"][i], s0["cluster_n"][i], s0["is_canonical"][i])
          for i in range(len(s0["doc_id"]))}
    check("q_dedup_norm replica-0 slice", set(m1) == set(mK) and
          all(mK[d][0] == m1[d][0] and mK[d][1] == K * m1[d][1]
              and mK[d][2] == m1[d][2] for d in m1),
          f"{len(m1)} docs, fp/canonical invariant, cluster_n xK")

# global index: replica keys interleave in the hash order, but replica-0
# docs keep their RELATIVE order (same hash keys), and the total xK
if have("q_global_index"):
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_global_index/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/q_global_index/*.parquet"))
    check("q_global_index rowcount xK", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    seq1 = [d for _, d in sorted(zip(t1["global_idx"].to_pylist(),
                                     t1["doc_id"].to_pylist()))]
    s0 = tK.filter(pc.less(tK["doc_id"], OFF))
    seqK = [d for _, d in sorted(zip(s0["global_idx"].to_pylist(),
                                     s0["doc_id"].to_pylist()))]
    check("q_global_index replica-0 order", seq1 == seqK,
          f"{len(seq1)} docs keep their relative hash order")

# shard manifest: shard CONTENTS interleave replicas in the hash order
# (replica doc_ids hash differently), but the tiling audit is structural
# at ANY size — consecutive shard_ids, ranges tiling [0, N) gaplessly in
# 50s with a partial tail — and the totals are exact: Σ n_docs xK,
# Σ n_chars xK (content is replicated verbatim)
if have("q_shard_manifest"):
    d1, dK = load(OUT1, "q_shard_manifest"), load(OUTK, "q_shard_manifest")
    n1, nK = sum(d1["n_docs"]), sum(dK["n_docs"])
    check("q_shard_manifest total docs xK", nK == K * n1, f"{n1} -> {nK}")
    check("q_shard_manifest total chars xK",
          sum(dK["n_chars"]) == K * sum(d1["n_chars"]),
          f"{sum(d1['n_chars'])} -> {sum(dK['n_chars'])}")
    for tag, d, n in (("sfN", d1, n1), ("sfKN", dK, nK)):
        shards = sorted(zip(d["shard_id"], d["idx_lo"], d["idx_hi"], d["n_docs"]))
        ok = (all(s == i for i, (s, _, _, _) in enumerate(shards))
              and all(lo == 50 * s and hi == min(50 * s + 49, n - 1)
                      and nd == hi - lo + 1 for s, lo, hi, nd in shards))
        check(f"q_shard_manifest {tag} tiling", ok,
              f"{len(shards)} shards tile [0, {n}) in 50s")

# media queries that FILTER on kind: kind = doc_id % 3 rotates per
# replica (OFF % 3 == 1), so global rowcounts are NOT xK — but replica-0
# rows are untouched, so the slice must still match exactly
for q in ["q_media_resize", "q_frame_sample"]:
    if not have(q):
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    s0 = tK.filter(pc.less(tK["media_id"], OFF)).to_pydict()
    check(f"{q} replica-0 slice", rows_ms(s0) == rows_ms(t1.to_pydict()),
          f"{t1.num_rows} rows (kind rotates per replica, no global xK)")

# content-address: per-doc sha is invariant, its corpus multiplicity xK
if have("q_sha_address"):
    d1 = load(OUT1, "q_sha_address")
    tK = pq.read_table(glob.glob(f"{OUTK}/q_sha_address/*.parquet"))
    check("q_sha_address rowcount xK", tK.num_rows == K * len(d1["doc_id"]),
          f"{len(d1['doc_id'])} -> {tK.num_rows}")
    s0 = tK.filter(pc.less(tK["doc_id"], OFF)).to_pydict()
    m1 = {d1["doc_id"][i]: (d1["sha16"][i], d1["n_same"][i])
          for i in range(len(d1["doc_id"]))}
    mK = {s0["doc_id"][i]: (s0["sha16"][i], s0["n_same"][i])
          for i in range(len(s0["doc_id"]))}
    check("q_sha_address sha inv, n_same xK", set(m1) == set(mK) and
          all(mK[d][0] == m1[d][0] and mK[d][1] == K * m1[d][1] for d in m1),
          f"{len(m1)} docs")

# co-purchase: pairs and their co-occurrence counts are replica-local
# (orders never cross replicas) so n_both is INVARIANT, while
# lift = n_both*N/(n_a*n_b) scales xK: N grows xK but each offset part's
# own basket count does not
if have("q_copurchase"):
    d1, dK = load(OUT1, "q_copurchase"), load(OUTK, "q_copurchase")
    m1 = {(d1["part_a"][i], d1["part_b"][i]): (d1["n_both"][i], d1["lift"][i])
          for i in range(len(d1["part_a"]))}
    mK = {(dK["part_a"][i], dK["part_b"][i]): (dK["n_both"][i], dK["lift"][i])
          for i in range(len(dK["part_a"])) if dK["part_a"][i] < OFF}
    # pairs are replica-local and EXACT: the replica-0 slice must equal
    # the sf(N) pair set in both directions — an extra pair appearing
    # only at sf(K*N) is as much a violation as a dropped one
    check("q_copurchase pairs exact", set(m1) == set(mK),
          f"{len(m1)} vs {len(mK)} replica-0 pairs"
          + (f"; extras {sorted(set(mK) - set(m1))[:5]}" if set(mK) - set(m1) else "")
          + (f"; missing {sorted(set(m1) - set(mK))[:5]}" if set(m1) - set(mK) else ""))
    q_lift = col_quantum(d1["lift"], dK["lift"])
    check("q_copurchase n_both inv, lift xK",
          all(mK[p][0] == m1[p][0] and
              rel_ok(mK[p][1], K * m1[p][1], 1e-9, ulps=(K + 1) * 0.6,
                     qpair=(m1[p][1], mK[p][1]), q=q_lift)
              for p in m1 if p in mK), f"{len(m1)} pairs")

# bit aggregates: AND/OR are idempotent under duplication; XOR of a
# K-fold-duplicated multiset is 0 for even K (every value cancels)
if have("q_bool_bit_aggs"):
    d1, dK = load(OUT1, "q_bool_bit_aggs"), load(OUTK, "q_bool_bit_aggs")
    k1, kK = keyed(d1, ["l_returnflag"]), keyed(dK, ["l_returnflag"])
    check("q_bool_bit_aggs groups", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    for g, i in k1.items():
        j = kK[g]
        ok = (dK["all_pos"][j] == d1["all_pos"][i]
              and dK["any_deep_disc"][j] == d1["any_deep_disc"][i]
              and dK["n_high_tax"][j] == K * d1["n_high_tax"][i]
              and dK["line_band"][j] == d1["line_band"][i]
              and dK["line_bor"][j] == d1["line_bor"][i]
              and dK["line_bxor"][j] == (d1["line_bxor"][i] if K % 2 else 0))
        check(f"q_bool_bit_aggs{g}", ok,
              "bool/AND/OR inv, count xK, XOR " + ("inv" if K % 2 else "0"))

# skew gates: the engineered hot user (-42) is remapped IN-QUERY, so all
# K replicas' hot rows merge into one group (xK); every natural user is
# replica-local (slice on 0 <= user_id < OFF)
for q in ["q_skew_salted_agg", "q_skew_salted_agg_stable"]:
    if not have(q):
        continue
    t1 = pq.read_table(glob.glob(f"{OUT1}/{q}/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/{q}/*.parquet"))
    d1 = t1.to_pydict()
    hot1 = {d1["user_id"][i]: (d1["n"][i], d1["sum_value"][i])
            for i in range(len(d1["user_id"])) if d1["user_id"][i] < 0}
    hK = tK.filter(pc.less(tK["user_id"], 0)).to_pydict()
    hotK = {hK["user_id"][i]: (hK["n"][i], hK["sum_value"][i])
            for i in range(len(hK["user_id"]))}
    q_sum = col_quantum(d1["sum_value"], hK["sum_value"])
    check(f"{q} hot group xK", set(hot1) == set(hotK) and
          all(hotK[u][0] == K * hot1[u][0] and
              rel_ok(hotK[u][1], K * hot1[u][1], 1e-9, ulps=(K + 1) * 0.6,
                     qpair=(hot1[u][1], hotK[u][1]), q=q_sum)
              for u in hot1),
          f"hot users {sorted(hot1)}: n xK, sum xK")
    cold1 = {c: [v for u, v in zip(d1["user_id"], d1[c]) if u >= 0]
             for c in d1}
    c0 = tK.filter(pc.and_(pc.greater_equal(tK["user_id"], 0),
                           pc.less(tK["user_id"], OFF))).to_pydict()
    check(f"{q} natural-user slice", rows_ms(cold1) == rows_ms(c0),
          f"{len(cold1['user_id'])} vs {len(c0['user_id'])} rows")

# k-anonymity (groups with n < 8): QI keys live in dim domains, so a
# group's population is exactly xK — the expected sf(K*N) output is
# DERIVABLE from sf(N): the groups whose K-fold population still sits
# under the threshold (empty at K=10, which is itself the semantics:
# replication heals every re-identification risk it can't create)
if have("q_k_anonymity"):
    d1, dK = load(OUT1, "q_k_anonymity"), load(OUTK, "q_k_anonymity")
    want = {(d1["c_nationkey"][i], d1["c_mktsegment"][i]): K * d1["n"][i]
            for i in range(len(d1["n"])) if K * d1["n"][i] < 8}
    got = {(dK["c_nationkey"][i], dK["c_mktsegment"][i]): dK["n"][i]
           for i in range(len(dK["n"]))}
    check("q_k_anonymity derived risky set", want == got,
          f"{len(d1['n'])} sf(N) risky groups -> {len(got)} (expected {len(want)})")

# deterministic hash sampling: n_total is exact xK; n_sampled mixes
# replica hashes (doc_id is salted into the md5), so it is NOT exact —
# but replica 0 contributes exactly the sf(N) count and every other
# replica's rate is md5-uniform at ~10%: bound each non-0 replica's
# aggregate rate to [5%, 15%], far beyond any plausible md5 deviation at
# these stratum sizes yet tight enough to catch a broken predicate
if have("q_hash_sample"):
    d1, dK = load(OUT1, "q_hash_sample"), load(OUTK, "q_hash_sample")
    k1, kK = keyed(d1, ["lang"]), keyed(dK, ["lang"])
    check("q_hash_sample langs", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    for g, i in k1.items():
        if g not in kK:
            continue
        j = kK[g]
        check(f"q_hash_sample n_total{g} xK",
              dK["n_total"][j] == K * d1["n_total"][i],
              f"{d1['n_total'][i]} -> {dK['n_total'][j]}")
        rest = dK["n_sampled"][j] - d1["n_sampled"][i]
        lo, hi = 0.05 * (K - 1) * d1["n_total"][i], 0.15 * (K - 1) * d1["n_total"][i]
        check(f"q_hash_sample n_sampled{g} band", lo <= rest <= hi,
              f"non-replica-0 sampled {rest} of {(K - 1) * d1['n_total'][i]} "
              f"(band [{lo:.0f}, {hi:.0f}])")

# duplicate-span profile: replication makes EVERY shingle corpus-shared
# (each gram gains K-1 verbatim copies in other doc_ids), so the measure
# SATURATES — n_shared == n_grams and shared_frac == 1.0 for every doc —
# while per-doc n_grams stays invariant and rows scale xK. The saturated
# state is the semantics a span-dedup must show on a fully-replicated
# corpus, and it is fully derivable from the sf(N) output.
if have("q_dup_spans"):
    d1, dK = load(OUT1, "q_dup_spans"), load(OUTK, "q_dup_spans")
    base = {d1["doc_id"][i]: d1["n_grams"][i] for i in range(len(d1["doc_id"]))}
    check("q_dup_spans rowcount xK", len(dK["doc_id"]) == K * len(base),
          f"{len(base)} -> {len(dK['doc_id'])}")
    bad = [i for i in range(len(dK["doc_id"]))
           if dK["n_grams"][i] != base.get(dK["doc_id"][i] % OFF)
           or dK["n_shared"][i] != dK["n_grams"][i]
           or dK["shared_frac"][i] != 1.0]
    check("q_dup_spans saturation", not bad,
          f"{len(bad)} rows violate n_grams inv / n_shared==n_grams / frac==1.0")

# column profile: the relation depends on which column each ROW profiles
# — key columns have xK distincts and an offset-dependent max, content
# columns are invariant; min/max are VARCHAR-ordered so only content
# rows assert them (a lexicographic max can keep or change under new
# key prefixes depending on leading digits)
if have("q_profile"):
    d1, dK = load(OUT1, "q_profile"), load(OUTK, "q_profile")
    k1, kK = keyed(d1, ["col_name"]), keyed(dK, ["col_name"])
    check("q_profile cols", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    KEY_COLS = {"l_orderkey", "l_suppkey"}
    for g, i in k1.items():
        if g not in kK:
            continue
        j = kK[g]
        ok = (dK["n_rows"][j] == K * d1["n_rows"][i]
              and dK["n_nulls"][j] == K * d1["n_nulls"][i])
        if g[0] in KEY_COLS:
            ok = ok and dK["n_distinct"][j] == K * d1["n_distinct"][i]
            detail = "rows/nulls/distinct xK (key column)"
        else:
            ok = (ok and dK["n_distinct"][j] == d1["n_distinct"][i]
                  and dK["min_s"][j] == d1["min_s"][i]
                  and dK["max_s"][j] == d1["max_s"][i])
            detail = "rows/nulls xK, distinct/min/max inv (content column)"
        check(f"q_profile {g}", ok, detail)

# skewed sessionization: the -42 hot user is remapped IN-QUERY from
# user_id % 5 == 0 (OFF % 5 == 0 keeps the class), so all K replicas'
# hot events merge at IDENTICAL timestamps — duplicate timestamps can't
# open a session gap, so the hot user keeps its session ids and
# start/end while n_events and value scale xK; natural users are
# replica-local (slice identity)
if OFF % 5 == 0 and have("q_skew_sessionize"):
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_skew_sessionize/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/q_skew_sessionize/*.parquet"))
    d1 = t1.to_pydict()
    hot1 = {d1["session_id"][i]: (d1["n_events"][i], d1["start_us"][i],
                                  d1["end_us"][i], d1["total_value"][i])
            for i in range(len(d1["user_id"])) if d1["user_id"][i] < 0}
    hK = tK.filter(pc.less(tK["user_id"], 0)).to_pydict()
    hotK = {hK["session_id"][i]: (hK["n_events"][i], hK["start_us"][i],
                                  hK["end_us"][i], hK["total_value"][i])
            for i in range(len(hK["user_id"]))}
    check("q_skew_sessionize rowcount",
          tK.num_rows == K * (t1.num_rows - len(hot1)) + len(hotK),
          f"{t1.num_rows} -> {tK.num_rows} (hot sessions merge, not multiply)")
    q_val = col_quantum(d1["total_value"], hK["total_value"])
    check("q_skew_sessionize hot sessions merged",
          set(hot1) == set(hotK) and
          all(hotK[sid][0] == K * hot1[sid][0]
              and hotK[sid][1] == hot1[sid][1] and hotK[sid][2] == hot1[sid][2]
              and rel_ok(hotK[sid][3], K * hot1[sid][3], 1e-9,
                         ulps=(K + 1) * 0.6,
                         qpair=(hot1[sid][3], hotK[sid][3]), q=q_val)
              for sid in hot1),
          f"{len(hot1)} hot sessions: ids/start/end inv, n/value xK")
    cold1 = {c: [v for u, v in zip(d1["user_id"], d1[c]) if u >= 0] for c in d1}
    c0 = tK.filter(pc.and_(pc.greater_equal(tK["user_id"], 0),
                           pc.less(tK["user_id"], OFF))).to_pydict()
    check("q_skew_sessionize natural slice", rows_ms(cold1) == rows_ms(c0),
          f"{len(cold1['user_id'])} vs {len(c0['user_id'])} rows")

# ---- round-15 bespoke algebras ------------------------------------------

# lateral top-2 per nation: customers replicate with name/acctbal verbatim,
# so sf(K*N)'s per-nation pool holds K copies of every sf(N) customer, all
# tying on the FULL sort key (acctbal DESC, c_name) — the top 2 are two
# copies of sf(N)'s rank-1 row, whichever physical copies the limit picks
# (the output columns carry no key, so the result multiset is determined)
if have("q_lateral_topk"):
    d1, dK = load(OUT1, "q_lateral_topk"), load(OUTK, "q_lateral_topk")
    by1, byK = {}, {}
    for i in range(len(d1["n_name"])):
        by1.setdefault(d1["n_name"][i], []).append(
            (d1["c_name"][i], d1["c_acctbal"][i]))
    for i in range(len(dK["n_name"])):
        byK.setdefault(dK["n_name"][i], []).append(
            (dK["c_name"][i], dK["c_acctbal"][i]))
    check("q_lateral_topk nations", set(by1) == set(byK),
          f"{len(by1)} vs {len(byK)}")
    bad = [n for n in by1 if n in byK and byK[n] != [by1[n][0]] * 2]
    check("q_lateral_topk top-1 doubled", not bad,
          f"{len(bad)} nations violate [rank-1 row x2] (copies tie on the full sort key)")

# media stats: kind = doc_id % 3 rotates per replica (replica j shifts the
# kind index by (j*OFF) % 3), so per-kind counts/bytes are NOT xK — they
# are an EXACT convolution of the sf(N) per-kind values with the shift
# multiplicities m(s) = #{j : (j*OFF) % 3 == s}
if have("q_media_stats"):
    d1, dK = load(OUT1, "q_media_stats"), load(OUTK, "q_media_stats")
    KIDX = {"image": 0, "audio": 1, "video": 2}
    n1 = {KIDX[d1["kind"][i]]: (d1["n"][i], d1["total_bytes"][i])
          for i in range(len(d1["kind"]))}
    m = Counter((j * OFF) % 3 for j in range(K))
    for i in range(len(dK["kind"])):
        k_ = KIDX[dK["kind"][i]]
        want_n = sum(m[s] * n1.get((k_ - s) % 3, (0, 0))[0] for s in m)
        want_b = sum(m[s] * n1.get((k_ - s) % 3, (0, 0))[1] for s in m)
        # want_n == 0 with the kind present at sf(K*N) is a genuine
        # violation - short-circuit before the avg_bytes division so it
        # reports as a normal FAIL instead of a ZeroDivisionError
        ok = (dK["n"][i] == want_n and dK["total_bytes"][i] == want_b
              and want_n > 0
              and abs(dK["avg_bytes"][i] - want_b / want_n) < 0.006)
        check(f"q_media_stats {dK['kind'][i]} rotation", ok,
              f"n {want_n}, bytes {want_b} (shift multiplicities {dict(m)})")

# exact substring dedup: a gram's corpus-wide first occurrence is the min
# (doc_id, pos), which replication never moves (added copies only have
# LARGER doc_ids) — so the replica-0 slice is byte-identical, while every
# replica-j>=1 doc saturates: all its n-7 grams are non-first, the
# overlapping marks merge into one full-cover island
if have("q_span_dedup"):
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_span_dedup/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/q_span_dedup/*.parquet"))
    check("q_span_dedup rowcount xK", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    s0 = tK.filter(pc.less(tK["doc_id"], OFF)).to_pydict()
    check("q_span_dedup replica-0 slice",
          rows_ms(s0) == rows_ms(t1.to_pydict()),
          f"{t1.num_rows} rows (first occurrences never move)")
    rep = tK.filter(pc.greater_equal(tK["doc_id"], OFF)).to_pydict()
    ntok1 = {t1["doc_id"][i].as_py(): t1["n_tokens"][i].as_py()
             for i in range(t1.num_rows)}
    bad = []
    for i in range(len(rep["doc_id"])):
        n = ntok1.get(rep["doc_id"][i] % OFF)
        if n is None:
            bad.append(rep["doc_id"][i])
            continue
        cov = n if n >= 8 else 0
        if (rep["n_tokens"][i] != n or rep["n_covered"][i] != cov
                or rep["n_retained"][i] != n - cov
                or rep["n_dup_spans"][i] != max(0, n - 7)):
            bad.append(rep["doc_id"][i])
    check("q_span_dedup replica saturation", not bad,
          f"{len(rep['doc_id'])} replica rows fully covered "
          f"(n_dup_spans=n-7, retained 0); {len(bad)} violations")

# substring-dedup rewrite: same first-occurrence argument — replica-0
# slice identical; every replica-j>=1 doc with >= 8 tokens rewrites to
# the empty string (md5 of "" is a constant), and a doc with < 8 tokens
# has no grams anywhere, so its rewrite equals its sf(N) row verbatim
if have("q_span_rewrite") and have("q_span_dedup"):
    EMPTY_MD5 = "d41d8cd98f00b204e9800998ecf8427e"
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_span_rewrite/*.parquet"))
    tK = pq.read_table(glob.glob(f"{OUTK}/q_span_rewrite/*.parquet"))
    check("q_span_rewrite rowcount xK", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    s0 = tK.filter(pc.less(tK["doc_id"], OFF)).to_pydict()
    check("q_span_rewrite replica-0 slice",
          rows_ms(s0) == rows_ms(t1.to_pydict()),
          f"{t1.num_rows} rows")
    base1 = t1.to_pydict()
    row1 = {base1["doc_id"][i]: (base1["n_retained"][i], base1["rewrite_md5"][i])
            for i in range(len(base1["doc_id"]))}
    sd1 = pq.read_table(glob.glob(f"{OUT1}/q_span_dedup/*.parquet")).to_pydict()
    ntok1 = dict(zip(sd1["doc_id"], sd1["n_tokens"]))
    rep = tK.filter(pc.greater_equal(tK["doc_id"], OFF)).to_pydict()
    bad = []
    for i in range(len(rep["doc_id"])):
        base = rep["doc_id"][i] % OFF
        # a replica whose base id is absent from the sf(N) outputs is a
        # violation, not a crash (mirrors the q_span_dedup loop's .get)
        if base not in ntok1 or base not in row1:
            bad.append(rep["doc_id"][i])
            continue
        want = (0, EMPTY_MD5) if ntok1[base] >= 8 else row1[base]
        if (rep["n_retained"][i], rep["rewrite_md5"][i]) != want:
            bad.append(rep["doc_id"][i])
    check("q_span_rewrite replica saturation", not bad,
          f"{len(rep['doc_id'])} replica rows rewrite to '' (>=8 tok) "
          f"or verbatim (<8 tok); {len(bad)} violations")

# temperature resampling: language shares p and p^tau/Z are pure ratios —
# the WEIGHT column is exactly invariant and n_in scales xK. n_out's
# stochastic-rounding part mixes replica hashes (md5 of doc_id), so the
# floor part is exact and the fractional part gets a q_hash_sample-style
# uniformity band over the K-1 non-0 replicas
if have("q_temperature_mix"):
    d1, dK = load(OUT1, "q_temperature_mix"), load(OUTK, "q_temperature_mix")
    k1, kK = keyed(d1, ["lang"]), keyed(dK, ["lang"])
    check("q_temperature_mix langs", set(k1) == set(kK), f"{len(k1)} vs {len(kK)}")
    for g, i in k1.items():
        if g not in kK:
            continue
        j = kK[g]
        check(f"q_temperature_mix weight{g} inv",
              dK["weight"][j] == d1["weight"][i],
              f"{d1['weight'][i]} (pure ratio of shares)")
        check(f"q_temperature_mix n_in{g} xK", dK["n_in"][j] == K * d1["n_in"][i],
              f"{d1['n_in'][i]} -> {dK['n_in'][j]}")
        import math
        w = d1["weight"][i]
        fl, frac = int(math.floor(w)), w - math.floor(w)
        n1_ = d1["n_in"][i]
        rest = dK["n_out"][j] - (K - 1) * fl * n1_ - d1["n_out"][i]
        lo = (K - 1) * n1_ * max(0.0, frac * 0.5 - 0.02)
        hi = (K - 1) * n1_ * min(1.0, frac * 1.5 + 0.02) + 1
        check(f"q_temperature_mix n_out{g} band", lo <= rest <= hi,
              f"floor part exact; non-0-replica frac draws {rest} of "
              f"{(K - 1) * n1_} (frac {frac:.4f}, band [{lo:.0f}, {hi:.0f}])")

# sequence packing: the md5 shuffle order interleaves replicas, so bin
# MEMBERSHIP changes — but per-lang totals are exact xK, and the bin ids
# must tile the running token total at BOTH SFs: each present bin b
# satisfies b == floor(prefix_tokens / 4096) (bins are contiguous runs of
# the cumsum, so the check is derivable from the output alone)
if have("q_pack_sequences"):
    for tag, out in (("sfN", OUT1), ("sfKN", OUTK)):
        d = load(out, "q_pack_sequences")
        by = {}
        for i in range(len(d["lang"])):
            by.setdefault(d["lang"][i], []).append(
                (d["bin"][i], d["n_docs"][i], d["bin_tokens"][i]))
        bad = []
        for lang, rows_ in by.items():
            cum = 0
            for b, _, tok in sorted(rows_):
                if b != cum // 4096:
                    bad.append((lang, b))
                cum += tok
        check(f"q_pack_sequences {tag} tiling", not bad,
              f"{sum(len(v) for v in by.values())} bins satisfy "
              f"b == floor(prefix/4096); {len(bad)} violations")
    d1, dK = load(OUT1, "q_pack_sequences"), load(OUTK, "q_pack_sequences")
    tot1, totK = {}, {}
    for i in range(len(d1["lang"])):
        a, b = tot1.get(d1["lang"][i], (0, 0))
        tot1[d1["lang"][i]] = (a + d1["n_docs"][i], b + d1["bin_tokens"][i])
    for i in range(len(dK["lang"])):
        a, b = totK.get(dK["lang"][i], (0, 0))
        totK[dK["lang"][i]] = (a + dK["n_docs"][i], b + dK["bin_tokens"][i])
    check("q_pack_sequences per-lang totals xK",
          set(tot1) == set(totK) and all(
              totK[l] == (K * tot1[l][0], K * tot1[l][1]) for l in tot1),
          f"{len(tot1)} langs: docs and tokens both xK")


# deterministic-hash selections (exact-k / cap / ES top-k): the hash pool
# at sf(K*N) is a SUPERSET of sf(N)'s (replica-0 keys hash identically),
# so the selection is downward-closed — the replica-0 members of the
# sf(K*N) pick, in rank order, must be a PREFIX of sf(N)'s ranking
def prefix_gate(q, group_col, id_col, expect_rows):
    if not have(q):
        return
    d1, dK = load(OUT1, q), load(OUTK, q)
    g1, gK = {}, {}
    for i in range(len(d1[id_col])):
        g1.setdefault(d1[group_col][i] if group_col else "", []).append(
            (d1["rank"][i], d1[id_col][i]))
    for i in range(len(dK[id_col])):
        gK.setdefault(dK[group_col][i] if group_col else "", []).append(
            (dK["rank"][i], dK[id_col][i]))
    check(f"{q} groups", set(g1) == set(gK), f"{len(g1)} vs {len(gK)}")
    bad_n, bad_p = [], []
    for g, rows1 in g1.items():
        if g not in gK:
            continue
        rowsK = sorted(gK[g])
        want_n = expect_rows(len(rows1))
        if len(rowsK) != want_n:
            bad_n.append(g)
        ids1 = [d for _, d in sorted(rows1)]
        sub = [d for _, d in rowsK if d < OFF]
        if ids1[:len(sub)] != sub:
            bad_p.append(g)
    check(f"{q} per-group rowcount", not bad_n,
          f"{len(bad_n)} groups off the derived count")
    check(f"{q} replica-0 prefix", not bad_p,
          f"selection is downward-closed in the hash order; {len(bad_p)} violations")


# per-lang held-out k=50: a stratum with n < 50 docs at sf(N) shows n rows
# there and min(50, K*n) at sf(K*N); a full stratum stays at 50
prefix_gate("q_sample_exact_k", "lang", "doc_id", lambda n1_: min(50, K * n1_))
# per-source cap 10: a source with n < 10 docs at sf(N) has min(10, K*n) at sf(K*N)
prefix_gate("q_source_cap", "source", "doc_id", lambda n1_: min(10, K * n1_))
# ES weighted top-100 (global stratum)
prefix_gate("q_weighted_sample", None, "doc_id", lambda n1_: min(100, K * n1_))
# ...plus the ES key dominance: the pool superset can only RAISE the
# r-th largest key (replica-0 keys are identical), never lower it
if have("q_weighted_sample"):
    d1, dK = load(OUT1, "q_weighted_sample"), load(OUTK, "q_weighted_sample")
    e1 = [v for _, v in sorted(zip(d1["rank"], d1["es_key"]))]
    eK = [v for _, v in sorted(zip(dK["rank"], dK["es_key"]))]
    bad = [r for r in range(min(len(e1), len(eK))) if eK[r] < e1[r] - 2e-6]
    check("q_weighted_sample key dominance", not bad,
          f"per-rank ES key monotone under the superset pool; {len(bad)} violations")

# ANN top-5 family (queries pinned to low vec_ids, so the query set is
# exactly sf(N)'s replica-0 vectors): every vector gains K-1 verbatim
# copies, including the query itself (self is excluded only by exact id),
# so the sf(K*N) neighbor list is the id-ordered merge of the sf(N)
# exact-duplicate set's copies and the query's own copies — all at
# cos == 1.0 (K-1 >= 5 guarantees the cut never reaches cos < 1). This
# holds for every content-deterministic ANN path, not just brute force:
#  - q_lsh_ann / q_lsh_ann_multi: hyperplanes are a pure function of the
#    embedding, so a copy lands in its original's bucket (incl. the
#    query's own bucket for self copies);
#  - q_ivf_ann: the 8 seed centroids are the lowest vec_ids = replica-0
#    vectors, so centroids, cell assignment, and the probe set are
#    identical at both SFs and copies co-locate with their originals;
#  - q_rp_ann: the JL sketch is content-deterministic, so the sk_cos=1.0
#    group (dup copies + self copies, id-ordered) tops the 20-cut, and
#    the exact rerank keeps only true cos=1.0 rows — sketch collisions
#    can enter the shortlist but never the final page (9 self copies
#    already saturate it);
#  - q_ivf_ann_iter: each Lloyd sweep's per-cell membership multiset at
#    sf(K*N) is K verbatim copies of sf(N)'s, so the per-dim double mean
#    differs only in accumulation order (~1e-13) and the float32
#    centroid cast (ULP ~6e-8) absorbs it — the trained centroids are
#    byte-identical at both SFs, reducing to the q_ivf_ann case.
for ann_q in ("q_cosine_topk", "q_lsh_ann", "q_lsh_ann_multi",
              "q_ivf_ann", "q_ivf_ann_iter", "q_rp_ann"):
    if not (K >= 6 and have(ann_q)):
        continue
    d1, dK = load(OUT1, ann_q), load(OUTK, ann_q)
    by1, byK = {}, {}
    for i in range(len(d1["q_id"])):
        by1.setdefault(d1["q_id"][i], []).append(
            (d1["rank"][i], d1["vec_id"][i], d1["cos"][i]))
    for i in range(len(dK["q_id"])):
        byK.setdefault(dK["q_id"][i], []).append(
            (dK["rank"][i], dK["vec_id"][i], dK["cos"][i]))
    check(f"{ann_q} queries", set(by1) == set(byK), f"{len(by1)} vs {len(byK)}")
    bad = []
    for q_, rows1 in by1.items():
        if q_ not in byK:
            continue
        dup_ids = [v for r, v, c in sorted(rows1) if c == 1.0]
        pool = sorted([v + j * OFF for v in dup_ids for j in range(K)]
                      + [q_ + j * OFF for j in range(1, K)])
        want = [(r + 1, v, 1.0) for r, v in enumerate(pool[:5])]
        if sorted(byK[q_]) != want:
            bad.append(q_)
    check(f"{ann_q} duplicate-flood expansion", not bad,
          f"top-5 = id-ordered copies of the sf(N) dup set + self copies; "
          f"{len(bad)} violations")

# PQ/ADC top-5: the per-subspace codebooks are the k lowest vec_ids =
# replica-0 seeds (iters = 0), so encoding is content-deterministic and
# every copy ties its original's ADC distance exactly. The sf(K*N) page
# is the first 5 of the (adc, id)-ordered merge of the K-expanded sf(N)
# page and the query's own K-1 copies (whose self-ADC is not visible in
# the sf(N) output — self is id-excluded there): so the check removes
# the observed self-copy rows and requires the remainder to be a strict
# prefix of the expanded sf(N) page, with the self rows themselves at
# one shared ADC value and consecutive replica indices.
if K >= 6 and have("q_pq_ann"):
    d1, dK = load(OUT1, "q_pq_ann"), load(OUTK, "q_pq_ann")
    by1, byK = {}, {}
    for i in range(len(d1["q_id"])):
        by1.setdefault(d1["q_id"][i], []).append(
            (d1["rank"][i], d1["adc_dist"][i], d1["vec_id"][i]))
    for i in range(len(dK["q_id"])):
        byK.setdefault(dK["q_id"][i], []).append(
            (dK["rank"][i], dK["adc_dist"][i], dK["vec_id"][i]))
    check("q_pq_ann queries", set(by1) == set(byK), f"{len(by1)} vs {len(byK)}")
    bad = []
    for q_, rows1 in by1.items():
        if q_ not in byK:
            continue
        page1 = [(a, v) for _, a, v in sorted(rows1)]
        pageK = [(a, v) for _, a, v in sorted(byK[q_])]
        expanded = sorted((a, v + j * OFF) for a, v in page1 for j in range(K))
        selfs = [(a, v) for a, v in pageK if v % OFF == q_ and v != q_]
        nonself = [x for x in pageK if x not in selfs]
        js = sorted(v // OFF for _, v in selfs)
        ok = (pageK == sorted(pageK)
              and nonself == expanded[:len(nonself)]
              and len({a for a, _ in selfs}) <= 1
              and js == list(range(1, len(js) + 1)))
        if not ok:
            bad.append(q_)
    check("q_pq_ann expanded-page prefix", not bad,
          f"page minus self copies is a prefix of the K-expanded sf(N) "
          f"page; {len(bad)} violations")

# mean-pooled centroids are exactly duplication-invariant: each (label,
# dim) group at sf(K*N) is K verbatim copies of sf(N)'s member multiset,
# so the double mean differs only in accumulation order (~1e-13) and the
# round-5 output can step by one 1e-5 grid unit only when the true mean
# sits within that noise of a .000005 boundary. n_vecs is exactly xK.
if have("q_embed_centroids"):
    d1, dK = load(OUT1, "q_embed_centroids"), load(OUTK, "q_embed_centroids")
    m1 = {(d1["label"][i], d1["dim"][i]): (d1["centroid_v"][i], d1["n_vecs"][i])
          for i in range(len(d1["label"]))}
    mK = {(dK["label"][i], dK["dim"][i]): (dK["centroid_v"][i], dK["n_vecs"][i])
          for i in range(len(dK["label"]))}
    check("q_embed_centroids groups", set(m1) == set(mK), f"{len(m1)} vs {len(mK)}")
    bad_v = [k for k in m1 if k in mK and abs(mK[k][0] - m1[k][0]) > 1.01e-5]
    bad_n = [k for k in m1 if k in mK and mK[k][1] != K * m1[k][1]]
    check("q_embed_centroids centroid invariance", not bad_v,
          f"per-(label,dim) mean identical up to one rounding-grid step; "
          f"{len(bad_v)} violations")
    check("q_embed_centroids n_vecs xK", not bad_n, f"{len(bad_n)} violations")

# the drift monitor is FULLY invariant: the per-replica key offset is
# even, so vec_id % 2 parity is replica-stable — each half's membership
# at sf(K*N) is K verbatim copies of sf(N)'s, the round-5 half-centroids
# are identical (order noise absorbed), and the per-label drift cosine
# re-rounds at 1e-6 (allow the one-grid-step boundary case).
if have("q_centroid_drift") and OFF % 2 == 0:
    d1, dK = load(OUT1, "q_centroid_drift"), load(OUTK, "q_centroid_drift")
    m1 = {d1["label"][i]: (d1["n_dims"][i], d1["drift_cos"][i])
          for i in range(len(d1["label"]))}
    mK = {dK["label"][i]: (dK["n_dims"][i], dK["drift_cos"][i])
          for i in range(len(dK["label"]))}
    check("q_centroid_drift labels", set(m1) == set(mK), f"{len(m1)} vs {len(mK)}")
    bad = [k for k in m1 if k in mK and
           (m1[k][0] != mK[k][0] or abs(mK[k][1] - m1[k][1]) > 1.01e-6)]
    check("q_centroid_drift parity-half invariance", not bad,
          f"per-label (n_dims, drift_cos) identical at both SFs; "
          f"{len(bad)} violations")

# DSL top-100: the HAVING predicate is per-order (replica-local), so the
# qualifier set replicates verbatim; the (price DESC, key) order expands
# each price-tie group into K replica blocks in the same within-block
# order — the sf(K*N) page is derivable from sf(N)'s as long as the
# groups used don't straddle sf(N)'s own LIMIT boundary
if have("q_dsl_topk"):
    d1, dK = load(OUT1, "q_dsl_topk"), load(OUTK, "q_dsl_topk")
    n1_, nK_ = len(d1["o_orderkey"]), len(dK["o_orderkey"])
    if n1_ == 0:
        # an empty sf(N) page can't seed the tie groups: report it as a
        # FAIL (unless sf(K*N) is empty too) instead of IndexError-ing
        check("q_dsl_topk empty sf(N) page", nK_ == 0, f"{n1_} -> {nK_}")
    else:
        rows1 = [(d1["o_orderkey"][i], d1["o_orderstatus"][i], d1["o_totalprice"][i])
                 for i in range(n1_)]  # already ORDER BY price DESC, key
        groups, cur = [], [rows1[0]]
        for r in rows1[1:]:
            if r[2] == cur[-1][2]:
                cur.append(r)
            else:
                groups.append(cur)
                cur = [r]
        groups.append(cur)
        if n1_ == 100:
            groups = groups[:-1]  # last group may be cut by sf(N)'s LIMIT
        want = []
        for grp in groups:
            for j in range(K):
                want += [(k + j * OFF, st, p) for k, st, p in grp]
            if len(want) >= 100:
                break
        want = want[:100]
        got = [(dK["o_orderkey"][i], dK["o_orderstatus"][i], dK["o_totalprice"][i])
               for i in range(nK_)]
        check("q_dsl_topk rowcount", nK_ == min(100, K * n1_), f"{n1_} -> {nK_}")
        check("q_dsl_topk tie-group expansion", got[:len(want)] == want,
              f"first {len(want)} rows derived from {len(groups)} complete "
              f"sf(N) price groups")

# reciprocal-rank fusion: both rankers score a replica copy of the query
# document perfectly (cos = jac = 1.0 after rounding) and order perfect
# scorers by id, so the fused top-5 under replication is derivable in the
# two regimes the data exhibits. Regime 1 — sf(N) has NO full dups (its
# rrf page has no round6(2/(60+rank)) prefix and the companion cosine
# page shows no cos == 1.0): the sf(K*N) page is exactly the query's
# first 5 self copies, (q, r, q + r*OFF, round6(2/(60+r))) for r = 1..5,
# each ranking r in BOTH rankers, and no other candidate can reach it —
# the best both-ranker outsider is bounded by 1/70 + 1/70 and the best
# single-ranker-1.0 outsider by 1/61 + 1/70, both < 2/65. Regime 2 —
# the sf(N) page is SATURATED with full dups (every row at exactly
# round6(2/(60+rank)), the sf1->sf10 case where sf1 is itself a
# replication): the page is invariant, because replication only adds
# ids LARGER than every replica-0 member to the perfect-score group.
if K >= 6 and have("q_rrf_fusion"):
    d1, dK = load(OUT1, "q_rrf_fusion"), load(OUTK, "q_rrf_fusion")
    by1, byK = {}, {}
    for i in range(len(d1["q_id"])):
        by1.setdefault(d1["q_id"][i], []).append(
            (d1["rank"][i], d1["id"][i], d1["rrf"][i]))
    for i in range(len(dK["q_id"])):
        byK.setdefault(dK["q_id"][i], []).append(
            (dK["rank"][i], dK["id"][i], dK["rrf"][i]))
    check("q_rrf_fusion queries", set(by1) == set(byK),
          f"{len(by1)} vs {len(byK)}")
    dup_free = set()
    if have("q_cosine_topk"):
        c1 = load(OUT1, "q_cosine_topk")
        top = {}
        for i in range(len(c1["q_id"])):
            top.setdefault(c1["q_id"][i], []).append(c1["cos"][i])
        dup_free = {q_ for q_, cs in top.items() if all(c < 1.0 for c in cs)}
    selfrrf = lambda r: round(2.0 / (60 + r), 6)
    bad, skipped = [], []
    for q_, rows1 in by1.items():
        if q_ not in byK:
            continue
        p1, pK = sorted(rows1), sorted(byK[q_])
        if all(abs(rrf - selfrrf(r)) < 5e-7 for r, _, rrf in p1):
            if pK != p1:  # regime 2: saturated page is invariant
                bad.append(q_)
        elif q_ in dup_free:  # regime 1: pure self-copy page
            want = [(r, q_ + r * OFF) for r in range(1, 6)]
            if ([(r, v) for r, v, _ in pK] != want
                    or any(abs(rrf - selfrrf(r)) > 5e-7 for r, _, rrf in pK)):
                bad.append(q_)
        else:  # partial-dup regime: derivation needs the full dup set
            skipped.append(q_)
    check("q_rrf_fusion fused-page derivation", not bad,
          f"{len(by1) - len(skipped)} queries derived "
          f"(self-copy or saturated-invariant), {len(bad)} violations")
    if skipped:
        print(f"     q_rrf_fusion: {len(skipped)} queries in the "
              f"partial-dup regime skipped: {skipped}")

# PMI is a pure count ratio: ln((Kc)(Kn)/((Kc_l)(Kc_r))) equals
# ln(cn/(c_l*c_r)) EXACTLY — the integer products stay < 2^53 so the fp
# ratio (and the 6dp rounding) is bit-identical. The c >= 10 cut is NOT
# invariant (sf(N) counts 1..9 cross it at sf(K*N)), so the top-30 page
# can admit newcomers; three exact relations survive: every sf(K*N)
# count is = 0 (mod K) (content replicates verbatim), a pair on BOTH
# pages keeps its pmi bit-identically with count exactly xK, and a
# sf(N)-page pair missing from the sf(K*N) page still qualifies there,
# so only higher-or-tied pmi newcomers can have displaced it.
if have("q_pmi_bigrams"):
    d1, dK = load(OUT1, "q_pmi_bigrams"), load(OUTK, "q_pmi_bigrams")
    m1 = {d1["pair"][i]: (d1["c_xy"][i], d1["pmi"][i])
          for i in range(len(d1["pair"]))}
    mK = {dK["pair"][i]: (dK["c_xy"][i], dK["pmi"][i])
          for i in range(len(dK["pair"]))}
    badmod = [p_ for p_, (c, _) in mK.items() if c % K != 0]
    check("q_pmi_bigrams counts mod K", not badmod,
          f"{len(mK)} page rows, {len(badmod)} violations")
    both = sorted(set(m1) & set(mK))
    badint = [p_ for p_ in both
              if mK[p_][0] != K * m1[p_][0] or abs(mK[p_][1] - m1[p_][1]) > 1e-9]
    check("q_pmi_bigrams intersection exact", not badint,
          f"{len(both)} shared pairs: count xK + pmi bit-identical; "
          f"{len(badint)} violations")
    if mK:
        minK = min(v[1] for v in mK.values())
        displaced = sorted(set(m1) - set(mK))
        baddisp = [p_ for p_ in displaced if m1[p_][1] > minK + 1e-9]
        check("q_pmi_bigrams displacement monotone", not baddisp,
              f"{len(displaced)} sf(N) pairs displaced by newcomers, all "
              f"at pmi <= page min {minK}; {len(baddisp)} violations")

# ---- round-18 additions: the six former exclusions, gated ------------
# These queries' VALUES are legitimately not derivable from sf(N) (the
# md5-thinned edge sample differs per replica; MMR state needs pairwise
# sims; the LSH stop-bucket cap crosses under xK growth) — but each has
# exact structural relations that ARE derivable, because edges, buckets
# and candidate sets never cross replicas:
#  - the sf(KN) graph is a DISJOINT UNION of K independently-thinned
#    copies of the base graph, replica 0 byte-identical (same keys ->
#    same md5 keep set): exact containment relations + tight
#    concentration bands on thinned counts (binomial sums; sd << 1%);
#  - every replica copy of an LSH probe doc sees the IDENTICAL
#    (mod OFF) candidate set, so output rows come in exactly-K groups
#    with identical (dup_of % OFF == dup_of, jaccard, n_matches), the
#    base-projected doc set is a SUBSET of sf(N)'s (caps only shrink),
#    jaccard <= base and n_matches = K * (a sub-count of base's);
#  - MMR floods with K-1 perfect self-copies: rank 1 pins to cos 1.0,
#    ranks 2+ to the 0.7*1 - 0.3*1 = 0.4 plateau, ids ascend within
#    the plateau (greedy min-id tie-break on equal scores).


def band(name, got, want, rel, abs_slack=0):
    lo = want * (1 - rel) - abs_slack
    hi = want * (1 + rel) + abs_slack
    check(name, lo <= got <= hi,
          f"{got} vs {want} (band +/-{rel * 100:g}% + {abs_slack})")


# basket-width histogram: baskets never span replicas and replicate
# verbatim, so the histogram is EXACTLY xK per width row — same width
# set, n_baskets and n_pairs both xK
if have("q_basket_profile"):
    d1, dK = load(OUT1, "q_basket_profile"), load(OUTK, "q_basket_profile")
    m1 = {d1["width"][i]: (d1["n_baskets"][i], d1["n_pairs"][i])
          for i in range(len(d1["width"]))}
    mK = {dK["width"][i]: (dK["n_baskets"][i], dK["n_pairs"][i])
          for i in range(len(dK["width"]))}
    check("q_basket_profile width set invariant", set(m1) == set(mK),
          f"{sorted(m1)} vs {sorted(mK)}")
    bad = [w for w in m1 if w in mK and
           (mK[w][0] != K * m1[w][0] or mK[w][1] != K * m1[w][1])]
    check("q_basket_profile counts exactly xK", not bad,
          f"{len(m1)} widths; violations {bad}")

if have("q_triangle_count"):
    d1, dK = load(OUT1, "q_triangle_count"), load(OUTK, "q_triangle_count")
    band("q_triangle_count edges xK", dK["n_edges_sampled"][0],
         K * d1["n_edges_sampled"][0], 0.01)
    band("q_triangle_count wedges xK", dK["n_wedges"][0],
         K * d1["n_wedges"][0], 0.03)
    check("q_triangle_count max_degree >= base (replica-0 containment)",
          dK["max_degree"][0] >= d1["max_degree"][0],
          f"{d1['max_degree'][0]} -> {dK['max_degree'][0]}")
    check("q_triangle_count tri >= base (replica-0 containment)",
          dK["n_tri_sampled"][0] >= d1["n_tri_sampled"][0],
          f"{d1['n_tri_sampled'][0]} -> {dK['n_tri_sampled'][0]}")
    band("q_triangle_count tri xK (Poisson band)", dK["n_tri_sampled"][0],
         K * d1["n_tri_sampled"][0], 0.5, abs_slack=20 * K)
    check("q_triangle_count est consistency",
          dK["est_triangles"][0] == 1000 * dK["n_tri_sampled"][0],
          f"{dK['est_triangles'][0]} == 1000*{dK['n_tri_sampled'][0]}")

if have("q_triangle_sampled"):
    d1, dK = load(OUT1, "q_triangle_sampled"), load(OUTK, "q_triangle_sampled")
    for p, mult in (("p20", 125), ("p50", 8)):
        band(f"q_triangle_sampled {p} edges xK", dK[f"n_edges_{p}"][0],
             K * d1[f"n_edges_{p}"][0], 0.01)
        check(f"q_triangle_sampled {p} tri >= base (replica-0 containment)",
              dK[f"n_tri_{p}"][0] >= d1[f"n_tri_{p}"][0],
              f"{d1[f'n_tri_{p}'][0]} -> {dK[f'n_tri_{p}'][0]}")
        band(f"q_triangle_sampled {p} tri xK (Poisson band)",
             dK[f"n_tri_{p}"][0], K * d1[f"n_tri_{p}"][0], 0.5,
             abs_slack=20 * K)
        check(f"q_triangle_sampled {p} est consistency",
              dK[f"est_{p}"][0] == mult * dK[f"n_tri_{p}"][0],
              f"{dK[f'est_{p}'][0]} == {mult}*{dK[f'n_tri_{p}'][0]}")
    # p=0.2 is a re-filter of the p=0.5 sample: the keep-rate must sit
    # at 2/5 of it (same salt, nested residue classes)
    band("q_triangle_sampled p20/p50 keep-rate", dK["n_edges_p20"][0],
         0.4 * dK["n_edges_p50"][0], 0.02)

if have("q_kcore"):
    d1, dK = load(OUT1, "q_kcore"), load(OUTK, "q_kcore")
    check("q_kcore trace length", len(dK["round"]) == len(d1["round"]) == 6,
          f"{len(d1['round'])} vs {len(dK['round'])} rounds")
    r1 = {d1["round"][i]: (d1["n_nodes"][i], d1["n_edges"][i])
          for i in range(len(d1["round"]))}
    rK = {dK["round"][i]: (dK["n_nodes"][i], dK["n_edges"][i])
          for i in range(len(dK["round"]))}
    # peel decomposes per replica (components never span replicas):
    # round-r totals are sums of K independent peels, replica 0 exact.
    # Guard r in rK everywhere: a diverging round SET in the xK trace
    # (the scenario the length check above probes) must record failures,
    # not KeyError-abort every remaining invariance check.
    bad = [r for r in r1
           if r not in rK or rK[r][0] < r1[r][0] or rK[r][1] < r1[r][1]]
    check("q_kcore per-round >= base (replica-0 containment)", not bad,
          f"rounds {sorted(r1)}: KN trace dominates base; violations {bad}")
    for r in sorted(r1):
        if r not in rK:
            check(f"q_kcore round-{r} present in xK trace", False,
                  f"round {r} missing from xK trace {sorted(rK)}")
            continue
        band(f"q_kcore round-{r} nodes xK", rK[r][0], K * r1[r][0], 0.05,
             abs_slack=5 * K)
        band(f"q_kcore round-{r} edges xK", rK[r][1], K * r1[r][1], 0.05,
             abs_slack=5 * K)

if have("q_mmr_diverse") and K >= 5:
    # the plateau checks need >= 4 spare self-copies beyond the rank-1
    # pick, i.e. K - 1 >= 4 perfect candidates per query
    d1, dK = load(OUT1, "q_mmr_diverse"), load(OUTK, "q_mmr_diverse")
    check("q_mmr_diverse shape invariant",
          len(dK["q_id"]) == len(d1["q_id"])
          and sorted(set(dK["q_id"])) == sorted(set(d1["q_id"])),
          f"{len(d1['q_id'])} rows, queries {sorted(set(d1['q_id']))}")
    byq = {}
    for i in range(len(dK["q_id"])):
        byq.setdefault(dK["q_id"][i], []).append(
            (dK["rank"][i], dK["id"][i], dK["mmr"][i]))
    bad1, bad2, bad3 = [], [], []
    for q, rows_ in byq.items():
        rows_.sort()
        if rows_[0][2] != 1.0:
            bad1.append(q)
        if any(abs(m - 0.4) > 1e-9 for _, _, m in rows_[1:]):
            bad2.append(q)
        ids = [i_ for _, i_, _ in rows_]
        # every pick is a replica copy of the query (or a base full-dup
        # of it, id < OFF), and the 0.4-plateau greedy ascends by id
        if any(i_ % OFF != q and i_ >= OFF for i_ in ids) \
           or ids != sorted(ids):
            bad3.append(q)
    check("q_mmr_diverse rank-1 saturates at cos 1.0", not bad1, f"{bad1}")
    check("q_mmr_diverse ranks 2+ on the 0.4 plateau", not bad2, f"{bad2}")
    check("q_mmr_diverse picks are query copies, id-ascending", not bad3,
          f"{bad3}")


def lsh_group_checks(qname, d1, dK, batch_col=None):
    """Replica-equivariance + cap-monotone subset for the LSH index
    probes. Keys are (batch, doc_id) when a batch column exists."""
    def index(d):
        out = {}
        for i in range(len(d["doc_id"])):
            key = (d[batch_col][i] if batch_col else "", d["doc_id"][i])
            out[key] = (d["dup_of"][i], d["jaccard"][i], d["n_matches"][i])
        return out
    m1, mK = index(d1), index(dK)
    groups = {}
    for (b, doc), v in mK.items():
        groups.setdefault((b, doc % OFF), []).append((doc, v))
    badsz = [g for g, vs in groups.items() if len(vs) != K]
    check(f"{qname} exactly-K replica groups", not badsz,
          f"{len(groups)} groups of {K}; bad {badsz[:5]}")
    badeq = [g for g, vs in groups.items()
             if len({v for _, v in vs}) != 1
             or any(v[0] >= OFF for _, v in vs)]
    check(f"{qname} groups identical (dup_of replica-0)", not badeq,
          f"violations {badeq[:5]}")
    miss = [g for g in groups if g not in m1]
    check(f"{qname} base projection subset of sf(N)", not miss,
          f"{len(groups)} projected docs all in sf(N) output; missing "
          f"{miss[:5]}")
    badrel = []
    for g, vs in groups.items():
        if g not in m1:
            continue
        dup, jac, nm = vs[0][1]
        dup1, jac1, nm1 = m1[g]
        if jac > jac1 + 1e-9 or nm % K != 0 or nm > K * nm1:
            badrel.append(g)
    check(f"{qname} jaccard <= base, n_matches = K*sub-count", not badrel,
          f"violations {badrel[:5]}")


if have("q_lsh_index_dedup"):
    lsh_group_checks("q_lsh_index_dedup",
                     load(OUT1, "q_lsh_index_dedup"),
                     load(OUTK, "q_lsh_index_dedup"))

if have("q_lsh_index_incremental"):
    lsh_group_checks("q_lsh_index_incremental",
                     load(OUT1, "q_lsh_index_incremental"),
                     load(OUTK, "q_lsh_index_incremental"),
                     batch_col="batch")

# ntile quartiles depend on the global distribution (deliberately outside
# the slice family), but the arithmetic price_bucket column is per-row
# pure: rows xK and the (key, price_bucket) projection slice-identical
if have("q_ntile_bucket"):
    t1 = pq.read_table(glob.glob(f"{OUT1}/q_ntile_bucket/*.parquet"),
                       columns=["o_orderkey", "price_bucket"])
    tK = pq.read_table(glob.glob(f"{OUTK}/q_ntile_bucket/*.parquet"),
                       columns=["o_orderkey", "price_bucket"])
    check("q_ntile_bucket rowcount xK", tK.num_rows == K * t1.num_rows,
          f"{t1.num_rows} -> {tK.num_rows}")
    s0 = tK.filter(pc.less(tK["o_orderkey"], OFF)).to_pydict()
    check("q_ntile_bucket price_bucket slice",
          rows_ms(s0) == rows_ms(t1.to_pydict()),
          f"{t1.num_rows} rows (quartile column excluded: global ntile)")

print("=" * 40)
print(f"{len(fails)} failures" if fails else "all replication invariants hold")
sys.exit(1 if fails else 0)
