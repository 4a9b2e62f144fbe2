#!/usr/bin/env python3
"""Full-board scale gate: compare every Spark result in out_dir against its
DuckDB oracle at a large SF, recording per-query status + reason into a
JSON report (SCALE_r{N}.json). Unlike check.py (the driver-gate emulation,
fail-fast and unbounded), each oracle runs in a SUBPROCESS with a memory
cap, a spill dir, and a wall-clock timeout, so one oracle that cannot
materialize at this SF (known: the triangle wedge CTEs, kcore's unrolled
MATERIALIZED rounds) is recorded as an oracle-side DNF instead of taking
down the whole pass.

Usage: scale_check.py sf_dir out_dir report.json [timeout_s] [mem_limit]
"""
import glob, json, math, multiprocessing as mp, os, shutil, sys, tempfile

SF_DIR, OUT_DIR, REPORT = sys.argv[1], sys.argv[2], sys.argv[3]
TIMEOUT = int(sys.argv[4]) if len(sys.argv) > 4 else 900
MEM = sys.argv[5] if len(sys.argv) > 5 else "60GB"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def run_oracle(sql, result_q, spill_dir):
    """Subprocess body: run one oracle + compare against the Spark parquet."""
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM}'")
    con.execute(f"SET temp_directory='{spill_dir}'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    exp = con.sql(sql["oracle"]).df()
    got = con.sql(f"SELECT * FROM read_parquet({sql['files']!r})").df()
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        result_q.put(("mismatch", f"cols {list(got.columns)} vs {list(exp.columns)}")); return
    if len(got) != len(exp):
        result_q.put(("mismatch", f"rows {len(got)} vs {len(exp)}")); return
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    for c in got.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b or (a == 0.0 and math.copysign(1, a) != math.copysign(1, b)):
                    result_q.put(("mismatch", f"col {c} row {i}: spark={a!r} oracle={b!r}")); return
            elif str(a) != str(b):
                result_q.put(("mismatch", f"col {c} row {i}: spark={a!r} oracle={b!r}")); return
    result_q.put(("pass", f"{len(got)} rows x {len(got.columns)} cols"))


def main():
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    report = {}
    for name in sorted(oracle):
        files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
        if not files:
            report[name] = {"status": "engine_err", "reason": "no spark output"}
            print(f"ENGINE_ERR {name}: no spark output", flush=True)
            continue
        q = mp.Queue()
        # spill dir owned by the PARENT so a killed/died oracle can't orphan
        # tens of GB of duckdb temp storage on /tmp (q_triangle_count's
        # wedge CTE spill at sf1.0 is ~50 GB before it dies)
        spill = tempfile.mkdtemp(prefix="duck_spill_")
        p = mp.Process(target=run_oracle,
                       args=({"oracle": oracle[name], "files": files}, q, spill))
        p.start()
        p.join(TIMEOUT)
        if p.is_alive():
            p.terminate(); p.join()
            report[name] = {"status": "oracle_dnf", "reason": f"timeout >{TIMEOUT}s"}
            print(f"ORACLE_DNF {name}: timeout >{TIMEOUT}s", flush=True)
        elif q.empty():
            # subprocess died (OOM-kill / duckdb abort) before reporting
            report[name] = {"status": "oracle_dnf",
                            "reason": f"oracle process died (exit {p.exitcode}) under {MEM} cap"}
            print(f"ORACLE_DNF {name}: process died exit {p.exitcode}", flush=True)
        else:
            status, reason = q.get()
            report[name] = {"status": status, "reason": reason}
            print(f"{status.upper():10s} {name}: {reason}", flush=True)
        shutil.rmtree(spill, ignore_errors=True)
    counts = {}
    for v in report.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    out = {"sf_dir": SF_DIR, "timeout_s": TIMEOUT, "mem_limit": MEM,
           "summary": counts, "queries": report}
    json.dump(out, open(REPORT, "w"), indent=1)
    print(f"{'=' * 40}\n{counts}")


if __name__ == "__main__":
    main()
