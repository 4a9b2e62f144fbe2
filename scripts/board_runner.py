#!/usr/bin/env python3
"""Full-board engine-completion runner for at-scale SFs (no DuckDB oracle).

Drives graft.Verify over every SparkEntry query at a large SF, streaming
its stderr to record per-query {status, sec} into a resumable JSON
report. Each query's output parquet is deleted the moment its "ok" line
lands, so disk usage stays bounded by ONE query's output plus Spark
scratch — the full board at the x1000 SF writes several hundred GB in
total, far past local disk, but never needs more than one output at a
time (the completion artifact only wants status + wall time; correctness
at these SFs rests on the replication-invariance gate).

If the JVM dies mid-pass (OOM, ENOSPC), the runner restarts with the
remaining queries; the in-flight killer is identified by its partial
output dir and excluded as engine_dnf after MAX_ATTEMPTS.

Usage: board_runner.py sf_dir tmp_out report.json oracle_sql.json
Env: CPUS (32), HEAP (96g), SHUF (256) — shuffle partitions sized for
at-scale sorts, see Verify.scala.
"""
import json, os, re, shutil, subprocess, sys

SF_DIR, TMP_OUT, REPORT, ORACLE = sys.argv[1:5]
CPUS = os.environ.get("CPUS", "32")
HEAP = os.environ.get("HEAP", "96g")
SHUF = os.environ.get("SHUF", "256")
MAX_ATTEMPTS = 2
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

names = sorted(json.load(open(ORACLE)))
# Optional cheap-first ordering: COST_HINT points at a prior board JSON
# (e.g. SCALE_SF10_r15.json); pending queries run in ascending recorded
# wall time so a time-bounded session completes the most queries. Names
# without a hint run last, alphabetically.
cost = {}
hint = os.environ.get("COST_HINT")
if hint and os.path.exists(hint):
    try:  # best-effort hint: a malformed file must not kill the runner
        cost = {k: v["sec"] for k, v in
                json.load(open(hint))["queries"].items() if "sec" in v}
    except Exception as e:
        print(f"COST_HINT unusable ({e}); ordering alphabetically", flush=True)
done = {}
if os.path.exists(REPORT):
    done = json.load(open(REPORT)).get("queries", {})
attempts = {}


def save():
    with open(REPORT + ".tmp", "w") as f:
        json.dump({"sf_dir": SF_DIR, "queries": done}, f, indent=1, sort_keys=True)
    os.replace(REPORT + ".tmp", REPORT)


OK = re.compile(r"\[verify\] (\S+) ok ([0-9.]+)s")
FAIL = re.compile(r"\[verify\] (\S+) failed: (.*)")
# per-entry window-quality stamp (Verify GRAFT_CONTROL_QUERY protocol):
# a fixed-size control query timed immediately before the entry — its
# ratio vs the floor's control makes entries measured in different
# sessions comparable by construction
CONTROL = re.compile(r"\[verify\] control (\S+) ([0-9.]+)s")


def sibling_graft_jvms(exclude=()):
    """Host-isolation precheck (round-17 protocol, mechanized): any
    OTHER graft JVM or board runner alive on the host invalidates every
    wall-time this pass records (two of round 17's three contaminated
    measurements — q_dsl_topk 1448 s -> 167.5 s isolated — were stray
    JVMs caught by hand). Returns (pid, cmdline-prefix) pairs.
    `exclude`: extra pids that are OURS (the in-flight Verify child when
    scanning mid-pass), not siblings."""
    me = os.getpid()
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me or int(pid) in exclude:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace").replace("\0", " ").strip()
        except OSError:
            continue
        argv0 = cmd.split(" ", 1)[0]
        if (argv0.endswith("java") and "graft." in cmd) or \
           ("python" in argv0 and "board_runner" in cmd):
            out.append((int(pid), cmd[:120]))
    return out

while True:
    siblings = sibling_graft_jvms()

    def settled(n):
        """A query is settled when it has a clean measurement or a final
        DNF. "contaminated" entries (measured with a sibling JVM alive)
        are settled only while the host is STILL dirty — a later clean
        pass re-measures them instead of carrying tainted wall-times
        forward as if they were measurements."""
        v = done.get(n)
        if v is None:
            return False
        if v["status"] == "contaminated":
            return bool(siblings)
        return True

    # names absent from the hint are typically NEW queries of unknown —
    # usually small — cost: run them first, not behind the heavy tail
    pending = sorted((n for n in names if not settled(n)),
                     key=lambda n: (cost.get(n, -1.0), n))
    if not pending:
        break
    # JVM_PER_QUERY=1: one fresh JVM per entry instead of one long
    # shared pass. The r19 sweep showed a 134-query shared-JVM pass
    # inflates late entries 3-7x (accumulated heap/code-cache/listener
    # state) while the per-entry CONTROL stamps stay clean — controls
    # are tiny codegen jobs and don't see the degradation that hits
    # shuffle-heavy queries. Fresh-per-query matches the r18 isolated
    # re-measure protocol and is the honest per-entry measurement;
    # the shared pass remains the cheap completion/DNF screen.
    n_pending = len(pending)
    if os.environ.get("JVM_PER_QUERY") == "1":
        pending = pending[:1]
    print(f"== pass: {n_pending} pending, {len(done)} done"
          + (f" (fresh JVM: {pending[0]})" if len(pending) < n_pending else ""),
          flush=True)
    if siblings:
        for pid, cmd in siblings:
            print(f"sibling: {pid}: {cmd}", flush=True)
        if os.environ.get("GRAFT_IGNORE_SIBLINGS") != "1":
            print("host not isolated — refusing to measure "
                  "(set GRAFT_IGNORE_SIBLINGS=1 to tag-and-run)", flush=True)
            sys.exit(3)
        # override: run anyway but TAG every entry this pass records so
        # the numbers are never mistaken for clean measurements
        print("GRAFT_IGNORE_SIBLINGS=1 — entries will be tagged "
              "contaminated", flush=True)
    shutil.rmtree(TMP_OUT, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=CPUS,
               GRAFT_SHUFFLE_PARTITIONS=SHUF, GRAFT_VERIFY_COALESCE="0")
    cmd = (["java"] + ADD_OPENS +
           [f"-Xmx{HEAP}", "-XX:ReservedCodeCacheSize=512m",
            "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            # r18 lesson (SCALING.md §9): when scratch headroom ~ one
            # phase's shuffle footprint, the RECLAIM CADENCE is part of
            # the disk budget — a dereferenced phase's shuffle files are
            # only deleted at ContextCleaner GC ticks, and the 30min
            # default (or even 1min) ENOSPC'd runs that 15s completes.
            "-Dspark.cleaner.periodicGC.interval=15s",
            "-Dspark.rdd.compress=true",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", SF_DIR, TMP_OUT, ",".join(pending)])
    proc = subprocess.Popen(cmd, stderr=subprocess.PIPE, text=True,
                            stdout=subprocess.DEVNULL)
    progressed = False
    counted_this_pass = set()
    # a query's measurement window runs from the previous ok line to its
    # own; siblings observed at either endpoint overlapped it
    prev_sibs = set(c for _, c in siblings)
    ctl_s = {}
    for line in proc.stderr:
        m = CONTROL.search(line)
        if m:
            ctl_s[m.group(1)] = float(m.group(2))
            continue
        m = OK.search(line)
        if m:
            # re-scan at every ok line (cheap /proc walk): passes run for
            # hours at x1000 SF, and a stray JVM appearing MID-pass must
            # not let the queries it overlapped certify as clean — the
            # exact failure mode the round-17 sweep was cleaning up
            now_sibs = {c for _, c in sibling_graft_jvms(exclude=(proc.pid,))}
            seen = prev_sibs | now_sibs
            prev_sibs = now_sibs
            if seen:
                entry = {"status": "contaminated",
                         "sec": float(m.group(2)),
                         "siblings": sorted(seen)}
            else:
                entry = {"status": "complete", "sec": float(m.group(2))}
            if m.group(1) in ctl_s:
                entry["control_s"] = ctl_s.pop(m.group(1))
            done[m.group(1)] = entry
            progressed = True
            shutil.rmtree(f"{TMP_OUT}/{m.group(1)}", ignore_errors=True)
            save()
            print(line.rstrip(), flush=True)
            continue
        m = FAIL.search(line)
        if m:
            name, msg = m.group(1), m.group(2)[:300]
            # a dying SparkContext fails every query still queued behind
            # the actual killer — those cascade failures say nothing
            # about the query itself, so they don't count as attempts
            # (the killer's own first failure line, e.g. an OOM or a
            # stage-materialization error, is NOT one of these shapes)
            cascade = ("stopped SparkContext" in msg
                       or "SparkContext was shut down" in msg
                       or "Shutdown in progress" in msg)
            # cascade lines also don't count as progress: if the JVM
            # dies repeatedly emitting only cascade noise (killer left
            # no partial dir), treating them as progress would restart
            # the same doomed pass forever
            if not cascade:
                attempts[name] = attempts.get(name, 0) + 1
                counted_this_pass.add(name)
                if attempts[name] >= MAX_ATTEMPTS:
                    done[name] = {"status": "engine_dnf", "error": msg}
                    save()
                progressed = True
            print(line.rstrip()[:200], flush=True)
    proc.wait()
    if proc.returncode == 0:
        # in-JVM failures under MAX_ATTEMPTS get retried next pass
        if not any(n for n in names if n not in done):
            break
        if not progressed:
            break
    else:
        # JVM died: the in-flight query left a partial output dir
        killers = [n for n in pending if n not in done
                   and os.path.isdir(f"{TMP_OUT}/{n}")]
        for k in killers:
            if k in counted_this_pass:
                continue  # its real failure line already took the attempt
            attempts[k] = attempts.get(k, 0) + 1
            if attempts[k] >= MAX_ATTEMPTS:
                done[k] = {"status": "engine_dnf",
                           "error": f"JVM exited {proc.returncode} mid-query"}
                save()
        if not killers and not progressed:
            print(f"no progress and no identifiable killer (exit "
                  f"{proc.returncode}) — stopping", flush=True)
            break

save()
n_ok = sum(1 for v in done.values() if v["status"] == "complete")
n_tag = sum(1 for v in done.values() if v["status"] == "contaminated")
print(f"== done: {n_ok}/{len(names)} complete, {n_tag} contaminated "
      f"(re-measured by a clean pass), "
      f"{len(done) - n_ok - n_tag} engine_dnf", flush=True)
