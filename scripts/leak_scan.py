#!/usr/bin/env python3
"""Builder-side leak scan: grep src/ + scripts/ for anything that could
reference a non-public system — internal-looking hosts/URLs, cloud bucket
URIs, chat links, credential-shaped strings, suspicious env vars. The
driver runs its own scan (LEAKCHECK.json); this one makes the 0-hits
claim locally reproducible: `python3 scripts/leak_scan.py` exits non-zero
on any hit and prints file:line for each.

Allowed by design: localhost / 127.0.0.1 (loopback-tested HTTP source),
apache.org / spark.apache.org (public docs), example.com, github.com
references to public repos, and the SPARK_GRAFT_* env vars this repo
defines itself.
"""
import os, re, sys

ROOTS = ["src", "scripts"]
PATTERNS = {
    "url": re.compile(r"https?://[\w.-]+"),
    "bucket-uri": re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w./-]+"),
    "chat-link": re.compile(r"slack\.com|app\.slack|discord\.gg", re.I),
    "credential": re.compile(
        r"(?:api[_-]?key|secret|token|passwd|password)\s*[:=]\s*['\"][^'\"]{8,}", re.I),
    "aws-key": re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
    "env-var": re.compile(r"\bsys\.env(?:\.getOrElse)?\(\"([A-Z0-9_]+)\""),
    # Python in scripts/ reads env too — same allowlist as the Scala side
    "py-env-var": re.compile(
        r"\bos\.(?:environ(?:\.get)?[\[\(]|getenv\()\s*['\"]([A-Z0-9_]+)['\"]"),
    "internal-host": re.compile(
        r"\b[\w-]+\.(?:corp|internal|intranet|local)\b", re.I),
}
# host must END at an allowed domain (followed by /, :port, or end of
# match) and the domain must sit on a label boundary - otherwise an
# allowed name embedded in a longer hostname (prefix or suffix) would pass
ALLOWED_URL = re.compile(
    r"https?://(?:localhost|127\.0\.0\.1|(?:[\w-]+\.)*"
    r"(?:apache\.org|example\.com|example\.org|github\.com|w3\.org|"
    r"json-schema\.org|opensearch\.org))(?::\d+)?(?:/|$)")
ALLOWED_ENV = {
    "SPARK_GRAFT_SF_DIR", "SPARK_GRAFT_CPUS", "JAVA_OPTS", "PATH",
    # repo-defined knobs (graft.Verify / StreamQ / board_runner /
    # scaling_check define and document these themselves)
    "GRAFT_SHUFFLE_PARTITIONS", "GRAFT_VERIFY_COALESCE", "GRAFT_CONTROL_DIR",
    "GRAFT_CONTROL_QUERY", "GRAFT_STAGE_DIR", "GRAFT_IGNORE_SIBLINGS",
    "GRAFT_SLICE_DIGEST_ROWS", "CPUS", "HEAP", "SHUF", "COST_HINT",
    "JVM_PER_QUERY",
}
ALLOWED_BUCKET = re.compile(r"(?:s3a?|gs|wasbs?|abfss?)://(?:bucket|my-bucket|\.\.\.|<)")

hits = []
for root in ROOTS:
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            path = os.path.join(dirpath, fn)
            try:
                lines = open(path, encoding="utf-8", errors="replace").read().splitlines()
            except OSError:
                continue
            for i, line in enumerate(lines, 1):
                for cat, pat in PATTERNS.items():
                    for m in pat.finditer(line):
                        frag = m.group(0)
                        if cat == "url" and ALLOWED_URL.match(frag + "/"):
                            continue
                        if cat in ("env-var", "py-env-var") and m.group(1) in ALLOWED_ENV:
                            continue
                        if cat == "bucket-uri" and ALLOWED_BUCKET.match(frag):
                            continue
                        hits.append((cat, path, i, frag[:80]))

for cat, path, i, frag in hits:
    print(f"{cat:14s} {path}:{i}: {frag}")
print(f"{len(hits)} hits across {len(PATTERNS)} categories")
sys.exit(1 if hits else 0)
