#!/usr/bin/env python3
"""Independent replay of the q_kcore trace (third engine, pure
numpy/DuckDB-pairs) for scales where the unrolled MATERIALIZED-CTE
DuckDB oracle exceeds the box's memory (>100 GB at sf1.0).

Replicates Triangles.basketPairs (distinct capped baskets -> a<b
pairs), the deterministic md5 DOULION thinning (first 8 hex chars of
md5('kc:a:b') % 10 < 1), and six KCore.peelRounds toward the 8-core,
printing the (round, n_nodes, n_edges) trace to compare against the
engine's q_kcore output.

Usage: python3 kcore_replay.py [sf_dir] [k] [rounds]
"""
import hashlib
import sys

import duckdb
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1.0"
k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

con = duckdb.connect()
con.execute("SET memory_limit='20GB'")
pairs = con.sql(f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM read_parquet('{sf_dir}/lineitem.parquet')),
okb AS (SELECT l_orderkey FROM items GROUP BY 1 HAVING count(*) <= 64),
kept AS (SELECT i.l_orderkey, i.l_partkey FROM items i JOIN okb USING (l_orderkey))
SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
FROM kept a JOIN kept b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
""").df()
print(f"pairs: {len(pairs)}", file=sys.stderr)

a = pairs["a"].to_numpy()
b = pairs["b"].to_numpy()
keep = np.fromiter(
    (int(hashlib.md5(f"kc:{x}:{y}".encode()).hexdigest()[:8], 16) % 10 < 1
     for x, y in zip(a, b)),
    dtype=bool, count=len(a))
ea, eb = a[keep], b[keep]
print(f"sampled edges: {len(ea)}", file=sys.stderr)

for r in range(1, rounds + 1):
    nodes, counts = np.unique(np.concatenate([ea, eb]), return_counts=True)
    keepn = set(nodes[counts >= k].tolist())
    m = np.fromiter(((x in keepn) and (y in keepn) for x, y in zip(ea, eb)),
                    dtype=bool, count=len(ea))
    ea, eb = ea[m], eb[m]
    print(f"{r}\t{len(keepn)}\t{len(ea)}")
