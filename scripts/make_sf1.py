#!/usr/bin/env python3
"""Synthesize sf1.0 testdata as a 10x FK-consistent replication of sf0.1.

Each replica k (0..9) offsets every surrogate key by k * OFF so joins
stay consistent within a replica and never cross replicas: lineitem ->
orders/part/supplier, orders -> customer, customer/supplier -> nation,
events.user_id -> customer, embeddings/documents ids. Non-key columns
are copied verbatim (replica 0 IS sf0.1), so value distributions are
preserved and text dedup operators see exact 10x multiplicity.

Usage: python3 make_sf1.py [src_dir] [dst_dir] [K] [OFF]

K (default 10) is the replication factor; OFF (default 1e9) the per-replica
key offset — it must exceed every key in src. Chaining works: sf1.0 from
sf0.1 with OFF=1e9 (keys < 1e10), then sf10 from sf1.0 with OFF=1e10.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1.0"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = int(float(sys.argv[4])) if len(sys.argv) > 4 else 10**9

# table -> columns that carry entity keys (offset per replica)
KEYED = {
    "region": [],        # tiny dims: replicating region/nation would break
    "nation": [],        # nothing (keys stay within-replica) but r8 kept the
                         # dim row count fixed; joins fan 10 replicas into the
                         # same 5 regions / 25 nations, which is the realistic
                         # shape (dims grow slower than facts)
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

import os
os.makedirs(DST, exist_ok=True)
for table, keys in KEYED.items():
    t = pq.read_table(f"{SRC}/{table}.parquet")
    if not keys:  # dims: copy through unchanged
        pq.write_table(t, f"{DST}/{table}.parquet")
        print(f"{table}: {t.num_rows} rows (copied)")
        continue
    for name in keys:  # OFF must clear every key or replicas collide
        mx = pc.max(t[name]).as_py()
        assert mx is None or mx < OFF, \
            f"{table}.{name} max {mx} >= OFF {OFF}: pass a larger OFF"
    # stream one replica at a time: concat_tables would hold all K
    # replicas in memory at once, which at sf100-scale facts is tens of
    # GB for no benefit — row groups land identically either way
    writer = pq.ParquetWriter(f"{DST}/{table}.parquet", t.schema)
    for k in range(K):
        if k == 0:
            writer.write_table(t)
            continue
        cols = []
        for name in t.schema.names:
            col = t[name]
            if name in keys:
                col = pc.add(col, pa.scalar(k * OFF, type=col.type))
            cols.append(col)
        writer.write_table(pa.table(dict(zip(t.schema.names, cols))))
    writer.close()
    print(f"{table}: {t.num_rows} -> {K * t.num_rows} rows")
