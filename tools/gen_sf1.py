#!/usr/bin/env python3
"""Generate /tmp/sf1: a 10x weak-scaling replica of the sf0.1 testdata,
for the one-off sf1 benchmark (VERDICT r5 #10). PERF TOOLING ONLY —
correctness oracles always run against the driver's own testdata.

Scaled tables: events, lineitem, documents (the inputs of the 10
headline queries). Replica k offsets ids and shifts events' timestamps
by k*31 days, so the time axis extends (exercising the bucketed
windows) and the event graph grows ~10x in edges. Remaining tables are
copied as-is. events.ts is written as BIGINT nanoseconds, which
Tables.load already consumes (ts div 1000 -> microseconds).
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

DAY_NS = 86400 * 10**9


def write(sql, name):
    con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")


# events: 10 replicas, ids/users offset, ts shifted by k*31 days (ns)
write(
    f"""
    SELECT event_id + k.k * 100000000 AS event_id,
           user_id + k.k * 1000000 AS user_id,
           event_type,
           epoch_ns(ts)::BIGINT + k.k * 31 * {DAY_NS} AS ts,
           value,
           props
    FROM read_parquet('{SRC}/events.parquet'), range({K}) k(k)
    """,
    "events",
)

# lineitem: order keys offset per replica
write(
    f"""
    SELECT l_orderkey + k.k * 100000000 AS l_orderkey, * EXCLUDE (l_orderkey)
    FROM read_parquet('{SRC}/lineitem.parquet'), range({K}) k(k)
    """,
    "lineitem",
)

# documents: doc ids offset; texts identical across replicas (a heavy
# but realistic dedup workload: every doc has K-1 exact twins)
write(
    f"""
    SELECT doc_id + k.k * 100000000 AS doc_id, * EXCLUDE (doc_id)
    FROM read_parquet('{SRC}/documents.parquet'), range({K}) k(k)
    """,
    "documents",
)

# embeddings: K replicas with offset ids and a per-replica CIRCULAR
# SHIFT of the vector (by 3k+1 positions). Shifted copies of random
# vectors are uncorrelated, so replicas are neither exact twins nor
# near-dups — an earlier sign-flip variant left replicas at cosine
# ~0.97 and turned the corpus into a pathological near-dup workload
# (dedup_embed's true-pair set exploded ~90x)
write(
    f"""
    SELECT vec_id + k.k * 100000000 AS vec_id,
           CASE WHEN k.k = 0 THEN embedding ELSE
             (embedding[(3 * k.k + 1) % len(embedding) + 1:] ||
              embedding[:(3 * k.k + 1) % len(embedding)])
           END::FLOAT[] AS embedding
    FROM read_parquet('{SRC}/embeddings.parquet'), range({K}) k(k)
    """,
    "embeddings",
)

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied")
print("done ->", DST)
