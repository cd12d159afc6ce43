#!/usr/bin/env python3
"""Generate the NX-replica stress corpus used for scale evidence.

Usage: python3 tools/make_stress_corpus.py <out_dir> <replicas>
  e.g. python3 tools/make_stress_corpus.py /tmp/sf1x10 10
       python3 tools/make_stress_corpus.py /tmp/sf1x100 100

Replicates sf0.1's documents/embeddings NX with per-replica word
shuffles (same vocabulary and token statistics, distinct texts) and
hash-jittered renormalized vectors (each original becomes an N-replica
near-dup group — planted ground truth for the dedup operators).

Caveats for interpreting sweeps on this corpus:
  - simhash is bag-of-tokens: word-shuffled replicas keep IDENTICAL
    fingerprints, so dd_simhash legitimately emits hamming-0 pairs for
    every replica pair (~N^2/2 per original).
  - shingle-based ops (jaccard/minhash) see shuffled replicas as
    DISTINCT docs (shingles are order-sensitive).
  - dd_semantic / dd_embed_cosine find the jittered replica groups —
    pair counts are output-bound by design.

Driver-side tooling only (pandas/pyarrow are not available to the
Scala library; this script only writes test inputs under /tmp).
"""
import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# Corpus tables are written as DIRECTORIES of N_FILES parquet files
# (each one row group), not one monolithic file: pyarrow's default
# single-file/single-row-group layout makes every Spark scan decode
# the whole table in ONE task (a row group is the parquet decode
# unit, and a single row group can never split across tasks), which
# serialized the corpus-read prefix of every 100x measurement. A real
# 100 TB corpus is thousands of files — the multi-file layout is the
# representative shape, not an optimization trick. Spark reads the
# `x.parquet` directory transparently; DuckDB reads it with a glob.
N_FILES = 32


def write_sharded(table: pa.Table, path: str):
    """Write `table` as a directory of N_FILES single-row-group files."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)
    rows = table.num_rows
    step = (rows + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        lo = i * step
        if lo >= rows:
            break
        shard = table.slice(lo, min(step, rows - lo))
        pq.write_table(shard, f"{path}/part-{i:05d}.parquet",
                       row_group_size=shard.num_rows)


def main():
    out, n = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    reps = []
    for r in range(n):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 1000000
        if r > 0:
            rr = np.random.default_rng(1000 + r)
            d["text"] = [" ".join(rr.permutation(t.split(" "))) for t in d["text"]]
        d["n_chars"] = d["text"].str.len()
        reps.append(d)
    big = pd.concat(reps, ignore_index=True)
    write_sharded(pa.Table.from_pandas(big, preserve_index=False),
                  f"{out}/documents.parquet")
    print("docs", len(big))

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    mats = np.stack([np.array(e, dtype=np.float32) for e in emb["embedding"]])
    reps = []
    for r in range(n):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * 1000000
        m = mats.copy()
        if r > 0:
            rr = np.random.default_rng(2000 + r)
            m = m + rr.normal(0, 0.05, m.shape).astype(np.float32)
            m = (m / np.linalg.norm(m, axis=1, keepdims=True) *
                 np.linalg.norm(mats, axis=1, keepdims=True)).astype(np.float32)
        e["embedding"] = [row for row in m]
        reps.append(e)
    bige = pd.concat(reps, ignore_index=True)
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    write_sharded(pa.Table.from_pandas(bige, preserve_index=False, schema=schema),
                  f"{out}/embeddings.parquet")
    print("emb", len(bige))


def replicate_relational(out, n):
    """NX-replicate the relational tables so a FULL 65-query sweep can
    run against the stress dir: fact tables (orders, lineitem, events)
    replicate with offset keys (orderkeys stay FK-consistent between
    orders and lineitem; events get fresh event_ids AND fresh user_ids
    so per-user session shapes are preserved while user count scales);
    dimension tables copy as-is — the realistic shape (dims grow far
    slower than facts) and every FK stays valid.
    """
    import shutil
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(t, "copied")
    ok = con.sql(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    con.sql(f"""COPY (
        SELECT o.* REPLACE (o.o_orderkey + t.r*{ok} AS o_orderkey)
        FROM '{SRC}/orders.parquet' o, range({n}) t(r))
        TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    print("orders", con.sql(f"SELECT count(*) FROM '{out}/orders.parquet'").fetchone()[0])
    con.sql(f"""COPY (
        SELECT l.* REPLACE (l.l_orderkey + t.r*{ok} AS l_orderkey)
        FROM '{SRC}/lineitem.parquet' l, range({n}) t(r))
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    print("lineitem", con.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0])
    # events via pyarrow to PRESERVE the nanosecond timestamp type
    # (Tables.load's nanosAsLong path is part of what the sweep tests)
    ev = pq.read_table(f"{SRC}/events.parquet")
    eid = ev.column("event_id").to_pandas().max() + 1
    uid = ev.column("user_id").to_pandas().max() + 1
    parts = []
    for r in range(n):
        d = ev.to_pandas()
        d["event_id"] = d["event_id"] + r * eid
        d["user_id"] = d["user_id"] + r * uid
        parts.append(d)
    bige = pd.concat(parts, ignore_index=True)
    write_sharded(pa.Table.from_pandas(bige, preserve_index=False, schema=ev.schema),
                  f"{out}/events.parquet")
    print("events", len(bige))


if __name__ == "__main__":
    main()
    if "--full" in sys.argv:
        replicate_relational(sys.argv[1], int(sys.argv[2]))
