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
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


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
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
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
    pq.write_table(pa.Table.from_pandas(bige, preserve_index=False, schema=schema),
                   f"{out}/embeddings.parquet")
    print("emb", len(bige))


if __name__ == "__main__":
    main()
