#!/usr/bin/env python3
"""Mixture-of-Gaussians embeddings corpus — the CLUSTERED geometry
real embedding models produce, vs the uniform synthetic sphere the
bench corpus uses (IVF's documented worst case, where coarse blocking
buys nothing over LSH — round-14 verdict next-round #3 asked for the
knn join family re-validated where clustering exists).

Each vector = cluster center + sigma * N(0, I); centers are standard
normal (norm ~ sqrt(dim)), so sigma controls within-cluster spread
(sigma 0.4 at dim 64 gives within-cluster cosine ~0.86, cross-cluster
~0.0 — the separation a decent sentence-embedding model shows between
topical neighborhoods and unrelated text). Labels (the knn join's
blocking column) are round-robin, INDEPENDENT of cluster — blocking
must not accidentally encode the clustering.

Same schema as testdata embeddings: (vec_id int64, embedding
list<float>, label int32). Written as a directory of 32 single-row-
group files (the make_stress_corpus.py layout lesson: one row group
can never split across Spark tasks).

Usage: make_clustered_corpus.py <out.parquet> <rows> <dim>
         [clusters=64] [sigma=0.4] [labels=10] [seed=11]
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_FILES = 32

out, rows, dim = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
clusters = int(sys.argv[4]) if len(sys.argv) > 4 else 64
sigma = float(sys.argv[5]) if len(sys.argv) > 5 else 0.4
labels = int(sys.argv[6]) if len(sys.argv) > 6 else 10
seed = int(sys.argv[7]) if len(sys.argv) > 7 else 11
rng = np.random.default_rng(seed)

centers = rng.standard_normal((clusters, dim)).astype(np.float32)
# zipf-ish cluster sizes: real corpora are head-heavy, and skewed cell
# population is exactly what stresses an IVF layout's balance
weights = 1.0 / np.arange(1, clusters + 1) ** 0.7
weights /= weights.sum()
assign = rng.choice(clusters, size=rows, p=weights)
V = centers[assign] + sigma * rng.standard_normal((rows, dim), dtype=np.float32)

tab = pa.table({
    "vec_id": pa.array(np.arange(rows, dtype=np.int64)),
    "embedding": pa.FixedSizeListArray.from_arrays(V.reshape(-1), dim).cast(
        pa.list_(pa.float32())),
    "label": pa.array((np.arange(rows) % labels).astype(np.int32)),
})

if os.path.isdir(out):
    shutil.rmtree(out)
elif os.path.exists(out):
    os.remove(out)
os.makedirs(out)
step = (rows + N_FILES - 1) // N_FILES
for i in range(N_FILES):
    lo = i * step
    if lo >= rows:
        break
    shard = tab.slice(lo, min(step, rows - lo))
    pq.write_table(shard, f"{out}/part-{i:05d}.parquet",
                   row_group_size=shard.num_rows)

# report the separation the sigma produced (sanity for the scaladoc)
def cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

same = [cos(V[i], V[j]) for i, j in
        zip(*[iter(np.where(assign == assign[0])[0][:40]), ] * 2)]
m = rows // 2
cross = [cos(V[i], V[m + i]) for i in range(20) if assign[i] != assign[m + i]]
print(f"wrote {out}: {rows} x {dim}, {clusters} clusters sigma={sigma}, "
      f"{labels} labels; within-cos~{np.mean(same):.3f} "
      f"cross-cos~{np.mean(cross):.3f}")
