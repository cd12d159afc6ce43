#!/usr/bin/env python3
"""Synthetic high-dimension embeddings corpus for the knn-join
dimension probe (graft.KnnDimProbe): the bench corpus's dim=64 float
vectors (256 B) sit at the same order as a shuffle row's key overhead,
which flattens the coded-join byte comparison; production embedding
dims (768-4096) are where codes (64-96 B) vs floats (3-16 KB) actually
separate. Same schema as testdata embeddings: (vec_id, embedding
list<float>, label int32).

Usage: make_dim_corpus.py <out.parquet> <rows> <dim> [labels=5] [seed=7]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out, rows, dim = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
labels = int(sys.argv[4]) if len(sys.argv) > 4 else 5
seed = int(sys.argv[5]) if len(sys.argv) > 5 else 7
rng = np.random.default_rng(seed)
V = rng.standard_normal((rows, dim), dtype=np.float32)
tab = pa.table({
    "vec_id": pa.array(np.arange(rows, dtype=np.int64)),
    "embedding": pa.FixedSizeListArray.from_arrays(V.reshape(-1), dim).cast(
        pa.list_(pa.float32())),
    "label": pa.array((np.arange(rows) % labels).astype(np.int32)),
})
pq.write_table(tab, out, row_group_size=max(1, rows // 32))
print(f"wrote {out}: {rows} x {dim}, {labels} labels")
