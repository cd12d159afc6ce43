#!/usr/bin/env python3
"""Measure the reference vectra-py on the sf0.1 testdata.

Produces the numbers in BASELINE.md: wall times for the operations the
reference can express (v_topk, v_topk_filtered, v_meta_filter, d_chunk,
d_query_documents-shape), run IN-PROCESS with the reference's own code
(/root/reference/src/vectra_py), so the 2x bench bar has a measured
denominator.

The reference's tokenizer modules import tiktoken / sentence_transformers
(not installed, zero-egress container); they are stubbed at import time
and the splitter gets a regex tokenizer with the same token definition
graft's RegexTokenizer uses, so splitter work is comparable.

Usage: python3 tools/bench_baseline.py [sf_dir] [out_json]
"""
import asyncio
import json
import re
import sys
import time
import types
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/baseline_numbers.json"
REF = "/root/reference/src/vectra_py"

# --- stub the external-model tokenizers, then import the reference ---
tiktoken = types.ModuleType("tiktoken")
tiktoken.encoding_for_model = lambda name: None
sys.modules["tiktoken"] = tiktoken
st = types.ModuleType("sentence_transformers")
st.SentenceTransformer = object
sys.modules["sentence_transformers"] = st
tf = types.ModuleType("transformers")
tf.AutoTokenizer = object
sys.modules["transformers"] = tf
sys.path.insert(0, REF)

from local_index import LocalIndex, CreateIndexConfig  # noqa: E402
from text_splitter import TextSplitter, TextSplitterConfig  # noqa: E402
from item_selector import ItemSelector  # noqa: E402

# reference bug: item_selector.py:74 calls ItemSelector.metadataFilter
# (camelCase) but the method is metadata_filter — every $and/$or/$not
# filter crashes in the reference as shipped. Patched here so the
# operation is measurable at all.
ItemSelector.metadataFilter = ItemSelector.metadata_filter


class RegexTokenizer:
    """Same token definition as graft.text.RegexTokenizer."""
    PAT = re.compile(r"\s*(?:[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])")

    def encode(self, text):
        return self.PAT.findall(text)

    def decode(self, tokens):
        return "".join(tokens)


def norm(v):
    return sum(x * x for x in v) ** 0.5


async def main():
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) e, label FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    print(f"{len(emb)} vectors, {len(docs)} documents from {SF_DIR}", file=sys.stderr)

    times = {}

    # ---- build the reference index (insert all items) ----
    folder = Path("/tmp/ref_vectra_index")
    if folder.exists():
        import shutil
        shutil.rmtree(folder)
    index = LocalIndex(str(folder))
    t0 = time.perf_counter()
    await index.create_index(CreateIndexConfig(version=1, delete_if_exists=True))
    await index.begin_update()
    for vec_id, vector, label in emb:
        await index.add_item_to_update(
            {"id": str(vec_id), "vector": list(vector),
             "metadata": {"vec_id": vec_id, "label": label}}, True)
    await index.end_update()
    times["build_index"] = time.perf_counter() - t0

    # warm load (query_items re-reads index.json unless cached)
    await index.load_index_data()

    # ---- v_topk: brute-force cosine top-10, query = vec 0 ----
    qv = list(emb[0][1])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        res = await index.query_items(qv, 10)
    times["v_topk"] = (time.perf_counter() - t0) / reps
    assert len(res) == 10

    # ---- v_topk_filtered: same with a metadata filter ----
    # $in is unusable in the reference as shipped (its bool-isinstance
    # guard rejects ints — see MetaFilter scaladoc); use comparisons
    filt = {"$and": [{"label": {"$gte": 2}}, {"label": {"$lte": 6}}]}
    t0 = time.perf_counter()
    for _ in range(reps):
        res = await index.query_items(qv, 10, filt)
    times["v_topk_filtered"] = (time.perf_counter() - t0) / reps
    assert len(res) == 10

    # ---- v_meta_filter: list_items_by_metadata ----
    filt2 = {"$or": [{"label": {"$lte": 3}},
                     {"$and": [{"label": {"$gte": 7}}, {"label": {"$lt": 9}}]}]}
    t0 = time.perf_counter()
    for _ in range(reps):
        res = await index.list_items_by_metadata(filt2)
    times["v_meta_filter"] = (time.perf_counter() - t0) / reps
    assert len(res) > 0

    # ---- d_chunk: reference splitter over all documents ----
    # same config as graft's d_chunk (chunk_size 64, overlap 8,
    # midpoint splits — separators=[] means "use doc-type defaults" in
    # the reference, so pass a separator that never matches to force
    # the same midpoint behavior is not possible; use default text
    # separators, which is the reference's real ingest path)
    # the reference splitter consumes a dict (its TextSplitterConfig
    # dataclass lacks the .get the code calls — upsert_document passes
    # dicts too)
    splitter = TextSplitter({
        "separators": [], "keep_separators": False, "chunk_size": 64,
        "chunk_overlap": 8, "tokenizer": RegexTokenizer(), "doc_type": None})
    t0 = time.perf_counter()
    n_chunks = 0
    for _, text in docs:
        n_chunks += len(splitter.split(text))
    times["d_chunk"] = time.perf_counter() - t0
    print(f"d_chunk: {n_chunks} chunks", file=sys.stderr)

    # ---- d_query_documents shape: top-50 chunks -> group by doc ->
    # mean -> top-10 (what query_documents does after embedding;
    # the chunk index holds one item per 200-char slice) ----
    chunk_folder = Path("/tmp/ref_vectra_chunks")
    if chunk_folder.exists():
        import shutil
        shutil.rmtree(chunk_folder)
    cindex = LocalIndex(str(chunk_folder))
    await cindex.create_index(CreateIndexConfig(version=1, delete_if_exists=True))
    # deterministic fake embedding per chunk (hash-derived, 64-dim) —
    # both engines pay one cosine per chunk at query time, which is
    # the measured part
    import hashlib

    def fake_embed(s):
        h = hashlib.md5(s.encode()).digest() * 16
        return [((b / 255.0) * 2 - 1) for b in h[:64]]

    await cindex.begin_update()
    n_chunk_items = 0
    for doc_id, text in docs:
        t = re.sub(r"\s+", " ", text.strip().lower())
        for i in range(0, len(t), 200):
            await cindex.add_item_to_update(
                {"id": f"{doc_id}-{i}", "vector": fake_embed(t[i:i + 200]),
                 "metadata": {"document_id": doc_id}}, True)
            n_chunk_items += 1
    await cindex.end_update()
    await cindex.load_index_data()
    print(f"d_query_documents: {n_chunk_items} chunk items", file=sys.stderr)

    qv2 = fake_embed("spark table join query")
    t0 = time.perf_counter()
    for _ in range(reps):
        top = await cindex.query_items(qv2, 50)
        by_doc = {}
        for r in top:
            by_doc.setdefault(r["item"]["metadata"]["document_id"], []).append(r["score"])
        ranked = sorted(((sum(v) / len(v), k) for k, v in by_doc.items()), reverse=True)[:10]
    times["d_query_documents"] = (time.perf_counter() - t0) / reps
    assert ranked

    out = {"sf_dir": SF_DIR, "n_vectors": len(emb), "n_documents": len(docs),
           "times_sec": {k: round(v, 4) for k, v in times.items()}}
    Path(OUT).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


asyncio.run(main())
