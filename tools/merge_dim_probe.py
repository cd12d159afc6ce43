#!/usr/bin/env python3
"""Merge N KnnDimProbe session JSON lines into one BENCH_DIM artifact.

Each session is an independent JVM running graft.KnnDimProbe with the
same corpus/config (the standard 2-session protocol); per rung the
merge takes min over sessions for sec_min, median-of-medians for
sec_med, and median over sessions for bytes/rows (bytes are near-
deterministic; the median guards one session's dropped listener
events). Refuses to merge sessions with mismatched corpus/config/sha.

Usage: merge_dim_probe.py <out.json> <session1.json> [session2.json ...]
"""
import json
import statistics
import sys

out, paths = sys.argv[1], sys.argv[2:]
sessions = [json.load(open(p)) for p in paths]
head = sessions[0]
for k in ("metric", "corpus", "n", "dim", "nlist", "k", "c_sq", "c_pq", "git_sha"):
    vals = {json.dumps(s.get(k)) for s in sessions}
    assert len(vals) == 1, f"sessions disagree on {k}: {vals}"

configs = []
for i, cfg in enumerate(head["configs"]):
    np_ = cfg["np"]
    rungs = {}
    for rung in cfg["rungs"]:
        rs = [s["configs"][i]["rungs"][rung] for s in sessions]
        assert all(s["configs"][i]["np"] == np_ for s in sessions)
        rungs[rung] = {
            "mb": round(statistics.median(r["mb"] for r in rs), 1),
            "mrows": round(statistics.median(r["mrows"] for r in rs), 3),
            "sec_min": round(min(r["sec_min"] for r in rs), 2),
            "sec_med": round(statistics.median(r["sec_med"] for r in rs), 2),
        }
    configs.append({"np": np_, "rungs": rungs})

merged = {k: head[k] for k in
          ("metric", "corpus", "n", "dim", "nlist", "k", "c_sq", "c_pq", "git_sha")}
merged["sessions"] = len(sessions)
merged["reps_per_session"] = head["reps"]
merged["configs"] = configs
with open(out, "w") as f:
    json.dump(merged, f, indent=1)
    f.write("\n")
print(f"wrote {out} from {len(sessions)} sessions")
for cfg in configs:
    ex = cfg["rungs"].get("exact", {})
    for rung, r in cfg["rungs"].items():
        rel = f" ({r['mb'] / ex['mb'] - 1:+.0%} bytes vs exact)" if ex and rung != "exact" else ""
        print(f"  np={cfg['np']:3d} {rung:10s} {r['mb']:9.1f} MB  "
              f"min={r['sec_min']:6.2f} s med={r['sec_med']:6.2f} s{rel}")
