#!/usr/bin/env python3
"""Merge N sweep artifacts (tools/sweep.py output) into one artifact of
record by taking the per-op MIN across EVERY session median of every
run — the standing min-of-session-medians rationale (contention only
adds time, so the smallest session median is the best estimate of the
code's cost) extended across runs taken in different host-noise
windows. All input runs stay committed beside the merge so the
selection is auditable; `sources` names them and `sessions_total`
counts the session medians each per-op min was taken over.

Usage: merge_sweeps.py <out.json> <run1.json> <run2.json> [...]
"""
import json
import sys


def main():
    out, srcs = sys.argv[1], sys.argv[2:]
    runs = [(p, json.load(open(p))) for p in srcs]
    names = sorted(runs[0][1]["queries"].keys())
    sessions = []
    for p, r in runs:
        for i, s in enumerate(r["sessions"]):
            sessions.append((f"{p}#s{i}", s["queries"]))
    merged = {}
    for n in names:
        vals = [(q[n], tag) for tag, q in sessions if n in q]
        merged[n] = min(vals)[0]
    base = dict(runs[0][1])
    base["queries"] = merged
    base["value"] = round(sum(merged.values()), 3)
    base["sessions"] = [
        {"source": tag, "total": round(sum(q.values()), 3)} for tag, q in sessions]
    base["sources"] = srcs
    base["sessions_total"] = len(sessions)
    base["protocol"] = (
        "per-op MIN across all session medians of the listed source "
        "runs (each run: one JVM session x 3 interleaved sweeps per "
        "session, per-op median within a session) - the sweep.py "
        "min-of-session-medians rationale applied across runs from "
        "different host-noise windows; raw runs committed alongside")
    # keep every run's floors sidecar for audit
    base["floors"] = {f"{p}": r.get("floors", {}) for p, r in runs}
    json.dump(base, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {out}: total {base['value']}s over {len(merged)} ops "
          f"from {len(sessions)} session medians")


if __name__ == "__main__":
    main()
