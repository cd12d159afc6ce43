#!/usr/bin/env python3
"""Run the four BenchStream modes (serve / ivf / classifier / cdc)
across the given corpus dirs and assemble one BENCH_STREAM artifact,
stamped with the git SHA (same trustworthiness contract as
tools/sweep.py).

Usage: python3 tools/stream_sweep.py <out.json> <sfDir> [<sfDir> ...]
"""
import json
import os
import subprocess
import sys


def git_sha():
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, check=True).stdout.strip()
        dirty = subprocess.run(["git", "status", "--porcelain"],
                               capture_output=True, text=True, check=True).stdout.strip()
        return sha + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"


def run_one(sf_dir, mode):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    if mode != "serve":
        env["SPARK_GRAFT_STREAM_MODE"] = mode
    out = subprocess.run(["tools/run.sh", "graft.BenchStream"], env=env,
                         capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')][-1]
    d = json.loads(line)
    print(f"[stream-sweep] {mode} @ {sf_dir}: {line}", file=sys.stderr)
    return d


def main():
    out_path, dirs = sys.argv[1], sys.argv[2:]
    runs = [run_one(d, m)
            for d in dirs for m in ("serve", "ivf", "classifier", "cdc")]
    artifact = {"git_sha": git_sha(), "runs": runs}
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[stream-sweep] wrote {out_path} ({len(runs)} runs)", file=sys.stderr)


if __name__ == "__main__":
    main()
