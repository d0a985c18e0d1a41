#!/usr/bin/env python3
"""Re-time the N slowest queries from a bench artifact in isolation.

Adjudicates co-tenant-load contamination in one command: reads a
BENCH_r*.json (or target/bench.json), picks the N slowest queries, re-runs
ONLY those through graft.Bench (min-of-2 per query, loadavg-stamped), and
prints artifact-vs-quiet seconds side by side.

    python3 tools/bench_quiet.py BENCH_r09.json            # 6 slowest, sf0.1
    python3 tools/bench_quiet.py BENCH_r09.json -n 3 --sf /root/testdata/sf0.01

A query whose quiet re-time is far below the artifact number was measured
under load, not regressed. Runtime: ~40s for the default 6 queries at
sf0.1 (sbt warm; dominated by the queries themselves).
"""
import argparse
import json
import os
import re
import subprocess
import sys


def load_queries(doc):
    """Per-query seconds from any bench artifact shape: a raw graft.Bench
    line ({"queries": {...}}), the driver's wrapper ({"parsed": {...},
    "tail": "<stdout tail>"}), or a tail whose full line was clipped but
    whose bench_queries chunk lines survived."""
    if not isinstance(doc, dict):
        return {}
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail")
    if isinstance(tail, str):
        qs = {}
        for m in re.finditer(r'\{"metric":"bench_queries"[^\n]*\}', tail):
            try:
                qs.update(json.loads(m.group(0))["queries"])
            except (ValueError, KeyError):
                pass
        if qs:
            return qs
        for m in re.finditer(r'\{"metric":"total"[^\n]*\}', tail):
            try:
                return json.loads(m.group(0))["queries"]
            except (ValueError, KeyError):
                pass
        # last resort for a tail that clipped the full line mid-map
        # (the pre-r10 artifact shape): scavenge every "q_x":sec pair
        for m in re.finditer(r'"(q_[a-z0-9_]+)":([0-9.]+)', tail):
            qs[m.group(1)] = float(m.group(2))
    return qs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", help="bench JSON with a top-level 'queries' map")
    ap.add_argument("-n", type=int, default=6, help="how many slowest to re-time")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", help="sf dir")
    args = ap.parse_args()

    with open(args.artifact) as f:
        doc = json.load(f)
    queries = load_queries(doc)
    if not queries:
        print(f"no 'queries' map in {args.artifact}", file=sys.stderr)
        return 2
    slowest = sorted(queries.items(), key=lambda kv: -kv[1])[: args.n]
    names = ",".join(k for k, _ in slowest)
    print(f"re-timing {len(slowest)} slowest of {len(queries)} at {args.sf}: {names}")

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf, SPARK_GRAFT_ONLY=names)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    m = None
    for line in out.stdout.splitlines():
        mm = re.search(r'\{"metric":"total".*\}', line)
        if mm:
            m = json.loads(mm.group(0))
    if m is None:
        print("bench produced no total line; stdout tail:", file=sys.stderr)
        print("\n".join(out.stdout.splitlines()[-15:]), file=sys.stderr)
        return 1

    print(f"loadavg before={m.get('loadavg_before')} after={m.get('loadavg_after')}")
    print(f"{'query':<28}{'artifact_s':>12}{'quiet_s':>10}{'ratio':>8}")
    for name, art in slowest:
        quiet = m["queries"].get(name)
        ratio = f"{art / quiet:.2f}x" if quiet else "-"
        print(f"{name:<28}{art:>12.2f}{quiet:>10.2f}{ratio:>8}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
