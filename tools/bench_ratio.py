#!/usr/bin/env python3
"""Compare a bench artifact against a reference artifact: per-query
ratios over the common queries, median ratio, totals, and the biggest
movers. Usage:

    python3 tools/bench_ratio.py NEW.json REF.json [-n 10]
"""
import argparse
import json
import re
import statistics


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("queries"), dict):
        return doc
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed
    tail = doc.get("tail", "")
    qs = {}
    for m in re.finditer(r'\{"metric":"bench_queries"[^\n]*\}', tail):
        try:
            qs.update(json.loads(m.group(0)).get("queries", {}))
        except Exception:
            pass
    return {"queries": qs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("ref")
    ap.add_argument("-n", type=int, default=10)
    a = ap.parse_args()
    new, ref = load(a.new), load(a.ref)
    nq, rq = new["queries"], ref["queries"]
    common = sorted(set(nq) & set(rq))
    ratios = {k: nq[k] / rq[k] for k in common if rq[k] > 0}
    med = statistics.median(ratios.values())
    print(f"common={len(common)}  median ratio={med:.3f}")
    print(f"new total={sum(nq.values()):.1f}s over {len(nq)}  "
          f"ref total={sum(rq.values()):.1f}s over {len(rq)}")
    only_new = sorted(set(nq) - set(rq))
    if only_new:
        t = sum(nq[k] for k in only_new)
        print(f"new-only: {len(only_new)} queries, {t:.1f}s "
              f"({', '.join(f'{k}={nq[k]}' for k in sorted(only_new, key=lambda k: -nq[k])[:8])})")
    movers = sorted(ratios.items(), key=lambda kv: -kv[1])[:a.n]
    print("slowest-growing (new/ref):")
    for k, r in movers:
        print(f"  {k:32} {nq[k]:7.2f} / {rq[k]:7.2f} = {r:.2f}")
    movers = sorted(ratios.items(), key=lambda kv: kv[1])[:a.n]
    print("fastest-improving:")
    for k, r in movers:
        print(f"  {k:32} {nq[k]:7.2f} / {rq[k]:7.2f} = {r:.2f}")


if __name__ == "__main__":
    main()
