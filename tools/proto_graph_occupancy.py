#!/usr/bin/env python3
"""Occupancy-scaling evidence for the graph family's entry seeding
(VERDICT r17 item 5): replay the engine's exact walk — one-hot cells,
SQ8(6) codes, top-m co-cell edges, min+max-id entry seeds, beam rounds —
over synthetic near-uniform corpora (the testdata embeddings' regime,
graph ANN's worst case) at growing cell occupancy, and measure in-cell
recall@5 against the exhaustive cell scan, plus variants (more seeds /
rounds / beam, and a deterministic coarse entry layer).

Usage: python3 tools/proto_graph_occupancy.py [scales...]
"""
import sys
import numpy as np

M, BEAM, ROUNDS, K, NQ = 8, 8, 4, 5, 20


def build(n, seed=42):
    rng = np.random.RandomState(seed)
    emb = rng.uniform(-1, 1, size=(n, 64)).astype(np.float32)
    codes = np.clip(np.floor(emb.astype(np.float64) * 64), -128, 127).astype(np.int64)
    cells = np.array([max(range(8), key=lambda j: (float(e[j]), j)) for e in emb])
    return emb, codes, cells


def cell_graph(codes, members):
    """top-M neighbors per member within the cell (dist, id tie-break)."""
    c = codes[members]
    sq = (c * c).sum(axis=1)
    d = sq[:, None] + sq[None, :] - 2 * (c @ c.T)
    np.fill_diagonal(d, np.iinfo(np.int64).max)
    order = np.lexsort((np.broadcast_to(members, d.shape), d), axis=1)
    return {members[i]: [members[j] for j in order[i][:M]]
            for i in range(len(members))}


def walk(qid, codes, graph, seeds, beam, rounds):
    def dist(n):
        diff = codes[qid] - codes[n]
        return int((diff * diff).sum())
    seen = {n: dist(n) for n in seeds}
    for _ in range(rounds):
        front = sorted(seen.items(), key=lambda kv: (kv[1], kv[0]))[:beam]
        for n, _d in front:
            for nb in graph.get(n, []):
                if nb not in seen:
                    seen[nb] = dist(nb)
    return seen


def measure(n, variants):
    emb, codes, cells = build(n)
    out = {}
    groups = {c: np.where(cells == c)[0] for c in range(8)}
    graphs = {c: cell_graph(codes, g) for c, g in groups.items()}
    for name, (seedfn, beam, rounds) in variants.items():
        hits = denom = 0
        for qid in range(NQ):
            c = cells[qid]
            members = groups[c]
            others = members[members != qid]
            dd = ((codes[others] - codes[qid]) ** 2).sum(axis=1)
            exact = set(others[np.lexsort((others, dd))][:K].tolist())
            seeds = seedfn(members, codes, qid)
            seen = walk(qid, codes, graphs[c], seeds, beam, rounds)
            got = sorted(((d, v) for v, d in seen.items() if v != qid))[:K]
            hits += len(exact & {v for _, v in got})
            denom += len(exact)
        out[name] = hits * 1000 // denom
    return out


def seeds_minmax(members, codes, qid):
    return {int(members.min()), int(members.max())}


def seeds_stride4(members, codes, qid):
    """4 deterministic id-quantile seeds (min, 1/3, 2/3, max by sorted id)."""
    s = np.sort(members)
    return {int(s[0]), int(s[len(s) // 3]), int(s[2 * len(s) // 3]), int(s[-1])}


def seeds_coarse(members, codes, qid):
    """Deterministic coarse entry layer: every 64th member by id is a
    layer-1 node; the walk starts from the TWO layer-1 nodes nearest the
    query (dist, id tie-break) — an HNSW-style upper layer, fully
    replayable."""
    s = np.sort(members)
    layer1 = s[::64]
    if len(layer1) < 2:
        return seeds_minmax(members, codes, qid)
    d = ((codes[layer1] - codes[qid]) ** 2).sum(axis=1)
    pick = layer1[np.lexsort((layer1, d))][:2]
    return {int(x) for x in pick}


def main():
    scales = [int(x) for x in sys.argv[1:]] or [2000, 6000, 20000, 60000]
    variants = {
        "minmax(b8,r4)": (seeds_minmax, 8, 4),
        "minmax(b8,r6)": (seeds_minmax, 8, 6),
        "minmax(b16,r4)": (seeds_minmax, 16, 4),
        "stride4(b8,r4)": (seeds_stride4, 8, 4),
        "coarse64(b8,r4)": (seeds_coarse, 8, 4),
    }
    print(f"occupancy scaling, near-uniform synthetic, m={M}, k={K}, nq={NQ}")
    hdr = ["n", "n/cell"] + list(variants)
    print(" | ".join(f"{h:>15}" for h in hdr))
    for n in scales:
        r = measure(n, variants)
        row = [str(n), str(n // 8)] + [str(r[v]) for v in variants]
        print(" | ".join(f"{v:>15}" for v in row))


if __name__ == "__main__":
    main()
