#!/usr/bin/env python3
"""Prototype for q_graph_filtered: label-aware navigable subgraph
(edges = top-m co-(cell,label) neighbors under integer SQ8 distance) with
the standard beam walk, seeded at the (cell,label) group's min+max ids.

Replays the whole traversal in pure python from the raw floats,
measures recall against the exact same-label in-cell scan, and
cross-checks the DuckDB chain SQL (the oracle draft) row-for-row.

Usage: python3 tools/proto_graph_filtered.py
"""
import sys
import duckdb
import numpy as np

M, BEAM, ROUNDS = 8, 8, 4


def chain_sql():
    def dist(qc, cc):
        return (f"CAST((SELECT sum(({qc}[i.d] - {cc}[i.d]) * ({qc}[i.d] - {cc}[i.d])) "
                "FROM (SELECT unnest(generate_series(1, 64)) AS d) i) AS BIGINT)")
    head = f"""WITH codes AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-128, least(127, CAST(floor(x * 64) AS BIGINT)))) AS code
  FROM embeddings
), cells AS (
  SELECT vec_id, label,
    CAST(list_max(list_transform(generate_series(1, 8),
      j -> [CAST(embedding[j] AS DOUBLE), CAST(j - 1 AS DOUBLE)]))[2] AS BIGINT) AS cell
  FROM embeddings
), asg AS (
  SELECT c.vec_id, cl.cell, cl.label, c.code FROM codes c JOIN cells cl USING (vec_id)
), pair AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
    {dist("a.code", "b.code")} AS dist
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.label = b.label AND a.vec_id <> b.vec_id
), graph AS (
  SELECT src, dst FROM (
    SELECT src, dst,
      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM pair) WHERE rn <= {M}
), q AS (
  SELECT vec_id AS query_id, code AS q_code, cell, label FROM asg WHERE vec_id < 20
), entry AS (
  SELECT query_id, node FROM (
    SELECT q.query_id, min(a.vec_id) AS node
    FROM q JOIN asg a ON a.cell = q.cell AND a.label = q.label GROUP BY 1
    UNION
    SELECT q.query_id, max(a.vec_id) AS node
    FROM q JOIN asg a ON a.cell = q.cell AND a.label = q.label GROUP BY 1) t
), s0 AS (
  SELECT e.query_id, e.node, {dist("q.q_code", "a.code")} AS dist
  FROM entry e JOIN q ON q.query_id = e.query_id JOIN asg a ON a.vec_id = e.node
)"""
    rounds = ""
    for r in range(1, ROUNDS + 1):
        p = r - 1
        rounds += f""", b{p} AS (
  SELECT query_id, node FROM (
    SELECT query_id, node,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, node) AS rn
    FROM s{p}) WHERE rn <= {BEAM}
), x{r} AS (
  SELECT b.query_id, g.dst AS node, {dist("q.q_code", "a.code")} AS dist
  FROM b{p} b JOIN graph g ON g.src = b.node
  JOIN q ON q.query_id = b.query_id JOIN asg a ON a.vec_id = g.dst
), s{r} AS (
  SELECT query_id, node, min(dist) AS dist FROM (
    SELECT query_id, node, dist FROM s{p}
    UNION ALL SELECT query_id, node, dist FROM x{r}) u GROUP BY 1, 2
)"""
    tail = f"""
SELECT query_id, rnk, neighbor_id, dist FROM (
  SELECT query_id, node AS neighbor_id, dist,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, node) AS INTEGER) AS rnk
  FROM s{ROUNDS} WHERE node <> query_id)
WHERE rnk <= 5 ORDER BY query_id, rnk"""
    return head + rounds + tail


def python_replay(emb_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{emb_path}' ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: (np.array(e, dtype=np.float32), lab) for vid, e, lab in rows}
    codes = {v: np.clip(np.floor(e.astype(np.float64) * 64), -128, 127).astype(np.int64)
             for v, (e, _) in vecs.items()}

    def cell(e):
        s = e[:8].astype(np.float64)
        return max(range(8), key=lambda j: (s[j], j))

    cells = {v: cell(e) for v, (e, _) in vecs.items()}
    groups = {}
    for v, (e, lab) in vecs.items():
        groups.setdefault((cells[v], lab), []).append(v)

    def d(a, b):
        return int(((codes[a] - codes[b]) ** 2).sum())

    # label-aware edges: top-M within the (cell,label) group
    graph = {}
    for g, members in groups.items():
        for s_ in members:
            nb = sorted(((d(s_, o), o) for o in members if o != s_))[:M]
            graph[s_] = [o for _, o in nb]

    results, exact = {}, {}
    for qid in sorted(v for v in vecs if v < 20):
        g = (cells[qid], vecs[qid][1])
        members = groups[g]
        seeds = {min(members), max(members)}
        seen = {n: d(qid, n) for n in seeds}
        for _ in range(ROUNDS):
            beam = sorted(seen.items(), key=lambda kv: (kv[1], kv[0]))[:BEAM]
            for n, _dn in beam:
                for nb in graph.get(n, []):
                    dist = d(qid, nb)
                    if nb not in seen or dist < seen[nb]:
                        seen[nb] = dist
        top = sorted(((dv, n) for n, dv in seen.items() if n != qid))[:5]
        results[qid] = [(qid, r + 1, n, dv) for r, (dv, n) in enumerate(top)]
        ex = sorted(((d(qid, o), o) for o in members if o != qid))[:5]
        exact[qid] = {n for _, n in ex}
    return results, exact


def main():
    sql = chain_sql()
    for sf in ["0.001", "0.01", "0.1"]:
        p = f"/root/testdata/sf{sf}/embeddings.parquet"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{p}'")
        duck = [tuple(r) for r in con.execute(sql).fetchall()]
        py, exact = python_replay(p)
        flat = [t for q in sorted(py) for t in py[q]]
        ok = duck == flat
        hits = sum(1 for q in py for (_, _, n, _) in py[q] if n in exact[q])
        denom = 5 * len(py)
        print(f"sf{sf}: duck=={len(duck)} rows, python=={len(flat)}, match={ok}, "
              f"recall={hits}/{denom} = {hits * 1000 // denom} permille")
        if not ok:
            for a, b in zip(duck, flat):
                if a != b:
                    print("  first diff:", a, b)
                    break
            sys.exit(1)


if __name__ == "__main__":
    main()
