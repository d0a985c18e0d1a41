#!/usr/bin/env python3
"""Prototype oracle for q_knn_filtered (filtered IVF+SQ8 search over the
planted-dup corpus, per-query label predicate as a candidate-join key),
cross-checked against an independent numpy replay at every sf.

Usage: python3 tools/proto_knn_filtered.py
"""
import sys
import duckdb
import numpy as np

OFF = 1000000

SQL = """
WITH vecs AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 0.5::FLOAT), label
  FROM embeddings WHERE vec_id % 5 = 0
), codes AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-128, least(127, CAST(floor(x * 64) AS BIGINT)))) AS code
  FROM vecs
), cells AS (
  SELECT vec_id, label,
    CAST(list_max(list_transform(generate_series(1, 8),
      j -> [CAST(embedding[j] AS DOUBLE), CAST(j - 1 AS DOUBLE)]))[2] AS BIGINT) AS cell
  FROM vecs
), probe AS (
  SELECT query_id, label, cell FROM (
    SELECT e.vec_id AS query_id, e.label, CAST(t.j - 1 AS BIGINT) AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY CAST(e.embedding[CAST(t.j AS INTEGER)] AS DOUBLE) DESC, t.j DESC) AS pr
    FROM vecs e, unnest(generate_series(1, 8)) AS t(j)
    WHERE e.vec_id >= 1000000 AND e.vec_id < 1000100)
  WHERE pr <= 2
), cand AS (
  SELECT p.query_id, p.cell, c.vec_id AS neighbor_id,
    CAST((SELECT sum((qc.code[i.d] - cc.code[i.d]) * (qc.code[i.d] - cc.code[i.d]))
      FROM (SELECT unnest(generate_series(1, 64)) AS d) i) AS BIGINT) AS dist
  FROM probe p
  JOIN cells c ON c.cell = p.cell AND c.label = p.label AND c.vec_id <> p.query_id
  JOIN codes qc ON qc.vec_id = p.query_id
  JOIN codes cc ON cc.vec_id = c.vec_id
)
SELECT query_id, rnk, neighbor_id, cell, dist,
  neighbor_id = query_id - 1000000 AS recovered
FROM (
  SELECT query_id, cell, neighbor_id, dist,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY dist, neighbor_id) AS INTEGER) AS rnk
  FROM cand)
WHERE rnk <= 5 ORDER BY query_id, rnk
"""


def numpy_replay(emb_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{emb_path}' ORDER BY vec_id"
    ).fetchall()
    base = {vid: (np.array(e, dtype=np.float32), lab) for vid, e, lab in rows}
    vecs = dict(base)
    for vid, (e, lab) in base.items():
        if vid % 5 == 0:
            vecs[vid + OFF] = ((e * np.float32(0.5)), lab)

    def code(e):
        return np.clip(np.floor(e.astype(np.float64) * 64), -128, 127).astype(np.int64)

    def cell(e):
        # argmax over first 8 dims, ties to the LARGER index (score desc, idx desc)
        s = e[:8].astype(np.float64)
        best = max(range(8), key=lambda j: (s[j], j))
        return best

    def probe2(e):
        s = e[:8].astype(np.float64)
        order = sorted(range(8), key=lambda j: (-s[j], -j))
        return order[:2]

    codes = {vid: code(e) for vid, (e, lab) in vecs.items()}
    cells = {vid: cell(e) for vid, (e, lab) in vecs.items()}
    out = []
    for qid in sorted(v for v in vecs if OFF <= v < OFF + 100):
        qe, qlab = vecs[qid]
        cand = []
        for pc in probe2(qe):
            for vid, (e, lab) in vecs.items():
                if vid == qid or lab != qlab or cells[vid] != pc:
                    continue
                d = int(((codes[qid] - codes[vid]) ** 2).sum())
                cand.append((d, vid, pc))
        cand.sort()
        for rnk, (d, vid, pc) in enumerate(cand[:5], 1):
            out.append((qid, rnk, vid, pc, d, vid == qid - OFF))
    return out


def main():
    for sf in ["0.001", "0.01", "0.1"]:
        p = f"/root/testdata/sf{sf}/embeddings.parquet"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{p}'")
        got = [tuple(r) for r in con.execute(SQL).fetchall()]
        want = numpy_replay(p)
        ok = got == want
        nrec = sum(1 for r in got if r[5] and r[1] == 1)
        nq = len({r[0] for r in got})
        print(f"sf{sf}: duck=={len(got)} rows, numpy=={len(want)}, "
              f"match={ok}, queries={nq}, top1-recovered={nrec}")
        if not ok:
            for a, b in zip(got, want):
                if a != b:
                    print("  first diff:", a, b)
                    break
            sys.exit(1)


if __name__ == "__main__":
    main()
