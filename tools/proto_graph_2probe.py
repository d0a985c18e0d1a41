#!/usr/bin/env python3
"""Prototype: graph-ANN recall with 1-probe vs 2-probe entry seeding.

Replays the KnnGraphChainSql oracle (m=8, beam=8, rounds=4, k=5,
queries vec_id<20) at each sf, with the entry CTE either the current
min-id-of-own-cell (1 entry) or min-id-of-each-top-2-probe-cell
(<=2 entries). Prints recall_permille for both, per sf.
"""
import sys
import duckdb


def dist(qc, cc):
    return (f"CAST((SELECT sum(({qc}[i.d] - {cc}[i.d]) * ({qc}[i.d] - {cc}[i.d])) "
            "FROM (SELECT unnest(generate_series(1, 64)) AS d) i) AS BIGINT)")


def chain_sql(entry_mode, rounds=4, m=8, beam=8):
    if entry_mode == "1probe":
        entry = """, entry AS (
  SELECT q.query_id, min(a.vec_id) AS node
  FROM q JOIN asg a ON a.cell = q.cell GROUP BY 1
)"""
    else:
        entry = """, probe AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, CAST(t.j - 1 AS BIGINT) AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY CAST(e.embedding[CAST(t.j AS INTEGER)] AS DOUBLE) DESC, t.j DESC) AS pr
    FROM embeddings e, unnest(generate_series(1, 8)) AS t(j)
    WHERE e.vec_id < 20)
  WHERE pr <= 2
), entry AS (
  SELECT p.query_id, min(a.vec_id) AS node
  FROM probe p JOIN asg a ON a.cell = p.cell GROUP BY p.query_id, p.cell
)"""
    head = f"""WITH codes AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-128, least(127, CAST(floor(x * 64) AS BIGINT)))) AS code
  FROM embeddings
), cells AS (
  SELECT vec_id,
    CAST(list_max(list_transform(generate_series(1, 8),
      j -> [CAST(embedding[j] AS DOUBLE), CAST(j - 1 AS DOUBLE)]))[2] AS BIGINT) AS cell
  FROM embeddings
), asg AS (
  SELECT c.vec_id, cl.cell, c.code FROM codes c JOIN cells cl USING (vec_id)
), pair AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
    {dist("a.code", "b.code")} AS dist
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), graph AS (
  SELECT src, dst FROM (
    SELECT src, dst,
      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM pair) WHERE rn <= {m}
), q AS (
  SELECT vec_id AS query_id, code AS q_code, cell FROM asg WHERE vec_id < 20
){entry}, s0 AS (
  SELECT e.query_id, e.node, {dist("q.q_code", "a.code")} AS dist
  FROM entry e JOIN q ON q.query_id = e.query_id JOIN asg a ON a.vec_id = e.node
)"""
    rcts = ""
    for r in range(1, rounds + 1):
        p = r - 1
        rcts += f""", b{p} AS (
  SELECT query_id, node FROM (
    SELECT query_id, node,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, node) AS rn
    FROM s{p}) WHERE rn <= {beam}
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
, gtop AS (
  SELECT query_id, node AS neighbor_id FROM (
    SELECT query_id, node, dist,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, node) AS rnk
    FROM s{rounds} WHERE node <> query_id) WHERE rnk <= 5
), epair AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {dist("q.q_code", "c.code")} AS dist
  FROM q JOIN asg c ON c.cell = q.cell AND c.vec_id <> q.query_id
), etop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
    FROM epair) WHERE rnk <= 5
), agg AS (
  SELECT
    (SELECT count(DISTINCT query_id) FROM q) AS n_queries,
    (SELECT count(*) FROM gtop g JOIN etop e
       ON g.query_id = e.query_id AND g.neighbor_id = e.neighbor_id) AS n_hits
)
SELECT n_queries, n_hits,
  CAST(n_hits * 1000 // (n_queries * 5) AS BIGINT) AS recall_permille
FROM agg"""
    return head + rcts + tail


for sf in sys.argv[1:] or ["0.001", "0.01", "0.1"]:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf{sf}/embeddings.parquet'")
    for mode in ("1probe", "2probe"):
        nq, nh, rp = con.sql(chain_sql(mode)).fetchall()[0]
        print(f"sf{sf} {mode}: n_queries={nq} n_hits={nh} recall={rp}permille")
    con.close()
