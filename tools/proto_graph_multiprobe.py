#!/usr/bin/env python3
"""Prototype: 2-probe graph ANN with an INDEPENDENT beam per probed cell.

The r17 measurement showed a shared beam seeded across two cells tanks
recall (the graph is cell-partitioned; the two subgraphs are
disconnected, so the seeds starve each other). The correct multi-probe
form searches each probed cell with its own beam — the search unit is
(query, probe-cell), keyed by a composite qkey — then merges the two
shortlists by (dist, node). Gauge: exact SQ8 top-5 over the UNION of
the two probed cells. Compare against the shared-beam number (820-840
permille) and the single-cell traversal vs the same 2-cell gauge
(560-580 permille).
"""
import sys
import duckdb


def dist(qc, cc):
    return (f"CAST((SELECT sum(({qc}[i.d] - {cc}[i.d]) * ({qc}[i.d] - {cc}[i.d])) "
            "FROM (SELECT unnest(generate_series(1, 64)) AS d) i) AS BIGINT)")


def multiprobe_sql(rounds=4, m=8, beam=8, nprobe=2):
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
), probe AS (
  SELECT query_id, cell, pr FROM (
    SELECT e.vec_id AS query_id, CAST(t.j - 1 AS BIGINT) AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY CAST(e.embedding[CAST(t.j AS INTEGER)] AS DOUBLE) DESC, t.j DESC) AS pr
    FROM embeddings e, unnest(generate_series(1, 8)) AS t(j)
    WHERE e.vec_id < 20)
  WHERE pr <= {nprobe}
), q AS (
  -- one search unit per (query, probed cell): composite key
  SELECT p.query_id * 8 + p.cell AS qkey, p.query_id, p.cell, c.code AS q_code
  FROM probe p JOIN codes c ON c.vec_id = p.query_id
), entry AS (
  SELECT qkey, node FROM (
    SELECT q.qkey, min(a.vec_id) AS node
    FROM q JOIN asg a ON a.cell = q.cell GROUP BY 1
    UNION
    SELECT q.qkey, max(a.vec_id) AS node
    FROM q JOIN asg a ON a.cell = q.cell GROUP BY 1) t
), s0 AS (
  SELECT e.qkey, e.node, {dist("q.q_code", "a.code")} AS dist
  FROM entry e JOIN q ON q.qkey = e.qkey JOIN asg a ON a.vec_id = e.node
)"""
    rcts = ""
    for r in range(1, rounds + 1):
        p = r - 1
        rcts += f""", b{p} AS (
  SELECT qkey, node FROM (
    SELECT qkey, node,
      row_number() OVER (PARTITION BY qkey ORDER BY dist, node) AS rn
    FROM s{p}) WHERE rn <= {beam}
), x{r} AS (
  SELECT b.qkey, g.dst AS node, {dist("q.q_code", "a.code")} AS dist
  FROM b{p} b JOIN graph g ON g.src = b.node
  JOIN q ON q.qkey = b.qkey JOIN asg a ON a.vec_id = g.dst
), s{r} AS (
  SELECT qkey, node, min(dist) AS dist FROM (
    SELECT qkey, node, dist FROM s{p}
    UNION ALL SELECT qkey, node, dist FROM x{r}) u GROUP BY 1, 2
)"""
    tail = f"""
, merged AS (
  SELECT q.query_id, s.node, min(s.dist) AS dist
  FROM s{rounds} s JOIN q ON q.qkey = s.qkey
  WHERE s.node <> q.query_id
  GROUP BY 1, 2
), gtop AS (
  SELECT query_id, node AS neighbor_id FROM (
    SELECT query_id, node, dist,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, node) AS rnk
    FROM merged) WHERE rnk <= 5
), epair AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
    {dist("qc.code", "c.code")} AS dist
  FROM probe p JOIN asg c ON c.cell = p.cell AND c.vec_id <> p.query_id
  JOIN codes qc ON qc.vec_id = p.query_id
), etop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
    FROM epair) WHERE rnk <= 5
), agg AS (
  SELECT
    (SELECT count(DISTINCT query_id) FROM probe) AS n_queries,
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
    nq, nh, rp = con.sql(multiprobe_sql()).fetchall()[0]
    print(f"sf{sf} per-cell-beam 2probe vs 2cell-exact: hits={nh} recall={rp}permille",
          flush=True)
    con.close()
