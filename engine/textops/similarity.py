"""Similarity search over the embeddings table (array<float>, dim 64).

Exact-parity trick: components are quantized q_i = floor(double(e_i) * 2^20)
as BIGINT (power-of-two scale -> the multiply is exact; floor is identical
on both engines — NOT a bare cast, DuckDB rounds double->int while Spark
truncates). Dot products and squared norms are then exact int64 sums
(|q| <~ 2^21, 64 dims -> < 2^48, no overflow), and
cosine = dot / (sqrt(n2a) * sqrt(n2b)) is the same correctly-rounded double
on Spark, DuckDB, and numpy — so even the float column value-hashes match.

Three paths:
- ann_topk_sql: brute-force top-k per query vector (the baseline; one
  pos-join + groupBy — at scale the vectors side partitions by vec_id and
  the query side broadcasts).
- ann_lsh_*: random-hyperplane LSH — 16 integer hyperplanes, bucket =
  sign-bit word; bucket assignment is a single groupBy, candidate gen is an
  equi-join on bucket (the 100TB path: no all-pairs anywhere).
- topk_numpy_df: mapInPandas numpy variant of the brute force (Arrow
  batches, int64 matmul — exact same numbers, zero shuffle before the
  final per-query top-k), sharing ann_topk_sql as its oracle.
"""

from __future__ import annotations

import numpy as np

from .sqlgen import elem, shiftl, unnest_series

DIM = 64
QSCALE = 1 << 20
N_PLANES = 16
N_QUERIES = 8


def _comp_cte(dialect: str) -> str:
    """(vec_id, p, q): quantized component per position."""
    e = elem(dialect, "embedding", "p.i")
    q = f"CAST(floor(CAST({e} AS DOUBLE) * {QSCALE}) AS BIGINT)"
    series = unnest_series(dialect, "1", str(DIM), "i")
    return (
        f"comp AS (SELECT vec_id, p.i AS p, {q} AS q "
        f"FROM embeddings CROSS JOIN {series} p), "
        f"norms AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 "
        f"FROM comp GROUP BY vec_id)"
    )


def ann_topk_sql(dialect: str, k: int = 3, n_queries: int = N_QUERIES) -> str:
    """Brute-force cosine top-k per query vector (vec_id < n_queries)."""
    return f"""
WITH {_comp_cte(dialect)},
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM comp a JOIN comp b ON a.p = b.p
  WHERE a.vec_id < {n_queries} AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id),
scored AS (
  SELECT d.query_id, d.vec_id,
         CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
  FROM dots d JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}"""


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = 11) -> np.ndarray:
    """Deterministic integer hyperplanes in [-99, 99] (exact in both engines)."""
    rng = np.random.default_rng(seed)
    return rng.integers(-99, 100, size=(n_planes, dim)).astype(np.int64)


def _planes_cte() -> str:
    h = hyperplanes()
    cols = ", ".join(f"h{j}" for j in range(N_PLANES))
    values = ",".join(
        "(" + ",".join([str(i + 1)] + [str(int(h[j, i])) for j in range(N_PLANES)]) + ")"
        for i in range(DIM)
    )
    return f"planes(p, {cols}) AS (VALUES {values})"


def lsh_buckets_sql(dialect: str, n_bits: int = N_PLANES) -> str:
    """vec_id -> n_bits-bit sign-hash bucket. One join against the 64-row
    plane table (broadcast), one groupBy vec_id. Fewer bits = bigger
    buckets = higher recall (the ANN path uses 8; the histogram view 16)."""
    dots = ", ".join(
        f"CAST(SUM(c.q * pl.h{j}) AS BIGINT) AS d{j}" for j in range(n_bits)
    )
    bucket = " + ".join(
        f"(CASE WHEN d{j} > 0 THEN {shiftl(dialect, 'CAST(1 AS BIGINT)', str(j))} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
WITH {_comp_cte(dialect)},
{_planes_cte()},
plane_dots AS (
  SELECT c.vec_id, {dots}
  FROM comp c JOIN planes pl ON c.p = pl.p
  GROUP BY c.vec_id)
SELECT vec_id, ({bucket}) AS bucket FROM plane_dots"""


def lsh_bucket_histogram_sql(dialect: str) -> str:
    return (
        f"WITH b AS ({lsh_buckets_sql(dialect)}) "
        "SELECT bucket, COUNT(*) AS n_vecs FROM b GROUP BY bucket"
    )


def lsh_topk_sql(dialect: str, k: int = 3, n_queries: int = N_QUERIES) -> str:
    """ANN: exact cosine ranked WITHIN the query's LSH bucket only (the
    scale path — candidate set ~ n/2^8 per bucket instead of n)."""
    return f"""
WITH b AS ({lsh_buckets_sql(dialect, n_bits=8)}),
{_comp_cte(dialect)},
cand AS (
  SELECT qa.vec_id AS query_id, qb.vec_id AS vec_id
  FROM b qa JOIN b qb ON qa.bucket = qb.bucket AND qa.vec_id <> qb.vec_id
  WHERE qa.vec_id < {n_queries}),
dots AS (
  SELECT c.query_id, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
  FROM cand c JOIN comp ca ON ca.vec_id = c.query_id
  JOIN comp cb ON cb.vec_id = c.vec_id AND cb.p = ca.p
  GROUP BY c.query_id, c.vec_id),
scored AS (
  SELECT d.query_id, d.vec_id,
         CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
  FROM dots d JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}"""


def embedding_near_dup_sql(dialect: str, threshold: float = 0.3) -> str:
    """Embedding-cosine near-dup pairs: LSH-bucket candidate gen (8-bit)
    + exact quantized-cosine verify >= threshold. The standard near-dup
    mining shape — candidates via equi-join, never all-pairs. (The synthetic
    corpus has no true duplicates; threshold picks up the similar tail.)"""
    return f"""
WITH b AS ({lsh_buckets_sql(dialect, n_bits=8)}),
{_comp_cte(dialect)},
pairs AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
dots AS (
  SELECT p.vec_a, p.vec_b, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
  FROM pairs p JOIN comp ca ON ca.vec_id = p.vec_a
  JOIN comp cb ON cb.vec_id = p.vec_b AND cb.p = ca.p
  GROUP BY p.vec_a, p.vec_b)
SELECT d.vec_a, d.vec_b,
       CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM dots d JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {threshold}"""


def ivf_topk_sql(
    dialect: str,
    k: int = 3,
    n_queries: int = N_QUERIES,
    nlist: int = 16,
    nprobe: int = 2,
    cent_base: int = 100,
) -> str:
    """IVF-Flat ANN: a coarse quantizer of ``nlist`` centroids partitions
    the vectors into inverted lists; each query probes its ``nprobe``
    nearest lists and ranks candidates by exact quantized cosine.

    The 100 TB shape: assignment is one bounded join against the tiny
    centroid set (broadcast) + a per-vector argmax; the probe join is an
    equi-join on list_id — candidates ~ nprobe/nlist of the corpus, never
    all-pairs, and the lists are exactly how a partitioned ANN index lays
    out on disk (repartition by list_id). Centroids are a deterministic
    training sample (vec_ids [cent_base, cent_base+nlist)) so both engines
    derive the identical quantizer — a k-means refinement would drop in
    without changing the plan shape.
    """
    cosine = (
        "CAST({d}.dot AS DOUBLE) / (sqrt(CAST({na}.n2 AS DOUBLE)) * "
        "sqrt(CAST({nb}.n2 AS DOUBLE)))"
    )
    return f"""
WITH {_comp_cte(dialect)},
cent AS (SELECT vec_id AS cent_id FROM embeddings
         WHERE vec_id >= {cent_base} AND vec_id < {cent_base + nlist}),
cdots AS (
  SELECT cv.vec_id, cc.vec_id AS cent_id, CAST(SUM(cv.q * cc.q) AS BIGINT) AS dot
  FROM comp cv JOIN comp cc ON cv.p = cc.p
  JOIN cent ON cent.cent_id = cc.vec_id
  GROUP BY cv.vec_id, cc.vec_id),
cscored AS (
  SELECT d.vec_id, d.cent_id,
         {cosine.format(d='d', na='na', nb='nb')} AS ccos
  FROM cdots d JOIN norms na ON na.vec_id = d.vec_id
  JOIN norms nb ON nb.vec_id = d.cent_id),
cranked AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
  FROM cscored),
assign AS (SELECT vec_id, cent_id AS list_id FROM cranked WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS list_id FROM cranked
  WHERE vec_id < {n_queries} AND crank <= {nprobe}),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id),
dots AS (
  SELECT c.query_id, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
  FROM cand c JOIN comp ca ON ca.vec_id = c.query_id
  JOIN comp cb ON cb.vec_id = c.vec_id AND cb.p = ca.p
  GROUP BY c.query_id, c.vec_id),
scored AS (
  SELECT d.query_id, d.vec_id,
         {cosine.format(d='d', na='na', nb='nb')} AS cosine
  FROM dots d JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}"""


# ------------------------------------------------------- numpy fast path --

def topk_numpy_df(spark, sf_dir: str, k: int = 3, n_queries: int = N_QUERIES):
    """Brute-force cosine top-k, numpy inner loop (same numbers as
    ann_topk_sql — int64 quantized matmul is exact, so this shares that
    oracle). Per Arrow batch: a (batch x dim) @ (dim x n_queries) matmul;
    only per-batch top-k survives to the final window."""
    import pandas as pd
    from pyspark.sql import Window, functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.floor(
        np.array([r.embedding for r in qrows], dtype=np.float64) * QSCALE
    ).astype(np.int64)
    qn = np.sqrt((qmat * qmat).sum(axis=1).astype(np.float64))
    bq = spark.sparkContext.broadcast((qids, qmat, qn))

    def score(batches):
        ids_q, mat_q, norm_q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * QSCALE
            ).astype(np.int64)
            dots = m @ mat_q.T  # exact int64
            n2 = (m * m).sum(axis=1).astype(np.float64)
            cos = dots.astype(np.float64) / (np.sqrt(n2)[:, None] * norm_q[None, :])
            nq = len(ids_q)
            out = pd.DataFrame(
                {
                    "query_id": np.tile(ids_q, len(vids)),
                    "vec_id": np.repeat(vids, nq),
                    "cosine": cos.reshape(-1),
                }
            )
            out = out[out["query_id"] != out["vec_id"]]
            # per-batch prune: keep top-k per query inside the batch
            out = (
                out.sort_values(["query_id", "cosine", "vec_id"],
                                ascending=[True, False, True])
                .groupby("query_id", sort=False)
                .head(k)
            )
            yield out

    partial = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
