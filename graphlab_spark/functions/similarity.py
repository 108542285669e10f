"""Embedding similarity search over an `embeddings(vec_id, embedding,
label)` table (embedding: array<float>).

- **cosine near-dup pairs**: all pairs with cosine >= tau (exact);
- **brute-force ANN top-k**: exact top-k neighbors per query — the
  correctness baseline, O(Q*N);
- **random-hyperplane LSH ANN**: the 100 TB path — deterministic
  hyperplanes bucket vectors by sign-pattern; queries probe their own
  bucket plus all Hamming-1 buckets, so the candidate join fans out on
  the bucket key instead of the full cross product.  Recall is
  validated against the brute-force baseline in tests.

Numeric portability: dot products fold left-to-right in DOUBLE via
`zip_with` + `aggregate` (JVM-side, whole-stage codegen — no Python),
which matches DuckDB's `list_sum(list_transform(...))` bit-for-bit, so
the driver's oracle can compare rounded values exactly.

The reference's closest analog is its collaborative-filtering toolkit's
dense vector algebra (`/root/reference/toolkits/collaborative_filtering/
eigen_wrapper.hpp`); ANN itself is a training-data-pipeline extension
from the project brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COSINE_TAU = 0.4
ANN_QUERIES = 10  # vec_id < ANN_QUERIES are the query set
ANN_K = 5
LSH_PLANES = 5
LSH_TABLES = 4
LSH_DIM = 64


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm(emb: DataFrame) -> DataFrame:
    """Adds the L2 norm column `nrm` (computed once, in double)."""
    return emb.withColumn("nrm", F.sqrt(_dot("embedding", "embedding")))


def cosine_pairs(emb: DataFrame, tau: float = COSINE_TAU) -> DataFrame:
    """(vec_a, vec_b, cos) for all pairs with cosine >= tau, cos rounded
    to 6 dp.  Exact quadratic verify — at scale, feed it LSH candidates
    instead of the full cross join."""
    n = with_norm(emb).persist()
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
                 F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def sql_cosine_pairs(tau: float = COSINE_TAU, table: str = "embeddings") -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)),"
        " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    return f"""
WITH n AS (SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM {table})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({dot} / (a.nrm * b.nrm), 6) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round({dot} / (a.nrm * b.nrm), 6) >= {tau}
"""


def ann_topk_brute(emb: DataFrame, n_queries: int = ANN_QUERIES,
                   k: int = ANN_K) -> DataFrame:
    """(query_id, rank, neighbor_id, cos): exact top-k cosine neighbors
    for each query vector (vec_id < n_queries), self excluded.
    Deterministic order: cos (6 dp) desc, then neighbor_id asc."""
    from pyspark.sql import Window
    n = with_norm(emb).persist()
    q = n.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"),
        F.col("nrm").alias("nq"))
    c = n.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("ec"), F.col("nrm").alias("nc"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("eq", "ec") / (F.col("nq") * F.col("nc")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def sql_ann_topk_brute(n_queries: int = ANN_QUERIES, k: int = ANN_K,
                       table: str = "embeddings") -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(q.embedding)),"
        " i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    return f"""
WITH n AS (SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM {table}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({dot} / (q.nrm * c.nrm), 6) AS cos
  FROM n q JOIN n c ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}
"""


# -- LSH-bucketed ANN (the scale path; Spark-only, recall-tested) ------------

def _lcg_planes(table: int, n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5] from a
    fixed LCG — no RNG state, reproducible across runs and engines."""
    planes = []
    for j in range(n_planes):
        row, x = [], ((table * 97 + j) * 2654435761 + 1013904223) % (2**32)
        for _ in range(dim):
            x = (1664525 * x + 1013904223) % (2**32)
            row.append(x / 2**32 - 0.5)
        planes.append(row)
    return planes


def with_lsh_buckets(emb: DataFrame, n_tables: int = LSH_TABLES,
                     n_planes: int = LSH_PLANES, dim: int = LSH_DIM) -> DataFrame:
    """Adds integer columns `b0..b{T-1}`: per hash table, the sign
    pattern of the embedding against n_planes fixed hyperplanes (all
    JVM-side expressions, one projection, no shuffle)."""
    out = emb
    for t in range(n_tables):
        planes = _lcg_planes(t, n_planes, dim)
        bucket = None
        for j, row in enumerate(planes):
            arr = f"array({', '.join(repr(v) for v in row)})"
            bit = F.when(_dot("embedding", arr) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        out = out.withColumn(f"b{t}", bucket.cast("int"))
    return out


def ann_topk_lsh(emb: DataFrame, n_queries: int = ANN_QUERIES, k: int = ANN_K,
                 n_tables: int = LSH_TABLES, n_planes: int = LSH_PLANES,
                 dim: int = LSH_DIM) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.  A vector
    is a candidate for a query iff they collide in >=1 of n_tables
    tables (plus Hamming-1 multiprobe within each table).  The
    candidate join fans out on the (table, bucket) key — at 100 TB a
    co-partitioned equi-join on a bounded key space, never a cross
    join.  Recall vs the brute-force baseline is asserted in tests."""
    from pyspark.sql import Window
    b = with_lsh_buckets(with_norm(emb), n_tables, n_planes, dim).persist()
    tagged = None
    for t in range(n_tables):
        probes = F.array(*(
            [F.col(f"b{t}")] +
            [F.expr(f"int(b{t} ^ {1 << j})") for j in range(n_planes)]
        ))
        qt = (
            b.filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("eq"), F.col("nrm").alias("nq"),
                    F.lit(t).alias("t"), F.explode(probes).alias("bucket"))
        )
        tagged = qt if tagged is None else tagged.unionAll(qt)
    cand = None
    for t in range(n_tables):
        ct = b.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ec"), F.col("nrm").alias("nc"),
                      F.lit(t).alias("t"), F.col(f"b{t}").alias("bucket"))
        cand = ct if cand is None else cand.unionAll(ct)
    scored = (
        tagged.join(cand, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("eq", "ec") / (F.col("nq") * F.col("nc")), 6).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
