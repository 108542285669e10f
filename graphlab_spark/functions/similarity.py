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

from .lsh_guard import LSH_MAX_BUCKET, cap_bucket_groups

COSINE_TAU = 0.4
ANN_QUERIES = 10  # vec_id < ANN_QUERIES are the query set
ANN_K = 5
LSH_PLANES = 5        # floor; real runs derive planes from N (below)
LSH_TABLES = 4
LSH_DIM = 64
LSH_TARGET_BUCKET = 64  # aim for ~this many vectors per bucket


def derived_planes(n_rows: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Plane count as a function of corpus size: ceil(log2(N/target)).

    A fixed plane count is a scale trap — with P planes there are only
    2^P buckets per table, so each candidate probe scans ~N/2^P vectors
    and a constant P degrades to a fractional cross join as N grows.
    Growing P with log2(N) keeps the expected bucket size (and thus the
    per-query candidate budget) constant at any scale.
    """
    import math

    return max(LSH_PLANES, math.ceil(math.log2(max(1.0, n_rows / target_bucket))))


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm(emb: DataFrame) -> DataFrame:
    """Adds the L2 norm column `nrm` (computed once, in double)."""
    return emb.withColumn("nrm", F.sqrt(_dot("embedding", "embedding")))


def cosine_pairs(emb: DataFrame, tau: float = COSINE_TAU,
                 candidates: DataFrame | None = None) -> DataFrame:
    """(vec_a, vec_b, cos) for pairs with cosine >= tau, cos rounded
    to 6 dp.

    Scale contract (same shape as ``knn_graph``): ``candidates=None``
    scores every pair — the exact O(N^2) correctness baseline the
    driver oracle replays.  At scale pass ``candidates`` = a
    (src, dst) pair DataFrame from a sub-quadratic generator
    (``lsh_knn_candidates``, IVF cell co-membership); pairs are
    canonicalized to vec_a < vec_b and only those are scored, so cost
    is O(|candidates|) and the scoring/filter plan (two id equi-joins,
    no cross product) is shared with the exact path."""
    # lazy localCheckpoint, not persist: reused by both join sides of
    # the returned lazy plan; blocks are released when the result is
    # dropped instead of pinning CacheManager storage per call
    n = with_norm(emb).localCheckpoint(eager=False)
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
                 F.col("nrm").alias("nb"))
    if candidates is None:
        pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    else:
        cand = (
            candidates.select(F.least("src", "dst").alias("vec_a"),
                              F.greatest("src", "dst").alias("vec_b"))
            .filter(F.col("vec_a") < F.col("vec_b")).distinct()
        )
        pairs = cand.join(a, "vec_a").join(b, "vec_b")
    return (
        pairs
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
    n = with_norm(emb).localCheckpoint(eager=False)
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
    JVM-side expressions, one projection, no shuffle).

    Guards against a dim mismatch: `zip_with` pads the shorter side
    with NULLs, which would silently turn every dot product NULL and
    collapse all buckets to 0 (a full cross join downstream)."""
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is not None and first["d"] != dim:
        raise ValueError(
            f"with_lsh_buckets: embedding dim {first['d']} != planes dim "
            f"{dim}; pass dim= explicitly (mismatch would zero all buckets)")
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


def lsh_candidate_pairs(emb: DataFrame, n_queries: int = ANN_QUERIES,
                        n_tables: int = LSH_TABLES,
                        n_planes: int | None = None,
                        dim: int = LSH_DIM,
                        max_bucket: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """Distinct (query_id, neighbor_id, cos) LSH candidates — the
    pre-ranking stage of ``ann_topk_lsh``, exposed so tests can assert
    the per-query candidate budget stays bounded as N grows.

    ``n_planes=None`` derives the plane count from the corpus size
    (``derived_planes``): one ``count()`` action, amortized across the
    whole query.  ``max_bucket`` caps the neighbor side of each
    (table, bucket) group before the probe join (``lsh_guard``) so a
    degenerate bucket — all-equal embeddings collapsing one sign
    pattern — costs at most max_bucket candidates per probe; None
    disables (the exact mode the DuckDB oracle replays)."""
    if n_planes is None:
        n_planes = derived_planes(emb.count())
    b = with_lsh_buckets(with_norm(emb), n_tables, n_planes,
                         dim).localCheckpoint(eager=False)
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
    cand = cap_bucket_groups(cand, ["t", "bucket"], max_bucket,
                             label="ann_lsh")
    return (
        tagged.join(cand, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("eq", "ec") / (F.col("nq") * F.col("nc")), 6).alias("cos"))
        .distinct()
    )


def ann_topk_lsh(emb: DataFrame, n_queries: int = ANN_QUERIES, k: int = ANN_K,
                 n_tables: int = LSH_TABLES, n_planes: int | None = None,
                 dim: int = LSH_DIM,
                 max_bucket: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.  A vector
    is a candidate for a query iff they collide in >=1 of n_tables
    tables (plus Hamming-1 multiprobe within each table).  The
    candidate join fans out on the (table, bucket) key — at 100 TB a
    co-partitioned equi-join on a bounded key space, never a cross
    join; the plane count grows with log2(N) (``derived_planes``) so
    bucket sizes stay constant.  Recall and candidate budget vs the
    brute-force baseline are asserted in tests; with ``n_planes``
    pinned, the whole pipeline (LCG planes included) is replayed
    value-for-value by the DuckDB oracle (``sql_ann_topk_lsh``)."""
    from pyspark.sql import Window
    scored = lsh_candidate_pairs(emb, n_queries, n_tables, n_planes, dim,
                                 max_bucket=max_bucket)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def sql_ann_topk_lsh(n_queries: int = ANN_QUERIES, k: int = ANN_K,
                     n_tables: int = LSH_TABLES, n_planes: int = LSH_PLANES,
                     dim: int = LSH_DIM, table: str = "embeddings") -> str:
    """DuckDB twin of ``ann_topk_lsh`` with a pinned plane count: the
    LCG hyperplanes are exact binary fractions (x/2^32 - 0.5), so their
    repr round-trips bit-for-bit into both engines and the sign
    patterns, buckets, multiprobe set, and cosine ranks all match."""
    def dot_lit(vec: str, row: list[float]) -> str:
        arr = "[" + ", ".join(repr(v) for v in row) + "]"
        return (f"list_sum(list_transform(generate_series(1, len({vec})),"
                f" i -> CAST({vec}[i] AS DOUBLE) * ({arr})[i]))")

    bucket_cols = []
    for t in range(n_tables):
        planes = _lcg_planes(t, n_planes, dim)
        bits = " + ".join(
            f"(CASE WHEN {dot_lit('embedding', row)} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j, row in enumerate(planes))
        bucket_cols.append(f"({bits}) AS b{t}")
    probe_selects = []
    for t in range(n_tables):
        probe_list = "[b%d%s]" % (
            t, "".join(f", xor(b{t}, {1 << j})" for j in range(n_planes)))
        probe_selects.append(
            f"SELECT vec_id AS query_id, embedding AS eq, nrm AS nq,"
            f" {t} AS t, unnest({probe_list}) AS bucket"
            f" FROM b WHERE vec_id < {n_queries}")
    cands = " UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, embedding AS ec, nrm AS nc,"
        f" {t} AS t, b{t} AS bucket FROM b"
        for t in range(n_tables))
    dot_qc = ("list_sum(list_transform(generate_series(1, len(q.eq)),"
              " i -> CAST(q.eq[i] AS DOUBLE) * CAST(c.ec[i] AS DOUBLE)))")
    return f"""
WITH n AS (SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM {table}),
b AS (SELECT vec_id, embedding, nrm, {', '.join(bucket_cols)} FROM n),
tagged AS ({' UNION ALL '.join(probe_selects)}),
cand AS ({cands}),
scored AS (
  SELECT DISTINCT q.query_id, c.neighbor_id,
         round({dot_qc} / (q.nq * c.nc), 6) AS cos
  FROM tagged q JOIN cand c ON q.t = c.t AND q.bucket = c.bucket
  WHERE q.query_id <> c.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}
"""


# -- IVF ANN (k-means coarse quantizer; the second scale path) ---------------

IVF_CELLS = 8
IVF_PROBE = 3


def ivf_assignments(emb: DataFrame, n_cells: int = IVF_CELLS,
                    kmeans_iterations: int = 5):
    """((vec_id, cell) assignments, centers): coarse quantization of
    the embedding table by Lloyd k-means (``init='first'`` — engine
    portable, so the DuckDB oracle rebuilds identical cells)."""
    from ..algos.kmeans import kmeans
    assign, centers = kmeans(
        emb, k=n_cells, iterations=kmeans_iterations,
        id_col="vec_id", vec_col="embedding", init="first")
    return assign.withColumnRenamed("id", "vec_id") \
                 .withColumnRenamed("cluster", "cell"), centers


def ann_topk_ivf(emb: DataFrame, n_queries: int = ANN_QUERIES,
                 k: int = ANN_K, n_cells: int = IVF_CELLS,
                 n_probe: int = IVF_PROBE,
                 kmeans_iterations: int = 5) -> DataFrame:
    """(query_id, rank, neighbor_id, cos): IVF approximate top-k — each
    query probes its ``n_probe`` nearest k-means cells and brute-forces
    cosine inside them only.

    Scale shape: the centroid table is tiny (n_cells rows, broadcast),
    so probing is an arithmetic pass over queries; the candidate join
    is an equi-join on ``cell``, touching ~n_probe/n_cells of the
    corpus per query instead of all of it.  ``n_probe = n_cells``
    degrades to exact brute force (asserted by tests).  At 100 TB,
    n_cells grows with corpus size (cells sized to fit an executor)
    and the quantizer trains on a sample — the plan shape is unchanged.
    """
    from pyspark.sql import Window

    assign, centers = ivf_assignments(emb, n_cells, kmeans_iterations)
    spark = emb.sparkSession
    cen = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, center array<double>")

    n = with_norm(emb).localCheckpoint(eager=False)
    q = n.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"),
        F.col("nrm").alias("nq"))
    # probe ranking: distance(query, center), ties to smaller cell id
    d2 = F.aggregate(
        F.zip_with("eq", "center", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    wp = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("cell").asc())
    probes = (
        q.join(F.broadcast(cen), F.lit(True))
        .withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "eq", "nq", "cell")
    )
    c = (
        n.join(assign, "vec_id")
        .select(F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ec"), F.col("nrm").alias("nc"),
                "cell")
    )
    scored = (
        probes.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("eq", "ec") / (F.col("nq") * F.col("nc")), 6)
                .alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
    return out


def sql_ann_topk_ivf(n_queries: int = ANN_QUERIES, k: int = ANN_K,
                     n_cells: int = IVF_CELLS, n_probe: int = IVF_PROBE,
                     kmeans_iterations: int = 5,
                     table: str = "embeddings") -> str:
    """DuckDB twin: reuses the k-means recursive CTE for the cells."""
    from ..algos.kmeans import kmeans as _  # noqa: F401 (parity anchor)
    from .. import oracles as O
    km = O.sql_kmeans_full(k=n_cells, iterations=kmeans_iterations,
                           table=table)
    head = km[: km.rindex("SELECT id, cluster FROM (")]
    dist = ("list_sum(list_transform(generate_series(1, len(p.v)),"
            " i -> (p.v[i] - c2.center[i]) * (p.v[i] - c2.center[i])))")
    qdist = ("list_sum(list_transform(generate_series(1, len(q.v)),"
             " i -> (q.v[i] - c2.center[i]) * (q.v[i] - c2.center[i])))")
    dot = ("list_sum(list_transform(generate_series(1, len(q.v)),"
           " i -> q.v[i] * c.v[i]))")
    return head + f"""
, cenf AS (SELECT cluster AS cell, center FROM cen
           WHERE iter = (SELECT max(iter) FROM cen)),
assign AS (SELECT id AS vec_id, cell FROM (
  SELECT p.id, c2.cell,
         row_number() OVER (PARTITION BY p.id ORDER BY {dist}, c2.cell)
             AS rn
  FROM pts p CROSS JOIN cenf c2) WHERE rn = 1),
nrm AS (SELECT id AS vec_id, v,
        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM pts),
cen2 AS (SELECT cell, list(m ORDER BY pos) AS center FROM (
  SELECT a.cell, g.pos, avg(p.v[g.pos]) AS m
  FROM assign a JOIN pts p ON p.id = a.vec_id
  CROSS JOIN (SELECT unnest(generate_series(1,
      (SELECT len(v) FROM pts LIMIT 1))) AS pos) g
  GROUP BY a.cell, g.pos) GROUP BY cell),
cenp AS (SELECT f.cell, coalesce(n.center, f.center) AS center
         FROM cenf f LEFT JOIN cen2 n ON n.cell = f.cell),
probes AS (SELECT query_id, cell FROM (
  SELECT q.id AS query_id, c2.cell,
         row_number() OVER (PARTITION BY q.id
             ORDER BY {qdist}, c2.cell) AS prn
  FROM (SELECT id, v FROM pts WHERE id < {n_queries}) q
  CROSS JOIN cenp c2) WHERE prn <= {n_probe}),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         round({dot} / (q.nrm * c.nrm), 6) AS cos
  FROM probes p
  JOIN nrm q ON q.vec_id = p.query_id
  JOIN assign a ON a.cell = p.cell
  JOIN nrm c ON c.vec_id = a.vec_id
  WHERE c.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}"""


def cosine_dup_clusters(emb: DataFrame, tau: float = COSINE_TAU,
                        candidates: DataFrame | None = None) -> DataFrame:
    """(vec_id, canonical_id): semantic near-duplicate clusters —
    connected components over the cosine>=tau pair graph, canonical =
    smallest vec_id (the embedding-space twin of
    ``dedup.minhash_dup_clusters``; same transitive-closure rationale).
    ``candidates`` routes straight into ``cosine_pairs`` — at scale
    pass ``lsh_knn_candidates(emb)`` (or an IVF generator) so the pair
    stage is sub-quadratic; the clustering step is unchanged, and CC's
    transitive closure absorbs generator misses whenever a dup cluster
    stays connected through any chain of surviving pairs."""
    from ..algos.connected_components import connected_components
    from ..graph import EdgeGraph

    pairs = cosine_pairs(emb, tau, candidates=candidates)
    edges = pairs.select(F.col("vec_a").alias("src"),
                         F.col("vec_b").alias("dst"))
    g = EdgeGraph(edges)
    state = connected_components(g, resume=False).state
    g.unpersist()  # CC ran eagerly; state is lineage-truncated
    return (
        emb.select("vec_id")
        .join(state.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select("vec_id",
                F.coalesce("component", "vec_id").alias("canonical_id"))
    )


def sql_cosine_dup_clusters(tau: float = COSINE_TAU,
                            table: str = "embeddings") -> str:
    """Hash-min fixpoint over the cosine pair SQL (same recursive
    shape as dedup.sql_minhash_dup_clusters)."""
    return f"""
WITH RECURSIVE
cpairs AS (SELECT vec_a, vec_b FROM ({sql_cosine_pairs(tau, table)}) t),
cverts AS (SELECT DISTINCT id FROM (SELECT vec_a AS id FROM cpairs
           UNION ALL SELECT vec_b FROM cpairs)),
csym AS (SELECT vec_a AS src, vec_b AS dst FROM cpairs
         UNION ALL SELECT vec_b, vec_a FROM cpairs),
ccc(iter, id, component, nchanged) AS (
  SELECT 0, id, id, CAST(1 AS BIGINT) FROM cverts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           least(p.component, coalesce(m.received, p.component)) AS component,
           sum(CASE WHEN coalesce(m.received, p.component) < p.component
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM ccc p
    LEFT JOIN (SELECT s.dst AS mid, min(p2.component) AS received
               FROM ccc p2 JOIN csym s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.mid
    WHERE p.nchanged > 0 AND p.iter < 100
  )
),
cfin AS (SELECT id, component FROM ccc
         WHERE iter = (SELECT max(iter) FROM ccc))
SELECT e.vec_id, coalesce(f.component, e.vec_id) AS canonical_id
FROM {table} e LEFT JOIN cfin f ON f.id = e.vec_id"""


def knn_graph(emb: DataFrame, k: int = 3,
              candidates: DataFrame | None = None) -> DataFrame:
    """(src, rank, dst, cos): each vector's top-k cosine neighbors as a
    directed edge table — the standard bridge from embedding space into
    the graph engine (k-NN graph -> components/LPA/PageRank is how
    embedding-level dedup and topic discovery compose with the link
    toolkit).

    Deterministic order: cos (6 dp) desc, then dst asc — the exact
    tie-break of ``ann_topk_brute``.

    Scale contract: with ``candidates=None`` every pair is scored — the
    exact O(N^2) correctness baseline (what the driver oracle replays).
    At scale pass ``candidates`` = a (src, dst)-id pair DataFrame from a
    sub-quadratic generator (LSH bucket co-occupancy via
    ``with_lsh_buckets``, IVF cell co-membership via
    ``ivf_assignments``); only those pairs are scored, so cost is
    O(|candidates|) and the result is exact whenever the generator's
    recall covers the true top-k.  Both paths share the scoring +
    ranking plan (broadcast-free sort-merge join on ids, one window
    per src partition).
    """
    n = with_norm(emb)
    a = n.select(F.col("vec_id").alias("src"), F.col("embedding").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"),
                 F.col("nrm").alias("nb"))
    if candidates is None:
        pairs = a.join(b, F.col("src") != F.col("dst"))
    else:
        cand = (candidates.select("src", "dst")
                .filter(F.col("src") != F.col("dst")).distinct())
        pairs = cand.join(a, "src").join(b, "dst")
    from pyspark.sql import Window
    scored = pairs.select(
        "src", "dst",
        F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias("cos"))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("src", "rank", "dst", "cos"))


def lsh_knn_candidates(emb: DataFrame, n_tables: int = LSH_TABLES,
                       n_planes: int | None = None,
                       dim: int = LSH_DIM,
                       multiprobe: bool = True,
                       max_bucket: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """All-to-all (src, dst) candidate pairs from LSH bucket
    co-occupancy (any table) — the sub-quadratic generator for
    ``knn_graph`` / ``cosine_pairs`` at scale.  Plane count defaults to
    ``derived_planes`` of the input size so per-bucket populations stay
    bounded as N grows (the round-1 geometry lesson).

    ``multiprobe=True`` (the knn default) adds Hamming-1 probes — a
    (1+planes)x candidate factor bought for top-k recall.  For
    near-duplicate detection pass ``multiprobe=False``: near-identical
    vectors share the *exact* bucket in every table (their sign
    patterns agree wherever margins exceed the perturbation), so the
    extra probes only inflate candidate volume on locally dense
    corpora.

    ``max_bucket`` caps rows per bucket on the non-exploded join side
    (``lsh_guard.cap_bucket_groups``) — this is the quadratic site: a
    mega-bucket of B co-hashing vectors would otherwise self-join into
    B^2 pairs per table.  None disables (exact mode)."""
    if n_planes is None:
        n_planes = derived_planes(emb.count())
    bucketed = with_lsh_buckets(emb, n_tables=n_tables, n_planes=n_planes,
                                dim=dim)
    pairs = None
    for t in range(n_tables):
        # Hamming-1 multiprobe on the src side (same scheme as
        # ann_topk_lsh): each vector also probes the buckets one flipped
        # plane away, trading a (1+planes)x candidate factor for the
        # recall a single bucket per table cannot give.
        probes = F.array(*(
            [F.col(f"b{t}")] +
            ([F.expr(f"int(b{t} ^ {1 << j})") for j in range(n_planes)]
             if multiprobe else [])
        ))
        l = bucketed.select(F.col("vec_id").alias("src"),
                            F.explode(probes).alias("bucket"))
        r = cap_bucket_groups(
            bucketed.select(F.col(f"b{t}").alias("bucket"),
                            F.col("vec_id").alias("dst")),
            ["bucket"], max_bucket, label=f"knn_lsh_t{t}")
        pt = l.join(r, "bucket").filter(F.col("src") != F.col("dst"))
        pairs = pt if pairs is None else pairs.unionAll(pt)
    return pairs.select("src", "dst").distinct()


def sql_knn_graph(k: int = 3, table: str = "embeddings") -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)),"
           " i -> CAST(a.embedding[i] AS DOUBLE)"
           " * CAST(b.embedding[i] AS DOUBLE)))")
    return f"""
WITH n AS (SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM {table}),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({dot} / (a.nrm * b.nrm), 6) AS cos
  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT src, dst, cos,
         CAST(row_number() OVER (PARTITION BY src
              ORDER BY cos DESC, dst ASC) AS BIGINT) AS rank
  FROM scored)
SELECT src, rank, dst, cos FROM ranked WHERE rank <= {k}"""


def knn_components(emb: DataFrame, k: int = 3) -> DataFrame:
    """(id, component): connected components of the symmetrized exact
    k-NN graph — embedding-space cluster discovery composed entirely
    from engine primitives (knn_graph -> EdgeGraph -> hash-min CC),
    the composition query for the embeddings->graph bridge."""
    from ..algos.connected_components import connected_components
    from ..graph import EdgeGraph

    edges = knn_graph(emb, k=k).select("src", "dst")
    g = EdgeGraph(edges)
    state = connected_components(g, resume=False).state
    g.unpersist()  # CC ran eagerly; state is lineage-truncated
    return state


def sql_knn_components(k: int = 3, table: str = "embeddings") -> str:
    """Hash-min fixpoint over the exact k-NN edge SQL (same recursive
    shape as ``sql_cosine_dup_clusters``)."""
    return f"""
WITH RECURSIVE
kedges AS (SELECT src, dst FROM ({sql_knn_graph(k, table)}) t),
kverts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM kedges
           UNION ALL SELECT dst FROM kedges)),
ksym AS (SELECT src, dst FROM kedges
         UNION ALL SELECT dst AS src, src AS dst FROM kedges),
kcc(iter, id, component, nchanged) AS (
  SELECT 0, id, id, CAST(1 AS BIGINT) FROM kverts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           least(p.component, coalesce(m.received, p.component)) AS component,
           sum(CASE WHEN coalesce(m.received, p.component) < p.component
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM kcc p
    LEFT JOIN (SELECT s.dst AS mid, min(p2.component) AS received
               FROM kcc p2 JOIN ksym s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.mid
    WHERE p.nchanged > 0 AND p.iter < 100
  )
)
SELECT id, component FROM kcc WHERE iter = (SELECT max(iter) FROM kcc)"""
