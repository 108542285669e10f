"""Graph file loaders/savers (SURVEY §2.1).

Reference format dispatcher: ``load_format(path, fmt)`` with formats
snap/adj/tsv/csv/graphjrl/bintsv4/bin
(``/root/reference/src/graphlab/graph/distributed_graph.hpp:2412-2438``;
parsers in ``builtin_parsers.hpp``). snap/tsv/adj drop self-loops
(``builtin_parsers.hpp:74,94,137``); csv does NOT (``:99-113`` has no
``source != target`` guard); '#' comment lines are snap-only.

Spark mapping: every text format is a ``spark.read`` + vectorized parse
expression (files split across executors for free — the reference's
per-machine file-subset logic, ``distributed_graph.hpp:2333-2342``, is
native here). Binary journal formats map to Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def _pairs(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).filter(F.col("src") != F.col("dst"))


def load_snap(spark: SparkSession, path: str) -> DataFrame:
    """SNAP: tab-separated ``src\tdst``, '#' comments
    (``builtin_parsers.hpp:62-77``)."""
    df = spark.read.csv(path, sep="\t", comment="#", schema=EDGE_SCHEMA)
    return _pairs(df.filter(F.col("src").isNotNull()))


def load_tsv(spark: SparkSession, path: str) -> DataFrame:
    """TSV: ``src\tdst`` (``builtin_parsers.hpp:85-96``)."""
    return _pairs(spark.read.csv(path, sep="\t", schema=EDGE_SCHEMA))


def load_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV: ``src,dst`` (``builtin_parsers.hpp:99-113``).  Unlike the
    snap/tsv/adj parsers, the reference's csv_parser adds every edge
    unconditionally — self-loops are KEPT."""
    df = spark.read.csv(path, sep=",", schema=EDGE_SCHEMA)
    return df.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))


def load_adj(spark: SparkSession, path: str,
             strict: bool = True) -> DataFrame:
    """Adjacency list: ``src n tgt1 ... tgtn`` per line
    (``builtin_parsers.hpp:119-142``) -> split + explode, taking ALL
    ``n`` declared targets (no silent cap — a 100 TB-scale hub line may
    carry millions).  ``strict`` replays the reference's ``n != nadded``
    parse failure (``:140``): any line whose target count disagrees
    with its declared ``n`` aborts the load (one validation pass over
    the text; the reference pays the same read).  Lines where ``n``
    cannot be read at all (a lone source token, or a non-numeric
    count) are silently skipped — the reference's ``strm.fail()``
    reading ``n`` returns true without error (``:129-130``).
    Self-loops are dropped from the edge set but count toward
    ``nadded``, exactly as the reference's loop does (``:136-138``)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    toks = F.split(F.trim("value"), r"\s+")
    # F.get (not getItem): a lone-token line must yield NULL, not an
    # ANSI out-of-bounds error — NULL n = "strm.fail() reading n" = skip
    n_declared = F.get(toks, 1).try_cast("long")
    n_actual = (F.size(toks) - F.lit(2)).cast("long")
    if strict:
        bad = lines.filter(n_declared.isNotNull()
                           & (n_actual != n_declared)).limit(1).collect()
        if bad:
            raise ValueError(
                f"adj parse failure (declared n != targets present): "
                f"{bad[0]['value'][:120]!r}")
    return _pairs(
        lines.filter(n_declared.isNotNull() & (n_actual > 0)).select(
            toks.getItem(0).alias("src"),
            F.explode(F.slice(toks, 3, F.greatest(n_actual, F.lit(1))))
            .alias("dst"),
        )
    )


def load_parquet_edges(spark: SparkSession, path: str) -> DataFrame:
    """Native columnar path (the graphjrl/bintsv4 binary analogs)."""
    return _pairs(spark.read.parquet(path))


def load_format(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    # graphjrl/bintsv4 read the reference's actual bytes
    # (binary_formats; ``builtin_parsers.hpp:196-318``,
    # ``distributed_graph.hpp:3278-3291``); "bin"/"parquet" are the
    # engine-native columnar snapshots.
    from .binary_formats import load_bintsv4, load_graphjrl
    loaders = {
        "snap": load_snap,
        "tsv": load_tsv,
        "csv": load_csv,
        "adj": load_adj,
        "parquet": load_parquet_edges,
        "bin": load_parquet_edges,
        "graphjrl": load_graphjrl,
        "bintsv4": load_bintsv4,
    }
    if fmt not in loaders:
        raise ValueError(f"unknown graph format: {fmt}")
    return loaders[fmt](spark, path)


# -- savers (``distributed_graph.hpp:2082-2140``) ----------------------------


def save_edges(edges: DataFrame, path: str, fmt: str = "tsv") -> None:
    if fmt in ("tsv", "snap"):
        edges.select("src", "dst").write.mode("overwrite").csv(path, sep="\t")
    elif fmt == "csv":
        edges.select("src", "dst").write.mode("overwrite").csv(path, sep=",")
    elif fmt in ("parquet", "bin"):
        edges.write.mode("overwrite").parquet(path)
    elif fmt == "graphjrl":
        from .binary_formats import save_graphjrl
        save_graphjrl(edges, path)
    elif fmt == "bintsv4":
        from .binary_formats import save_bintsv4
        save_bintsv4(edges, path)
    else:
        raise ValueError(f"unknown graph format: {fmt}")


def save_edge_list_structure(edges: DataFrame, path: str) -> None:
    """``graph_ops::save_edge_list_structure`` (``graph_ops.hpp:183``)."""
    edges.select("src", "dst").write.mode("overwrite").csv(path, sep=" ")


def load_synthetic_powerlaw(
    spark: SparkSession, n: int, alpha: float = 2.1, in_degree: bool = False,
    truncate: int = 100_000_000, seed: int = 42,
) -> DataFrame:
    """Synthetic power-law graph (``distributed_graph.hpp:2371-2403``):
    each vertex v draws out-degree ~ Zipf(alpha) (or in-degree when
    ``in_degree``), targets chosen by stride hashing. Deterministic via
    seeded hashes; fully vectorized (range -> explode).

    The reference re-strides until ``target != source``
    (``:2391-2393``), so the sampled degree is realized exactly; the
    vectorized analog re-probes with a second hash and falls back to a
    guaranteed-distinct offset target, never dropping an edge."""
    if n < 2:
        return spark.createDataFrame([], EDGE_SCHEMA)
    v = spark.range(n).select(F.col("id").alias("src"))
    u = (F.pmod(F.xxhash64("src", F.lit(seed)), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    deg = F.least(
        F.lit(min(truncate, n)),
        F.ceil(F.pow(F.lit(1.0) - u, F.lit(-1.0 / (alpha - 1.0)))).cast("long"),
    )
    e = v.select("src", F.explode(F.sequence(F.lit(1), deg)).alias("k"))
    d1 = F.pmod(F.xxhash64("src", "k", F.lit(seed + 1)), F.lit(n))
    d2 = F.pmod(F.xxhash64("src", "k", F.lit(seed + 2)), F.lit(n))
    # offset in [1, n-1] makes the fallback distinct by construction
    d3 = F.pmod(F.col("src") + 1
                + F.pmod(F.xxhash64("src", "k", F.lit(seed + 3)),
                         F.lit(n - 1)), F.lit(n))
    dst = (F.when(d1 != F.col("src"), d1)
           .when(d2 != F.col("src"), d2).otherwise(d3))
    out = e.select("src", dst.alias("dst"))
    if in_degree:
        out = out.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return out


def load_synthetic_clusters(
    spark: SparkSession, ndata: int, num_clusters: int = 2, dim: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Synthetic Gaussian-blob clustering dataset
    (``toolkits/clustering/generate_synthetic.cpp:29-59``): each of
    ``num_clusters`` centers is uniform in [-10, 10]^dim, each point is
    its (hash-uniformly assigned) center plus N(0,1) noise per
    dimension.  Deterministic via seeded hashes; normals via
    Box-Muller over two hash-uniforms — fully vectorized range ->
    column expressions, no per-row Python.

    Returns ``(vec_id long, cluster int, embedding array<double>)`` —
    ``cluster`` is the ground-truth label the reference prints to
    stdout, kept as a column for recovery tests.
    """
    import math

    def u(*cols) -> F.Column:
        return (F.pmod(F.xxhash64(*cols), F.lit(1_000_003)) + 0.5) / 1_000_003.0

    assign = F.pmod(
        F.xxhash64(F.col("id"), F.lit("c"), F.lit(seed)),
        F.lit(num_clusters),
    ).cast("int")
    base = spark.range(ndata).select(
        F.col("id").alias("vec_id"), assign.alias("cluster"))
    dims = []
    for j in range(dim):
        center_j = u(F.lit("center"), F.col("cluster"), F.lit(j),
                     F.lit(seed)) * 20.0 - 10.0
        u1 = u(F.col("vec_id"), F.lit(2 * j), F.lit(seed))
        u2 = u(F.col("vec_id"), F.lit(2 * j + 1), F.lit(seed))
        z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2 * math.pi) * u2)
        dims.append(center_j + z)
    return base.select(
        "vec_id", "cluster", F.array(*dims).alias("embedding"))


def load_synthetic_als(
    spark: SparkSession, nusers: int = 100, nmovies: int = 500, d: int = 3,
    alpha: float = 1.8, stdev: float = 2.0, nvalidate: int = 2,
    npredict: int = 1, seed: int = 31413,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Synthetic collaborative-filtering dataset
    (``toolkits/collaborative_filtering/make_synthetic_als_data.cpp:
    120-177``): latent user/movie factors ~ N(0, stdev^2); per movie a
    power-law(alpha) number of train ratings plus ``nvalidate``
    validate ratings and ``npredict`` unrated predict pairs, each
    rating the exact factor dot product (the reference's ``noise``
    option is parsed but never applied, ``:49,158`` — reproduced
    as-is).  Item ids are offset by ``nusers`` (``:159``).

    Deviations (documented, distribution-parity): the reference walks
    user ids with a sequential Knuth stride and samples degrees from a
    discrete multinomial CDF — both inherently serial; here users are
    hash-uniform picks and degrees come from the continuous power-law
    inverse CDF (same family as :func:`load_synthetic_powerlaw`).

    Everything is built from :mod:`..operators.portable` LCG hashes —
    not engine builtins — so the whole generator replays in ANSI SQL
    (``oracles.py::SYNTH_ALS_CTES`` is the twin; ◆
    cf_synthetic_als_stats).  Factor components are pure functions of
    (id, dim, seed), so ratings are computed inline as column
    expressions — no factor-table join, no per-row Python.

    Returns ``(train, validate, predict)``: (user, item, rating) /
    (user, item, rating) / (user, item).
    """
    import math

    from ..operators.portable import M as LCG_M, edge_hash, lcg_hash

    umax = max(1, nusers - nvalidate - npredict)

    def unit(col):  # strictly inside (0, 1): safe for ln()
        return (lcg_hash(col) + F.lit(0.5)) / F.lit(float(LCG_M))

    def normal(tag: int, ident, dim: int):
        u1 = unit(edge_hash(F.lit(seed + tag), ident * F.lit(d) + F.lit(dim)))
        u2 = unit(edge_hash(F.lit(seed + tag + 7), ident * F.lit(d) + F.lit(dim)))
        return (F.sqrt(F.lit(-2.0) * F.log(u1))
                * F.cos(F.lit(2.0 * math.pi) * u2) * F.lit(stdev))

    def rating(user, movie):
        return sum(normal(1, user, j) * normal(2, movie, j)
                   for j in range(d))

    movies = spark.range(nmovies).select(F.col("id").alias("movie"))
    du = unit(edge_hash(F.lit(seed + 3), F.col("movie")))
    deg = F.least(F.lit(umax),
                  F.floor(F.pow(F.lit(1.0) - du,
                                F.lit(-1.0 / (alpha - 1.0)))).cast("long"))
    train_e = movies.select(
        "movie", F.explode(F.sequence(F.lit(1), deg)).alias("j"))
    # degrees are bounded by umax (the prob-vector size) but user ids
    # stride over the FULL nusers range, as the reference does
    # (make_synthetic_als_data.cpp:152 '% nusers')
    t_user = edge_hash(edge_hash(F.lit(seed + 4), F.col("movie")),
                       F.col("j")) % F.lit(nusers)
    train = train_e.select(
        t_user.alias("user"),
        (F.col("movie") + F.lit(nusers)).alias("item"),
        rating(t_user, F.col("movie")).alias("rating"))
    val_e = movies.select(
        "movie", F.explode(F.sequence(F.lit(1), F.lit(nvalidate))).alias("j"))
    v_user = edge_hash(edge_hash(F.lit(seed + 5), F.col("movie")),
                       F.col("j")) % F.lit(nusers)
    validate = val_e.select(
        v_user.alias("user"),
        (F.col("movie") + F.lit(nusers)).alias("item"),
        rating(v_user, F.col("movie")).alias("rating"))
    pred_e = movies.select(
        "movie", F.explode(F.sequence(F.lit(1), F.lit(npredict))).alias("j"))
    p_user = edge_hash(edge_hash(F.lit(seed + 6), F.col("movie")),
                       F.col("j")) % F.lit(nusers)
    predict = pred_e.select(
        p_user.alias("user"), (F.col("movie") + F.lit(nusers)).alias("item"))
    return train, validate, predict


def load_synthetic_image(
    spark: SparkSession, rows: int = 32, cols: int = 32, ncolors: int = 5,
    error_rate: float = 0.5, seed: int = 17,
) -> tuple[DataFrame, DataFrame]:
    """Synthetic noisy-image structured-prediction dataset
    (``toolkits/graphical_models/synthetic_image_data.cpp:79-131``, the
    ``make_data`` generator the denoising demos consume).

    Replayed semantics: pixel ids pack (row, col) as ``(r << 16) | c``
    (``sub2ind``, ``:69-72``); the true image is a radial "sunset" ring
    ``floor(min(1, dist/max_radius) * (ncolors-1))`` masked to 0 below
    the integer horizon ``r >= rows/2`` (``:98-105``); the observed
    color flips to a uniform color with probability ``error_rate``
    (``:106-108``); the per-pixel prior over colors is the reference's
    own (unnormalized) table ``obs == pred ? error_rate :
    error_rate/(ncolors-1)`` written verbatim (``:118-122``); edges are
    the 4-neighbor grid arcs (r+1, c) and (r, c+1) (``:125-129``).

    Deviation (documented): the reference draws from its process-seeded
    Mersenne RNG; here both draws are :mod:`..operators.portable` LCG
    hashes of the pixel id, so the dataset is deterministic at any
    parallelism and replays in ANSI SQL (sql_synthetic_image twin).
    The OpenCV png renders (``:133-136``) are out of scope per the
    media-codec policy.

    Returns ``(vertices, edges)``: ``(id, r, c, true_color, obs_color,
    prior: array<double>[ncolors])`` / ``(src, dst)``.
    """
    from ..operators.portable import M as LCG_M, edge_hash, lcg_hash

    if rows < 1 or cols < 1 or ncolors < 2:
        raise ValueError("load_synthetic_image: need rows,cols >= 1 "
                         "and ncolors >= 2")
    center_r, center_c = rows / 2.0, cols / 2.0
    max_radius = min(rows, cols) / 2.0
    px = spark.range(rows * cols).select(
        (F.col("id") / cols).cast("long").alias("r"),
        (F.col("id") % cols).alias("c"))
    vid = (F.col("r") * 65536 + F.col("c")).alias("id")
    dist = F.sqrt(
        (F.col("r") - F.lit(center_r)) * (F.col("r") - F.lit(center_r))
        + (F.col("c") - F.lit(center_c)) * (F.col("c") - F.lit(center_c)))
    ring = F.floor(
        F.least(F.lit(1.0), dist / F.lit(max_radius)) * F.lit(ncolors - 1)
    ).cast("int")
    true_color = F.when(F.col("r") < F.lit(rows // 2), ring) \
        .otherwise(F.lit(0)).alias("true_color")
    u_flip = (lcg_hash(edge_hash(F.lit(seed + 1), F.col("id")))
              + F.lit(0.5)) / F.lit(float(LCG_M))
    rand_color = (edge_hash(F.lit(seed + 2), F.col("id"))
                  % F.lit(ncolors)).cast("int")
    obs_color = F.when(u_flip < F.lit(error_rate), rand_color) \
        .otherwise(F.col("true_color")).alias("obs_color")
    base = px.select(vid, "r", "c", true_color).select(
        "*", obs_color)
    off = error_rate / (ncolors - 1)
    prior = F.array(*[
        F.when(F.col("obs_color") == p, F.lit(error_rate))
        .otherwise(F.lit(off)) for p in range(ncolors)
    ]).alias("prior")
    vertices = base.select("id", "r", "c", "true_color", "obs_color", prior)
    down = base.filter(F.col("r") + 1 < rows).select(
        F.col("id").alias("src"),
        ((F.col("r") + 1) * 65536 + F.col("c")).alias("dst"))
    right = base.filter(F.col("c") + 1 < cols).select(
        F.col("id").alias("src"),
        (F.col("r") * 65536 + F.col("c") + 1).alias("dst"))
    return vertices, down.unionAll(right)


def load_synthetic_clusters_portable(
    spark: SparkSession, num_clusters: int = 2, dim: int = 2,
    ndata: int = 10_000, seed: int = 2009,
) -> tuple[DataFrame, DataFrame]:
    """SQL-replayable twin of :func:`load_synthetic_clusters`
    (``toolkits/clustering/generate_synthetic.cpp:29-59``): identical
    model — Uniform(-10,10) centers, uniform cluster picks, unit
    gaussians — but every draw is a portable LCG hash instead of
    xxhash64, so the whole table replays in ANSI SQL for the value
    oracle, and the drawn centers are returned as a second frame.

    Replayed semantics: ``num_clusters`` centers with every coordinate
    ``Uniform(-10, 10)`` (``:43-46``); each of ``ndata`` points picks a
    uniform cluster (``:53``) and emits ``gaussian() + center[c][j]``
    per coordinate (``:55``) — unit-variance noise.

    Deviation (documented, distribution-parity): the reference draws
    from its process-seeded Mersenne RNG; here every draw is a
    :mod:`..operators.portable` LCG hash of (seed, index) with
    Box-Muller for the gaussians — deterministic at any parallelism
    and replayable in ANSI SQL (``oracles.sql_synthetic_clusters_stats``
    twin).  All draws are column expressions — no factor-table join,
    no per-row Python.

    Returns ``(points, centers)``:
    ``(id, cluster, vec: array<double>[dim])`` /
    ``(cluster, center: array<double>[dim])``.
    """
    import math

    from ..operators.portable import M as LCG_M, edge_hash, lcg_hash

    if num_clusters < 1 or dim < 1 or ndata < 0:
        raise ValueError("load_synthetic_clusters: need num_clusters,"
                         " dim >= 1 and ndata >= 0")

    def unit(col):  # strictly inside (0, 1): safe for ln()
        return (lcg_hash(col) + F.lit(0.5)) / F.lit(float(LCG_M))

    def center(c, j: int):
        key = edge_hash(F.lit(seed + 1), c * F.lit(dim) + F.lit(j))
        return F.lit(-10.0) + F.lit(20.0) * unit(key)

    def normal(ident, j: int):
        key = ident * F.lit(dim) + F.lit(j)
        u1 = unit(edge_hash(F.lit(seed + 3), key))
        u2 = unit(edge_hash(F.lit(seed + 10), key))
        return (F.sqrt(F.lit(-2.0) * F.log(u1))
                * F.cos(F.lit(2.0 * math.pi) * u2))

    cl = (edge_hash(F.lit(seed + 2), F.col("id"))
          % F.lit(num_clusters)).cast("int")
    points = spark.range(ndata).select("id", cl.alias("cluster")).select(
        "id", "cluster",
        F.array(*[normal(F.col("id"), j) + center(F.col("cluster"), j)
                  for j in range(dim)]).alias("vec"))
    centers = spark.range(num_clusters).select(
        F.col("id").cast("int").alias("cluster"),
        F.array(*[center(F.col("id"), j) for j in range(dim)])
        .alias("center"))
    return points, centers


def load_synthetic_factor_graph(
    spark: SparkSession, groups: int = 40, seed: int = 41,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic portable factor graph exercising the N-ary
    ``factors/`` surface (:mod:`..algos.factor_bp`): mixed variable
    cardinalities and factor arities 1/2/3, every potential a
    :mod:`..operators.portable` LCG draw so the whole model — and a
    max-sum BP chain over it — replays in ANSI SQL
    (``oracles.sql_factor_bp_beliefs`` twin).

    Shape: ``3*groups`` chained variables plus one isolated variable
    (id ``3*groups``, exercising the zero-belief apply skip of
    ``bp_vertex_program.hpp:166``):

    - variable ``v`` has cardinality ``2 + v % 2`` and log prior
      ``-(0.1 + 0.8 * u(seed, v*8+i))`` per state ``i``;
    - factor ``g`` (arity 3) spans ``[3g, 3g+1, 3g+2]``;
    - factor ``groups + g`` (arity 2) links group ``g`` to ``g+1``
      via ``[3g+2, 3g+3]`` (g < groups-1);
    - factor ``2*groups + g`` (arity 1) re-weights ``[3g]``;
    - factor tables (first variable fastest, the
      ``discrete_assignment.hpp:210-222`` layout): entry ``e`` of
      factor ``f`` is ``-(0.2 + 0.6 * u(seed+1, f*32+e))``.

    Returns ``(variables, factors)`` in the
    :func:`..algos.factor_bp.factor_graph_bp` schema:
    ``(id, card, prior)`` / ``(fid, vids, cards, table)``.
    """
    from ..operators.portable import M as LCG_M, edge_hash, lcg_hash

    if groups < 2:
        raise ValueError("load_synthetic_factor_graph: need groups >= 2")

    def unit(tag: int, key):  # noqa: ANN001 - Column
        return (lcg_hash(edge_hash(F.lit(seed + tag), key)) + F.lit(0.5)) \
            / F.lit(float(LCG_M))

    card_of = lambda v: (F.lit(2) + v % 2).cast("int")  # noqa: E731
    n_vars = 3 * groups
    variables = (
        spark.range(n_vars + 1)
        .select(F.col("id"), card_of(F.col("id")).alias("card"))
        .select(
            "id", "card",
            F.transform(
                F.sequence(F.lit(0), F.col("card") - 1),
                lambda i: -(F.lit(0.1) + F.lit(0.8)
                            * unit(0, F.col("id") * 8 + i))).alias("prior"))
    )

    def factor(fid, vids):  # noqa: ANN001 - Columns
        cards = F.transform(vids, card_of)
        numel = F.aggregate(cards, F.lit(1).cast("long"), lambda a, c: a * c)
        table = F.transform(
            F.sequence(F.lit(0).cast("long"), numel - 1),
            lambda e: -(F.lit(0.2) + F.lit(0.6) * unit(1, fid * 32 + e)))
        return (fid.alias("fid"), vids.alias("vids"),
                cards.alias("cards"), table.alias("table"))

    g = F.col("id")
    triads = spark.range(groups).select(
        *factor(g, F.array(g * 3, g * 3 + 1, g * 3 + 2)))
    links = spark.range(groups - 1).select(
        *factor(g + groups, F.array(g * 3 + 2, g * 3 + 3)))
    unaries = spark.range(groups).select(
        *factor(g + 2 * groups, F.array(g * 3)))
    return variables, triads.unionByName(links).unionByName(unaries)
