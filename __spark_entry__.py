"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: converged PageRank over the link graph
induced from the sf0.001 `events` table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the training-data-pipeline extensions).  Graph queries
run over an edge table derived from `events` with engine-portable
vertex ids (see ``graphlab_spark.sources.events``) so DuckDB can replay
the exact derivation.  Iterative fixed-point results (converged
PageRank / CC / LPA / SSSP / k-core) are not ANSI-SQL-expressible and
ship without an oracle (rows-only driver check); their exact-value
parity is covered by the pytest goldens on the reference fixture graph
(FIXTURES.md §3-4, tests/test_fixture_goldens.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos.connected_components import (
    component_size_histogram,
    connected_components,
)
from graphlab_spark.algos.kcore import kcore_subgraph
from graphlab_spark.algos.label_propagation import label_propagation
from graphlab_spark.algos.pagerank import pagerank
from graphlab_spark.algos.sssp import sssp
from graphlab_spark.algos.triangles import (
    triangle_count_per_vertex,
    triangle_list,
)
from graphlab_spark.algos.walks import sql_random_walks
from graphlab_spark.functions import curation as C
from graphlab_spark.functions import dedup as D
from graphlab_spark.functions import multimodal as M
from graphlab_spark.functions import similarity as S
from graphlab_spark.functions import text as T
from graphlab_spark import oracles as O
from graphlab_spark.sources.events import EDGES_CTES, events_graph
from graphlab_spark.sources.transcripts import (
    transcript_ctes,
    sql_tool_transitions as _sql_tool_transitions,
    sql_turn_latency_by_role as _sql_turn_latency_by_role,
)

_T_N_CONVS = 400
_T_CTES = transcript_ctes(_T_N_CONVS)


# One EdgeGraph per (session, sf_dir): the driver runs ~25 graph
# queries back-to-back in one session, and rebuilding the persisted
# edge table + degree views per query costs ~2-4s each.  Cached here
# (not in the library — callers own EdgeGraph lifetimes).
_GRAPH_CACHE: dict[tuple[int, str], "EdgeGraph"] = {}


def _graph(spark: SparkSession, sf_dir: str) -> "EdgeGraph":
    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = events_graph(spark, sf_dir)
    return _GRAPH_CACHE[key]


# Trained-model cache, same rationale: the params and rmse contract
# queries of each CF family member would otherwise train the identical
# deterministic model twice per driver run.
_MODEL_CACHE: dict[tuple[int, str, str], object] = {}


def _trained(spark: SparkSession, sf_dir: str, name: str, fit):
    key = (id(spark), sf_dir, name)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = fit()
    return _MODEL_CACHE[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to 1e-6 convergence on the sf0.001 events graph."""
    g = events_graph(spark, "/root/testdata/sf0.001", num_edge_partitions=8)
    res = pagerank(g, tol=1e-6, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_edges(spark, sf_dir):
    g = events_graph(spark, sf_dir, persist=False)
    return g.edges


def q_degrees(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return (
        g.vertices.join(g.out_degrees, "id", "left")
        .join(g.in_degrees, "id", "left")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def q_pagerank_iter2(spark, sf_dir):
    g = _graph(spark, sf_dir)
    res = pagerank(g, fixed_supersteps=2, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_converged(spark, sf_dir):
    g = _graph(spark, sf_dir)
    res = pagerank(g, tol=1e-6, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_delta(spark, sf_dir):
    """Delta-cached dynamic PageRank (post_delta gather caching,
    icontext.hpp:254 + pagerank.cpp:124-127): frontier-proportional
    supersteps over a cached gather total."""
    g = _graph(spark, sf_dir)
    res = pagerank(g, tol=1e-6, delta_cache=True, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


def q_warp_pagerank(spark, sf_dir):
    """PageRank written against the warp fine-grained API
    (``operators/warp.py`` — ``warp_graph_mapreduce.hpp:392``,
    ``demoapps/pagerank/warp_engine_pagerank.cpp:32-62``): two
    iterations of ``parfor_all_vertices`` over
    ``map_reduce_neighborhood(IN_EDGES, other.rank/other.out_degree)``;
    values replay on the builtin PageRank oracle."""
    from graphlab_spark.operators.warp import warp_pagerank
    g = _graph(spark, sf_dir)
    return warp_pagerank(g, iterations=2).select(
        "id", F.round("rank", 6).alias("rank"))


def q_triangle_total(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return triangle_list(g).agg(F.count("*").alias("triangles"))


def q_triangles_per_vertex(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return triangle_count_per_vertex(g)


def q_connected_components(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return connected_components(g, resume=False).state


def q_cc_sizes(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return component_size_histogram(connected_components(g, resume=False).state)


def q_lpa(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return label_propagation(g, max_supersteps=10, resume=False).state


def q_lpa_frontier(spark, sf_dir):
    """Frontier-pruned LPA schedule (recompute only destinations with a
    changed neighbor) — shares ``sql_lpa`` with ``graph_lpa``: the
    driver hash doubles as the bit-identical-schedules proof."""
    g = _graph(spark, sf_dir)
    return label_propagation(g, max_supersteps=10, resume=False,
                             schedule="frontier").state


def q_kcore_k2(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return kcore_subgraph(g, k=2)


def q_hits(spark, sf_dir):
    from graphlab_spark.algos.hits import hits
    g = _graph(spark, sf_dir)
    res = hits(g, supersteps=3, resume=False)
    return res.state.select(
        "id", F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"))


def q_ppr(spark, sf_dir):
    from graphlab_spark.algos.pagerank import personalized_pagerank
    g = _graph(spark, sf_dir)
    res = personalized_pagerank(g, seeds=[-1], tol=1e-6, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


def q_random_walks(spark, sf_dir):
    from graphlab_spark.algos.walks import random_walks
    g = _graph(spark, sf_dir)
    return random_walks(g, walk_length=4, walks_per_vertex=2, seed=7)


BM25_TERMS = ["spark", "window", "merge"]


def q_bm25_scores(spark, sf_dir):
    scored = T.bm25_scores(_docs(spark, sf_dir), BM25_TERMS)
    return scored.select("doc_id", F.round("score", 6).alias("score"))


def q_sssp(spark, sf_dir):
    g = _graph(spark, sf_dir)
    # source: hub node -1 (the lexicographically-first event type)
    out = sssp(g, sources=[-1], directed=False, resume=False).state
    return out.filter(~F.isnan("distance") & (F.col("distance") != float("inf")))


def q_betweenness_hubs(spark, sf_dir):
    """Brandes dependency sums from the four lexicographically-first
    event-type hubs (engine extension; oracle = chained BFS +
    descending-level accumulation recursions)."""
    from graphlab_spark.algos.betweenness import betweenness
    g = _graph(spark, sf_dir)
    out = betweenness(g, sources=[-1, -2, -3, -4], directed=False)
    return out.select("id", F.round("bc", 6).alias("bc"))


def q_harmonic_hubs(spark, sf_dir):
    """Harmonic centrality (sum of reciprocal hop distances) from the
    same four hub sources (engine extension; oracle = the shared BFS
    recursion + a reciprocal-distance aggregation)."""
    from graphlab_spark.algos.betweenness import harmonic_centrality
    g = _graph(spark, sf_dir)
    out = harmonic_centrality(g, sources=[-1, -2, -3, -4], directed=False)
    return out.select("id", F.round("hc", 6).alias("hc"))


def q_catpath(spark, sf_dir):
    """Category-mediated typed BFS (apps/our_algo) from the min event
    id, over membership (event↔type-hub) and type-co-occurrence links."""
    from graphlab_spark.algos.catpath import (
        catpath, catpath_articles, events_typed_edges)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    source = ev.agg(F.min("event_id")).first()[0]
    membership, catlinks = events_typed_edges(ev)
    res = catpath(membership, catlinks, sources=[int(source)], resume=False)
    return catpath_articles(res.state)


def q_neighbors_of_hubs(spark, sf_dir):
    """1-hop in-neighborhood expansion of the hub vertex set (id < 0)."""
    g = _graph(spark, sf_dir)
    seeds = g.vertices.filter(F.col("id") < 0)
    return g.neighbors(seeds, direction="in")


def q_vset_inout(spark, sf_dir):
    """Vertex-set algebra: ids with >=1 out-edge AND >=1 in-edge."""
    from graphlab_spark.operators.vertex_ops import vset_intersect
    g = _graph(spark, sf_dir)
    return vset_intersect(
        g.out_degrees.select("id"), g.in_degrees.select("id")
    )


def q_kcore_table(spark, sf_dir):
    """Per-K surviving (vertices, edges) — the reference kcore report."""
    from graphlab_spark.algos.kcore import kcore_table
    g = _graph(spark, sf_dir)
    rows = kcore_table(g, kmin=1, kmax=4)
    return spark.createDataFrame(
        [(r["k"], r["vertices"], r["edges"]) for r in rows],
        "k int, vertices long, edges long")


def q_approx_diameter(spark, sf_dir):
    """Effective diameter of the undirected view (direction='all'): the
    FM growth genuinely stalls within ~8 supersteps on the hub graph,
    so the stop criterion — not the superstep cap — is what the oracle
    verifies."""
    from graphlab_spark.algos.diameter import approx_diameter
    g = _graph(spark, sf_dir)
    return spark.createDataFrame(
        [(int(approx_diameter(g, direction="all")["diameter"]),)],
        "diameter int")


def q_directed_census(spark, sf_dir):
    from graphlab_spark.algos.directed_triangles import directed_triangle_census
    g = _graph(spark, sf_dir)
    return directed_triangle_census(g)


def q_coloring(spark, sf_dir):
    from graphlab_spark.algos.coloring import greedy_coloring
    g = _graph(spark, sf_dir)
    return greedy_coloring(g)


def q_warp_coloring(spark, sf_dir):
    """Greedy coloring written against the warp fine-grained API
    (``toolkits/graph_analytics/warp_coloring.cpp:63-137`` —
    ``set_union_gather`` map-reduce + smallest-free-color apply, here
    as two ``map_reduce_neighborhood`` reductions per Jones-Plassmann
    round); bit-identical to the builtin, so it replays on the same
    recursive-CTE coloring oracle."""
    from graphlab_spark.algos.coloring import warp_coloring
    g = _graph(spark, sf_dir)
    return warp_coloring(g)


def q_text_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.ws_token_count(F.col("text")).alias("ws_toks"),
        T.bpe_token_count(F.col("text")).alias("bpe_toks"),
        T.lang_id(F.col("text")).alias("lang_guess"),
        F.round(T.quality_score(F.col("text")), 6).alias("quality"),
        T.fingerprint(F.col("text")).alias("fp"),
    )


def q_bigram_lm_scores(spark, sf_dir):
    return T.char_bigram_lm_scores(_docs(spark, sf_dir))


def q_repetition_signals(spark, sf_dir):
    return T.repetition_signals(_docs(spark, sf_dir))


def q_line_dedup(spark, sf_dir):
    return D.line_dedup(
        D.chunk_into_lines(_docs(spark, sf_dir).select("doc_id", "text")))


def q_token_frequencies(spark, sf_dir):
    return T.token_frequencies(_docs(spark, sf_dir))


def q_winnowing(spark, sf_dir):
    return T.winnowing_fingerprints(_docs(spark, sf_dir))


def q_exact_dup(spark, sf_dir):
    return D.exact_dup_groups(_docs(spark, sf_dir))


def q_jaccard_pairs(spark, sf_dir):
    return D.jaccard_pairs(_docs(spark, sf_dir))


def q_minhash_sigs(spark, sf_dir):
    return D.minhash_signatures(_docs(spark, sf_dir))


def q_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(_docs(spark, sf_dir))


def q_minhash_clusters(spark, sf_dir):
    return D.minhash_dup_clusters(_docs(spark, sf_dir))


def q_simhash_sigs(spark, sf_dir):
    return D.simhash_signatures(_docs(spark, sf_dir))


def q_simhash_pairs(spark, sf_dir):
    return D.simhash_pairs(_docs(spark, sf_dir))


def q_cosine_pairs(spark, sf_dir):
    return S.cosine_pairs(_emb(spark, sf_dir))


def q_ann_brute(spark, sf_dir):
    return S.ann_topk_brute(_emb(spark, sf_dir))


def q_ann_ivf(spark, sf_dir):
    return S.ann_topk_ivf(_emb(spark, sf_dir))


def q_ann_lsh(spark, sf_dir):
    """Planes pinned to the floor value so the DuckDB oracle replays the
    identical LCG hyperplanes; real runs pass n_planes=None to derive
    the count from N (similarity.derived_planes, scale-tested)."""
    return S.ann_topk_lsh(_emb(spark, sf_dir), n_planes=S.LSH_PLANES)


def q_media_stats(spark, sf_dir):
    """Real binary payloads (PGM/WAV/P6-stream synthesized from the
    documents text) decoded back by the pure-Python codec layer; the
    oracle re-derives payload sizes + decoded dims arithmetically from
    the text length, verifying the decode path end-to-end (r5: upgraded
    from the metadata-only media_stats)."""
    return M.decoded_media_stats(
        M.synthesize_payloads(_docs(spark, sf_dir)))


def q_kmeans_assign1(spark, sf_dir):
    """One Lloyd assignment against portable 'first'-init centers —
    SQL-replayable (full iterative k-means is rows-only below)."""
    from graphlab_spark.algos.kmeans import kmeans
    assign, _ = kmeans(_emb(spark, sf_dir), k=4, iterations=1, init="first")
    return assign


def q_kmeans_full(spark, sf_dir):
    """Full 10-iteration Lloyd run with the engine-portable 'first'
    init, so the DuckDB oracle can replay every centroid update."""
    from graphlab_spark.algos.kmeans import kmeans
    assign, _ = kmeans(_emb(spark, sf_dir), k=4, iterations=10, init="first")
    return assign


def q_als_factors(spark, sf_dir):
    """ALS over a ratings table derived from lineitem (supplier x part,
    rating = mean quantity); returns per-user factor norms (iterative
    pandas-solve output — rows-only check, exactness via pytest)."""
    from graphlab_spark.algos.als import als
    ratings = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("user"),
                 F.col("l_partkey").alias("item"))
        .agg(F.avg("l_quantity").alias("rating"))
    )
    uf, _ = als(ratings, k=4, iterations=2)
    return uf.select(
        "id",
        F.round(F.expr(
            "aggregate(factor, CAST(0.0 AS DOUBLE), (a, v) -> a + v*v)"), 6)
        .alias("norm_sq"),
    )


def _ratings(spark, sf_dir):
    """Shared CF ratings: supplier x part, rating = min quantity / 50
    (min — not avg — so Spark and DuckDB agree bit-for-bit; the /50
    brings ratings to ~[0,1] so the batch-GD step is stable at the
    hub degrees this table has)."""
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("user"),
                 F.col("l_partkey").alias("item"))
        .agg((F.min("l_quantity").cast("double") / F.lit(50.0))
             .alias("rating"))
    )


def q_jacobi(spark, sf_dir):
    """Jacobi on the diagonally-dominant system (deg+1) x_i - sum_nbr
    x_j = b_i with portable pseudo-random b — the Laplacian-plus-shift
    system of the linear-solvers toolkit, run to the 1e-9 fixpoint."""
    from graphlab_spark.algos.jacobi import jacobi
    from graphlab_spark.operators.portable import unit_interval
    g = _graph(spark, sf_dir)
    sym = g.symmetric_edges.select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("dg"))
    vertices = g.vertices.join(deg, "id").select(
        "id", unit_interval(F.col("id")).alias("b"),
        (F.col("dg") + 1.0).alias("diag"))
    edges = sym.select("src", "dst", F.lit(-1.0).alias("a"))
    res = jacobi(edges, vertices, tol=1e-9, resume=False)
    return res.state.select("id", F.round("x", 6).alias("x"))


def q_sir(spark, sf_dir):
    from graphlab_spark.algos.cascades import sir_cascade
    g = _graph(spark, sf_dir)
    return sir_cascade(g, seeds=[-1], p_percent=30, resume=False).state


def q_percolation(spark, sf_dir):
    from graphlab_spark.algos.cascades import bond_percolation
    g = _graph(spark, sf_dir)
    return bond_percolation(g, p_percent=50, resume=False)


def q_topo_layers(spark, sf_dir):
    """Kahn/longest-path layers over the events DAG truncated to 12
    events per user (the truncation keeps the BSP depth ~13 instead of
    the ~90-hop full user chains; replayed identically in SQL)."""
    from pyspark.sql import Window
    from graphlab_spark.operators.graph_ops import topological_layers
    from graphlab_spark.sources.events import edges_from_events
    from graphlab_spark import EdgeGraph
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev12 = (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 12).drop("rn"))
    g = EdgeGraph(edges_from_events(ev12))
    return topological_layers(g, resume=False).state


def q_laplacian(spark, sf_dir):
    from graphlab_spark.algos.spectral import normalized_adjacency
    g = _graph(spark, sf_dir)
    return normalized_adjacency(g).select(
        "src", "dst", F.round("w", 6).alias("w"))


def q_spectral_embedding(spark, sf_dir):
    from graphlab_spark.algos.spectral import spectral_embedding
    g = _graph(spark, sf_dir)
    return spectral_embedding(g, iterations=15).select(
        "id", F.round("comp", 6).alias("comp"))


def q_spectral_clusters(spark, sf_dir):
    from graphlab_spark.algos.spectral import spectral_clusters
    g = _graph(spark, sf_dir)
    return spectral_clusters(g, k=2, iterations=15)


def _sgd_model(spark, sf_dir):
    from graphlab_spark.algos.sgd import sgd
    return _trained(spark, sf_dir, "sgd",
                    lambda: sgd(_ratings(spark, sf_dir), k=4, iterations=3))


def q_sgd_user_factors(spark, sf_dir):
    uf, _ = _sgd_model(spark, sf_dir)
    return uf.select("id", "f", F.round("v", 6).alias("v"))


def q_sgd_rmse(spark, sf_dir):
    from graphlab_spark.algos.sgd import sgd_rmse
    uf, itf = _sgd_model(spark, sf_dir)
    return sgd_rmse(_ratings(spark, sf_dir), uf, itf).select(
        F.round("rmse", 6).alias("rmse"))


def _biassgd_model(spark, sf_dir):
    from graphlab_spark.algos.biassgd import biassgd
    return _trained(
        spark, sf_dir, "biassgd",
        lambda: biassgd(_ratings(spark, sf_dir), k=4, iterations=3))


def q_biassgd_user_params(spark, sf_dir):
    uf, _, _ = _biassgd_model(spark, sf_dir)
    return uf.select("id", "f", F.round("v", 6).alias("v"))


def q_biassgd_rmse(spark, sf_dir):
    from graphlab_spark.algos.biassgd import biassgd_rmse
    uf, itf, mu = _biassgd_model(spark, sf_dir)
    return biassgd_rmse(_ratings(spark, sf_dir), uf, itf, mu).select(
        F.round("rmse", 6).alias("rmse"))


def _svdpp_model(spark, sf_dir):
    from graphlab_spark.algos.svdpp import svdpp
    return _trained(
        spark, sf_dir, "svdpp",
        lambda: svdpp(_ratings(spark, sf_dir), k=4, iterations=3))


def q_svdpp_user_params(spark, sf_dir):
    uf, _, _, _ = _svdpp_model(spark, sf_dir)
    return uf.select("id", "f", F.round("v", 6).alias("v"))


def q_svdpp_rmse(spark, sf_dir):
    from graphlab_spark.algos.svdpp import svdpp_rmse
    uf, itf, yf, mu = _svdpp_model(spark, sf_dir)
    return svdpp_rmse(_ratings(spark, sf_dir), uf, itf, yf, mu).select(
        F.round("rmse", 6).alias("rmse"))


def _wratings(spark, sf_dir):
    """Weighted CF ratings: rating as in _ratings, weight = observation
    multiplicity (the reference stores weight-or-time per edge)."""
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_suppkey").alias("user"),
                 F.col("l_partkey").alias("item"))
        .agg((F.min("l_quantity").cast("double") / F.lit(50.0))
             .alias("rating"),
             F.count("*").cast("double").alias("weight"))
    )


def q_wals1_user_factors(spark, sf_dir):
    """WALS with k=1: the weighted solve is a scalar closed form, so
    the whole alternation is oracle-replayable (the k x k LDLT of the
    full family is not SQL-expressible)."""
    from graphlab_spark.algos.als import wals
    uf, _ = wals(_wratings(spark, sf_dir), k=1, reg=0.01, iterations=3)
    return uf.select(
        "id", F.round(F.element_at("factor", 1), 6).alias("v"))


def q_warp_als1_user_factors(spark, sf_dir):
    """ALS expressed through the warp fine-grained combinators
    (``warp_als_coord.cpp`` at k=1, where one coordinate-descent sweep
    equals the exact rank-1 solve): map_reduce_neighborhood gathers the
    (numerator, denominator) struct, parfor applies z = num/(den+reg).
    Computes the same fixed point as wals(k=1) — same WALS oracle."""
    from graphlab_spark.operators.warp import warp_als1
    uf = warp_als1(_wratings(spark, sf_dir), reg=0.01, iterations=3)
    return uf.select("id", F.round("f", 6).alias("v"))


def q_als2_regnormal_user_factors(spark, sf_dir):
    """ALS k=2 under the reference's --regnormal flag
    (``als.cpp:323-326``): lambda scales with the user's rating count
    and is ZERO for items (no out-edges in the user->item orientation,
    ``als.cpp:415``) — the one ALS mode with no prior contract query.
    Same Cramer-expressible rank as cf_als2_user_factors."""
    from graphlab_spark.algos.als import wals
    uf, _ = wals(_ratings(spark, sf_dir).withColumn("weight", F.lit(1.0)),
                 k=2, reg=0.01, regnormal=True, iterations=2)
    return uf.select(
        "id", F.round(F.element_at("factor", 1), 6).alias("v1"),
        F.round(F.element_at("factor", 2), 6).alias("v2"))


def q_warp_nmf1_user_factors(spark, sf_dir):
    """NMF expressed through the warp combinators (``warp_nmf.cpp`` at
    k=1, where the masked Lee-Seung multiplicative update telescopes to
    one (num, den) gather + rescale).  Same fixed point as nmf(k=1) —
    same NMF oracle at rank 1."""
    from graphlab_spark.operators.warp import warp_nmf1
    w = warp_nmf1(_ratings(spark, sf_dir), iterations=3)
    return w.select("id", "f", F.round("v", 6).alias("v"))


def q_mplp_table_labels(spark, sf_dir):
    """General factor-table MPLP over the link graph (K=2): each
    canonical undirected factor carries its OWN portable-LCG log-
    potential table (the explicit dense-table form of the reference's
    ``factors/dense_table.hpp`` / ``mplp_structured_prediction.cpp``
    surface), unaries are the engine's portable log-phi.  Same damped
    Globerson-Jaakkola update as graph_mplp_labels, table read from
    the per-edge array column."""
    from graphlab_spark.algos.mplp import _log_phi, mplp_table_labels
    from graphlab_spark.operators.portable import lcg_hash
    g = _graph(spark, sf_dir)
    unary = _log_phi(g.vertices).select(
        "id", F.array("t0", "t1").alias("theta"))

    def t(x, y):
        h = lcg_hash(F.col("src") * 9 + F.col("dst") * 31 + (x * 2 + y))
        return -(F.lit(0.2) + F.lit(0.6) * (h / F.lit(2.0 ** 31)))

    factors = g.canonical_undirected_edges.select(
        "src", "dst",
        F.array(t(0, 0), t(0, 1), t(1, 0), t(1, 1)).alias("table"))
    return mplp_table_labels(unary, factors, 2, iterations=10)


def q_mplp_sparse_labels(spark, sf_dir):
    """Sparse-factor-table MPLP (``factors/sparse_table.hpp`` —
    ``algos/mplp.py::mplp_sparse_table_labels``): the same per-edge
    portable-LCG tables as graph_mplp_table_labels, but carried as
    sparse ``map<int,double>`` entry lists and densified through the
    reference's APPROX_LOG_ZERO read path.  Fully-specified entries ⇒
    bit-identical to the dense query, so it replays on the same
    recursive-CTE oracle."""
    from graphlab_spark.algos.mplp import _log_phi, mplp_sparse_table_labels
    from graphlab_spark.operators.portable import lcg_hash
    g = _graph(spark, sf_dir)
    unary = _log_phi(g.vertices).select(
        "id", F.array("t0", "t1").alias("theta"))

    def t(x, y):
        h = lcg_hash(F.col("src") * 9 + F.col("dst") * 31 + (x * 2 + y))
        return -(F.lit(0.2) + F.lit(0.6) * (h / F.lit(2.0 ** 31)))

    entries = F.create_map(*[
        c for x in (0, 1) for y in (0, 1)
        for c in (F.lit(x * 2 + y).cast("int"), t(x, y))])
    factors = g.canonical_undirected_edges.select(
        "src", "dst", entries.alias("entries"))
    return mplp_sparse_table_labels(unary, factors, 2, iterations=10)


def q_minhash_pairs_scale(spark, sf_dir):
    """The minhash-LSH SHIPPING plan as a graded artifact
    (rows-only): portable=False hashes shingles with xxhash64 — no
    dense-rank shingle dim, hence no global sort anywhere in the plan.
    Signatures are engine-specific (DuckDB has no xxhash64, so no value
    oracle), but the verified-pair semantics are identical — pytest
    asserts pair-set equality with the portable twin
    (test_minhash_nonportable_same_pairs)."""
    return (
        D.minhash_lsh_pairs(_docs(spark, sf_dir), portable=False)
        .select("doc_a", "doc_b", "jac"))


def q_lda_word_topics_scale(spark, sf_dir):
    """LDA CVB0 scale path (rows-only): portable=False keys words by
    xxhash64 instead of the dense-rank vocab dim (a single-partition
    sort at 100-TB vocab sizes).  Different pseudo-random init, same
    CVB0 semantics — pytest asserts the no-Window plan shape, per-
    (doc, word) responsibility normalization, and word-mass identity
    (test_lda_scale_path_invariants)."""
    from graphlab_spark.algos.lda import lda_cvb0, word_topics
    gamma = lda_cvb0(_docs(spark, sf_dir), k=4, iterations=2,
                     portable=False)
    return word_topics(gamma).select(
        "word", "k", F.round("weight", 6).alias("weight"))


def q_quality_buckets_scale(spark, sf_dir):
    """Quality-bucket mixing table, scale path (rows-only):
    portable=False derives bucket boundaries from approxQuantile
    (one aggregation; no exact-ntile global-order window), so the plan
    survives any corpus size.  Pytest bounds per-bucket drift vs exact
    ntile to boundary ties (test_quality_buckets_scale_path_close_to_
    exact)."""
    return C.quality_buckets(_docs(spark, sf_dir), portable=False)


def q_als2_user_factors(spark, sf_dir):
    """ALS at k=2: the per-vertex 2x2 normal-equation solve has a
    Cramer's-rule closed form, so the whole alternation is oracle-
    replayable (with WALS k=1 this value-oracles the ALS family's solve
    at both SQL-expressible ranks; the general k x k LDLT is not
    ANSI-expressible and stays rows-only in cf_als_factor_norms).
    Runs through wals() with unit weights — identical normal equations
    to als(), portable LCG factor init."""
    from graphlab_spark.algos.als import wals
    uf, _ = wals(_ratings(spark, sf_dir).withColumn("weight", F.lit(1.0)),
                 k=2, reg=0.01, iterations=2)
    return uf.select(
        "id", F.round(F.element_at("factor", 1), 6).alias("v1"),
        F.round(F.element_at("factor", 2), 6).alias("v2"))


def q_synthetic_als_stats(spark, sf_dir):
    """Per-item degree + rating mass of the synthetic ALS training
    split (``make_synthetic_als_data.cpp:120-177`` analog,
    ``sources/parsers.py::load_synthetic_als``): the generator is pure
    portable-LCG column arithmetic, so the whole dataset — power-law
    degrees, hash-uniform users, Box-Muller factor dot products —
    replays in the DuckDB twin.  Fixed-size (sf-independent) by
    design, like the reference tool's CLI defaults."""
    from graphlab_spark.sources.parsers import load_synthetic_als
    train, _, _ = load_synthetic_als(spark, nusers=50, nmovies=200, d=3)
    return train.groupBy("item").agg(
        F.count("*").alias("deg"),
        F.round(F.sum("rating"), 6).alias("rsum"))


def q_synthetic_image(spark, sf_dir):
    """The structured-prediction synthetic-image generator
    (``synthetic_image_data.cpp:79-131`` —
    ``sources/parsers.py::load_synthetic_image``): radial sunset ring
    masked at the integer horizon, portable-LCG color flips; the whole
    pixel table replays in the DuckDB twin.  Fixed-size
    (sf-independent) by design, like the reference tool's CLI."""
    from graphlab_spark.sources.parsers import load_synthetic_image
    vertices, _ = load_synthetic_image(
        spark, rows=32, cols=32, ncolors=5, error_rate=0.5, seed=17)
    return vertices.select("id", "r", "c", "true_color", "obs_color")


def q_synthetic_clusters(spark, sf_dir):
    """The clustering toolkit's synthetic data generator
    (``clustering/generate_synthetic.cpp:29-59`` —
    ``sources/parsers.py::load_synthetic_clusters_portable``,
    the SQL-replayable twin of the xxhash64 blob generator): Uniform(-10,10)
    centers, hash-uniform cluster picks, Box-Muller unit gaussians;
    per-cluster count + rounded coordinate sums replay the whole
    generator in the DuckDB twin.  Fixed-size (sf-independent) by
    design, like the reference tool's CLI."""
    from graphlab_spark.sources.parsers import (
        load_synthetic_clusters_portable)
    points, _ = load_synthetic_clusters_portable(
        spark, num_clusters=4, dim=2, ndata=2000, seed=7)
    return points.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.element_at("vec", 1)), 6).alias("s0"),
        F.round(F.sum(F.element_at("vec", 2)), 6).alias("s1"))


def q_gibbs_denoise(spark, sf_dir):
    """Chromatic parallel Gibbs sampling (``gibbs_sampling/
    chromatic_sampler.cpp:35-59`` — ``algos/gibbs.py``) denoising the
    K=3 synthetic image: log-prior unaries, Potts smoothing tables
    (dyadic lam=0.75 keeps every neighbor sum order-exact so the chain
    is bit-stable), the bipartite (r+c)%2 grid coloring, 3 sweeps.  The
    DuckDB twin replays the full chain — init draw, color schedule,
    conditional arithmetic, mix31 inverse-CDF draws — step by step in
    a recursive CTE."""
    from graphlab_spark.algos.gibbs import chromatic_gibbs
    from graphlab_spark.sources.parsers import load_synthetic_image
    k, lam = 3, 0.75
    v, e = load_synthetic_image(spark, rows=12, cols=12, ncolors=k,
                                error_rate=0.45, seed=11)
    unary = v.select("id", F.expr("transform(prior, p -> ln(p))")
                     .alias("theta"))
    potts = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    factors = e.select(
        "src", "dst", F.array(*[F.lit(p) for p in potts]).alias("table"))
    colors = v.select(
        "id", ((F.col("r") + F.col("c")) % 2).cast("int").alias("color"))
    res = chromatic_gibbs(unary, factors, k, sweeps=3, seed=29,
                          colors=colors)
    return res.state.select("id", "asg")


def q_factor_bp_beliefs(spark, sf_dir):
    """N-ary factor-graph max-sum BP (``factors/bp_vertex_program.hpp``
    + ``factor_graph.hpp`` — ``algos/factor_bp.py``) over the portable
    synthetic model (mixed cardinalities 2/3, factor arities 1/2/3):
    5 synchronous message rounds with damping 0.5 and regularization
    0.25, decoded to per-(variable, state) beliefs + MAP labels.  The
    DuckDB twin replays the chain round by round in a recursive CTE —
    variable/factor beliefs, the stride-walk MAP projection, the
    regularize/shift-normalize/damp message tail."""
    from graphlab_spark.algos.factor_bp import factor_bp_beliefs
    from graphlab_spark.sources.parsers import load_synthetic_factor_graph
    variables, factors = load_synthetic_factor_graph(spark, groups=40)
    bel = factor_bp_beliefs(variables, factors, iterations=5,
                            damping=0.5, regularization=0.25)
    return (bel.select("id", F.posexplode("belief").alias("i", "b"),
                       "label")
            .select("id", "i", F.round("b", 6).alias("b"), "label"))


def q_factor_bp_sum_beliefs(spark, sf_dir):
    """The sum-product twin of :func:`q_factor_bp_beliefs` — the
    ``marginalize`` projection the reference carries in-code as the
    alternative to MAP (``bp_vertex_program.hpp:236-239``,
    ``dense_table.hpp:531-563``); beliefs are log marginals up to a
    per-variable shift."""
    from graphlab_spark.algos.factor_bp import factor_bp_beliefs
    from graphlab_spark.sources.parsers import load_synthetic_factor_graph
    variables, factors = load_synthetic_factor_graph(spark, groups=40)
    bel = factor_bp_beliefs(variables, factors, iterations=5,
                            damping=0.5, regularization=0.25, mode="sum")
    return (bel.select("id", F.posexplode("belief").alias("i", "b"),
                       "label")
            .select("id", "i", F.round("b", 6).alias("b"), "label"))


def q_implicit_ratings(spark, sf_dir):
    """Ratings table after implicit-edge injection (``implicit.hpp:
    40-88``, ``algos/als.py::add_implicit_ratings``): the full
    augmented (user, item, rating) multiset — observed supplier x part
    ratings plus max(1, floor(1e-4 * M * N)) hash-uniform implicit
    zeros drawn over the rank-indexed id universes."""
    from graphlab_spark.algos.als import add_implicit_ratings
    aug = add_implicit_ratings(_ratings(spark, sf_dir), percentage=1e-4,
                               value=0.0, seed=97)
    return aug.select("user", "item", F.round("rating", 6).alias("rating"))


def _stitch_matches(spark, sf_dir):
    """Shared (and persisted) match-edge table for the two vision
    queries — the feature extraction + bucket join is identical."""
    from graphlab_spark.functions import vision as V

    def fit():
        feats = V.compute_features(
            V.images_from_documents(_docs(spark, sf_dir)))
        return V.match_features(feats).persist()

    return _trained(spark, sf_dir, "stitch_matches", fit)


def q_vision_match_graph(spark, sf_dir):
    """Stitch match graph (``stitch_main.cpp:137-162``,
    ``functions/vision.py``): chunk-hash keypoints over the synthetic
    image table (documents + planted overlapping copies), visual-word
    equi-join matching with the stop-feature df-cap."""
    return _stitch_matches(spark, sf_dir).select(
        "img_a", "img_b", "matches")


def q_vision_panorama_groups(spark, sf_dir):
    """Panorama grouping: the engine's hash-min connected components
    over the stitch match edges (the leave-component step the
    reference runs before camera estimation)."""
    from graphlab_spark.functions import vision as V
    return V.panorama_groups(_stitch_matches(spark, sf_dir))


def q_vision_pair_transforms(spark, sf_dir):
    """Camera-estimation stage 1 (``stitch_main.cpp:214`` analog):
    per-pair least-squares alignment + inliers + OpenCV-formula
    confidence from content-descriptor matches over the shifted-copy
    image table."""
    from graphlab_spark.functions import vision as V
    imgs = V.images_with_shifted_copies(_docs(spark, sf_dir))
    return V.estimate_pair_transforms(V.content_features(imgs))


def q_vision_camera_offsets(spark, sf_dir):
    """Camera-estimation stage 2: homography-chain initialization —
    per-image offsets from each panorama root, BFS-accumulated over the
    pair-transform graph."""
    from graphlab_spark.functions import vision as V
    imgs = V.images_with_shifted_copies(_docs(spark, sf_dir))
    t = V.estimate_pair_transforms(V.content_features(imgs))
    return V.camera_offsets(t)


def q_vision_composite_stats(spark, sf_dir):
    """Stitch tail (r5: de-stubbed 1-D geometry): warp each matched
    image into root-frame byte coordinates and report per-panorama
    canvas stats; the oracle replays pos0/width arithmetic on top of
    the recursive camera-offsets CTE."""
    from graphlab_spark.functions import vision as V
    imgs = V.images_with_shifted_copies(_docs(spark, sf_dir))
    cams = V.camera_offsets(
        V.estimate_pair_transforms(V.content_features(imgs)))
    warped = V.warp_images(imgs, cams)
    return warped.groupBy("pano").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        (F.max(F.col("pos0") + F.col("width")) - F.min("pos0"))
        .cast("long").alias("width"))


def q_sparse_als2_user_factors(spark, sf_dir):
    """Sparse ALS at k=2, s=1 with portable init: the CoSaMP
    identify+re-estimate step (dense Cramer solve -> abs-argmax
    support -> scalar re-solve) replays in SQL, value-oracling the
    sparse-ALS solve family (the k=20 path stays rows-only in
    cf_sparse_als_support)."""
    from graphlab_spark.algos.als import sparse_als
    uf, _ = sparse_als(_ratings(spark, sf_dir), k=2, reg=0.01,
                       user_sparsity=1, item_sparsity=1, iterations=2,
                       portable_init=True)
    return uf.select(
        "id", F.round(F.element_at("factor", 1), 6).alias("v1"),
        F.round(F.element_at("factor", 2), 6).alias("v2"))


def q_sparse_als_support(spark, sf_dir):
    """Sparse-ALS support sizes: per-user nonzero count after the
    CoSaMP-style projection (rows-only contract — dense k x k solve)."""
    from graphlab_spark.algos.als import sparse_als
    uf, _ = sparse_als(_ratings(spark, sf_dir), k=4, user_sparsity=2,
                       item_sparsity=2, iterations=2)
    nnz = F.aggregate(
        "factor", F.lit(0),
        lambda acc, x: acc + F.when(F.abs(x) > 1e-12, 1).otherwise(0))
    return uf.select("id", nnz.alias("nnz"))


def q_adpredictor_weights(spark, sf_dir):
    from graphlab_spark.algos.adpredictor import (adpredictor,
                                                  clicks_from_lineitem)
    rows = clicks_from_lineitem(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    uw, iw = adpredictor(rows, iterations=3)
    return (
        uw.select(F.lit(1).alias("side"), "id", "mu", "sig")
        .unionByName(iw.select(F.lit(2).alias("side"), "id", "mu", "sig"))
        .select("side", "id", F.round("mu", 6).alias("mu"),
                F.round("sig", 6).alias("sig"))
    )


def q_svd_power(spark, sf_dir):
    from graphlab_spark.algos.svd import power_iteration_svd
    v, _sigma = power_iteration_svd(_ratings(spark, sf_dir), iterations=8)
    return v.select("id", F.round("xv", 6).alias("xv"))


def q_svd_lanczos(spark, sf_dir):
    from graphlab_spark.algos.svd import lanczos_svd
    vals = lanczos_svd(_ratings(spark, sf_dir), m=4)
    return spark.createDataFrame(
        [(i, round(v, 4)) for i, v in enumerate(vals)], "rank int, sigma double")


def q_svd_lanczos2_sigma(spark, sf_dir):
    """Lanczos at m=2: both tridiagonal entries come from SQL-
    expressible matvec/dot/normalize chains and the 2x2 symmetric
    eigenproblem has a closed form, so this path value-oracles the
    whole Lanczos recursion (basis build + full reorthogonalization
    step included); m=4 (cf_svd_lanczos) keeps the numpy tridiagonal
    eigensolve rows-only."""
    from graphlab_spark.algos.svd import lanczos_svd
    vals = lanczos_svd(_ratings(spark, sf_dir), m=2)
    return spark.createDataFrame(
        [(round(vals[0], 6), round(vals[1], 6))],
        "sigma1 double, sigma2 double")


def q_nmf_user_factors(spark, sf_dir):
    from graphlab_spark.algos.nmf import nmf
    w, _ = nmf(_ratings(spark, sf_dir), k=4, iterations=3)
    return w.select("id", "f", F.round("v", 6).alias("v"))


def q_lbp_beliefs(spark, sf_dir):
    from graphlab_spark.algos.lbp import lbp_beliefs
    g = _graph(spark, sf_dir)
    return lbp_beliefs(g, iterations=5).select(
        "id", F.round("b1", 6).alias("b1"))


def q_mplp_labels(spark, sf_dir):
    from graphlab_spark.algos.mplp import mplp_labels
    g = _graph(spark, sf_dir)
    return mplp_labels(g, iterations=10)


def q_tsc(spark, sf_dir):
    """Rows-only: exp(H) is a dense driver-side matrix exponential no
    ANSI SQL expresses (same class as the Lanczos contract)."""
    from graphlab_spark.algos.tsc import tsc
    g = _graph(spark, sf_dir)
    return tsc(g, m=8).select("id", F.round("tsc", 4).alias("tsc"))


def q_dd_labels(spark, sf_dir):
    from graphlab_spark.algos.dd import dd_labels
    g = _graph(spark, sf_dir)
    return dd_labels(g, iterations=10)


def q_ad3_labels(spark, sf_dir):
    from graphlab_spark.algos.ad3 import ad3_labels
    g = _graph(spark, sf_dir)
    return ad3_labels(g, iterations=10)


def q_dd_projected_labels(spark, sf_dir):
    from graphlab_spark.algos.dd import dd_projected_labels
    g = _graph(spark, sf_dir)
    return dd_projected_labels(g, iterations=10)


def q_bethe_admm_labels(spark, sf_dir):
    from graphlab_spark.algos.ad3 import bethe_admm_labels
    g = _graph(spark, sf_dir)
    return bethe_admm_labels(g, iterations=10)


def q_budget_map(spark, sf_dir):
    """SolveMAP_budget over IN-neighborhood budget factors: each dst
    vertex constrains at most 3 of its distinct in-neighbors active
    (in-neighborhoods include the type-hub vertices with thousands of
    members, so the budget cut is actually exercised — out-degrees in
    the events graph are <= 2 and would never bind); member scores are
    the portable log-odds ln(phi1) - ln(phi0)."""
    from graphlab_spark.algos.ad3 import budget_map_select
    from graphlab_spark.algos.lbp import node_potentials
    g = _graph(spark, sf_dir)
    factors = (g.edges.select("src", "dst").distinct()
               .select(F.col("dst").alias("fid"),
                       F.col("src").alias("member"),
                       F.lit(3).alias("budget")))
    unary = node_potentials(g.vertices).select(
        "id", (F.log("phi1") - F.log("phi0")).alias("theta"))
    return budget_map_select(factors, unary)


_STRATA = {"en": 1.0, "es": 0.5, "zh": 0.1}


def q_hash_sample(spark, sf_dir):
    return C.hash_sample(_docs(spark, sf_dir), rate=0.25).select("doc_id")


def q_stratified_sample(spark, sf_dir):
    return C.stratified_sample(
        _docs(spark, sf_dir), "lang", _STRATA, default_rate=0.05
    ).select("doc_id", "lang")


def q_scrub_pii(spark, sf_dir):
    return C.scrub_pii(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    from pyspark.sql import functions as F
    return C.decontaminate(docs.filter(F.col("doc_id") % 10 != 0),
                           docs.filter(F.col("doc_id") % 10 == 0))


def q_pack_sequences(spark, sf_dir):
    return C.pack_sequences(_docs(spark, sf_dir))


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition: scrub PII -> decontaminate the
    scrubbed corpus against the held-out benchmark split -> drop
    contaminated docs -> exact-dedup survivors (min-doc_id canonical)
    -> pack into training chunks.  One query exercising the full
    training-data path the individual contract queries cover piecewise;
    every stage is the same operator the standalone query uses, so the
    oracle is the chained CTE of their SQL twins."""
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    scrubbed = C.scrub_pii(corpus).select("doc_id", "text")
    decon = C.decontaminate(scrubbed, bench)
    clean = scrubbed.join(
        decon.filter(F.col("contaminated") == 0).select("doc_id"), "doc_id")
    hashed = clean.withColumn("__h", F.md5("text"))
    canon = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    survivors = hashed.join(canon, ["__h", "doc_id"]).select("doc_id", "text")
    return C.pack_sequences(survivors)


def q_quality_buckets(spark, sf_dir):
    """Data-mixing table: LM-quality quantile buckets with per-bucket
    doc/token mass (exact-ntile verification mode; the scale path uses
    approxQuantile boundaries instead of a global window)."""
    return C.quality_buckets(_docs(spark, sf_dir))


def q_cosine_dup_clusters(spark, sf_dir):
    return S.cosine_dup_clusters(_emb(spark, sf_dir))


# --- transcript-shaped input contract (the north-rule input_hint) ------
# The testdata ships no transcripts.parquet, so the corpus is synthesized
# deterministically at fixed size (the driver compares Spark vs DuckDB on
# the SAME generated table — `transcript_ctes` regenerates it in SQL).


def _transcripts(spark, sf_dir):
    from graphlab_spark.sources.transcripts import synthetic_transcripts_portable
    return synthetic_transcripts_portable(spark, _T_N_CONVS)


def q_transcript_corpus(spark, sf_dir):
    """The contract table itself (conv_id, turn_idx, role, text, tool, ts)
    — value-oracles the deterministic synthesis + per-turn text equality
    under stable turn ordering (ts as epoch seconds: engine-neutral)."""
    t = _transcripts(spark, sf_dir)
    return t.select("conv_id", "turn_idx", "role", "text", "tool",
                    F.col("ts").cast("long").alias("ts_epoch"))


def q_transcript_edges(spark, sf_dir):
    """conv_id/role/tool co-occurrence edge induction under stable turn
    ordering (sequence + tool + role families), portable vertex ids."""
    from graphlab_spark.sources.transcripts import transcripts_to_edges_portable
    return transcripts_to_edges_portable(_transcripts(spark, sf_dir))


def q_transcript_pagerank_iter2(spark, sf_dir):
    """End-to-end north-rule pipeline: transcript table → induced link
    graph → 2 PageRank supersteps, every value DuckDB-replayed."""
    from graphlab_spark.sources.transcripts import transcripts_to_edges_portable
    g = EdgeGraph(transcripts_to_edges_portable(_transcripts(spark, sf_dir)))
    res = pagerank(g, fixed_supersteps=2, resume=False)
    return res.state.select("id", F.round("rank", 6).alias("rank"))


def q_tool_transitions(spark, sf_dir):
    """Markov transition matrix over consecutive tool calls per
    conversation (window lag on the ingest clustering key + tiny agg)."""
    from graphlab_spark.sources.transcripts import tool_transitions
    return tool_transitions(_transcripts(spark, sf_dir))


def q_turn_latency(spark, sf_dir):
    """Inter-turn latency stats per responding role (exact interpolated
    median so the DuckDB twin hash-matches)."""
    from graphlab_spark.sources.transcripts import turn_latency_by_role
    return turn_latency_by_role(_transcripts(spark, sf_dir))


def q_contract_lpa(spark, sf_dir):
    """Community-graph coarsening: LPA labels → supernode edge table
    with inter-community edge counts (multilevel primitive)."""
    from graphlab_spark.operators.graph_ops import contract_graph
    g = _graph(spark, sf_dir)
    labels = label_propagation(g, max_supersteps=10, resume=False).state
    return contract_graph(g, labels)


def q_transcript_sessions(spark, sf_dir):
    """Inactivity-gap sessionization: the verification corpus has fixed
    1 s turn spacing, so the query plants deterministic cumulative
    2-hour gaps (portable hash, monotone ts preserved) and then splits
    on gap > 1 h; per-session turn counts + spans are value-oracled."""
    from pyspark.sql import Window
    from graphlab_spark.operators.portable import lcg_hash
    from graphlab_spark.sources.transcripts import session_stats, sessionize
    t = _transcripts(spark, sf_dir)
    ci = F.expr("CAST(substr(conv_id, 2) AS BIGINT)")
    flag = F.when(lcg_hash(ci * 97 + F.col("turn_idx")) % 5 == 0, 1).otherwise(0)
    w = (
        Window.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    jit = t.withColumn(
        "ts",
        F.timestamp_seconds(F.col("ts").cast("long") + 7200 * F.sum(flag).over(w)),
    )
    return session_stats(sessionize(jit, gap_seconds=3600))


def q_transcript_near_dups(spark, sf_dir):
    """Conversation-level near-dup detection: transcripts →
    one document per conversation (ordered text concat) → MinHash-LSH
    verified pairs — the end-to-end composition of the payload bridge
    with the dedup pipeline.  The synthetic corpus has no organic
    near-dups (conv-id digits permeate every shingle), so the query
    plants them: every 5th conversation also appears as a mutated copy
    (last token dropped, doc_id 'm'-prefixed); long conversations must
    pair with their originals, short ones must not.  portable=True is
    the oracle dimension (dense-rank shingle ids, one global sort);
    production corpora take the xxhash64 portable=False path, which
    has no global sort."""
    from graphlab_spark.sources.transcripts import transcripts_to_documents
    docs = transcripts_to_documents(_transcripts(spark, sf_dir))
    ci = F.expr("CAST(substr(doc_id, 2) AS BIGINT)")
    mutated = docs.filter(ci % 5 == 0).select(
        F.concat(F.lit("m"), "doc_id").alias("doc_id"),
        F.regexp_replace("text", " [^ ]*$", "").alias("text"),
    )
    return D.minhash_lsh_pairs(docs.unionAll(mutated), portable=True)


_INGRESS_SPECS = [("random", 16), ("grid", 16), ("pds", 13), ("hybrid", 16)]


def q_ingress_report(spark, sf_dir):
    """Vertex-cut ingress finalize summary (replication factor +
    edge balance) for each placement strategy over the events graph
    (``distributed_ingress_base.hpp:538-550``; grid/pds constraints
    from ``sharding_constraint.hpp``)."""
    from graphlab_spark.operators.ingress import ingress_report
    g = _graph(spark, sf_dir)
    return ingress_report(g.edges, _INGRESS_SPECS, threshold=100)


def q_knn_graph(spark, sf_dir):
    """Exact k-NN cosine graph over the embeddings table (the bridge
    from embedding space into the link-graph toolkit)."""
    return S.knn_graph(_emb(spark, sf_dir), k=3)


def q_knn_components(spark, sf_dir):
    """Composition: embeddings → k-NN graph → hash-min CC."""
    return S.knn_components(_emb(spark, sf_dir), k=3)


def q_transcript_conv_stats(spark, sf_dir):
    """Per-conversation analytics over the contract table: turn count,
    tool-call count, distinct tools, wall-clock span — the narrow
    groupBy-on-conv_id aggregation every transcript pipeline starts
    with (partial+final hash agg; pipelines into the scan)."""
    t = _transcripts(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
         .cast("long").alias("n_tool_calls"),
        F.countDistinct("tool").cast("long").alias("n_distinct_tools"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
         .alias("span_sec"),
    )


def q_lda_word_topics(spark, sf_dir):
    from graphlab_spark.algos.lda import lda_cvb0, word_topics
    gamma = lda_cvb0(_docs(spark, sf_dir), k=4, iterations=2)
    return word_topics(gamma)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- round-5 ordering (VERDICT r4 "Next round" item 1): the 44
        # --- queries whose most recent driver CORRECTNESS row is round 2
        # --- come first so their evidence is refreshed (the driver checks
        # --- the first 50 registry entries; the rest stay covered by
        # --- scripts/oracle_dev.py --all + pytest). Flagship graph family:
        "graph_edges_from_events": q_edges,
        "graph_degrees": q_degrees,
        "graph_pagerank_iter2": q_pagerank_iter2,
        "graph_pagerank_converged": q_pagerank_converged,
        "graph_pagerank_delta": q_pagerank_delta,
        "graph_warp_pagerank": q_warp_pagerank,
        "graph_triangle_total": q_triangle_total,
        "graph_triangles_per_vertex": q_triangles_per_vertex,
        "graph_connected_components": q_connected_components,
        "graph_cc_sizes": q_cc_sizes,
        "graph_kcore_k2": q_kcore_k2,
        "graph_kcore_table": q_kcore_table,
        "graph_hits": q_hits,
        "graph_ppr_from_hub": q_ppr,
        "graph_random_walks": q_random_walks,
        "graph_sssp_from_hub": q_sssp,
        "graph_catpath": q_catpath,
        "graph_neighbors_of_hubs": q_neighbors_of_hubs,
        "graph_vset_inout": q_vset_inout,
        "graph_directed_census": q_directed_census,
        "graph_coloring": q_coloring,
        "graph_approx_diameter": q_approx_diameter,
        "graph_topo_layers": q_topo_layers,
        "lin_jacobi": q_jacobi,
        "cascade_sir": q_sir,
        "cascade_percolation": q_percolation,
        # --- stale text / dedup / similarity / clustering / CF set:
        "text_stats": q_text_stats,
        "text_token_frequencies": q_token_frequencies,
        "text_bigram_lm_scores": q_bigram_lm_scores,
        "text_winnowing_fingerprints": q_winnowing,
        "text_repetition_signals": q_repetition_signals,
        "text_bm25_scores": q_bm25_scores,
        "dedup_exact_groups": q_exact_dup,
        "dedup_cross_doc_lines": q_line_dedup,
        "dedup_jaccard_pairs": q_jaccard_pairs,
        "dedup_minhash_signatures": q_minhash_sigs,
        "dedup_simhash_signatures": q_simhash_sigs,
        "dedup_simhash_pairs": q_simhash_pairs,
        "sim_ann_topk_brute": q_ann_brute,
        "sim_ann_topk_ivf": q_ann_ivf,
        "multimodal_media_stats": q_media_stats,
        "cluster_kmeans_assign1": q_kmeans_assign1,
        "cluster_kmeans_full": q_kmeans_full,
        "cf_als_factor_norms": q_als_factors,
        # --- remaining 6 window slots: r4-green value-oracled
        # --- representatives (transcript payload, LSH-guard contract,
        # --- curation pipeline, LPA):
        "transcript_pagerank_iter2": q_transcript_pagerank_iter2,
        "transcript_sessions": q_transcript_sessions,
        "dedup_minhash_lsh_pairs": q_minhash_lsh,
        "sim_ann_topk_lsh": q_ann_lsh,
        "curation_pipeline": q_curation_pipeline,
        "graph_lpa": q_lpa,
        # ----- 50-row driver window ends here; everything below is
        # ----- r3/r4-driver-green and stays verified by the full
        # ----- type-strict dev sweep + pytest goldens.
        "graph_dd_projected_labels": q_dd_projected_labels,
        "graph_bethe_admm_labels": q_bethe_admm_labels,
        "gm_factor_bp_sum_beliefs": q_factor_bp_sum_beliefs,
        "cf_sgd_rmse": q_sgd_rmse,
        "cf_biassgd_rmse": q_biassgd_rmse,
        "cf_svdpp_rmse": q_svdpp_rmse,
        "graph_warp_coloring": q_warp_coloring,
        "graph_betweenness_hubs": q_betweenness_hubs,
        "graph_harmonic_hubs": q_harmonic_hubs,
        # --- 6 rows-only (driver-side dense linear algebra with numpy
        # --- pytest goldens, plus xxhash64/approxQuantile scale twins
        # --- DuckDB can't replay; the driver records a rows-green row):
        "cf_sparse_als_support": q_sparse_als_support,
        "cf_svd_lanczos": q_svd_lanczos,
        "graph_tsc": q_tsc,
        "dedup_minhash_pairs_scale": q_minhash_pairs_scale,
        "lda_word_topics_scale": q_lda_word_topics_scale,
        "curation_quality_buckets_scale": q_quality_buckets_scale,
        "transcript_near_dups": q_transcript_near_dups,
        "graph_lpa_frontier": q_lpa_frontier,
        "vision_pair_transforms": q_vision_pair_transforms,
        "vision_camera_offsets": q_vision_camera_offsets,
        "vision_composite_stats": q_vision_composite_stats,
        "dedup_minhash_clusters": q_minhash_clusters,
        "sim_cosine_pairs": q_cosine_pairs,
        "sim_cosine_dup_clusters": q_cosine_dup_clusters,
        "sim_knn_graph": q_knn_graph,
        "sim_knn_components": q_knn_components,
        "transcript_corpus": q_transcript_corpus,
        "transcript_edges": q_transcript_edges,
        "transcript_conv_stats": q_transcript_conv_stats,
        "transcript_tool_transitions": q_tool_transitions,
        "transcript_turn_latency": q_turn_latency,
        "graph_contract_lpa": q_contract_lpa,
        "graph_ingress_report": q_ingress_report,
        "graph_laplacian": q_laplacian,
        "spectral_clusters2": q_spectral_clusters,
        "cf_als2_user_factors": q_als2_user_factors,
        "cf_implicit_ratings": q_implicit_ratings,
        "cf_nmf_user_factors": q_nmf_user_factors,
        "cf_adpredictor_weights": q_adpredictor_weights,
        "cf_svd_lanczos2_sigma": q_svd_lanczos2_sigma,
        "lda_word_topics": q_lda_word_topics,
        "graph_lbp_beliefs": q_lbp_beliefs,
        "graph_mplp_labels": q_mplp_labels,
        "graph_dd_labels": q_dd_labels,
        "graph_ad3_labels": q_ad3_labels,
        "gm_factor_bp_beliefs": q_factor_bp_beliefs,
        "gm_gibbs_denoise": q_gibbs_denoise,
        "curation_hash_sample": q_hash_sample,
        "curation_scrub_pii": q_scrub_pii,
        "curation_pack_sequences": q_pack_sequences,
        "curation_quality_buckets": q_quality_buckets,
        "vision_match_graph": q_vision_match_graph,
        "spectral_embedding2": q_spectral_embedding,
        "cf_sgd_user_factors": q_sgd_user_factors,
        "cf_biassgd_user_params": q_biassgd_user_params,
        "cf_svdpp_user_params": q_svdpp_user_params,
        "cf_wals1_user_factors": q_wals1_user_factors,
        "cf_sparse_als2_user_factors": q_sparse_als2_user_factors,
        "vision_panorama_groups": q_vision_panorama_groups,
        "cf_svd_power_v": q_svd_power,
        "graph_budget_map": q_budget_map,
        "curation_stratified_sample": q_stratified_sample,
        "curation_decontaminate": q_decontaminate,
        "cf_als2_regnormal_user_factors": q_als2_regnormal_user_factors,
        "cf_warp_als1_user_factors": q_warp_als1_user_factors,
        "cf_warp_nmf1_user_factors": q_warp_nmf1_user_factors,
        "graph_mplp_table_labels": q_mplp_table_labels,
        "gm_synthetic_image": q_synthetic_image,
        "cluster_synthetic_stats": q_synthetic_clusters,
        "graph_mplp_sparse_labels": q_mplp_sparse_labels,
        "cf_synthetic_als_stats": q_synthetic_als_stats,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def _sql_curation_pipeline() -> str:
    """Chained CTE of the per-stage SQL twins (scrub -> decontaminate
    -> exact-dedup survivors -> pack), mirroring q_curation_pipeline
    stage for stage."""
    scrub = C.sql_scrub_pii(
        table="(SELECT * FROM documents WHERE doc_id % 10 <> 0)")
    decon = C.sql_decontaminate(
        "doc_id % 10 <> 0", "doc_id % 10 = 0", table="pipe")
    pack = C.sql_pack_sequences(table="surv")
    return f"""WITH scrub AS (SELECT doc_id, text FROM ({scrub}) s0),
pipe AS (SELECT doc_id, text FROM scrub
         UNION ALL
         SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
decon AS (SELECT * FROM ({decon}) d0),
clean AS (SELECT s.doc_id, s.text FROM scrub s
          JOIN decon d ON d.doc_id = s.doc_id AND d.contaminated = 0),
canon AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
          FROM clean GROUP BY 1),
surv AS (SELECT c.doc_id, c.text FROM clean c
         JOIN canon ON md5(c.text) = canon.h
                    AND c.doc_id = canon.doc_id)
SELECT * FROM ({pack}) p"""


def _sql_transcript_sessions_oracle() -> str:
    from graphlab_spark.operators.portable import sql_lcg_hash
    from graphlab_spark.sources.transcripts import sql_sessionize
    flag = (
        f"CASE WHEN {sql_lcg_hash('(p.ci * 97 + p.turn_idx)')} % 5 = 0 "
        "THEN 1 ELSE 0 END"
    )
    return f"""WITH {_T_CTES},
tjit AS (SELECT p.conv_id, p.turn_idx,
                p.ts_epoch + 7200 * sum({flag})
                  OVER (PARTITION BY p.conv_id ORDER BY p.turn_idx
                        ROWS UNBOUNDED PRECEDING) AS ts_epoch
         FROM tparsed p),
tsess AS ({sql_sessionize(3600, "tjit")})
SELECT conv_id, session_idx, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(max(ts_epoch) - min(ts_epoch) AS BIGINT) AS span_sec
FROM tsess GROUP BY conv_id, session_idx"""


def _sql_transcript_near_dups_oracle() -> str:
    from graphlab_spark.sources.transcripts import sql_transcripts_to_documents
    return (
        f"WITH {_T_CTES}, tbase AS ({sql_transcripts_to_documents()}), "
        "tdocs AS (SELECT doc_id, text FROM tbase "
        "UNION ALL "
        "SELECT 'm' || doc_id AS doc_id, "
        "regexp_replace(text, ' [^ ]*$', '') AS text "
        "FROM tbase WHERE CAST(substr(doc_id, 2) AS BIGINT) % 5 = 0) "
        f"SELECT * FROM ({D.sql_minhash_lsh_pairs(table='tdocs')}) q"
    )


def _sql_ingress_report_oracle() -> str:
    from graphlab_spark.operators.ingress import sql_ingress_report
    return (
        f"WITH {EDGES_CTES} "
        + sql_ingress_report(_INGRESS_SPECS, threshold=100)
    )


_GRAPH_PRELUDE = f"""
WITH {EDGES_CTES},
verts AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
outd AS (SELECT src AS id, count(*) AS out_degree FROM edges GROUP BY 1),
ind AS (SELECT dst AS id, count(*) AS in_degree FROM edges GROUP BY 1)
"""

_PR_UNROLL2 = """,
prverts AS (SELECT DISTINCT id FROM
            (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
proutd AS (SELECT src AS id, count(*) AS out_degree FROM edges GROUP BY 1),
cont AS (SELECT e.src, e.dst, 1.0 / d.out_degree AS cw
         FROM edges e JOIN proutd d ON e.src = d.id),
r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM prverts),
m1 AS (SELECT c.dst AS id, sum(r.rank * c.cw) AS t
       FROM cont c JOIN r0 r ON c.src = r.id GROUP BY 1),
r1 AS (SELECT v.id, 0.15 + 0.85 * coalesce(m1.t, 0.0) AS rank
       FROM r0 v LEFT JOIN m1 ON v.id = m1.id),
m2 AS (SELECT c.dst AS id, sum(r.rank * c.cw) AS t
       FROM cont c JOIN r1 r ON c.src = r.id GROUP BY 1),
r2 AS (SELECT v.id, 0.15 + 0.85 * coalesce(m2.t, 0.0) AS rank
       FROM r1 v LEFT JOIN m2 ON v.id = m2.id)
SELECT id, round(rank, 6) AS rank FROM r2"""


def _pr_iter2_sql(edge_ctes: str) -> str:
    """2-superstep PageRank unroll over any CTE list ending in
    ``edges(src, dst)`` — shared by the events and transcript graphs."""
    return f"WITH {edge_ctes}{_PR_UNROLL2}"


_PR_PRELUDE = f"""
{_GRAPH_PRELUDE},
cont AS (SELECT e.src, e.dst, 1.0 / d.out_degree AS cw
         FROM edges e JOIN outd d ON e.src = d.id),
r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts),
m1 AS (SELECT c.dst AS id, sum(r.rank * c.cw) AS t
       FROM cont c JOIN r0 r ON c.src = r.id GROUP BY 1),
r1 AS (SELECT v.id, 0.15 + 0.85 * coalesce(m1.t, 0.0) AS rank
       FROM r0 v LEFT JOIN m1 ON v.id = m1.id),
m2 AS (SELECT c.dst AS id, sum(r.rank * c.cw) AS t
       FROM cont c JOIN r1 r ON c.src = r.id GROUP BY 1),
r2 AS (SELECT v.id, 0.15 + 0.85 * coalesce(m2.t, 0.0) AS rank
       FROM r1 v LEFT JOIN m2 ON v.id = m2.id)
"""

_TRI_PRELUDE = f"""
{_GRAPH_PRELUDE},
canon AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
          FROM edges WHERE src <> dst),
tris AS (SELECT e1.src AS v1, e1.dst AS v2, e2.dst AS v3
         FROM canon e1
         JOIN canon e2 ON e1.dst = e2.src
         JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
"""


def _census_corner_sql(v: str, fab: str, fba: str, fac: str, fca: str,
                       fbc: str, fcb: str) -> str:
    """One corner's census contributions (mirrors
    graphlab_spark.algos.directed_triangles.corner())."""
    return f"""
SELECT {v} AS id,
       {fba}*{fcb}*{fca} + {fca}*{fbc}*{fba} AS in_t,
       {fab}*{fac}*{fbc} + {fac}*{fab}*{fcb} AS out_t,
       {fab}*{fca}*{fcb} + {fac}*{fba}*{fbc} AS through_t,
       {fab}*{fca}*{fbc} + {fac}*{fba}*{fcb} AS cycle_t
FROM tf"""


_CENSUS_SQL = f"""
{_TRI_PRELUDE},
de AS (SELECT DISTINCT src, dst FROM edges),
tf AS (
  SELECT t.v1, t.v2, t.v3,
         CASE WHEN e12.src IS NOT NULL THEN 1 ELSE 0 END AS f12,
         CASE WHEN e21.src IS NOT NULL THEN 1 ELSE 0 END AS f21,
         CASE WHEN e13.src IS NOT NULL THEN 1 ELSE 0 END AS f13,
         CASE WHEN e31.src IS NOT NULL THEN 1 ELSE 0 END AS f31,
         CASE WHEN e23.src IS NOT NULL THEN 1 ELSE 0 END AS f23,
         CASE WHEN e32.src IS NOT NULL THEN 1 ELSE 0 END AS f32
  FROM tris t
  LEFT JOIN de e12 ON e12.src = t.v1 AND e12.dst = t.v2
  LEFT JOIN de e21 ON e21.src = t.v2 AND e21.dst = t.v1
  LEFT JOIN de e13 ON e13.src = t.v1 AND e13.dst = t.v3
  LEFT JOIN de e31 ON e31.src = t.v3 AND e31.dst = t.v1
  LEFT JOIN de e23 ON e23.src = t.v2 AND e23.dst = t.v3
  LEFT JOIN de e32 ON e32.src = t.v3 AND e32.dst = t.v2),
corners AS (
  {_census_corner_sql('v1', 'f12', 'f21', 'f13', 'f31', 'f23', 'f32')}
  UNION ALL {_census_corner_sql('v2', 'f21', 'f12', 'f23', 'f32', 'f13', 'f31')}
  UNION ALL {_census_corner_sql('v3', 'f31', 'f13', 'f32', 'f23', 'f12', 'f21')}),
agg AS (SELECT id, sum(in_t) AS in_triangles, sum(out_t) AS out_triangles,
               sum(through_t) AS through_triangles,
               sum(cycle_t) AS cycle_triangles
        FROM corners GROUP BY id)
SELECT v.id, CAST(coalesce(a.in_triangles, 0) AS BIGINT) AS in_triangles,
       CAST(coalesce(a.out_triangles, 0) AS BIGINT) AS out_triangles,
       CAST(coalesce(a.through_triangles, 0) AS BIGINT) AS through_triangles,
       CAST(coalesce(a.cycle_triangles, 0) AS BIGINT) AS cycle_triangles
FROM verts v LEFT JOIN agg a ON v.id = a.id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "graph_edges_from_events": f"WITH {EDGES_CTES} SELECT src, dst FROM edges",
        "graph_degrees": _GRAPH_PRELUDE + """
SELECT v.id, coalesce(o.out_degree, 0) AS out_degree,
       coalesce(i.in_degree, 0) AS in_degree
FROM verts v LEFT JOIN outd o ON v.id = o.id LEFT JOIN ind i ON v.id = i.id
""",
        "graph_pagerank_iter2": _PR_PRELUDE
        + "SELECT id, round(rank, 6) AS rank FROM r2",
        # warp-API pagerank computes the same fixed point as the builtin
        # (mapper divides per edge instead of baking 1/out_degree — ulp
        # noise only, absorbed by round 6): same 2-iteration oracle.
        "graph_warp_pagerank": _PR_PRELUDE
        + "SELECT id, round(rank, 6) AS rank FROM r2",
        "graph_triangle_total": _TRI_PRELUDE
        + "SELECT count(*) AS triangles FROM tris",
        "graph_triangles_per_vertex": _TRI_PRELUDE + """
, corners AS (SELECT v1 AS id FROM tris UNION ALL
              SELECT v2 FROM tris UNION ALL SELECT v3 FROM tris),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY 1)
SELECT v.id, coalesce(c.triangles, 0) AS triangles
FROM verts v LEFT JOIN cnt c ON v.id = c.id
""",
        "graph_neighbors_of_hubs": _GRAPH_PRELUDE + """
SELECT DISTINCT e.src AS id FROM edges e WHERE e.dst < 0
""",
        "graph_vset_inout": _GRAPH_PRELUDE + """
SELECT id FROM outd INTERSECT SELECT id FROM ind
""",
        "graph_directed_census": _CENSUS_SQL,
        "text_stats": (
            f"SELECT doc_id, {T.sql_ws_token_count()} AS ws_toks, "
            f"{T.sql_bpe_token_count()} AS bpe_toks, "
            f"{T.sql_lang_id()} AS lang_guess, "
            f"round({T.sql_quality_score()}, 6) AS quality, "
            f"{T.sql_fingerprint()} AS fp FROM documents"
        ),
        "text_token_frequencies": T.sql_token_frequencies(),
        "text_bigram_lm_scores": T.sql_char_bigram_lm_scores(),
        "text_winnowing_fingerprints": T.sql_winnowing_fingerprints(),
        "text_repetition_signals": T.sql_repetition_signals(),
        "dedup_exact_groups": D.sql_exact_dup_groups(),
        "dedup_cross_doc_lines": D.sql_line_dedup(
            table="chunked",
            prelude_ctes=(
                "chunked AS (SELECT doc_id, "
                + D.sql_chunk_into_lines()
                + " AS text FROM documents),\n"
            ),
        ),
        "dedup_jaccard_pairs": D.sql_jaccard_pairs(),
        "dedup_minhash_signatures": D.sql_minhash_signatures(),
        "dedup_minhash_lsh_pairs": D.sql_minhash_lsh_pairs(),
        "dedup_minhash_clusters": D.sql_minhash_dup_clusters(),
        "dedup_simhash_signatures": D.sql_simhash_signatures(),
        "dedup_simhash_pairs": D.sql_simhash_pairs(),
        "sim_cosine_pairs": S.sql_cosine_pairs(),
        "sim_cosine_dup_clusters": S.sql_cosine_dup_clusters(),
        "curation_hash_sample": (
            f"SELECT doc_id FROM ({C.sql_hash_sample(0.25)})"
        ),
        "curation_stratified_sample": (
            "SELECT doc_id, lang FROM ("
            + C.sql_stratified_sample("lang", _STRATA, default_rate=0.05)
            + ")"
        ),
        "curation_scrub_pii": C.sql_scrub_pii(),
        "curation_decontaminate": C.sql_decontaminate(
            "doc_id % 10 <> 0", "doc_id % 10 = 0"),
        "curation_pack_sequences": C.sql_pack_sequences(),
        "curation_pipeline": _sql_curation_pipeline(),
        "curation_quality_buckets": C.sql_quality_buckets(),
        "sim_ann_topk_brute": S.sql_ann_topk_brute(),
        "multimodal_media_stats": M.sql_decoded_media_stats(),
        "cluster_kmeans_assign1": """
WITH c AS (SELECT embedding,
                  CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
d AS (SELECT p.vec_id AS id, c.cluster,
             list_sum(list_transform(generate_series(1, len(p.embedding)),
                 i -> (CAST(p.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
                    * (CAST(p.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))))
             AS dist
      FROM embeddings p CROSS JOIN c),
r AS (SELECT id, cluster,
             row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
      FROM d)
SELECT id, cluster FROM r WHERE rn = 1
""",
        # Iterative fixed points — recursive-CTE oracles with the same
        # convergence rules as the Spark loops (graphlab_spark.oracles).
        "graph_connected_components": O.sql_connected_components(),
        "graph_cc_sizes": O.sql_cc_sizes(),
        "graph_sssp_from_hub": O.sql_sssp_from_hub(source=-1),
        "graph_catpath": O.sql_catpath(),
        "graph_lpa": O.sql_lpa(max_supersteps=10),
        "graph_lpa_frontier": O.sql_lpa(max_supersteps=10),
        "graph_hits": O.sql_hits(supersteps=3),
        "graph_ppr_from_hub": O.sql_personalized_pagerank(seeds=(-1,),
                                                          tol=1e-6),
        "graph_random_walks": sql_random_walks(
            walk_length=4, walks_per_vertex=2, seed=7),
        "text_bm25_scores": T.sql_bm25(BM25_TERMS),
        "graph_pagerank_converged": O.sql_pagerank_converged(tol=1e-6),
        "graph_pagerank_delta": O.sql_pagerank_delta(tol=1e-6),
        "graph_kcore_k2": O.sql_kcore_k2(),
        "graph_kcore_table": O.sql_kcore_table(kmin=1, kmax=4),
        "graph_coloring": O.sql_coloring(),
        "graph_warp_coloring": O.sql_coloring(),
        "graph_approx_diameter": O.sql_approx_diameter(direction="all"),
        "cluster_kmeans_full": O.sql_kmeans_full(k=4, iterations=10),
        "sim_ann_topk_lsh": S.sql_ann_topk_lsh(),
        "sim_ann_topk_ivf": S.sql_ann_topk_ivf(),
        "lin_jacobi": O.sql_jacobi(tol=1e-9),
        "cascade_sir": O.sql_sir_cascade(source=-1, p_percent=30),
        "cascade_percolation": O.sql_bond_percolation(p_percent=50),
        "graph_topo_layers": O.sql_topo_layers(max_turns=12),
        "graph_laplacian": O.sql_laplacian(),
        "spectral_embedding2": O.sql_spectral_embedding(iterations=15),
        "spectral_clusters2": O.sql_spectral_clusters(k=2, iterations=15),
        "cf_sgd_user_factors": O.sql_sgd_user_factors(k=4, iterations=3),
        "cf_sgd_rmse": O.sql_sgd_rmse(k=4, iterations=3),
        "cf_biassgd_user_params": O.sql_biassgd_user_params(k=4, iterations=3),
        "cf_biassgd_rmse": O.sql_biassgd_rmse(k=4, iterations=3),
        "cf_svdpp_user_params": O.sql_svdpp_user_params(k=4, iterations=3),
        "cf_svdpp_rmse": O.sql_svdpp_rmse(k=4, iterations=3),
        "cf_wals1_user_factors": O.sql_wals1_user_factors(iterations=3),
        "cf_als2_user_factors": O.sql_als2_user_factors(iterations=2),
        # the warp twin computes the same fixed point as wals(k=1) —
        # identical oracle (ulp noise absorbed by round 6):
        "cf_warp_als1_user_factors": O.sql_wals1_user_factors(iterations=3),
        # the warp NMF twin computes the same fixed point as nmf(k=1) —
        # the rank-parameterized NMF oracle at k=1:
        "cf_warp_nmf1_user_factors": O.sql_nmf_user_factors(k=1, iterations=3),
        "cf_als2_regnormal_user_factors":
            O.sql_als2_regnormal_user_factors(iterations=2),
        "cf_synthetic_als_stats": O.sql_synthetic_als_stats(
            nusers=50, nmovies=200, d=3),
        "gm_synthetic_image": O.sql_synthetic_image(
            rows=32, cols=32, ncolors=5, error_rate=0.5, seed=17),
        "cluster_synthetic_stats": O.sql_synthetic_clusters_stats(
            num_clusters=4, dim=2, ndata=2000, seed=7),
        "gm_gibbs_denoise": O.sql_gibbs_denoise(
            rows=12, cols=12, error_rate=0.45, lam=0.75, sweeps=3,
            seed=11, gseed=29),
        "gm_factor_bp_beliefs": O.sql_factor_bp_beliefs(
            groups=40, iterations=5, damping=0.5, regularization=0.25),
        "gm_factor_bp_sum_beliefs": O.sql_factor_bp_beliefs(
            groups=40, iterations=5, damping=0.5, regularization=0.25,
            mode="sum"),
        "cf_implicit_ratings": O.sql_implicit_ratings(percentage=1e-4),
        "cf_sparse_als2_user_factors": O.sql_sparse_als2_user_factors(
            iterations=2),
        "cf_svd_lanczos2_sigma": O.sql_svd_lanczos2_sigma(),
        "vision_match_graph": O.sql_vision_match_graph(),
        "vision_panorama_groups": O.sql_vision_panorama_groups(),
        "vision_pair_transforms": O.sql_vision_pair_transforms(),
        "vision_camera_offsets": O.sql_vision_camera_offsets(),
        "vision_composite_stats": O.sql_vision_composite_stats(),
        "cf_adpredictor_weights": O.sql_adpredictor_weights(iterations=3),
        "cf_svd_power_v": O.sql_svd_power(iterations=8),
        "lda_word_topics": O.sql_lda_word_topics(k=4, iterations=2),
        "graph_lbp_beliefs": O.sql_lbp_beliefs(iterations=5),
        "graph_mplp_labels": O.sql_mplp_labels(iterations=10),
        "graph_mplp_table_labels": O.sql_mplp_table_labels(iterations=10),
        "graph_mplp_sparse_labels": O.sql_mplp_table_labels(iterations=10),
        "graph_dd_labels": O.sql_dd_labels(iterations=10),
        "graph_ad3_labels": O.sql_ad3_labels(iterations=10),
        "graph_dd_projected_labels": O.sql_dd_projected_labels(iterations=10),
        "graph_bethe_admm_labels": O.sql_bethe_admm_labels(iterations=10),
        "graph_budget_map": O.sql_budget_map(budget=3),
        "cf_nmf_user_factors": O.sql_nmf_user_factors(k=4, iterations=3),
        "transcript_corpus": (
            f"WITH {_T_CTES} SELECT conv_id, turn_idx, role, text, tool, "
            "ts_epoch FROM transcripts"
        ),
        "transcript_edges": f"WITH {_T_CTES} SELECT src, dst FROM edges",
        "transcript_pagerank_iter2": _pr_iter2_sql(_T_CTES),
        "transcript_conv_stats": f"""WITH {_T_CTES}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_calls,
       CAST(count(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
       max(ts_epoch) - min(ts_epoch) AS span_sec
FROM transcripts GROUP BY conv_id""",
        "transcript_tool_transitions":
            f"WITH {_T_CTES}{_sql_tool_transitions()}",
        "transcript_turn_latency":
            f"WITH {_T_CTES}{_sql_turn_latency_by_role()}",
        "transcript_sessions": _sql_transcript_sessions_oracle(),
        "transcript_near_dups": _sql_transcript_near_dups_oracle(),
        "graph_contract_lpa": O.sql_contract_by_lpa(max_supersteps=10),
        "graph_ingress_report": _sql_ingress_report_oracle(),
        "sim_knn_graph": S.sql_knn_graph(k=3),
        "sim_knn_components": S.sql_knn_components(k=3),
        "graph_betweenness_hubs": O.sql_betweenness_hubs(),
        "graph_harmonic_hubs": O.sql_harmonic_hubs(),
        # no oracle (rows-only): cf_als_factor_norms + cf_svd_lanczos
        # (per-user ridge solves / driver-side tridiagonal eigenproblem
        # — not ANSI-SQL-expressible; exactness via pytest goldens vs
        # closed forms and numpy.linalg.svd).  Also rows-only by design:
        # dedup_minhash_pairs_scale / lda_word_topics_scale /
        # curation_quality_buckets_scale — the portable=False shipping
        # plans use xxhash64 / approxQuantile, which DuckDB cannot
        # replay; each is pytest-equivalence-checked against its
        # portable twin (see the q_* docstrings for the test names).
    }
