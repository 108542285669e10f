"""Graph utility operators (reference ``graph_ops.hpp``).

- ``topological_layers`` — the Spark-native re-expression of
  ``topological_sort`` (``graph_ops.hpp:59-92``): Kahn's queue rounds
  become BSP longest-path layers (a vertex leaves Kahn's queue in
  round = length of its longest predecessor chain), computed by dense
  max-propagation to fixpoint.  Sorting by (layer, id) yields a valid
  topological order; a cycle is detected exactly as non-convergence
  within |V| supersteps (a DAG's longest path is < |V|).
- ``save_metis_structure`` (``graph_ops.hpp:151``) — METIS adjacency
  file: header "N M", then one line per vertex (dense 1-based ids)
  listing its undirected neighbor ids.
- ``save_zoltan_hypergraph_structure`` (``graph_ops.hpp:202``) — the
  Zoltan hypergraph exchange format with the reference's edge<->vertex
  role swap: every undirected edge is a hyper-vertex, every graph
  vertex a hyperedge pinning its incident edge ids.

The two writers are single-file exchange formats for external (single
machine) partitioners, so they collect through ``toLocalIterator`` by
design — the scale path for graph storage remains parquet
(``sources/parsers.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.superstep import BSPResult, run_bsp


def topological_layers(
    graph: EdgeGraph,
    max_supersteps: int | None = None,
    resume: bool = False,
    verbose: bool = False,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, layer int)``; raises
    ``ValueError`` if the graph has a cycle (non-convergence bound, the
    analog of the reference returning false)."""
    edges = graph.edges.select("src", "dst")
    if max_supersteps is None:
        max_supersteps = graph.num_vertices + 1
    init = graph.vertices.select(
        "id", F.lit(0).alias("layer"), F.lit(True).alias("__changed"))

    def step(state: DataFrame, i: int):
        frontier = state.filter(F.col("__changed")).select("id", "layer")
        msgs = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .groupBy("dst")
            .agg((F.max("layer") + 1).alias("cand"))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        improved = F.coalesce("cand", F.lit(-1)) > F.col("layer")
        new_state = joined.select(
            "id",
            F.when(improved, F.col("cand")).otherwise(F.col("layer"))
            .cast("int").alias("layer"),
            improved.alias("__changed"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"topo_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("active"))

        def finish():
            n = int(obs.get["active"] or 0)
            return ({"active": n, "max_delta": float(n)}, n == 0)

        return observed, finish

    result = run_bsp(init, step, max_supersteps=max_supersteps,
                     resume=resume, verbose=verbose)
    if not result.converged:
        raise ValueError(
            "topological_layers: no fixpoint within |V| supersteps — "
            "the graph has a cycle (reference topological_sort => false)")
    result.state = result.state.drop("__changed")
    return result


def _dense_ids(graph: EdgeGraph) -> DataFrame:
    """(id, did): dense 1-based vertex numbering by id order.  Global
    window sort — exchange formats are single-file/single-machine."""
    w = Window.orderBy("id")
    return graph.vertices.select(
        "id", F.row_number().over(w).cast("long").alias("did"))


def _write_lines(lines, path: str) -> None:
    with open(path, "w", encoding="utf-8") as fout:
        for row in lines:
            fout.write(row["line"])
            fout.write("\n")


def save_metis_structure(graph: EdgeGraph, path: str) -> None:
    """METIS: "N M" header then per-vertex undirected neighbor lists
    (1-based dense ids, sorted; one line per vertex, blanks allowed)."""
    dense = _dense_ids(graph)
    und = (
        graph.symmetric_edges.select("src", "dst").distinct()
        .join(dense.withColumnRenamed("id", "src")
              .withColumnRenamed("did", "dsrc"), "src")
        .join(dense.withColumnRenamed("id", "dst")
              .withColumnRenamed("did", "ddst"), "dst")
    )
    n_vertices = graph.num_vertices
    n_edges = und.count() // 2
    adj = (
        dense.join(und.select(F.col("dsrc").alias("did"), "ddst"),
                   "did", "left")
        .groupBy("did")
        .agg(F.sort_array(F.collect_list("ddst")).alias("nbrs"))
        .select("did", F.array_join("nbrs", " ").alias("line"))
        .orderBy("did")
    )
    rows = adj.select("line").toLocalIterator()
    with open(path, "w", encoding="utf-8") as fout:
        fout.write(f"{n_vertices} {n_edges}\n")
        for row in rows:
            fout.write(row["line"])
            fout.write("\n")


def save_zoltan_hypergraph_structure(graph: EdgeGraph, path: str) -> None:
    """Zoltan hypergraph: edges become hyper-vertices (dense 1-based edge
    ids over canonical undirected pairs), vertices become hyperedges
    pinning their incident edge ids — the reference's role swap."""
    canon = graph.canonical_undirected_edges
    we = Window.orderBy("src", "dst")
    eid = canon.select(
        "src", "dst", F.row_number().over(we).cast("long").alias("eid"))
    dense = _dense_ids(graph)
    incident = (
        eid.select(F.col("src").alias("id"), "eid")
        .unionAll(eid.select(F.col("dst").alias("id"), "eid"))
        .distinct()
    )
    pins = (
        dense.join(incident, "id", "left")
        .groupBy("did")
        .agg(F.sort_array(F.collect_list("eid")).alias("eids"))
        .select(
            "did",
            F.concat(
                F.col("did").cast("string"), F.lit(" "),
                F.size(F.filter("eids", lambda x: x.isNotNull()))
                .cast("string"),
                F.lit("\t"), F.array_join("eids", "\t"),
            ).alias("line"),
        )
        .orderBy("did")
    )
    n_edges = eid.count()
    n_vertices = graph.num_vertices
    with open(path, "w", encoding="utf-8") as fout:
        fout.write(f"{n_edges}\n\n")
        for i in range(1, n_edges + 1):
            fout.write(f"{i}\n")
        fout.write("\n")
        fout.write(f"{n_vertices}\n\n")
        fout.write(f"{n_edges * 2}\n\n")
        for row in pins.select("line").toLocalIterator():
            fout.write(row["line"])
            fout.write("\n")


def contract_graph(graph: EdgeGraph, labels: DataFrame,
                   keep_internal: bool = False) -> DataFrame:
    """Coarsen by a vertex labeling: ``(src, dst, w)`` supernode edges
    where ``src``/``dst`` are the endpoint labels and ``w`` counts the
    original directed edges between them — the standard multilevel /
    community-graph primitive (cluster the communities, route between
    them, iterate coarsen→solve→refine).

    ``labels``: ``(id, label)`` — any labeling (LPA communities, CC
    components, METIS parts).  Unlabeled endpoints get a ``__v<id>``
    singleton label (prefixed so a partial labeling can never merge an
    unlabeled vertex into a community whose label happens to equal the
    vertex id — LPA/CC labels are themselves id-derived strings), so
    the contraction is total.
    ``keep_internal=False`` (default) drops intra-label edges — their
    count is the community's internal volume, one groupBy away if
    wanted; ``True`` keeps them as supernode self-loops.

    Scale shape: two |E|⋈|V| hash joins on vertex id (the same key the
    edge table is already bucketed/partitioned by in the persisted
    layouts) and one partial+final count aggregation on the (tiny)
    label-pair key — no windows, no skew beyond what the label sizes
    themselves carry (a mega-community's edges all map to few pairs;
    the count monoid combines map-side, so hot pairs cost no extra
    shuffle volume).
    """
    lab = labels.select("id", F.col("label").cast("string").alias("label"))
    a = lab.select(F.col("id").alias("src"), F.col("label").alias("_sl"))
    b = lab.select(F.col("id").alias("dst"), F.col("label").alias("_dl"))
    e = (
        graph.edges.join(a, "src", "left").join(b, "dst", "left")
        .select(
            F.coalesce("_sl", F.concat(F.lit("__v"), F.col("src").cast("string")))
            .alias("src_label"),
            F.coalesce("_dl", F.concat(F.lit("__v"), F.col("dst").cast("string")))
            .alias("dst_label"),
        )
    )
    if not keep_internal:
        e = e.filter(F.col("src_label") != F.col("dst_label"))
    return (
        e.groupBy(F.col("src_label").alias("src"),
                  F.col("dst_label").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
