"""spark-submit entry point.

The north-star launch mode is ``spark-submit --py-files graphlab_spark.zip
-m graphlab_spark.cli`` (or ``python -m graphlab_spark.cli`` locally) on a
multi-executor cluster.  The reference's equivalent surface is the
toolkit binaries' command lines (``mpiexec ... ./pagerank --graph=...
--format=snap --engine=synchronous``, ``/root/reference/toolkits/
graph_analytics/pagerank.cpp:159-230``).

Examples::

    python -m graphlab_spark.cli pagerank \
        --input /data/edges.parquet --format parquet \
        --output /out/ranks --checkpoint-dir /ck --tol 1e-6
    python -m graphlab_spark.cli cc --input t.tsv --format tsv --output /out
    python -m graphlab_spark.cli pagerank --events /data/events.parquet ...

Emits one JSON metrics line (throughput, supersteps, convergence) on
stdout — the payload the two-cluster-size scaling protocol compares.
When launched under spark-submit an existing SparkSession is reused, so
``--cores`` only applies to self-managed local runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from .graph import EdgeGraph
from .plans.checkpoint import CheckpointManager

ALGOS = ("pagerank", "cc", "lpa", "triangles", "census", "coloring",
         "kcore", "sssp", "diameter", "convert", "extension", "ingress",
         "stitch", "gibbs", "factor_bp", "betweenness", "harmonic")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="graphlab_spark.cli")
    p.add_argument("algo", choices=ALGOS)
    p.add_argument("--input", help="edge file/dir (with --format)")
    p.add_argument("--events", help="events parquet table -> induced graph")
    p.add_argument("--transcripts", help="transcripts parquet -> induced graph")
    p.add_argument("--documents", help="documents parquet (stitch verb)")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "tsv", "snap", "csv", "adj"])
    p.add_argument("--output", help="output parquet dir for vertex state")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-supersteps", type=int, default=200)
    p.add_argument("--iterations", type=int, default=None,
                   help="fixed supersteps (pagerank), like --iterations "
                        "in the reference")
    p.add_argument("--k", type=int, default=2, help="k for kcore")
    p.add_argument("--source", type=int, default=0, help="sssp source vid")
    p.add_argument("--sources", default=None,
                   help="comma-separated source vids "
                        "(betweenness/harmonic; default --source)")
    p.add_argument("--output-format", default="tsv",
                   choices=["tsv", "snap", "csv", "parquet"],
                   help="target format for the convert verb")
    p.add_argument("--partitions", type=int, default=None)
    # extension verb: a GAS program declared on the command line — the
    # analog of the reference's runtime extension driver
    # (toolkits/extensions/extension_main.cpp + extension_pagerank.cpp)
    p.add_argument("--init", help="extension: init SQL expr")
    p.add_argument("--gather", help="extension: gather SQL expr")
    p.add_argument("--merge", default="sum",
                   help="extension: merge aggregate (sum/min/max/count/avg)")
    p.add_argument("--apply", dest="apply_expr",
                   help="extension: apply SQL expr")
    p.add_argument("--gather-edges", default="in", choices=["in", "out", "all"])
    p.add_argument("--cores", type=int, default=None,
                   help="local[] cores when no session exists")
    # ingress verb (vertex-cut placement diagnostics, the analog of the
    # reference's finalize summary print)
    p.add_argument("--strategy", default="random",
                   help="ingress: comma-separated strategies "
                        "(random/grid/pds/hybrid)")
    p.add_argument("--nshards", type=int, default=16)
    p.add_argument("--degree-threshold", type=int, default=100,
                   help="ingress hybrid: low/high-degree cut")
    # gibbs verb (chromatic_sampler.cpp analog over the link graph:
    # K=2 portable log-phi unaries + Potts smoothing)
    p.add_argument("--sweeps", type=int, default=3,
                   help="gibbs: full chromatic sweeps")
    p.add_argument("--smoothing", type=float, default=0.75,
                   help="gibbs: Potts smoothing strength (dyadic values "
                        "keep the chain bit-deterministic)")
    p.add_argument("--seed", type=int, default=103)
    # factor_bp verb (factors/ library workflow: alchemy model file ->
    # bipartite factor graph -> synchronous BP -> beliefs/labels)
    p.add_argument("--model", help="factor_bp: alchemy model file")
    p.add_argument("--damping", type=float, default=0.0,
                   help="factor_bp: message damping in [0, 1)")
    p.add_argument("--bound", type=float, default=None,
                   help="factor_bp: stop when the max probability-space "
                        "residual is <= bound (default: fixed iterations)")
    p.add_argument("--bp-mode", default="max", choices=["max", "sum"],
                   help="factor_bp: MAP (max-sum) or marginal "
                        "(sum-product) projection")
    return p


def _get_session(args) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark
    return get_spark(app_name=f"graphlab-spark-{args.algo}",
                     cores=args.cores, shuffle_partitions=args.partitions)


def _load_graph(spark: SparkSession, args) -> EdgeGraph:
    if args.events:
        from .sources.events import edges_from_events
        return EdgeGraph(edges_from_events(spark.read.parquet(args.events)),
                         num_edge_partitions=args.partitions)
    if args.transcripts:
        from .sources.transcripts import transcripts_to_edges
        return EdgeGraph(
            transcripts_to_edges(spark.read.parquet(args.transcripts)),
            num_edge_partitions=args.partitions)
    if not args.input:
        raise SystemExit("one of --input/--events/--transcripts is required")
    from .sources.parsers import load_format
    return EdgeGraph(load_format(spark, args.input, args.format),
                     num_edge_partitions=args.partitions)


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    spark = _get_session(args)
    if args.algo == "convert":
        # format_convert parity (toolkits/graph_analytics/
        # format_convert.cpp:24-81): load any format, save any format.
        if not args.output:
            raise SystemExit("convert requires --output")
        from .sources.parsers import save_edges
        g = _load_graph(spark, args)
        t0 = time.time()
        save_edges(g.edges, args.output, args.output_format)
        print(json.dumps({
            "algo": "convert", "edges": g.num_edges,
            "from": args.format, "to": args.output_format,
            "wall_sec": round(time.time() - t0, 3)}))
        return 0
    if args.algo == "stitch":
        # image-stitching match graph (toolkits/computer_vision/
        # stitch_main.cpp:137-162): features -> matches -> panoramas
        if not args.documents:
            raise SystemExit("stitch requires --documents")
        from .functions import vision as V
        docs = spark.read.parquet(args.documents)
        t0 = time.time()
        imgs = V.images_from_documents(docs)
        matches = V.match_features(V.compute_features(imgs)).persist()
        groups = V.panorama_groups(matches)
        out = {
            "algo": "stitch", "images": imgs.count(),
            "match_edges": matches.count(),
            "grouped_images": groups.count(),
            "panoramas": groups.select("pano").distinct().count(),
        }
        if args.output:
            matches.write.mode("overwrite").parquet(args.output)
        out["wall_sec"] = round(time.time() - t0, 3)
        matches.unpersist()
        print(json.dumps(out))
        return 0
    if args.algo == "ingress":
        # placement diagnostics (distributed_ingress_base.hpp:538-550):
        # one JSON line per strategy with replication factor + balance
        from .operators.ingress import ingress_report
        g = _load_graph(spark, args)
        t0 = time.time()
        specs = [(s.strip(), args.nshards) for s in args.strategy.split(",")]
        rows = ingress_report(g.edges, specs,
                              threshold=args.degree_threshold).collect()
        print(json.dumps({
            "algo": "ingress", "edges": g.num_edges,
            "reports": [
                {"strategy": r.strategy, "nshards": r.nshards,
                 "nreplicas": r.nreplicas,
                 "replication_factor": r.replication_factor,
                 "edge_balance": r.edge_balance}
                for r in rows
            ],
            "wall_sec": round(time.time() - t0, 3)}))
        return 0
    if args.algo == "factor_bp":
        # N-ary factor-graph BP over an alchemy model file — the
        # factor_graph.hpp/bp_vertex_program.hpp workflow end to end
        if not args.model:
            raise SystemExit("factor_bp requires --model (alchemy file)")
        from .algos.factor_bp import factor_graph_bp
        from .sources.alchemy import load_alchemy_factor_graph
        variables, factors = load_alchemy_factor_graph(spark, args.model)
        # factor_graph_bp persists un-cached inputs for the call's
        # duration, but this verb also counts factors AFTER the run —
        # persist here so the parse survives until the metrics line
        factors = factors.persist()
        t0 = time.time()
        res = factor_graph_bp(
            variables, factors,
            iterations=10 if args.iterations is None else args.iterations,
            damping=args.damping, bound=args.bound, mode=args.bp_mode,
            checkpoint=CheckpointManager(args.checkpoint_dir,
                                         every=args.checkpoint_every),
            resume=args.resume)
        bel = res.beliefs.persist()
        out = {
            "algo": "factor_bp", "mode": args.bp_mode,
            "variables": bel.count(), "factors": factors.count(),
            "supersteps": res.supersteps, "converged": res.converged,
        }
        if args.output:
            bel.write.mode("overwrite").parquet(args.output)
        out["wall_sec"] = round(time.time() - t0, 3)
        bel.unpersist()
        factors.unpersist()
        print(json.dumps(out))
        return 0
    g = _load_graph(spark, args)
    ckpt = CheckpointManager(args.checkpoint_dir, every=args.checkpoint_every)
    n_edges = g.num_edges
    t0 = time.time()
    supersteps, converged = 0, True
    extra_metrics: dict = {}
    state = None

    if args.algo == "pagerank":
        from .algos.pagerank import pagerank
        res = pagerank(g, tol=args.tol, max_supersteps=args.max_supersteps,
                       fixed_supersteps=args.iterations,
                       checkpoint=ckpt, resume=args.resume)
        state, supersteps, converged = res.state, res.supersteps, res.converged
    elif args.algo == "cc":
        from .algos.connected_components import connected_components
        res = connected_components(g, max_supersteps=args.max_supersteps,
                                   checkpoint=ckpt, resume=args.resume)
        state, supersteps, converged = res.state, res.supersteps, res.converged
    elif args.algo == "lpa":
        from .algos.label_propagation import label_propagation
        res = label_propagation(g, max_supersteps=args.max_supersteps,
                                checkpoint=ckpt, resume=args.resume)
        state, supersteps, converged = res.state, res.supersteps, res.converged
    elif args.algo == "triangles":
        from .algos.triangles import triangle_count_per_vertex
        state = triangle_count_per_vertex(g)
    elif args.algo == "census":
        from .algos.directed_triangles import directed_triangle_census
        state = directed_triangle_census(g)
    elif args.algo == "coloring":
        from .algos.coloring import greedy_coloring
        state = greedy_coloring(g)
    elif args.algo == "kcore":
        from .algos.kcore import kcore_subgraph
        state = kcore_subgraph(g, k=args.k)
    elif args.algo == "sssp":
        from .algos.sssp import sssp
        res = sssp(g, sources=[args.source], checkpoint=ckpt,
                   resume=args.resume)
        state, supersteps, converged = res.state, res.supersteps, res.converged
    elif args.algo == "diameter":
        from .algos.diameter import approx_diameter
        d = approx_diameter(g)
        state = spark.createDataFrame([(int(d["diameter"]),)], "diameter int")
    elif args.algo in ("betweenness", "harmonic"):
        from .algos.betweenness import betweenness, harmonic_centrality
        srcs = ([int(s) for s in args.sources.split(",")]
                if args.sources else [args.source])
        fn = betweenness if args.algo == "betweenness" else harmonic_centrality
        state = fn(g, sources=srcs, max_supersteps=args.max_supersteps)
    elif args.algo == "gibbs":
        # chromatic parallel Gibbs over the loaded graph, instantiated
        # like the lbp/mplp link-graph model: K=2 portable log-phi
        # unaries, Potts pairwise at --smoothing.  Prints the
        # reference's run_statistics block (nsamples/nchanges/loglik).
        from pyspark.sql import functions as F
        from .algos.gibbs import chromatic_gibbs, gibbs_run_statistics
        from .algos.mplp import _log_phi
        unary = _log_phi(g.vertices).select(
            "id", F.array("t0", "t1").alias("theta"))
        lam = args.smoothing
        factors = g.canonical_undirected_edges.select(
            "src", "dst",
            F.array(F.lit(0.0), F.lit(-lam), F.lit(-lam), F.lit(0.0))
            .alias("table"))
        res = chromatic_gibbs(unary, factors, 2, sweeps=args.sweeps,
                              seed=args.seed, checkpoint=ckpt,
                              resume=args.resume)
        stats = gibbs_run_statistics(res, unary, factors, 2)
        state = res.state.select("id", "asg")
        supersteps, converged = args.sweeps * res.ncolors, True
        extra_metrics = stats
    elif args.algo == "extension":
        if not (args.init and args.gather and args.apply_expr):
            raise SystemExit(
                "extension requires --init, --gather and --apply")
        from .operators.vertex_program import VertexProgram
        prog = VertexProgram(
            init=args.init, gather=args.gather, merge=args.merge,
            apply=args.apply_expr, gather_edges=args.gather_edges)
        res = prog.run(g, tol=args.tol, max_supersteps=args.max_supersteps,
                       fixed_supersteps=args.iterations,
                       checkpoint=ckpt, resume=args.resume)
        state, supersteps, converged = res.state, res.supersteps, res.converged

    if args.output:
        state.write.mode("overwrite").parquet(args.output)
        rows = spark.read.parquet(args.output).count()
    else:
        rows = state.count()
    wall = time.time() - t0
    print(json.dumps({
        "algo": args.algo, "edges": n_edges, "rows": rows,
        "supersteps": supersteps, "converged": converged,
        "wall_sec": round(wall, 3),
        "edges_per_sec_per_superstep": round(
            n_edges * max(supersteps, 1) / wall, 1),
        **extra_metrics,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
