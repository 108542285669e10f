"""Headline benchmark — one JSON line for the driver.

Runs the engine's flagship workloads over ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``:

- pagerank:   converged (tol 1e-6) PageRank on the events link graph —
              the north-star metric (edges/sec per superstep);
- cc:         hash-min connected components to fixpoint;
- lpa:        community label propagation (capped supersteps);
- triangles:  exact total triangle count;
- minhash:    MinHash-LSH near-dup pairs on documents (xxhash64 scale
              path — no portable dense-rank sort);
- ann:        multi-table LSH top-k cosine neighbors on embeddings;
- betweenness16: sampled-source Brandes betweenness from the 16
              top-degree hubs (multi-root BFS + backward accumulation).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank_supersteps": n, "pagerank_edges": e,
   "pagerank_edges_per_sec_per_superstep": r}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from graphlab_spark import get_spark
    from graphlab_spark.algos.connected_components import connected_components
    from graphlab_spark.algos.label_propagation import label_propagation
    from graphlab_spark.algos.pagerank import pagerank
    from graphlab_spark.algos.triangles import triangle_list
    from graphlab_spark.functions import dedup as D
    from graphlab_spark.functions import similarity as S
    from graphlab_spark.sources.events import events_graph
    from pyspark.sql import functions as F

    spark = get_spark(app_name="graphlab-spark-bench", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    g = events_graph(spark, sf_dir, num_edge_partitions=cpus)
    n_edges = g.num_edges  # materializes the persisted edge table

    res = timed("pagerank", lambda: pagerank(g, tol=1e-6, resume=False))
    extra["pagerank_supersteps"] = res.supersteps
    extra["pagerank_edges"] = n_edges
    extra["pagerank_edges_per_sec_per_superstep"] = round(
        n_edges * res.supersteps / timings["pagerank"], 1)

    timed("cc", lambda: connected_components(g, resume=False).state.count())
    timed("lpa", lambda: label_propagation(g, max_supersteps=10,
                                           resume=False).state.count())
    timed("triangles", lambda: triangle_list(g).count())

    from graphlab_spark.algos.directed_triangles import directed_triangle_census
    timed("census", lambda: directed_triangle_census(g).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("minhash", lambda: D.minhash_lsh_pairs(docs, portable=False).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("ann", lambda: S.ann_topk_lsh(emb).count())

    from graphlab_spark.algos.kmeans import kmeans
    timed("kmeans", lambda: kmeans(emb, k=4, iterations=10)[0].count())

    # sampled-source betweenness (|S|=16 top-degree hubs): the r4
    # centrality family's tracked perf number — multi-root BFS forward
    # phase + level-by-level Brandes accumulation, state O(|V|*|S|)
    from graphlab_spark.algos.betweenness import betweenness
    hubs = [r["src"] for r in
            g.symmetric_edges.groupBy("src").agg(F.count("*").alias("d"))
            .orderBy(F.desc("d"), "src").limit(16).collect()]
    timed("betweenness16", lambda: betweenness(g, sources=hubs).count())

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "headline workloads wall time (events link graph + "
                  "dedup/ANN pipeline)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extra,
    }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
