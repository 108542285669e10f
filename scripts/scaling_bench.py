"""Two-parallelism scaling evidence for the north rule.

The target criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox, so per the
task protocol we run the SAME PageRank job on the SAME input at two
local parallelism levels (local[8] vs local[32], 32 physical cores) and
report edges/sec-per-superstep at both plus the efficiency ratio.

Protocol details that keep the comparison honest:

- input generated once (deterministic synthetic transcripts -> edges)
  and written to parquet; both runs read the same files;
- identical spark.sql.shuffle.partitions (64) in both runs, so the
  physical plan is the same and only executor-thread count varies;
- one untimed warmup pagerank (2 supersteps) per session to exclude
  JVM/codegen warmup from the measurement;
- fixed 6 supersteps (not tolerance mode) so both runs do identical
  work regardless of float convergence noise.

Writes BENCH_scaling.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EDGES_PATH = "/tmp/scaling_edges.parquet"
N_CONVS = int(os.environ.get("SCALING_N_CONVS", "300000"))
SUPERSTEPS = 6
SHUFFLE_PARTITIONS = 64
LEVELS = (8, 32)


def build_input() -> None:
    from graphlab_spark import get_spark
    from graphlab_spark.sources.transcripts import (
        synthetic_transcripts,
        transcripts_to_edges,
    )
    spark = get_spark(app_name="scaling-gen", cores=32,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    t = synthetic_transcripts(spark, n_convs=N_CONVS)
    transcripts_to_edges(t).write.mode("overwrite").parquet(EDGES_PATH)
    spark.stop()


def run_level(cores: int) -> dict:
    from graphlab_spark import EdgeGraph, get_spark
    from graphlab_spark.algos.pagerank import pagerank
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    g = EdgeGraph(edges, num_edge_partitions=SHUFFLE_PARTITIONS)
    n_edges = g.num_edges
    pagerank(g, fixed_supersteps=2, resume=False)  # warmup (untimed)
    t0 = time.time()
    pagerank(g, fixed_supersteps=SUPERSTEPS, resume=False)
    wall = time.time() - t0
    spark.stop()
    tput = n_edges * SUPERSTEPS / wall
    return {"cores": cores, "edges": n_edges, "supersteps": SUPERSTEPS,
            "wall_sec": round(wall, 2),
            "edges_per_sec_per_superstep": round(tput, 0)}


def main() -> None:
    if not os.path.isdir(EDGES_PATH):
        build_input()
    results = [run_level(c) for c in LEVELS]
    lo, hi = results[0], results[-1]
    speedup = (hi["edges_per_sec_per_superstep"]
               / lo["edges_per_sec_per_superstep"])
    efficiency = speedup / (hi["cores"] / lo["cores"])
    out = {
        "protocol": "same job, same input, same shuffle partitioning; "
                    "only executor-thread count varies (sandbox stand-in "
                    "for N vs 4N executors)",
        "levels": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
