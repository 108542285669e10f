"""SparkSession factory tuned for iterative link-graph workloads.

Scale design notes (100 TB / 1000-executor target):

- AQE is on: skew-join splitting and partition coalescing replace the
  reference's hand-rolled vertex-cut balancing (the reference balances
  edge placement at ingress; Spark re-balances at every shuffle, so the
  equivalent knob is adaptive shuffle planning, not static placement).
- ``spark.sql.shuffle.partitions`` defaults to 2x cores locally; on a
  real cluster pass ``shuffle_partitions`` ~ 2-3x total executor cores.
- Arrow is enabled for every pandas-UDF path (no per-row Python
  anywhere, per the project north rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP = "graphlab-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with iterative-graph-friendly conf.

    ``cores`` pins ``local[cores]`` (used by the two-level scaling bench);
    default is ``local[$SPARK_GRAFT_CPUS]`` falling back to all cores.
    ``master`` overrides the master URL entirely (e.g.
    ``local-cluster[4,4,8192]`` for the multi-executor scaling evidence,
    or a real ``spark://``/``yarn`` URL in production); ``cores`` then
    only sizes the default shuffle parallelism.
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(8, 2 * cores)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Wide partial aggregates (ALS normal equations carry k(k+1)/2
        # sum columns — 230 at the reference's k=20) must stay inside
        # whole-stage codegen: the default maxFields=100 silently drops
        # such plans to interpreted row aggregation (measured 2x wall
        # on the k=20 solve at sf0.1 — BASELINE §5).
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/graphlab_spark_warehouse"
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
