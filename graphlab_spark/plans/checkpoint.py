"""Superstep checkpointing with per-partition lineage + metrics manifests.

The reference snapshots the whole graph every ``snapshot_interval``
iterations via ``graph.save_binary`` (``synchronous_engine.hpp:1418-1420``,
``distributed_graph.hpp:1711,1776-1790``); restore requires the same
machine count. Our version is strictly better-behaved: the vertex-state
DataFrame is written as Parquet per checkpointed superstep together with
a JSON-lines manifest recording, per partition:

    (superstep, partition, rows, input_files, max_delta, active,
     skew_max_partition_rows, wall_ms)

(FIXTURES.md §5). Resume is machine-count independent — any session can
read the latest complete checkpoint and continue the loop.

Checkpointing also serves the classic Spark iterative-join role: it
truncates lineage so plans don't grow superstep-over-superstep. Between
durable checkpoints we use ``localCheckpoint`` (cheap, memory/disk local)
every superstep; durable Parquet checkpoints happen every ``every``
supersteps when a directory is configured.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


@dataclass
class SuperstepMetrics:
    superstep: int
    rows: int
    active: int
    max_delta: float
    wall_ms: int
    skew_max_partition_rows: int = 0
    partitions: list[dict] = field(default_factory=list)


class CheckpointManager:
    """Writes/reads durable vertex-state checkpoints and their manifests."""

    def __init__(self, directory: str | None, every: int = 5):
        self.directory = directory
        self.every = max(1, every)
        if directory:
            os.makedirs(directory, exist_ok=True)

    # -- write --------------------------------------------------------------

    def should_checkpoint(self, superstep: int) -> bool:
        return self.directory is not None and superstep % self.every == 0

    def save(self, superstep: int, state: DataFrame, metrics: SuperstepMetrics) -> DataFrame:
        """Write state + manifest; return the re-read (lineage-free) state."""
        assert self.directory is not None
        step_dir = os.path.join(self.directory, f"superstep={superstep:06d}")
        data_dir = os.path.join(step_dir, "state")
        t0 = time.time()
        state.write.mode("overwrite").parquet(data_dir)
        spark = state.sparkSession
        reread = spark.read.parquet(data_dir)
        # Per-partition lineage: rows per parquet file of the checkpoint.
        part_rows = (
            reread.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        files = [r.file for r in reread.select(
            F.input_file_name().alias("file")).distinct().collect()]
        metrics.partitions = [
            {
                "superstep": superstep,
                "partition": int(r.partition),
                "rows": int(r.rows),
                "input_files": files,
                "max_delta": metrics.max_delta,
                "active": metrics.active,
                "skew_max_partition_rows": metrics.skew_max_partition_rows
                or max((int(r.rows) for r in part_rows), default=0),
                "wall_ms": metrics.wall_ms,
            }
            for r in part_rows
        ]
        manifest = {
            "superstep": superstep,
            "rows": metrics.rows,
            "active": metrics.active,
            "max_delta": metrics.max_delta,
            "wall_ms": metrics.wall_ms,
            "checkpoint_write_ms": int((time.time() - t0) * 1000),
            "skew_max_partition_rows": max(
                (int(r.rows) for r in part_rows), default=0
            ),
            "partitions": metrics.partitions,
            "complete": True,
        }
        with open(os.path.join(step_dir, MANIFEST), "w") as f:
            json.dump(manifest, f)
        return reread

    # -- read / resume --------------------------------------------------------

    def latest(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        """Return (superstep, state) of the newest complete checkpoint."""
        if not self.directory or not os.path.isdir(self.directory):
            return None
        steps = []
        for name in os.listdir(self.directory):
            if not name.startswith("superstep="):
                continue
            mpath = os.path.join(self.directory, name, MANIFEST)
            if os.path.exists(mpath):
                with open(mpath) as f:
                    m = json.load(f)
                if m.get("complete"):
                    steps.append(int(name.split("=")[1]))
        if not steps:
            return None
        best = max(steps)
        state = spark.read.parquet(
            os.path.join(self.directory, f"superstep={best:06d}", "state")
        )
        return best, state

    def manifests(self) -> list[dict]:
        out = []
        if not self.directory or not os.path.isdir(self.directory):
            return out
        for name in sorted(os.listdir(self.directory)):
            mpath = os.path.join(self.directory, name, MANIFEST)
            if os.path.exists(mpath):
                with open(mpath) as f:
                    out.append(json.load(f))
        return out


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the logical plan between durable checkpoints.

    ``localCheckpoint(eager=True)`` materializes the partitions on the
    executors and drops the lineage — the in-memory analog of the
    reference's per-superstep snapshot hook. On a multi-tenant cluster
    prefer durable checkpoints (CheckpointManager) for fault tolerance.
    """
    return df.localCheckpoint(eager=True)
