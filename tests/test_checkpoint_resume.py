"""Checkpoint/resume + lineage-manifest tests (north rule: resumable from
checkpoint with per-partition lineage + metrics)."""

import json
import os

import pytest

from graphlab_spark.algos import pagerank
from graphlab_spark.plans.checkpoint import CheckpointManager


def test_checkpoint_manifests_written(fixture_graph, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "ck"), every=1)
    res = pagerank(fixture_graph, tol=1e-9, checkpoint=ckpt, resume=False)
    assert res.converged
    manifests = ckpt.manifests()
    assert manifests, "no manifests written"
    m = manifests[0]
    for key in ("superstep", "rows", "active", "max_delta", "wall_ms",
                "skew_max_partition_rows", "partitions", "complete"):
        assert key in m
    p = m["partitions"][0]
    for key in ("superstep", "partition", "rows", "input_files", "max_delta",
                "active", "skew_max_partition_rows", "wall_ms"):
        assert key in p
    assert p["input_files"], "per-partition lineage must record input files"


def test_resume_mid_computation_matches_uninterrupted(fixture_graph, tmp_path):
    golden = {r.id: r.rank for r in pagerank(fixture_graph, tol=1e-9).state.collect()}

    ckdir = str(tmp_path / "ck2")
    # Phase 1: run only 2 supersteps (simulated kill), checkpointing each.
    ckpt = CheckpointManager(ckdir, every=1)
    partial = pagerank(fixture_graph, tol=1e-9, checkpoint=ckpt, resume=False,
                       max_supersteps=2)
    assert not partial.converged

    # Phase 2: resume from the checkpoint directory and run to convergence.
    ckpt2 = CheckpointManager(ckdir, every=1)
    latest = ckpt2.latest(fixture_graph.spark)
    assert latest is not None and latest[0] == 1
    resumed = pagerank(fixture_graph, tol=1e-9, checkpoint=ckpt2, resume=True)
    assert resumed.converged
    # Resumed run starts after the checkpointed superstep.
    assert resumed.history[0]["superstep"] == 2
    got = {r.id: r.rank for r in resumed.state.collect()}
    assert got.keys() == golden.keys()
    for k in golden:
        assert got[k] == pytest.approx(golden[k], abs=1e-9)


def test_checkpoint_state_is_readable_parquet(fixture_graph, tmp_path):
    ckdir = str(tmp_path / "ck3")
    ckpt = CheckpointManager(ckdir, every=1)
    pagerank(fixture_graph, tol=1e-9, checkpoint=ckpt, resume=False, max_supersteps=1)
    step_dirs = [d for d in os.listdir(ckdir) if d.startswith("superstep=")]
    assert step_dirs
    df = fixture_graph.spark.read.parquet(os.path.join(ckdir, step_dirs[0], "state"))
    assert set(df.columns) == {"id", "rank"}
    with open(os.path.join(ckdir, step_dirs[0], "manifest.json")) as f:
        assert json.load(f)["complete"] is True
