"""Streaming ingest: streamed edges must equal the batch derivation.

The key property: sequence edges require cross-micro-batch state (the
last turn of each conversation), so the input is split into two parquet
files by turn parity and drained with maxFilesPerTrigger=1 — forcing
the bridge edges to come from the stateful operator's carried state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from graphlab_spark.sources.transcripts import (
    synthetic_transcripts,
    transcripts_to_edges,
)
from graphlab_spark.streaming.ingest import run_stream_to_parquet


@pytest.mark.parametrize("split", ["single", "by_half"])
def test_streamed_edges_match_batch(spark, tmp_path, split):
    t = synthetic_transcripts(spark, n_convs=50).persist()
    in_dir = tmp_path / "in"
    if split == "single":
        t.coalesce(1).write.parquet(str(in_dir))
    else:
        # two files: first halves of conversations, then second halves —
        # bridge edges across the split exist only via carried state
        half = t.withColumn(
            "__h",
            F.col("turn_idx")
            < F.max("turn_idx").over(Window.partitionBy("conv_id")) / 2,
        )
        half.filter("__h").drop("__h").coalesce(1).write.parquet(
            str(in_dir / "part=0"))
        half.filter("NOT __h").drop("__h").coalesce(1).write.parquet(
            str(in_dir / "part=1"))
        # relocate so the directory is a flat file listing in arrival order
        import shutil
        files = sorted((in_dir).rglob("*.parquet"))
        for i, f in enumerate(files):
            shutil.move(str(f), str(in_dir / f"{i:04d}.parquet"))
        for sub in list(in_dir.iterdir()):
            if sub.is_dir():
                shutil.rmtree(sub)

    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    q = run_stream_to_parquet(
        spark, str(in_dir), str(out_dir), str(ck),
        max_files_per_trigger=1 if split == "by_half" else None)
    q.awaitTermination(120)

    streamed = sorted(
        map(tuple, spark.read.parquet(str(out_dir)).collect()))
    batch = sorted(map(tuple, transcripts_to_edges(
        spark.read.parquet(str(in_dir))).collect()))
    assert streamed == batch
    t.unpersist()


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_sequence_pairs_cross_chunk_order():
    """One conversation delivered as two Arrow chunks in REVERSE turn
    order must still emit in-order pairs (r1 advice finding)."""
    import pandas as pd

    from graphlab_spark.streaming.ingest import _make_sequence_pairs

    fn = _make_sequence_pairs(None)
    chunks = [pd.DataFrame({"turn_idx": [3, 4]}),
              pd.DataFrame({"turn_idx": [1, 2]})]
    st = _FakeState()
    out = list(fn(("c1",), iter(chunks), st))
    pairs = list(zip(out[0]["a"], out[0]["b"]))
    assert pairs == [(1, 2), (2, 3), (3, 4)]
    assert st.get == (4,)
    assert st.timeout_set is None  # no TTL configured

    fn_ttl = _make_sequence_pairs(5000)
    st2 = _FakeState()
    list(fn_ttl(("c1",), iter([pd.DataFrame({"turn_idx": [1, 2]})]), st2))
    assert st2.timeout_set == 5000


def test_sequence_pairs_cross_batch_out_of_order_is_skipped():
    """A turn arriving AFTER a higher-indexed turn was already chained
    (out-of-order across micro-batches, inside the watermark) must be
    skipped for sequence edges — not emitted as a backwards edge with a
    regressed chain state."""
    import pandas as pd

    from graphlab_spark.streaming.ingest import _make_sequence_pairs

    fn = _make_sequence_pairs(None)
    # batch 1: turns 0, 2 (turn 1 delayed)
    st = _FakeState()
    out = list(fn(("c1",), iter([pd.DataFrame({"turn_idx": [0, 2]})]), st))
    assert list(zip(out[0]["a"], out[0]["b"])) == [(0, 2)]
    assert st.get == (2,)
    # batch 2: the late turn 1 — no backwards (2->1), no state regress
    out = list(fn(("c1",), iter([pd.DataFrame({"turn_idx": [1]})]), st))
    assert out == []
    assert st.get == (2,)
    # batch 3: turn 3 chains from 2, not from the late turn
    out = list(fn(("c1",), iter([pd.DataFrame({"turn_idx": [3]})]), st))
    assert list(zip(out[0]["a"], out[0]["b"])) == [(2, 3)]
    assert st.get == (3,)
    # a retransmit of the current head is likewise a no-op
    out = list(fn(("c1",), iter([pd.DataFrame({"turn_idx": [3]})]), st))
    assert out == []
    assert st.get == (3,)


def test_sequence_pairs_timeout_evicts():
    from graphlab_spark.streaming.ingest import _make_sequence_pairs

    fn = _make_sequence_pairs(5000)
    st = _FakeState(value=(7,), timed_out=True)
    assert list(fn(("c1",), iter([]), st)) == []
    assert st.removed


def test_streamed_dedup_drops_cross_batch_redelivery(spark, tmp_path):
    """The same turns delivered twice in two separate micro-batches
    must come out once: state carries keys across batches."""
    from graphlab_spark.streaming.windows import run_dedup_to_parquet
    t = synthetic_transcripts(spark, n_convs=30).persist()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    t.coalesce(1).write.parquet(str(in_dir / "stage0"))
    t.coalesce(1).write.parquet(str(in_dir / "stage1"))  # full re-delivery
    import shutil
    files = sorted(in_dir.rglob("*.parquet"))
    for i, f in enumerate(files):
        shutil.move(str(f), str(in_dir / f"{i:04d}.parquet"))
    for sub in list(in_dir.iterdir()):
        if sub.is_dir():
            shutil.rmtree(sub)

    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    q = run_dedup_to_parquet(spark, str(in_dir), str(out_dir), str(ck),
                             max_files_per_trigger=1)
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(str(out_dir))
                 .select("conv_id", "turn_idx").collect()))
    want = sorted(map(tuple, t.select("conv_id", "turn_idx").collect()))
    assert got == want  # each turn exactly once despite double delivery
    t.unpersist()


def test_refinalize_streamed_edges_into_bucketed_graph(spark, tmp_path):
    """Grow-then-finalize (dynamic_local_graph re-finalize analog):
    streamed micro-batch edge files compact into the bucketed layout
    and the resulting graph matches the batch-derived one exactly."""
    from graphlab_spark.algos.pagerank import pagerank
    from graphlab_spark.streaming.ingest import refinalize

    t = synthetic_transcripts(spark, n_convs=40).persist()
    in_dir, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    t.coalesce(1).write.parquet(str(in_dir))
    q = run_stream_to_parquet(spark, str(in_dir), str(out_dir), str(ck))
    q.awaitTermination(120)

    spark.sql("DROP TABLE IF EXISTS refinalized_edges_test")
    g = refinalize(spark, str(out_dir), "refinalized_edges_test",
                   num_buckets=8)
    try:
        from graphlab_spark import EdgeGraph
        gb = EdgeGraph(transcripts_to_edges(t), num_edge_partitions=8)
        assert g.num_edges == gb.num_edges
        a = {r["id"]: r["rank"]
             for r in pagerank(g, fixed_supersteps=3).state.collect()}
        b = {r["id"]: r["rank"]
             for r in pagerank(gb, fixed_supersteps=3).state.collect()}
        assert a.keys() == b.keys()
        assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
        gb.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS refinalized_edges_test")
        t.unpersist()
