"""Property-based invariants (hypothesis) over the curation / vset /
packing operators.

Each property runs a handful of generated cases against one shared
SparkSession on tiny data — the goal is algebraic-law coverage the
example-based tests can't enumerate (SURVEY §5: the reference leans on
randomized robot tests for its graph API; hypothesis is the analog
here).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rates=st.tuples(st.floats(0.05, 0.95), st.floats(0.05, 0.95)),
    seed=st.integers(0, 2**20),
)
def test_hash_sample_is_monotone_in_rate(spark, rates, seed):
    """sample(r_lo) ⊆ sample(r_hi) for r_lo <= r_hi — the membership
    draw is a fixed per-id uniform, so raising the rate only ever adds
    rows (a rerun with a higher rate is a superset, never a reshuffle —
    the property that makes hash sampling resumable at 100 TB)."""
    from graphlab_spark.functions.curation import hash_sample
    lo, hi = sorted(rates)
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    a = hash_sample(docs, lo, seed=seed)
    b = hash_sample(docs, hi, seed=seed)
    assert a.exceptAll(b).count() == 0
    assert a.count() <= b.count()


@settings(**SETTINGS)
@given(
    xs=st.sets(st.integers(0, 30), max_size=12),
    ys=st.sets(st.integers(0, 30), max_size=12),
)
def test_vset_algebra_matches_python_sets(spark, xs, ys):
    """& | - over vertex sets == Python set semantics."""
    from graphlab_spark.operators.vertex_ops import (vset_intersect,
                                                     vset_minus,
                                                     vset_union)
    mk = lambda s: spark.createDataFrame([(i,) for i in s] or [(-99,)],
                                         "id long").filter(F.col("id") >= 0)
    a, b = mk(xs), mk(ys)
    got = {
        "and": {r["id"] for r in vset_intersect(a, b).collect()},
        "or": {r["id"] for r in vset_union(a, b).collect()},
        "sub": {r["id"] for r in vset_minus(a, b).collect()},
    }
    assert got == {"and": xs & ys, "or": xs | ys, "sub": xs - ys}


@settings(**SETTINGS)
@given(budget=st.integers(8, 64), n=st.integers(1, 40))
def test_pack_sequences_respects_budget_and_conserves_tokens(
        spark, budget, n):
    """Every (shard, chunk) holds at most ``budget`` tokens and every
    input token lands in exactly one chunk span — packing neither
    overflows nor drops (the invariant that makes the packed layout a
    faithful training stream)."""
    from graphlab_spark.functions.curation import pack_sequences
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(
            F.lit("tok"), (F.pmod(F.col("id") * 7, 19) + 1).cast("int")))
        .alias("text"))
    packed = pack_sequences(docs, budget=budget)
    span = (F.col("tok_to") - F.col("tok_from"))
    per_chunk = packed.groupBy("shard", "chunk_idx").agg(
        F.sum(span).alias("toks"))
    assert per_chunk.filter(F.col("toks") > budget).count() == 0
    total_in = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")).first()["t"]
    total_out = packed.agg(F.sum(span)).first()[0]
    assert total_out == total_in
