"""N-ary factor-graph max-sum BP (factors/bp_vertex_program.hpp twin).

The strong check is a numpy replication of the whole synchronous
schedule — repmat-combine, stride-walk MAP projection, the
regularize/shift-normalize/damp message tail — over the portable
synthetic model, across every damping/regularization combination.
A tree model checks exact-MAP decode against brute-force enumeration;
a DuckDB run checks the contract oracle at small scale; resume and
validation cover the engine plumbing."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphlab_spark.algos.factor_bp import (APPROX_LOG_ZERO,
                                            factor_bp_beliefs,
                                            factor_graph_bp)
from graphlab_spark.sources.parsers import load_synthetic_factor_graph


# ---------------------------------------------------------------------------
# numpy replication of the schedule (module docstring of factor_bp)
# ---------------------------------------------------------------------------

def _np_replay(vrows, frows, iterations, damping, regularization,
               mode="max"):
    def shift(a):
        return a - a.max()

    def damp(new, old):
        if damping == 0.0:
            return new
        val = damping * np.exp(old) + (1 - damping) * np.exp(new)
        return np.where(val == 0.0, APPROX_LOG_ZERO,
                        np.log(np.where(val == 0.0, 1.0, val)))

    def tail(raw, old):
        a = raw
        if regularization > 0.0:
            a = shift(a)
            a = np.log(regularization * math.e
                       + (1 - regularization) * np.exp(a))
        a = shift(a)
        return damp(a, old)

    edges = []  # (fid, vid, pos, card, stride)
    for fid, f in frows.items():
        cards = list(f["cards"])
        for pos, vid in enumerate(f["vids"]):
            s = 1
            for q in range(pos):
                s *= cards[q]
            edges.append((fid, vid, pos, cards[pos], s))
    mv = {(f, v): np.zeros(c) for (f, v, _p, c, _s) in edges}
    mf = {(f, v): np.zeros(c) for (f, v, _p, c, _s) in edges}

    def state_at(idx, stride, card):
        return (idx // stride) % card

    for _ in range(iterations):
        vb = {}
        for (f, v, _p, _c, _s) in edges:
            if v not in vb:
                vb[v] = np.array(vrows[v]["prior"], dtype=float).copy()
            vb[v] += mf[(f, v)]
        fb = {}
        for fid, f in frows.items():
            t = np.array(f["table"], dtype=float).copy()
            for (f2, v, _p, c, s) in edges:
                if f2 != fid:
                    continue
                for idx in range(len(t)):
                    t[idx] += mv[(fid, v)][state_at(idx, s, c)]
            fb[fid] = t
        nmv, nmf = {}, {}
        for (f, v, _p, c, s) in edges:
            raw_mv = vb[v] - mf[(f, v)]
            raw_mf = np.empty(c)
            for lbl in range(c):
                ent = [fb[f][idx] - mv[(f, v)][lbl]
                       for idx in range(len(fb[f]))
                       if state_at(idx, s, c) == lbl]
                if mode == "max":
                    raw_mf[lbl] = max([APPROX_LOG_ZERO] + ent)
                else:
                    tot = sum(math.exp(x) for x in ent)
                    raw_mf[lbl] = (APPROX_LOG_ZERO if tot == 0.0
                                   else math.log(tot))
            nmv[(f, v)] = tail(raw_mv, mv[(f, v)])
            nmf[(f, v)] = tail(raw_mf, mf[(f, v)])
        mv, mf = nmv, nmf

    beliefs = {}
    for vid, r in vrows.items():
        tot = np.array(r["prior"], dtype=float).copy()
        touched = False
        for (f, v, _p, _c, _s) in edges:
            if v == vid:
                tot += mf[(f, v)]
                touched = True
        beliefs[vid] = tot if touched else np.zeros(r["card"])
    return beliefs


@pytest.mark.parametrize("damping,reg,mode",
                         [(0.0, 0.0, "max"), (0.5, 0.0, "max"),
                          (0.0, 0.3, "max"), (0.5, 0.25, "max"),
                          (0.0, 0.0, "sum"), (0.5, 0.25, "sum")])
def test_matches_numpy_replay(spark, damping, reg, mode):
    variables, factors = load_synthetic_factor_graph(spark, groups=3)
    vrows = {r["id"]: r for r in variables.collect()}
    frows = {r["fid"]: r for r in factors.collect()}
    res = factor_graph_bp(variables, factors, iterations=4,
                          damping=damping, regularization=reg, mode=mode)
    got = {r["id"]: (np.array(r["belief"]), r["label"])
           for r in res.beliefs.collect()}
    want = _np_replay(vrows, frows, 4, damping, reg, mode)
    assert set(got) == set(want)
    for vid, exp in want.items():
        bel, lbl = got[vid]
        assert np.allclose(bel, exp, atol=1e-9), (vid, bel, exp)
        assert lbl == int(np.argmax(exp))
    # the isolated variable (id 3*groups) keeps the zeroed init belief
    # (apply early-return, bp_vertex_program.hpp:166)
    iso_bel, iso_lbl = got[9]
    assert iso_bel.tolist() == [0.0] * vrows[9]["card"] and iso_lbl == 0


def _frame_model(spark, priors, facs):
    """priors: {vid: [..]}; facs: [(fid, [vids], [cards], [table])]."""
    variables = spark.createDataFrame(
        [(v, len(p), [float(x) for x in p]) for v, p in priors.items()],
        "id long, card int, prior array<double>")
    factors = spark.createDataFrame(
        [(f, vs, cs, [float(x) for x in t]) for f, vs, cs, t in facs],
        "fid long, vids array<long>, cards array<int>, "
        "table array<double>")
    return variables, factors


def _brute_force_map(priors, facs):
    """argmax over all joint assignments of sum(prior) + sum(table)."""
    vids = sorted(priors)
    cards = [len(priors[v]) for v in vids]
    pos_of = {v: i for i, v in enumerate(vids)}
    best, best_asg, second = -np.inf, None, -np.inf
    for asg in itertools.product(*[range(c) for c in cards]):
        s = sum(priors[v][asg[pos_of[v]]] for v in vids)
        for _f, fvs, fcs, tbl in facs:
            idx, stride = 0, 1
            for p, fv in enumerate(fvs):
                idx += asg[pos_of[fv]] * stride
                stride *= fcs[p]
            s += tbl[idx]
        if s > best:
            best, second, best_asg = s, best, asg
        elif s > second:
            second = s
    assert best - second > 1e-6, "test model must have a unique MAP"
    return {v: best_asg[pos_of[v]] for v in vids}


def test_tree_exact_map(spark):
    """Max-sum BP on a tree factor graph converges to the exact MAP —
    the classic guarantee; the model mixes arities 1/2/3 and
    cardinalities 2/3."""
    rng = np.random.RandomState(5)
    priors = {0: rng.randn(2), 1: rng.randn(3), 2: rng.randn(2),
              3: rng.randn(3), 4: rng.randn(2)}
    priors = {v: [round(float(x), 3) for x in p] for v, p in priors.items()}
    facs = [
        (100, [0, 1, 2], [2, 3, 2],
         [round(float(x), 3) for x in rng.randn(12)]),
        (101, [2, 3], [2, 3], [round(float(x), 3) for x in rng.randn(6)]),
        (102, [3, 4], [3, 2], [round(float(x), 3) for x in rng.randn(6)]),
        (103, [4], [2], [round(float(x), 3) for x in rng.randn(2)]),
    ]
    variables, factors = _frame_model(spark, priors, facs)
    res = factor_graph_bp(variables, factors, iterations=30,
                          damping=0.0, bound=1e-12)
    assert res.converged and res.supersteps < 30
    got = {r["id"]: r["label"] for r in res.beliefs.collect()}
    assert got == _brute_force_map(priors, facs)


def test_tree_exact_marginals_sum_mode(spark):
    """Sum-product BP on a tree: the softmax of each variable's belief
    equals the exact marginal by joint enumeration (the marginalize
    projection of dense_table.hpp:531-563)."""
    rng = np.random.RandomState(11)
    priors = {0: rng.randn(2), 1: rng.randn(3), 2: rng.randn(2)}
    priors = {v: [round(float(x), 3) for x in p] for v, p in priors.items()}
    facs = [
        (50, [0, 1, 2], [2, 3, 2],
         [round(float(x), 3) for x in rng.randn(12)]),
        (51, [1], [3], [round(float(x), 3) for x in rng.randn(3)]),
    ]
    variables, factors = _frame_model(spark, priors, facs)
    res = factor_graph_bp(variables, factors, iterations=30,
                          mode="sum", bound=1e-12)
    assert res.converged
    got = {r["id"]: np.array(r["belief"]) for r in res.beliefs.collect()}
    # exact marginals by enumeration
    vids = sorted(priors)
    cards = [len(priors[v]) for v in vids]
    pos_of = {v: i for i, v in enumerate(vids)}
    marg = {v: np.zeros(len(priors[v])) for v in vids}
    for asg in itertools.product(*[range(c) for c in cards]):
        s = sum(priors[v][asg[pos_of[v]]] for v in vids)
        for _f, fvs, fcs, tbl in facs:
            idx, stride = 0, 1
            for p, fv in enumerate(fvs):
                idx += asg[pos_of[fv]] * stride
                stride *= fcs[p]
            s += tbl[idx]
        w = math.exp(s)
        for v in vids:
            marg[v][asg[pos_of[v]]] += w
    for v in vids:
        exact = marg[v] / marg[v].sum()
        b = np.exp(got[v] - got[v].max())
        assert np.allclose(b / b.sum(), exact, atol=1e-9), (v, b, exact)


def test_mode_validation(spark):
    variables, factors = load_synthetic_factor_graph(spark, groups=2)
    with pytest.raises(ValueError, match="mode must be"):
        factor_graph_bp(variables, factors, 1, mode="marginal")


def test_iterations_zero_decodes_prior(spark):
    """0 message rounds = the reference's first apply over zeroed
    messages: belief = prior for connected variables, the zeroed init
    table for isolated ones."""
    priors = {0: [0.3, -0.1], 1: [-0.5, 0.2, 0.1], 2: [1.0, 2.0]}
    facs = [(10, [0, 1], [2, 3], [0.1] * 6)]
    variables, factors = _frame_model(spark, priors, facs)
    out = {r["id"]: (r["belief"], r["label"])
           for r in factor_bp_beliefs(variables, factors,
                                      iterations=0).collect()}
    assert out[0] == ([0.3, -0.1], 0)
    assert out[1] == ([-0.5, 0.2, 0.1], 1)
    assert out[2] == ([0.0, 0.0], 0)  # isolated: apply never ran


def test_validation_errors(spark):
    good_v = {0: [0.0, 0.0], 1: [0.0, 0.0, 0.0]}
    good_f = [(9, [0, 1], [2, 3], [0.0] * 6)]

    v, f = _frame_model(spark, {0: [0.0], 1: [0.0, 0.0, 0.0]}, good_f)
    v = v.withColumn("card", F.when(F.col("id") == 0, 2)
                     .otherwise(F.col("card")))
    with pytest.raises(ValueError, match="prior"):
        factor_graph_bp(v, f, 1)

    v, f = _frame_model(spark, good_v, [(9, [0, 1], [2, 3], [0.0] * 5)])
    with pytest.raises(ValueError, match="malformed"):
        factor_graph_bp(v, f, 1)

    v, f = _frame_model(spark, good_v, [(9, [0, 0], [2, 2], [0.0] * 4)])
    with pytest.raises(ValueError, match="DISTINCT"):
        factor_graph_bp(v, f, 1)

    v, f = _frame_model(spark, good_v, [(9, [0, 7], [2, 3], [0.0] * 6)])
    with pytest.raises(ValueError, match="matching cardinality"):
        factor_graph_bp(v, f, 1)

    v, f = _frame_model(spark, good_v, [(9, [0, 1], [2, 2], [0.0] * 4)])
    with pytest.raises(ValueError, match="matching cardinality"):
        factor_graph_bp(v, f, 1)

    # null-safety: a NULL prior/table must raise, not slip through the
    # size() predicates as NULL and silently NULL the beliefs
    v, f = _frame_model(spark, good_v, good_f)
    v = v.withColumn("prior", F.when(F.col("id") == 0, F.col("prior")
                                     ).otherwise(F.lit(None)))
    with pytest.raises(ValueError, match="non-null"):
        factor_graph_bp(v, f, 1)
    v, f = _frame_model(spark, good_v, good_f)
    f = f.withColumn("table", F.lit(None).cast("array<double>"))
    with pytest.raises(ValueError, match="malformed"):
        factor_graph_bp(v, f, 1)

    # duplicate keys fan out the per-superstep joins and double-count
    # messages — must raise
    v, f = _frame_model(spark, good_v, good_f)
    with pytest.raises(ValueError, match="variable id 0 appears"):
        factor_graph_bp(v.unionAll(v.filter(F.col("id") == 0)), f, 1)
    with pytest.raises(ValueError, match="factor fid 9 appears"):
        factor_graph_bp(v, f.unionAll(f), 1)


def test_checkpoint_resume_bit_identical(spark, tmp_path):
    """Kill-and-resume: messages checkpointed every superstep and
    resumed from disk finish bit-identical to an uninterrupted run
    (the state row carries everything; statics rebuild in the
    caller)."""
    from graphlab_spark.plans.checkpoint import CheckpointManager

    variables, factors = load_synthetic_factor_graph(spark, groups=2)
    full = factor_graph_bp(variables, factors, iterations=6,
                           damping=0.5, regularization=0.25)
    want = sorted((r["id"], tuple(r["belief"]), r["label"])
                  for r in full.beliefs.collect())
    ck = str(tmp_path / "fbp_ck")
    partial = factor_graph_bp(
        variables, factors, iterations=3, damping=0.5,
        regularization=0.25,
        checkpoint=CheckpointManager(ck, every=1), resume=False)
    partial.messages.count()
    resumed = factor_graph_bp(
        variables, factors, iterations=6, damping=0.5,
        regularization=0.25,
        checkpoint=CheckpointManager(ck, every=1), resume=True)
    got = sorted((r["id"], tuple(r["belief"]), r["label"])
                 for r in resumed.beliefs.collect())
    assert got == want


def test_contract_oracle_parity_small(spark):
    """The DuckDB recursive-CTE twin replays the Spark chain to the
    rounded digit at a small scale (the driver runs the full-size
    version)."""
    duckdb = pytest.importorskip("duckdb")
    from graphlab_spark.oracles import sql_factor_bp_beliefs

    variables, factors = load_synthetic_factor_graph(spark, groups=4)
    for mode in ("max", "sum"):
        bel = factor_bp_beliefs(variables, factors, iterations=3,
                                damping=0.5, regularization=0.25,
                                mode=mode)
        got = sorted(
            (r["id"], r["i"], r["b"], r["label"])
            for r in bel.select(
                "id", F.posexplode("belief").alias("i", "b"), "label")
            .select("id", "i", F.round("b", 6).alias("b"),
                    "label").collect())
        want = sorted(map(tuple, duckdb.connect().execute(
            sql_factor_bp_beliefs(groups=4, iterations=3, damping=0.5,
                                  regularization=0.25,
                                  mode=mode)).fetchall()))
        assert got == want, mode
