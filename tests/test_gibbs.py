"""Chromatic parallel Gibbs sampling (chromatic_sampler.cpp twin).

The strong check is a scalar Python replication of the whole chain —
same LCG draws, same color schedule, same conditional arithmetic — so
the distributed sampler's assignments must match bit-for-bit.  A
Rao-Blackwellized-marginal test against brute-force enumeration covers
the statistics; isolated vertices check the exact-softmax edge."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlab_spark.algos.gibbs import chromatic_gibbs, gibbs_marginals

M = 2_147_483_648
A = 1_103_515_245
C = 12_345
FOLD = 65_599


def _lcg(x: int) -> int:
    x = (x % M + M) % M
    x = (x * A + C) % M
    return (x * A + C) % M


def _ehash(u: int, v: int) -> int:
    return _lcg(((u % M + M) % M) * FOLD + ((v % M + M) % M))


def _mix31(x: int) -> int:
    x = (x * 69_069 + 12_345) % M
    x ^= x >> 13
    x = (x * A + C) % M
    x ^= x >> 17
    return (x * 69_069 + 1) % M


def _unary(spark, thetas: dict[int, list[float]]):
    return spark.createDataFrame(
        [(i, t) for i, t in thetas.items()], "id long, theta array<double>")


def _potts_factors(spark, edges: list[tuple[int, int]], k: int, lam: float):
    tbl = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    return spark.createDataFrame(
        [(s, d, tbl) for s, d in edges],
        "src long, dst long, table array<double>")


def _py_gibbs(thetas, edges, k, sweeps, seed, colors):
    """Scalar replication of chromatic_gibbs (Potts/whatever table is
    baked into `edges` as (src, dst, table))."""
    asg = {i: _ehash(seed, i) % k for i in thetas}
    bel = {i: [0.0] * k for i in thetas}
    nsamples = {i: 0 for i in thetas}
    nchanges = {i: 0 for i in thetas}
    nbrs: dict[int, list[tuple[int, list[float], bool]]] = {
        i: [] for i in thetas}
    for s, d, tbl in edges:
        nbrs[s].append((d, tbl, True))
        nbrs[d].append((s, tbl, False))
    color_list = sorted(set(colors.values()))
    for sweep in range(sweeps):
        for ci, color in enumerate(color_list):
            t = sweep * len(color_list) + ci
            new = {}
            for i in thetas:
                if colors[i] != color:
                    continue
                b = list(thetas[i])
                for (j, tbl, fwd) in nbrs[i]:
                    a = asg[j]
                    for x in range(k):
                        b[x] += tbl[x * k + a] if fwd else tbl[a * k + x]
                mx = max(b)
                e = [math.exp(v - mx) for v in b]
                z = sum(e)
                u = (_mix31(_ehash(seed + 7 + t, i)) + 0.5) / float(M)
                thr = u * z
                cum, pick = 0.0, k - 1
                for x in range(k):
                    cum += e[x]
                    if cum > thr:
                        pick = x
                        break
                new[i] = (pick, [v / z for v in e])
            for i, (pick, p) in new.items():
                nchanges[i] += int(pick != asg[i])
                asg[i] = pick
                nsamples[i] += 1
                for x in range(k):
                    bel[i][x] += p[x]
    return asg, bel, nsamples, nchanges


def test_gibbs_matches_scalar_replication(spark):
    """Bit parity with the scalar chain on a K=3 Potts path+branch
    graph (lam=1.5 keeps every neighbor sum order-exact)."""
    k, lam, sweeps, seed = 3, 1.5, 3, 41
    thetas = {i: [0.1 * i, -0.2, 0.05 * (i % 3)] for i in range(7)}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
    # hand-built proper coloring (plain parity breaks on the 1-5 edge)
    colors = {0: 0, 1: 1, 2: 0, 3: 1, 4: 0, 5: 0, 6: 1}
    unary = _unary(spark, thetas)
    factors = _potts_factors(spark, edges, k, lam)
    cdf = spark.createDataFrame(list(colors.items()), "id long, color int")
    res = chromatic_gibbs(unary, factors, k, sweeps=sweeps, seed=seed,
                          colors=cdf)
    got = {r["id"]: r for r in res.state.collect()}
    tbl = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    asg, bel, nsamples, nchanges = _py_gibbs(
        thetas, [(s, d, tbl) for s, d in edges], k, sweeps, seed, colors)
    for i in thetas:
        assert got[i]["asg"] == asg[i], i
        assert got[i]["nsamples"] == nsamples[i] == sweeps
        assert got[i]["nchanges"] == nchanges[i]
        for x in range(k):
            assert got[i]["bel"][x] == pytest.approx(bel[i][x], abs=1e-12)


def test_gibbs_isolated_vertex_exact_softmax(spark):
    """A vertex with no factors draws from softmax(theta) every step,
    so its Rao-Blackwellized marginal is *exactly* softmax(theta)."""
    theta = [math.log(0.2), math.log(0.3), math.log(0.5)]
    unary = _unary(spark, {9: theta})
    factors = spark.createDataFrame(
        [], "src long, dst long, table array<double>")
    res = chromatic_gibbs(unary, factors, k=3, sweeps=5, seed=1)
    m = gibbs_marginals(res).collect()[0]["marginal"]
    for x, want in enumerate((0.2, 0.3, 0.5)):
        assert m[x] == pytest.approx(want, abs=1e-12)


def test_gibbs_marginals_match_enumeration(spark):
    """Ising 4-path: Rao-Blackwellized marginals converge to the exact
    enumerated marginals (deterministic seed; tolerance covers the
    finite-sweep Monte Carlo error)."""
    k, lam, sweeps = 2, 0.8, 60
    thetas = {0: [0.3, -0.1], 1: [0.0, 0.2], 2: [-0.2, 0.1], 3: [0.1, 0.0]}
    edges = [(0, 1), (1, 2), (2, 3)]
    # exact marginals by enumeration
    def logp(cfg):
        lp = sum(thetas[i][cfg[i]] for i in range(4))
        lp += sum(0.0 if cfg[s] == cfg[d] else -lam for s, d in edges)
        return lp
    cfgs = [(a, b, c, d) for a in (0, 1) for b in (0, 1)
            for c in (0, 1) for d in (0, 1)]
    ws = [math.exp(logp(c)) for c in cfgs]
    z = sum(ws)
    exact = {i: sum(w for c, w in zip(cfgs, ws) if c[i] == 1) / z
             for i in range(4)}
    unary = _unary(spark, thetas)
    factors = _potts_factors(spark, edges, k, lam)
    cdf = spark.createDataFrame([(i, i % 2) for i in range(4)],
                                "id long, color int")
    res = chromatic_gibbs(unary, factors, k, sweeps=sweeps, seed=5,
                          colors=cdf)
    marg = {r["id"]: r["marginal"]
            for r in gibbs_marginals(res).collect()}
    for i in range(4):
        assert marg[i][1] == pytest.approx(exact[i], abs=0.06), i


def test_gibbs_default_coloring_and_determinism(spark):
    """colors=None greedy-colors the factor graph; the run is
    deterministic across rebuilds."""
    k = 2
    thetas = {i: [0.1, -0.1 * (i % 4)] for i in range(10)}
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5)]
    unary = _unary(spark, thetas)
    factors = _potts_factors(spark, edges, k, 1.5)
    a = chromatic_gibbs(unary, factors, k, sweeps=2, seed=3)
    b = chromatic_gibbs(unary, factors, k, sweeps=2, seed=3)
    ra = sorted((r["id"], r["asg"], r["nsamples"]) for r in a.state.collect())
    rb = sorted((r["id"], r["asg"], r["nsamples"]) for r in b.state.collect())
    assert ra == rb
    assert a.ncolors >= 2
    assert all(n == 2 for _, _, n in ra)


def test_gibbs_validation_errors(spark):
    unary = _unary(spark, {0: [0.0, 0.0], 1: [0.0, 0.0]})
    factors = _potts_factors(spark, [(0, 1)], 2, 1.0)
    # improper coloring
    same = spark.createDataFrame([(0, 0), (1, 0)], "id long, color int")
    with pytest.raises(ValueError, match="not proper"):
        chromatic_gibbs(unary, factors, 2, sweeps=1, colors=same)
    # endpoint missing from the coloring
    part = spark.createDataFrame([(0, 0)], "id long, color int")
    with pytest.raises(ValueError, match="no row in the supplied"):
        chromatic_gibbs(unary, factors, 2, sweeps=1, colors=part)
    # factor endpoint with no unary row
    orphan = _potts_factors(spark, [(0, 7)], 2, 1.0)
    with pytest.raises(ValueError, match="no unary row"):
        chromatic_gibbs(unary, orphan, 2, sweeps=1)
    with pytest.raises(ValueError, match="k >= 2"):
        chromatic_gibbs(unary, factors, 1)
    # shape mismatches would corrupt samples silently (NULL element_at
    # terms vanish inside sum/coalesce) — must raise instead
    with pytest.raises(ValueError, match="theta entries"):
        chromatic_gibbs(unary, _potts_factors(spark, [(0, 1)], 3, 1.0),
                        3, sweeps=1)
    with pytest.raises(ValueError, match="table .*entries"):
        chromatic_gibbs(
            spark.createDataFrame([(0, [0.0] * 3), (1, [0.0] * 3)],
                                  "id long, theta array<double>"),
            factors, 3, sweeps=1)


def test_gibbs_denoises_synthetic_image(spark):
    """End-to-end on the reference's own synthetic input (the pipeline
    the gibbs_sampling toolkit demos run): per-pixel argmax of the
    Rao-Blackwellized marginal must beat the noisy observation at
    recovering the true image."""
    from graphlab_spark.sources.parsers import load_synthetic_image

    # lam dyadic (0.75 = 3/4) so every neighbor sum stays order-exact;
    # stronger smoothing (1.5) oversmooths this thin-ring image and
    # loses to the observation
    k, er, lam = 3, 0.45, 0.75
    v, e = load_synthetic_image(spark, rows=12, cols=12, ncolors=k,
                                error_rate=er, seed=11)
    v = v.persist()
    unary = v.select("id", F.expr("transform(prior, p -> ln(p))")
                     .alias("theta"))
    potts = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    factors = e.select(
        "src", "dst", F.array(*[F.lit(p) for p in potts]).alias("table"))
    colors = v.select(
        "id", ((F.col("r") + F.col("c")) % 2).cast("int").alias("color"))
    res = chromatic_gibbs(unary, factors, k, sweeps=12, seed=29,
                          colors=colors)
    marg = gibbs_marginals(res)
    dec = marg.select(
        "id", (F.array_position(
            "marginal", F.array_max("marginal")) - 1).cast("int")
        .alias("map_color"))
    agg = v.join(dec, "id").select(
        (F.col("map_color") == F.col("true_color")).cast("int").alias("m"),
        (F.col("obs_color") == F.col("true_color")).cast("int").alias("o"),
    ).agg(F.sum("m").alias("m"), F.sum("o").alias("o")).first()
    assert agg["m"] > agg["o"], (agg["m"], agg["o"])
    v.unpersist()


def test_gibbs_run_statistics_scalar_parity(spark):
    """run_statistics.hpp replay: totals + min/max + the unnormalized
    loglik of the final assignment, checked against scalar math."""
    from graphlab_spark.algos.gibbs import gibbs_run_statistics

    k, lam, sweeps, seed = 2, 1.5, 2, 9
    thetas = {0: [0.4, -0.2], 1: [0.1, 0.3], 2: [-0.1, 0.0]}
    edges = [(0, 1), (1, 2)]
    colors = {0: 0, 1: 1, 2: 0}
    unary = _unary(spark, thetas)
    factors = _potts_factors(spark, edges, k, lam)
    cdf = spark.createDataFrame(list(colors.items()), "id long, color int")
    res = chromatic_gibbs(unary, factors, k, sweeps=sweeps, seed=seed,
                          colors=cdf)
    stats = gibbs_run_statistics(res, unary, factors, k)
    tbl = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    asg, _, ns, nc = _py_gibbs(
        thetas, [(s, d, tbl) for s, d in edges], k, sweeps, seed, colors)
    want_ll = sum(thetas[i][asg[i]] for i in thetas) + sum(
        tbl[asg[s] * k + asg[d]] for s, d in edges)
    assert stats["nsamples"] == sum(ns.values())
    assert stats["nchanges"] == sum(nc.values())
    assert stats["min_samples"] == stats["max_samples"] == sweeps
    assert stats["loglik"] == pytest.approx(want_ll, abs=1e-12)


def test_gibbs_checkpoint_resume_bit_identical(spark, tmp_path):
    """Kill-and-resume: a chain checkpointed every color step and
    resumed from disk finishes bit-identical to an uninterrupted run
    (draws are pure functions of (seed, step, id); accumulators ride
    in the state row)."""
    from graphlab_spark.plans.checkpoint import CheckpointManager

    k, lam = 3, 1.5
    thetas = {i: [0.1 * i, -0.2, 0.05 * (i % 3)] for i in range(7)}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
    colors = {0: 0, 1: 1, 2: 0, 3: 1, 4: 0, 5: 0, 6: 1}
    unary = _unary(spark, thetas)
    factors = _potts_factors(spark, edges, k, lam)
    cdf = spark.createDataFrame(list(colors.items()), "id long, color int")
    full = chromatic_gibbs(unary, factors, k, sweeps=3, seed=41,
                           colors=cdf)
    want = sorted(map(tuple, full.state.collect()))
    ck = str(tmp_path / "gibbs_ck")
    # partial run: only 1 sweep (2 color steps), checkpoint every step
    partial = chromatic_gibbs(
        unary, factors, k, sweeps=1, seed=41, colors=cdf,
        checkpoint=CheckpointManager(ck, every=1), resume=False)
    partial.state.count()
    # resumed run continues from the saved step to the full 3 sweeps
    resumed = chromatic_gibbs(
        unary, factors, k, sweeps=3, seed=41, colors=cdf,
        checkpoint=CheckpointManager(ck, every=1), resume=True)
    got = sorted(map(tuple, resumed.state.collect()))
    assert got == want
    # resuming exactly-complete is fine (returns the final state) ...
    again = chromatic_gibbs(
        unary, factors, k, sweeps=3, seed=41, colors=cdf,
        checkpoint=CheckpointManager(ck, every=1), resume=True)
    assert sorted(map(tuple, again.state.collect())) == want
    # ... but resuming PAST the requested horizon must raise, not
    # silently return the longer chain labeled with fewer sweeps
    import pytest
    with pytest.raises(ValueError, match="past the requested horizon"):
        chromatic_gibbs(
            unary, factors, k, sweeps=1, seed=41, colors=cdf,
            checkpoint=CheckpointManager(ck, every=1), resume=True)
