"""Goldens for the round-2 algorithm additions: SGD / SVD (CF family),
spectral pipeline, LDA-CVB0, cascades/percolation, and graph_ops."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph


def _toy_ratings(spark):
    """Rank-1-ish 6x5 matrix: rating = u_i * v_j with noise-free
    structure so factorization must fit it closely."""
    rows = [(u, i, (0.2 + 0.1 * u) * (0.5 + 0.1 * i))
            for u in range(6) for i in range(5)]
    return spark.createDataFrame(rows, "user long, item long, rating double")


def test_sgd_rmse_decreases(spark):
    from graphlab_spark.algos.sgd import sgd, sgd_rmse
    r = _toy_ratings(spark)
    prev = None
    for iters in (1, 5, 30):
        uf, itf = sgd(r, k=2, iterations=iters, lr=0.1)
        rmse = sgd_rmse(r, uf, itf).first()["rmse"]
        assert math.isfinite(rmse)
        if prev is not None:
            assert rmse < prev * 1.001
        prev = rmse
    assert prev < 0.05  # fits the low-rank structure (floor ~ reg bias)


def test_sgd_deterministic(spark):
    from graphlab_spark.algos.sgd import sgd
    r = _toy_ratings(spark)
    a = sorted(map(tuple, sgd(r, k=2, iterations=2)[0].collect()))
    b = sorted(map(tuple, sgd(r, k=2, iterations=2)[0].collect()))
    assert a == b


def test_svd_power_matches_numpy(spark):
    import numpy as np
    from graphlab_spark.algos.svd import power_iteration_svd
    r = _toy_ratings(spark)
    v, sigma = power_iteration_svd(r, iterations=30)
    m = np.zeros((6, 5))
    for row in r.collect():
        m[row["user"], row["item"]] = row["rating"]
    svals = np.linalg.svd(m, compute_uv=False)
    assert abs(sigma - svals[0]) < 1e-6 * max(1.0, svals[0])
    # leading right-singular vector matches up to sign
    _, _, vt = np.linalg.svd(m)
    got = {row["id"]: row["xv"] for row in v.collect()}
    ref = vt[0]
    sign = 1.0 if got[0] * ref[0] > 0 else -1.0
    for i in range(5):
        assert abs(got[i] - sign * ref[i]) < 1e-5


def test_lanczos_matches_numpy(spark):
    import numpy as np
    from graphlab_spark.algos.svd import lanczos_svd
    r = _toy_ratings(spark)
    m = np.zeros((6, 5))
    for row in r.collect():
        m[row["user"], row["item"]] = row["rating"]
    svals = np.linalg.svd(m, compute_uv=False)
    got = lanczos_svd(r, m=4)
    # rank-1-dominated matrix: top value must match tightly
    assert abs(got[0] - svals[0]) < 1e-6 * svals[0]


def _two_blocks(spark):
    """Two 5-cliques joined by a single bridge edge."""
    edges = []
    for base in (0, 10):
        for a in range(5):
            for b in range(a + 1, 5):
                edges.append((base + a, base + b))
    edges.append((0, 10))
    return EdgeGraph(
        spark.createDataFrame(edges, "src long, dst long"),
        num_edge_partitions=4)


def test_spectral_two_blocks(spark):
    from graphlab_spark.algos.spectral import (
        normalized_adjacency, spectral_clusters, spectral_embedding)
    g = _two_blocks(spark)
    nadj = normalized_adjacency(g)
    # symmetric entries, w = 1/sqrt(d_u d_v)
    w = {(r["src"], r["dst"]): r["w"] for r in nadj.collect()}
    assert all(abs(w[(a, b)] - w[(b, a)]) < 1e-12
               for (a, b) in w if (b, a) in w)
    emb = {r["id"]: r["comp"] for r in spectral_embedding(g).collect()}
    left = [emb[i] for i in range(5)]
    right = [emb[10 + i] for i in range(5)]
    assert max(left) < min(right) or min(left) > max(right)
    clusters = {r["id"]: r["cluster"]
                for r in spectral_clusters(g, k=2).collect()}
    assert len({clusters[i] for i in range(5)}) == 1
    assert len({clusters[10 + i] for i in range(5)}) == 1
    assert clusters[0] != clusters[10]
    g.unpersist()


def test_lda_invariants(spark):
    from graphlab_spark.algos.lda import lda_cvb0, word_topics
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta epsilon delta")
         for i in range(20)],
        "doc_id long, text string")
    gamma = lda_cvb0(docs, k=3, iterations=2)
    # responsibilities normalize per (doc, word)
    norms = (gamma.groupBy("doc_id", "wid")
             .agg(F.sum("g").alias("s")).collect())
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in norms)
    # word-topic weights sum to corpus counts per word
    wt = word_topics(gamma)
    totals = {r["word"]: r["t"] for r in
              wt.groupBy("word").agg(F.sum("weight").alias("t")).collect()}
    assert abs(totals["delta"] - 20.0) < 1e-4   # 2 per doc x 10 docs
    assert abs(totals["alpha"] - 10.0) < 1e-4
    # deterministic
    a = sorted(map(tuple, wt.collect()))
    b = sorted(map(tuple, word_topics(
        lda_cvb0(docs, k=3, iterations=2)).collect()))
    assert a == b


def test_lda_scale_path_invariants(spark):
    """portable=False (xxhash64 word ids, no global vocab sort) is a
    different random init but must satisfy the same CVB0 invariants
    and stay deterministic; its physical plan must carry no
    single-partition window."""
    from graphlab_spark.algos.lda import doc_word_counts, lda_cvb0, word_topics
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta epsilon delta")
         for i in range(20)],
        "doc_id long, text string")
    plan = doc_word_counts(docs, portable=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    gamma = lda_cvb0(docs, k=3, iterations=2, portable=False)
    norms = (gamma.groupBy("doc_id", "wid")
             .agg(F.sum("g").alias("s")).collect())
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in norms)
    wt = word_topics(gamma)
    totals = {r["word"]: r["t"] for r in
              wt.groupBy("word").agg(F.sum("weight").alias("t")).collect()}
    assert abs(totals["delta"] - 20.0) < 1e-4
    assert abs(totals["alpha"] - 10.0) < 1e-4
    a = sorted(map(tuple, wt.collect()))
    b = sorted(map(tuple, word_topics(
        lda_cvb0(docs, k=3, iterations=2, portable=False)).collect()))
    assert a == b


def test_sir_cascade_is_bfs_on_transmitting_subgraph(spark):
    from graphlab_spark.algos.cascades import sir_cascade, transmitting_edges
    g = _two_blocks(spark)
    res = sir_cascade(g, seeds=[0], p_percent=60, resume=False)
    steps = {r["id"]: r["step"] for r in res.state.collect()}
    assert steps[0] == 0
    # every infected non-seed vertex has a transmitting in-edge from a
    # vertex infected exactly one step earlier
    t = {(r["src"], r["dst"])
         for r in transmitting_edges(g, 60).collect()}
    for v, s in steps.items():
        if s > 0:
            assert any((u, v) in t and steps.get(u) == s - 1 for u in steps)
    g.unpersist()


def test_percolation_components_respect_kept_edges(spark):
    from graphlab_spark.algos.cascades import bond_percolation
    from graphlab_spark.operators.portable import edge_hash
    g = _two_blocks(spark)
    labels = {r["id"]: r["component"]
              for r in bond_percolation(g, p_percent=50, resume=False).collect()}
    kept = g.canonical_undirected_edges.filter(
        edge_hash("src", "dst") % 100 < 50)
    for r in kept.collect():
        assert labels[r["src"]] == labels[r["dst"]]
    assert set(labels) == {r["id"] for r in g.vertices.collect()}
    g.unpersist()


def test_topological_layers_valid_order(spark):
    from graphlab_spark.operators.graph_ops import topological_layers
    dag = EdgeGraph(spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"),
        num_edge_partitions=2)
    layers = {r["id"]: r["layer"]
              for r in topological_layers(dag, resume=False).state.collect()}
    assert layers == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    dag.unpersist()


def test_metis_and_zoltan_exports(spark, tmp_path):
    from graphlab_spark.operators.graph_ops import (
        save_metis_structure, save_zoltan_hypergraph_structure)
    g = EdgeGraph(spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"),
        num_edge_partitions=2)
    mp = tmp_path / "m.txt"
    save_metis_structure(g, str(mp))
    lines = mp.read_text().splitlines()
    assert lines[0] == "3 3"
    assert len(lines) == 4
    # triangle: every vertex lists the other two (dense 1-based ids)
    assert sorted(lines[1].split()) == ["2", "3"]
    zp = tmp_path / "z.txt"
    save_zoltan_hypergraph_structure(g, str(zp))
    zl = [ln for ln in zp.read_text().splitlines()]
    assert zl[0] == "3"          # 3 hyper-vertices (edges)
    assert f"{g.num_edges * 2}" in zl  # pin count line
    g.unpersist()


def test_lbp_exact_on_tree(spark):
    """Sum-product on a tree is exact: beliefs after >= diameter sweeps
    must equal brute-force enumeration of the 3-node chain MRF."""
    import itertools
    from graphlab_spark.algos.lbp import PSI, lbp_beliefs

    M, A, C = 2**31, 1103515245, 12345

    def lcg(x):
        x = (x % M + M) % M
        x = (x * A + C) % M
        return (x * A + C) % M

    def phi(v):
        p1 = 0.3 + 0.4 * (lcg(v) / M)
        return (1.0 - p1, p1)

    g = __import__("graphlab_spark").EdgeGraph(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"),
        num_edge_partitions=2)
    got = {r["id"]: r["b1"] for r in lbp_beliefs(g, iterations=6).collect()}
    marg = {v: [0.0, 0.0] for v in (0, 1, 2)}
    for x0, x1, x2 in itertools.product((0, 1), repeat=3):
        p = (phi(0)[x0] * phi(1)[x1] * phi(2)[x2]
             * PSI[x0][x1] * PSI[x1][x2])
        marg[0][x0] += p
        marg[1][x1] += p
        marg[2][x2] += p
    for v in (0, 1, 2):
        want = marg[v][1] / (marg[v][0] + marg[v][1])
        assert abs(got[v] - want) < 1e-9, (v, got[v], want)
    g.unpersist()


def test_nmf_objective_decreases_and_stays_nonneg(spark):
    from graphlab_spark.algos.nmf import nmf, nmf_objective
    r = _toy_ratings(spark)
    prev = None
    for iters in (1, 3, 6):
        w, h = nmf(r, k=2, iterations=iters)
        assert w.filter(F.col("v") < 0).count() == 0
        assert h.filter(F.col("v") < 0).count() == 0
        obj = nmf_objective(r, w, h)
        if prev is not None:
            assert obj <= prev * 1.0001
        prev = obj
    assert prev < 0.5


def test_biassgd_fits_and_beats_plain_sgd_on_biased_data(spark):
    """Data with strong additive user/item offsets: the bias terms must
    absorb them (RMSE decreasing, converging under the data's raw std)."""
    import math as _math
    from graphlab_spark.algos.biassgd import biassgd, biassgd_rmse
    rows = [(u, i, 2.0 + 0.5 * u - 0.3 * i + 0.05 * ((u * i) % 3))
            for u in range(6) for i in range(5)]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    prev = None
    for iters in (1, 10, 25):
        uf, itf, mu = biassgd(r, k=2, iterations=iters, lr=0.15)
        rmse = biassgd_rmse(r, uf, itf, mu).first()["rmse"]
        assert _math.isfinite(rmse)
        if prev is not None:
            assert rmse < prev * 1.001
        prev = rmse
    assert prev < 0.1  # additive structure absorbed by mu + b_u + b_i


def test_biassgd_deterministic_and_bias_rows_present(spark):
    from graphlab_spark.algos.biassgd import biassgd
    r = _toy_ratings(spark)
    uf1, itf1, mu1 = biassgd(r, k=2, iterations=2)
    uf2, _, mu2 = biassgd(r, k=2, iterations=2)
    assert mu1 == mu2
    assert sorted(map(tuple, uf1.collect())) == sorted(
        map(tuple, uf2.collect()))
    # one f=-1 bias row per user, k factor rows
    per_f = {r_["f"]: r_["n"] for r_ in
             uf1.groupBy("f").agg(F.count("*").alias("n")).collect()}
    assert per_f == {-1: 6, 0: 6, 1: 6}


def test_svdpp_rmse_decreases_and_fits(spark):
    import math as _math
    from graphlab_spark.algos.svdpp import svdpp, svdpp_rmse
    r = _toy_ratings(spark)
    prev = None
    for iters in (1, 5, 15):
        uf, itf, yf, mu = svdpp(r, k=2, iterations=iters, lr=0.15)
        rmse = svdpp_rmse(r, uf, itf, yf, mu).first()["rmse"]
        assert _math.isfinite(rmse)
        if prev is not None:
            assert rmse < prev * 1.001
        prev = rmse
    assert prev < 0.05  # rank-1 structure fits through q.(p + implicit)


def test_svdpp_deterministic_and_param_shapes(spark):
    from graphlab_spark.algos.svdpp import svdpp
    r = _toy_ratings(spark)
    uf1, itf1, yf1, mu1 = svdpp(r, k=2, iterations=2)
    uf2, _, yf2, mu2 = svdpp(r, k=2, iterations=2)
    assert mu1 == mu2
    assert sorted(map(tuple, uf1.collect())) == sorted(
        map(tuple, uf2.collect()))
    assert sorted(map(tuple, yf1.collect())) == sorted(
        map(tuple, yf2.collect()))
    # p/q carry bias rows at f=-1; y is factors-only
    assert uf1.filter(F.col("f") == -1).count() == 6
    assert itf1.filter(F.col("f") == -1).count() == 5
    assert yf1.filter(F.col("f") == -1).count() == 0
    assert yf1.count() == 5 * 2


def test_wals_downweights_corrupted_cell(spark):
    from graphlab_spark.algos.als import predict, wals
    rows = []
    for u in range(6):
        for i in range(5):
            clean = (0.2 + 0.1 * u) * (0.5 + 0.1 * i)
            if (u, i) == (2, 3):
                rows.append((u, i, clean + 5.0, 1e-6))  # corrupted, ~ignored
            else:
                rows.append((u, i, clean, 1.0))
    r = spark.createDataFrame(
        rows, "user long, item long, rating double, weight double")
    uf, itf = wals(r, k=2, reg=0.01, iterations=8)
    p = {(x["user"], x["item"]): x["prediction"]
         for x in predict(r.select("user", "item", "rating"),
                          uf, itf).collect()}
    clean23 = (0.2 + 0.1 * 2) * (0.5 + 0.1 * 3)
    # prediction tracks the clean low-rank value, not the outlier
    assert abs(p[(2, 3)] - clean23) < 0.15
    for u in range(6):
        for i in range(5):
            if (u, i) != (2, 3):
                assert abs(p[(u, i)] - (0.2 + 0.1 * u) * (0.5 + 0.1 * i)) \
                    < 0.05


def test_sparse_als_respects_support_and_fits(spark):
    from graphlab_spark.algos.als import rmse, sparse_als
    r = _toy_ratings(spark)
    uf, itf = sparse_als(r, k=4, user_sparsity=2, item_sparsity=3,
                         iterations=4)
    for row in uf.collect():
        assert sum(1 for v in row["factor"] if abs(v) > 1e-12) <= 2
    for row in itf.collect():
        assert sum(1 for v in row["factor"] if abs(v) > 1e-12) <= 3
    assert rmse(r, uf, itf) < 0.05  # rank-1 data needs only 1 coord


def test_mplp_exact_map_on_tree(spark):
    """MAP on a tree: damped MPLP labels must equal brute-force argmax
    of the 3-node chain MRF (same potentials as the LBP test)."""
    import itertools
    from graphlab_spark.algos.lbp import PSI
    from graphlab_spark.algos.mplp import mplp_labels

    M, A, C = 2**31, 1103515245, 12345

    def lcg(x):
        x = (x % M + M) % M
        x = (x * A + C) % M
        return (x * A + C) % M

    def phi(v):
        p1 = 0.3 + 0.4 * (lcg(v) / M)
        return (1.0 - p1, p1)

    g = EdgeGraph(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"),
        num_edge_partitions=2)
    got = {r["id"]: r["label"]
           for r in mplp_labels(g, iterations=25).collect()}
    best, best_p = None, -1.0
    for x in itertools.product((0, 1), repeat=3):
        p = (phi(0)[x[0]] * phi(1)[x[1]] * phi(2)[x[2]]
             * PSI[x[0]][x[1]] * PSI[x[1]][x[2]])
        if p > best_p:
            best, best_p = x, p
    assert tuple(got[v] for v in (0, 1, 2)) == best
    g.unpersist()


def test_mplp_dual_monotone_and_bounded(spark):
    from graphlab_spark.algos.mplp import mplp_dual_objective, mplp_duals
    g = _two_blocks(spark)
    objs = [mplp_dual_objective(g, iterations=it) for it in (2, 5, 10)]
    assert objs[0] >= objs[1] - 1e-9 and objs[1] >= objs[2] - 1e-9
    d = mplp_duals(g, iterations=10)
    mx = d.select(F.greatest(*[F.abs(F.col(c)) for c in
                               ("du0", "du1", "dv0", "dv1")]).alias("m")) \
        .agg(F.max("m")).first()[0]
    assert mx < 10.0  # no synchronous-schedule explosion
    g.unpersist()


def test_dd_map_on_decisive_tree_and_projection_invariant(spark):
    """DD vote decoding recovers MAP when the optimum has margin (the
    LCG potentials of ids 12/14/16 all prefer state 1 decisively; on a
    near-tied chain the vote legitimately settles in the LP dual's
    disagreement region, so that is NOT asserted).  Also asserts the
    subgradient's zero-sum projection on the per-variable dual sums."""
    import itertools
    from graphlab_spark.algos.dd import dd_labels, dd_state
    from graphlab_spark.algos.lbp import PSI

    M, A, C = 2**31, 1103515245, 12345

    def lcg(x):
        x = (x % M + M) % M
        x = (x * A + C) % M
        return (x * A + C) % M

    def phi(v):
        p1 = 0.3 + 0.4 * (lcg(v) / M)
        return (1.0 - p1, p1)

    ids = (12, 14, 16)  # phi1 = .66/.68/.69 — MAP (1,1,1) with margin
    g = EdgeGraph(
        spark.createDataFrame([(ids[0], ids[1]), (ids[1], ids[2])],
                              "src long, dst long"),
        num_edge_partitions=2)
    got = {r["id"]: r["label"] for r in dd_labels(g, iterations=30).collect()}
    best, best_p = None, -1.0
    for x in itertools.product((0, 1), repeat=3):
        p = (phi(ids[0])[x[0]] * phi(ids[1])[x[1]] * phi(ids[2])[x[2]]
             * PSI[x[0]][x[1]] * PSI[x[1]][x[2]])
        if p > best_p:
            best, best_p = x, p
    assert tuple(got[v] for v in ids) == best
    # zero-sum projection: sum of duals toward each variable is 0
    d = dd_state(g, iterations=30)
    sums = (
        d.select(F.col("src").alias("id"), F.col("lu0").alias("l0"),
                 F.col("lu1").alias("l1"))
        .unionAll(d.select(F.col("dst").alias("id"), "lv0", "lv1"))
        .groupBy("id").agg(F.sum("l0").alias("s0"), F.sum("l1").alias("s1"))
        .collect())
    for r in sums:
        assert abs(r["s0"]) < 1e-9 and abs(r["s1"]) < 1e-9
    g.unpersist()


def test_dd_dual_bounds_map_energy(spark):
    """The DD dual is an upper bound on any labeling's energy,
    including the decoded one."""
    import math as _math
    from graphlab_spark.algos.dd import dd_dual_objective, dd_labels
    from graphlab_spark.algos.lbp import PSI
    from graphlab_spark.algos.mplp import _log_phi
    g = _two_blocks(spark)
    labels = {r["id"]: r["label"]
              for r in dd_labels(g, iterations=15).collect()}
    lphi = {r["id"]: (r["t0"], r["t1"])
            for r in _log_phi(g.vertices).collect()}
    energy = sum(lphi[v][labels[v]] for v in labels)
    for r in g.canonical_undirected_edges.collect():
        energy += _math.log(PSI[labels[r["src"]]][labels[r["dst"]]])
    dual = dd_dual_objective(g, iterations=15)
    assert dual >= energy - 1e-9
    g.unpersist()


def test_tsc_matches_dense_exponential(spark):
    """Arnoldi TSC equals dense exp(A) b / exp(A) e_c on a small
    symmetric graph (full Krylov budget -> machine precision)."""
    import numpy as np
    from graphlab_spark.algos.tsc import tsc
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    M = np.zeros((5, 5))
    for a, b in edges:
        M[b][a] = 1.0
    w, V = np.linalg.eigh(M)
    expm = V @ np.diag(np.exp(w)) @ V.T
    got = {r["id"]: r["tsc"] for r in tsc(g, m=6).collect()}
    ref = expm @ np.ones(5)
    assert max(abs(got[i] - ref[i]) for i in range(5)) < 1e-10
    gotc = {r["id"]: r["tsc"] for r in tsc(g, m=6, column=2).collect()}
    assert max(abs(gotc[i] - expm[i, 2]) for i in range(5)) < 1e-10
    g.unpersist()


def test_tsc_early_convergence_budget(spark):
    """A Krylov budget far below n must still converge on a path graph
    (communicability decays fast) and stay deterministic."""
    from graphlab_spark.algos.tsc import tsc
    und = [(i, i + 1) for i in range(12)]
    edges = und + [(b, a) for a, b in und]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    a = sorted(map(tuple, tsc(g, m=8).collect()))
    b = sorted(map(tuple, tsc(g, m=8).collect()))
    assert a == b
    import numpy as np
    M = np.zeros((13, 13))
    for x, y in edges:
        M[y][x] = 1.0
    w, V = np.linalg.eigh(M)
    ref = (V @ np.diag(np.exp(w)) @ V.T) @ np.ones(13)
    got = dict(a)
    # m=8 of 13: Krylov truncation error, not machine precision
    assert max(abs(got[i] - ref[i]) / ref[i] for i in range(13)) < 1e-3
    g.unpersist()


def test_adpredictor_learns_separable_clicks(spark):
    """Users whose rows are all +1 must end with positive weight mean
    and shrunken variance; all-negative users the mirror; CTR ranks
    them accordingly."""
    from graphlab_spark.algos.adpredictor import adpredictor, predict_ctr
    rows = [(u, i, 1.0 if u < 3 else -1.0)
            for u in range(6) for i in range(4)]
    r = spark.createDataFrame(rows, "user long, item long, y double")
    uw, iw = adpredictor(r, iterations=4)
    w = {x["id"]: (x["mu"], x["sig"]) for x in uw.collect()}
    for u in range(3):
        assert w[u][0] > 0 and w[u][1] < 1.0
    for u in range(3, 6):
        assert w[u][0] < 0 and w[u][1] < 1.0
    ctr = {(x["user"], x["item"]): x["ctr"]
           for x in predict_ctr(r, uw, iw).collect()}
    assert min(ctr[(u, 0)] for u in range(3)) \
        > max(ctr[(u, 0)] for u in range(3, 6))
    # deterministic
    uw2, _ = adpredictor(r, iterations=4)
    assert sorted(map(tuple, uw.collect())) == sorted(
        map(tuple, uw2.collect()))


def test_lda_scale_vs_portable_word_mass_equal(spark):
    """The scale path (xxhash64 word ids) has a different pseudo-random
    init than the portable twin, so responsibilities differ — but the
    per-word topic MASS (sum over k of expected counts) is the word's
    corpus count under CVB0's per-(doc, word) normalization, so the two
    paths must agree on it exactly."""
    from graphlab_spark.algos.lda import lda_cvb0, word_topics

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta epsilon delta")
         for i in range(20)],
        "doc_id long, text string")

    def mass(portable):
        wt = word_topics(lda_cvb0(docs, k=3, iterations=2,
                                  portable=portable))
        return {r["word"]: round(r["t"], 6) for r in
                wt.groupBy("word").agg(F.sum("weight").alias("t"))
                .collect()}

    assert mass(True) == mass(False)


def _tree_factor_instance():
    """Deterministic 7-node, K=3 tree factor graph with generic
    (asymmetric, tie-free) log-potential tables."""
    K = 3
    edges = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)]

    def h(*xs):
        v = 17
        for x in xs:
            v = (v * 1103515245 + x * 12345 + 12345) % (2 ** 31)
        return v / (2 ** 31)

    theta = {v: [-2.0 * h(v, x) for x in range(K)] for v in range(7)}
    tables = {e: [-1.5 * h(e[0], e[1], x, y)
                  for x in range(K) for y in range(K)] for e in edges}
    return K, edges, theta, tables


def test_mplp_table_exact_map_on_tree(spark):
    """General factor-table MPLP: on a tree the LP relaxation is tight,
    so the decoded labels must equal exact junction-tree (here brute
    force: 3^7 assignments) MAP."""
    import itertools
    from graphlab_spark.algos.mplp import mplp_table_labels

    K, edges, theta, tables = _tree_factor_instance()
    unary = spark.createDataFrame(
        [(v, theta[v]) for v in theta], "id long, theta array<double>")
    factors = spark.createDataFrame(
        [(s, d, tables[(s, d)]) for s, d in edges],
        "src long, dst long, table array<double>")
    got = {r["id"]: r["label"]
           for r in mplp_table_labels(unary, factors, K,
                                      iterations=60).collect()}
    best, best_s = None, float("-inf")
    for x in itertools.product(range(K), repeat=7):
        s = sum(theta[v][x[v]] for v in range(7))
        s += sum(tables[(a, b)][x[a] * K + x[b]] for a, b in edges)
        if s > best_s:
            best, best_s = x, s
    assert tuple(got[v] for v in range(7)) == best


def test_mplp_table_potts_matches_builtin(spark):
    """With a constant ln(PSI) Potts table and the engine's portable
    log-phi unaries, the table engine must reproduce mplp_labels
    exactly (same damped update, table read from the array column)."""
    import math
    from graphlab_spark.algos.lbp import PSI
    from graphlab_spark.algos.mplp import (_log_phi, mplp_labels,
                                           mplp_table_labels)

    edges = [(0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0), (3, 5)]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    ref = {r["id"]: r["label"] for r in mplp_labels(g, iterations=10).collect()}
    lth = [math.log(p) for row in PSI for p in row]
    unary = _log_phi(g.vertices).select(
        "id", F.array("t0", "t1").alias("theta"))
    factors = g.canonical_undirected_edges.select(
        "src", "dst", F.array(*[F.lit(v) for v in lth]).alias("table"))
    got = {r["id"]: r["label"]
           for r in mplp_table_labels(unary, factors, 2,
                                      iterations=10).collect()}
    assert got == ref
    g.unpersist()


def test_mplp_table_isolated_vertex_decodes_from_theta(spark):
    from graphlab_spark.algos.mplp import mplp_table_labels
    unary = spark.createDataFrame(
        [(0, [0.0, -1.0]), (1, [-2.5, 0.0]), (9, [-3.0, -0.5])],
        "id long, theta array<double>")
    factors = spark.createDataFrame(
        [(0, 1, [0.0, -2.0, -2.0, 0.0])],
        "src long, dst long, table array<double>")
    got = {r["id"]: r["label"]
           for r in mplp_table_labels(unary, factors, 2,
                                      iterations=8).collect()}
    # joint scores: (1,1) = -1.0 beats (0,0) = -2.5, (0,1) = -2.0,
    # (1,0) = -5.5; isolated vertex 9 decodes from theta alone.
    assert got[9] == 1 and got[0] == 1 and got[1] == 1


def test_mplp_table_orphan_factor_endpoint_raises(spark):
    """A factor endpoint with no unary row would be silently dropped by
    the dual-update inner joins (the coupling never enforced); the
    general surface must reject it instead."""
    import pytest

    from graphlab_spark.algos.mplp import mplp_table_labels
    unary = spark.createDataFrame(
        [(0, [0.0, -1.0])], "id long, theta array<double>")
    factors = spark.createDataFrame(
        [(0, 1, [0.0, -2.0, -2.0, 0.0])],
        "src long, dst long, table array<double>")
    with pytest.raises(ValueError, match="no unary row"):
        mplp_table_labels(unary, factors, 2, iterations=2)


# ---------------------------------------------------------------------------
# AD3 / ADMM dual decomposition (ad3_qp.hpp, dd_main.cpp algorithm=2)
# ---------------------------------------------------------------------------


def test_ad3_pair_qp_closed_form_is_grid_optimal(spark):
    """The closed-form binary-pairwise QP solve must attain the grid
    maximum of A x + B y + Dq z(x,y) - x^2 - y^2 over the local
    polytope for random coefficients in BOTH the supermodular and
    submodular branches."""
    import numpy as np

    from graphlab_spark.algos.ad3 import _qp_pair

    rng = np.random.RandomState(11)
    cases = [(float(a), float(b), float(d))
             for a, b, d in rng.uniform(-4, 4, (40, 3))]
    df = spark.createDataFrame(cases, "a double, b double, d double")
    x, y = _qp_pair(F.col("a"), F.col("b"), F.col("d"))
    got = df.select("a", "b", "d", x.alias("x"), y.alias("y")).collect()
    g = np.linspace(0, 1, 801)
    X, Y = np.meshgrid(g, g, indexing="ij")
    assert any(r["d"] < 0 for r in got) and any(r["d"] >= 0 for r in got)
    for r in got:
        A, B, D = r["a"], r["b"], r["d"]
        Z = np.minimum(X, Y) if D >= 0 else np.maximum(0.0, X + Y - 1.0)
        grid_max = (A * X + B * Y + D * Z - X ** 2 - Y ** 2).max()
        zs = (min(r["x"], r["y"]) if D >= 0
              else max(0.0, r["x"] + r["y"] - 1.0))
        mine = A * r["x"] + B * r["y"] + D * zs - r["x"] ** 2 - r["y"] ** 2
        assert mine >= grid_max - 1e-5, (A, B, D, r["x"], r["y"])


def test_ad3_map_matches_exact_enumeration(spark):
    """On a small loopy graph the ADMM iterate converges to an integral
    LP solution that equals the exact MAP (enumeration over 2^|V|)."""
    import itertools
    import math

    from graphlab_spark.algos.ad3 import ad3_labels, ad3_residuals
    from graphlab_spark.algos.lbp import PSI, node_potentials

    E = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
    g = EdgeGraph(spark.createDataFrame(E, "src long, dst long"))
    lab = {r["id"]: r["label"]
           for r in ad3_labels(g, iterations=40).collect()}
    ph = {r["id"]: (r["phi0"], r["phi1"])
          for r in node_potentials(g.vertices).collect()}
    ids = sorted(ph)
    best, bestx = -1e18, None
    for xs in itertools.product([0, 1], repeat=len(ids)):
        x = dict(zip(ids, xs))
        s = (sum(math.log(ph[i][x[i]]) for i in ids)
             + sum(math.log(PSI[x[u]][x[v]]) for u, v in E))
        if s > best:
            best, bestx = s, x
    assert lab == bestx
    res = ad3_residuals(g, iterations=40)
    assert res["primal_residual"] < 1e-9
    assert res["mean_integrality_gap"] < 1e-9


def test_dd_projected_map_on_decisive_tree(spark):
    """The projected variant (algorithm=1) must also recover the exact
    MAP on a small loopy graph, and its fractional consensus beliefs
    must converge to the integral solution."""
    import itertools
    import math

    from graphlab_spark.algos.dd import dd_projected_labels
    from graphlab_spark.algos.lbp import PSI, node_potentials

    E = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
    g = EdgeGraph(spark.createDataFrame(E, "src long, dst long"))
    lab = {r["id"]: r["label"]
           for r in dd_projected_labels(g, iterations=25).collect()}
    ph = {r["id"]: (r["phi0"], r["phi1"])
          for r in node_potentials(g.vertices).collect()}
    ids = sorted(ph)
    best, bestx = -1e18, None
    for xs in itertools.product([0, 1], repeat=len(ids)):
        x = dict(zip(ids, xs))
        s = (sum(math.log(ph[i][x[i]]) for i in ids)
             + sum(math.log(PSI[x[u]][x[v]]) for u, v in E))
        if s > best:
            best, bestx = s, x
    assert lab == bestx


def test_bethe_admm_map_matches_exact_enumeration(spark):
    """Bethe-ADMM (algorithm=3): the exponentiated-gradient/BP inner
    step must also drive the consensus to the exact MAP on a small
    loopy graph, with per-variable beliefs summing to 1."""
    import itertools
    import math

    from graphlab_spark.algos.ad3 import bethe_admm_labels, bethe_admm_state
    from graphlab_spark.algos.lbp import PSI, node_potentials

    E = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
    g = EdgeGraph(spark.createDataFrame(E, "src long, dst long"))
    lab = {r["id"]: r["label"]
           for r in bethe_admm_labels(g, iterations=25).collect()}
    ph = {r["id"]: (r["phi0"], r["phi1"])
          for r in node_potentials(g.vertices).collect()}
    ids = sorted(ph)
    best, bestx = -1e18, None
    for xs in itertools.product([0, 1], repeat=len(ids)):
        x = dict(zip(ids, xs))
        s = (sum(math.log(ph[i][x[i]]) for i in ids)
             + sum(math.log(PSI[x[u]][x[v]]) for u, v in E))
        if s > best:
            best, bestx = s, x
    assert lab == bestx
    st = bethe_admm_state(g, iterations=5)
    row = st.select(
        F.max(F.abs(F.col("bu0") + F.col("bu1") - 1.0)).alias("du"),
        F.max(F.abs(F.col("fb00") + F.col("fb01") + F.col("fb10")
                    + F.col("fb11") - 1.0)).alias("df")).first()
    assert row["du"] < 1e-12 and row["df"] < 1e-12


def test_budget_qp_project_matches_bisection(spark):
    """The array-expression budget projection must match a numpy
    bisection waterfilling on random instances, including budget 0
    (all-zero) and budget >= d (pure box clip)."""
    import numpy as np

    from graphlab_spark.algos.ad3 import budget_qp_project

    def np_project(x, budget):
        c = np.clip(x, 0, 1)
        if c.sum() <= budget:
            return c
        lo_t, hi_t = 0.0, x.max()
        for _ in range(200):
            mid = (lo_t + hi_t) / 2
            if np.clip(x - mid, 0, 1).sum() > budget:
                lo_t = mid
            else:
                hi_t = mid
        return np.clip(x - hi_t, 0, 1)

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        d = rng.randint(2, 12)
        x = rng.uniform(-2, 3, d)
        rows.append((i, [float(v) for v in x], float(rng.randint(0, d + 1))))
    df = spark.createDataFrame(rows, "i int, xs array<double>, b double")
    got = {r["i"]: np.array(r["p"]) for r in df.select(
        "i", budget_qp_project(F.col("xs"), F.col("b")).alias("p")
    ).collect()}
    for i, x, b in rows:
        assert np.allclose(got[i], np_project(np.array(x), b), atol=1e-6)


def test_budget_map_select_reference_semantics(spark):
    """SolveMAP_budget ties: nonnegative scores only, at most budget,
    ties by (score desc, member asc); zero scores are selectable."""
    from graphlab_spark.algos.ad3 import budget_map_select

    fac = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 2), (1, 12, 2), (1, 13, 2),
         (2, 10, 3), (2, 11, 3)],
        "fid long, member long, budget int")
    un = spark.createDataFrame(
        [(10, 1.5), (11, -0.2), (12, 1.5), (13, 0.0)],
        "id long, theta double")
    sel = {(r["fid"], r["member"]): r["selected"]
           for r in budget_map_select(fac, un).collect()}
    assert sel == {(1, 10): 1, (1, 11): 0, (1, 12): 1, (1, 13): 0,
                   (2, 10): 1, (2, 11): 0}


def test_budget_map_select_orphan_member_raises(spark):
    """A factor member with no unary row must raise, not silently
    vanish from the output via the score inner join."""
    from graphlab_spark.algos.ad3 import budget_map_select

    fac = spark.createDataFrame(
        [(1, 10, 2), (1, 99, 2)], "fid long, member long, budget int")
    un = spark.createDataFrame([(10, 1.5)], "id long, theta double")
    with pytest.raises(ValueError, match="no unary row"):
        budget_map_select(fac, un).collect()


def test_synthetic_image_generator_semantics(spark):
    """synthetic_image_data.cpp:79-131 replay: packed ids, horizon
    mask, ring geometry, 4-neighbor grid arcs, determinism."""
    import math

    from graphlab_spark.sources.parsers import load_synthetic_image

    rows, cols, nc, er, seed = 8, 6, 4, 0.4, 23
    v, e = load_synthetic_image(spark, rows, cols, nc, er, seed)
    got = {r["id"]: r.asDict() for r in v.collect()}
    assert len(got) == rows * cols
    # numpy-free scalar replication of the generator
    cr, cc, mr = rows / 2.0, cols / 2.0, min(rows, cols) / 2.0
    for r_ in range(rows):
        for c_ in range(cols):
            vid = (r_ << 16) | c_
            d = math.sqrt((r_ - cr) ** 2 + (c_ - cc) ** 2)
            ring = math.floor(min(1.0, d / mr) * (nc - 1))
            want = ring if r_ < rows // 2 else 0
            assert got[vid]["true_color"] == want, (r_, c_)
            assert 0 <= got[vid]["obs_color"] < nc
            pri = got[vid]["prior"]
            assert len(pri) == nc
            assert pri[got[vid]["obs_color"]] == er
            off = [p for i, p in enumerate(pri)
                   if i != got[vid]["obs_color"]]
            assert all(abs(p - er / (nc - 1)) < 1e-15 for p in off)
    edges = {(r["src"], r["dst"]) for r in e.collect()}
    assert len(edges) == rows * (cols - 1) + (rows - 1) * cols
    assert ((0 << 16) | 0, (1 << 16) | 0) in edges
    assert ((0 << 16) | 0, (0 << 16) | 1) in edges
    # deterministic across re-builds
    v2, _ = load_synthetic_image(spark, rows, cols, nc, er, seed)
    assert sorted(map(tuple, v.collect())) == sorted(map(tuple, v2.collect()))


def test_mplp_table_denoises_synthetic_image(spark):
    """The mplp_denoise.cpp pipeline end-to-end on the reference's own
    synthetic input: log-prior unaries + Potts smoothing tables must
    recover the true image strictly better than the noisy observation
    does."""
    from pyspark.sql import functions as F

    from graphlab_spark.algos.mplp import mplp_table_labels
    from graphlab_spark.sources.parsers import load_synthetic_image

    K, er = 3, 0.35
    v, e = load_synthetic_image(spark, rows=12, cols=12, ncolors=K,
                                error_rate=er, seed=5)
    v = v.persist()
    unary = v.select(
        "id", F.expr("transform(prior, p -> ln(p))").alias("theta"))
    lam = 1.5  # Potts smoothing strength (mplp_denoise.cpp SMOOTHING)
    potts = [0.0 if x == y else -lam for x in range(K) for y in range(K)]
    factors = e.select(
        "src", "dst",
        F.array(*[F.lit(p) for p in potts]).alias("table"))
    labels = mplp_table_labels(unary, factors, K, iterations=15)
    joined = v.join(labels, "id").select(
        (F.col("label") == F.col("true_color")).cast("int").alias("map_ok"),
        (F.col("obs_color") == F.col("true_color")).cast("int").alias("obs_ok"),
    ).agg(F.sum("map_ok").alias("m"), F.sum("obs_ok").alias("o")).first()
    assert joined["m"] > joined["o"], (joined["m"], joined["o"])
    v.unpersist()


def test_sparse_table_fully_specified_matches_dense(spark):
    """sparse_table.hpp densify: a fully-specified sparse table is the
    dense table — MPLP MAP must match bit-for-bit."""
    from graphlab_spark.algos.mplp import (
        mplp_sparse_table_labels, mplp_table_labels, sparse_table_to_dense)

    k = 2
    un = spark.createDataFrame(
        [(0, [0.4, -0.1]), (1, [0.0, 0.3]), (2, [-0.2, 0.1])],
        "id long, theta array<double>")
    tbl = [0.0, -0.7, -0.7, 0.1]
    dense = spark.createDataFrame(
        [(0, 1, tbl), (1, 2, tbl)], "src long, dst long, table array<double>")
    sparse = spark.createDataFrame(
        [(0, 1, dict(enumerate(tbl))), (1, 2, dict(enumerate(tbl)))],
        "src long, dst long, entries map<int,double>")
    d = sparse_table_to_dense(sparse, k)
    assert sorted(map(tuple, d.collect())) == sorted(map(tuple,
                                                         dense.collect()))
    a = sorted(map(tuple, mplp_table_labels(un, dense, k, 8).collect()))
    b = sorted(map(tuple, mplp_sparse_table_labels(un, sparse, k, 8)
                   .collect()))
    assert a == b


def test_sparse_table_missing_entries_forbid_assignments(spark):
    """Missing sparse entries read as APPROX_LOG_ZERO = -1e6
    (table_base.hpp:57-60) — a factor listing only the unequal
    assignments is a hard XOR constraint the MAP must respect even
    when the unaries prefer agreeing states."""
    from graphlab_spark.algos.mplp import mplp_sparse_table_labels

    k = 2
    # both vertices strongly prefer state 0...
    un = spark.createDataFrame(
        [(0, [2.0, 0.0]), (1, [1.5, 0.0])], "id long, theta array<double>")
    # ...but only (0,1) and (1,0) are admissible
    xor = spark.createDataFrame(
        [(0, 1, {1: 0.0, 2: 0.0})], "src long, dst long, entries map<int,double>")
    got = {r["id"]: r["label"]
           for r in mplp_sparse_table_labels(un, xor, k, 12).collect()}
    # brute force with -1e6 for missing entries: best is (0 -> 0, 1 -> 1)
    assert got == {0: 0, 1: 1}, got


def test_sparse_table_feeds_gibbs(spark):
    """One densify feeds sampling too: chromatic Gibbs over a sparse
    XOR factor never visits a forbidden configuration."""
    from graphlab_spark.algos.gibbs import chromatic_gibbs
    from graphlab_spark.algos.mplp import sparse_table_to_dense

    un = spark.createDataFrame(
        [(0, [0.5, 0.0]), (1, [0.5, 0.0])], "id long, theta array<double>")
    xor = spark.createDataFrame(
        [(0, 1, {1: 0.0, 2: 0.0})], "src long, dst long, entries map<int,double>")
    factors = sparse_table_to_dense(xor, 2)
    res = chromatic_gibbs(un, factors, 2, sweeps=6, seed=13)
    asg = {r["id"]: r["asg"] for r in res.state.collect()}
    assert asg[0] != asg[1], asg
