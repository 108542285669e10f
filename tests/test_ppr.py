"""Personalized PageRank: fixpoint parity with a NumPy dense iteration
and seed-locality sanity on the micro fixture."""

import numpy as np
import pytest

from graphlab_spark.algos.pagerank import personalized_pagerank

from conftest import FIXTURE_EDGES


def _numpy_ppr(edges, seeds, tol=1e-10, damping=0.85, base=0.15):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))  # W[j, i] = cw of edge i->j
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    for s, d in edges:
        W[idx[d], idx[s]] += 1.0 / outd[s]
    b = np.array([base if v in seeds else 0.0 for v in verts])
    r = b.copy()
    for _ in range(500):
        nr = b + damping * (W @ r)
        if np.max(np.abs(nr - r)) <= tol:
            r = nr
            break
        r = nr
    return {v: r[idx[v]] for v in verts}


def test_ppr_matches_numpy_fixpoint(spark, fixture_graph):
    res = personalized_pagerank(
        fixture_graph, seeds=[1], tol=1e-10, resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = _numpy_ppr(FIXTURE_EDGES, {1})
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-8)
    assert res.converged


def test_ppr_mass_concentrates_near_seed(spark, fixture_graph):
    # Seeding at 1 gives 1 itself the full teleport mass; vertex 4
    # doesn't exist and 5/0 only receive flow.  Unreached vertices
    # (2, 3 have no in-edges) keep rank 0.
    res = personalized_pagerank(fixture_graph, seeds=[1], resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert got[1] > got[0] > 0
    assert got[5] > 0
    assert got[2] == 0.0 and got[3] == 0.0


def test_ppr_requires_seeds(spark, fixture_graph):
    with pytest.raises(ValueError):
        personalized_pagerank(fixture_graph, seeds=[], resume=False)
