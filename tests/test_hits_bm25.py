"""HITS and BM25: value parity against independent NumPy / pure-Python
computations on the micro fixtures (the DuckDB twins are exercised by
scripts/oracle_dev.py and the driver)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphlab_spark.algos.hits import hits
from graphlab_spark.functions.text import (
    BM25_B,
    BM25_K1,
    bm25_scores,
)

from conftest import FIXTURE_EDGES


def _numpy_hits(edges, supersteps):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[s], idx[d]] += 1.0  # multigraph: parallel edges accumulate
    hub = np.ones(n)
    for _ in range(supersteps):
        auth = A.T @ hub
        hub = A @ auth
    hub = hub / np.linalg.norm(hub) if np.linalg.norm(hub) else hub
    auth = auth / np.linalg.norm(auth) if np.linalg.norm(auth) else auth
    return {v: (hub[idx[v]], auth[idx[v]]) for v in verts}


def test_hits_fixture_matches_numpy(spark, fixture_graph):
    res = hits(fixture_graph, supersteps=3, resume=False)
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    want = _numpy_hits(FIXTURE_EDGES, supersteps=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_hits_handles_parallel_edges(spark):
    from graphlab_spark import EdgeGraph
    edges = [(1, 2), (1, 2), (3, 2)]  # duplicate edge doubles 1's weight
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    got = {r["id"]: (r["hub"], r["auth"])
           for r in hits(g, supersteps=2, resume=False).state.collect()}
    want = _numpy_hits(edges, supersteps=2)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)
    g.unpersist()


DOCS = [
    (1, "spark merge spark window"),
    (2, "the slow table scan"),
    (3, "window window window merge"),
    (4, "spark"),
]


def _python_bm25(docs, terms, k1=BM25_K1, b=BM25_B):
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s:
            out[d] = s
    return out


def test_bm25_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    terms = ["spark", "window", "merge"]
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, terms).collect()}
    want = _python_bm25(DOCS, terms)
    assert set(got) == set(want)  # doc 2 matches nothing -> absent
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_bm25_rarer_term_outranks_common_at_equal_tf(spark):
    rows = [(i, "filler words here") for i in range(10)]
    rows += [(100, "rare common"), (101, "common"), (102, "common")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, ["rare", "common"]).collect()}
    # doc 100 has both terms; its score must exceed the common-only docs
    assert got[100] > got[101] == got[102]
