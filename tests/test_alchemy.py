"""Alchemy factor-graph IO (factorized_model.cpp load/save_alchemy)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlab_spark.sources.alchemy import (
    load_alchemy, make_denoise_alchemy, save_alchemy)


def test_load_alchemy_hand_file(spark, tmp_path):
    """Format semantics: default arity 2, explicit arity, value order
    first-var-fastest, '///' weight suffix ignored, unary merge."""
    f = tmp_path / "m.alchemy"
    f.write_text(
        "variables:\n"
        "a\n"                      # arity defaults to 2
        "b\t3\n"
        "factors:\n"
        "a // 0.5 -0.5\n"
        "a // 0.25 0.25\n"         # second unary on a: log tables add
        "b // 1.0 2.0 3.0\n"
        # pairwise a/b: file order j = x_a + x_b*2 (a varies fastest)
        "a / b // 10 11 20 21 30 31 /// 1.0\n")
    variables, unary, pairwise = load_alchemy(spark, str(f))
    vs = {r["name"]: (r["id"], r["arity"]) for r in variables.collect()}
    assert vs == {"a": (0, 2), "b": (1, 3)}
    th = {r["id"]: list(r["theta"]) for r in unary.collect()}
    assert th[0] == pytest.approx([0.75, -0.25])
    assert th[1] == [1.0, 2.0, 3.0]
    pw = pairwise.collect()
    assert len(pw) == 1 and pw[0]["src"] == 0 and pw[0]["dst"] == 1
    # row-major table[x_a*3 + x_b]: (0,0)=10 (0,1)=20 (0,2)=30
    #                               (1,0)=11 (1,1)=21 (1,2)=31
    assert list(pw[0]["table"]) == [10.0, 20.0, 30.0, 11.0, 21.0, 31.0]


def test_load_alchemy_errors(spark, tmp_path):
    bad1 = tmp_path / "noheader.alchemy"
    bad1.write_text("factors:\n")
    with pytest.raises(ValueError, match="variables:"):
        load_alchemy(spark, str(bad1))
    bad2 = tmp_path / "nofactors.alchemy"
    bad2.write_text("variables:\na\n")
    with pytest.raises(ValueError, match="factors"):
        load_alchemy(spark, str(bad2))
    bad3 = tmp_path / "triple.alchemy"
    bad3.write_text("variables:\na\nb\nc\nfactors:\n"
                    "a / b / c // 0 0 0 0 0 0 0 0\n")
    with pytest.raises(ValueError, match="unary . pairwise"):
        load_alchemy(spark, str(bad3))
    bad4 = tmp_path / "unknown.alchemy"
    bad4.write_text("variables:\na\nfactors:\na / zz // 0 0 0 0\n")
    with pytest.raises(ValueError, match="unknown variable"):
        load_alchemy(spark, str(bad4))
    bad5 = tmp_path / "shortvals.alchemy"
    bad5.write_text("variables:\na\nb\nfactors:\na / b // 0 0 0\n")
    with pytest.raises(ValueError, match="values"):
        load_alchemy(spark, str(bad5))
    # unknown variable in the FIRST slot must raise too (a silent
    # inner-join drop here once corrupted the model with no error)
    bad6 = tmp_path / "unknown1.alchemy"
    bad6.write_text("variables:\na\nfactors:\nzz / a // 0 0 0 0\n")
    with pytest.raises(ValueError, match="unknown variable 'zz'"):
        load_alchemy(spark, str(bad6))
    bad7 = tmp_path / "unknown_unary.alchemy"
    bad7.write_text("variables:\na\nfactors:\nzz // 0 0\n")
    with pytest.raises(ValueError, match="unknown variable 'zz'"):
        load_alchemy(spark, str(bad7))
    # duplicate variable declarations would fan the name joins out
    bad8 = tmp_path / "dupvar.alchemy"
    bad8.write_text("variables:\na\na\nfactors:\na // 0 1\n")
    with pytest.raises(ValueError, match="declared more than once"):
        load_alchemy(spark, str(bad8))
    # malformed arity token must raise, not silently default to 2
    bad9 = tmp_path / "badarity.alchemy"
    bad9.write_text("variables:\nb\t3x\nfactors:\nb // 0 1 2\n")
    with pytest.raises(ValueError, match="unparseable arity"):
        load_alchemy(spark, str(bad9))


def test_load_alchemy_blank_lines_keep_ids_contiguous(spark, tmp_path):
    """A blank line inside the variables section must not shift or gap
    the file-order ids (the reference's unique_var_id++ advances only
    on parsed lines)."""
    f = tmp_path / "blank.alchemy"
    f.write_text(
        "variables:\n"
        "a\n"
        "\n"
        "b\n"
        "factors:\n"
        "a / b // 0 -1 -1 0\n")
    variables, _, pairwise = load_alchemy(spark, str(f))
    vs = {r["name"]: r["id"] for r in variables.collect()}
    assert vs == {"a": 0, "b": 1}
    pw = pairwise.collect()
    assert (pw[0]["src"], pw[0]["dst"]) == (0, 1)


def test_alchemy_roundtrip_and_gibbs_end_to_end(spark, tmp_path):
    """The full reference workflow: make_denoise_alchemy writes the
    synthetic-image model, load_alchemy reads it back, and the
    chromatic sampler over the loaded model is BIT-IDENTICAL to the
    sampler over the directly-constructed model."""
    from graphlab_spark.algos.gibbs import chromatic_gibbs
    from graphlab_spark.sources.parsers import load_synthetic_image

    path = str(tmp_path / "denoise.alchemy")
    k, er, lam = 3, 0.45, 0.75
    make_denoise_alchemy(spark, path, rows=6, cols=5, ncolors=k,
                         error_rate=er, lam=lam, seed=11)
    variables, unary_l, pairwise_l = load_alchemy(spark, path)
    assert variables.count() == 30
    # loaded ids are file-order (0..29); map back to pixel ids by name
    v, e = load_synthetic_image(spark, rows=6, cols=5, ncolors=k,
                                error_rate=er, seed=11)
    name = F.concat(F.lit("px_"), F.col("r"), F.lit("_"), F.col("c"))
    px = v.select(F.col("id").alias("pxid"), name.alias("name"))
    idmap = variables.join(px, "name").select("id", "pxid")
    # direct model in loaded-id space
    unary_d = (
        v.select(F.col("id").alias("pxid"),
                 F.expr("transform(prior, p -> ln(p))").alias("theta_d"))
        .join(idmap, "pxid").select("id", "theta_d"))
    both = unary_l.join(unary_d, "id")
    assert both.count() == 30
    mism = both.filter(F.expr(
        "exists(zip_with(theta, theta_d, (a, b) -> abs(a - b) > 1e-12),"
        " x -> x)")).count()
    assert mism == 0
    # gibbs over loaded model == gibbs over direct model (same ids)
    potts = [0.0 if x == y else -lam for x in range(k) for y in range(k)]
    pairwise_d = (
        e.select(F.col("src").alias("pxsrc"), F.col("dst").alias("pxdst"))
        .join(idmap.select(F.col("pxid").alias("pxsrc"),
                           F.col("id").alias("src")), "pxsrc")
        .join(idmap.select(F.col("pxid").alias("pxdst"),
                           F.col("id").alias("dst")), "pxdst")
        .select("src", "dst",
                F.array(*[F.lit(p) for p in potts]).alias("table")))
    ra = chromatic_gibbs(unary_l, pairwise_l, k, sweeps=2, seed=5)
    rb = chromatic_gibbs(unary_d.withColumnRenamed("theta_d", "theta"),
                         pairwise_d, k, sweeps=2, seed=5)
    a = sorted((r["id"], r["asg"]) for r in ra.state.collect())
    b = sorted((r["id"], r["asg"]) for r in rb.state.collect())
    assert a == b


def test_save_alchemy_preserves_exact_doubles(spark, tmp_path):
    """save->load round-trips bit-exact doubles (repr serialization)."""
    variables = spark.createDataFrame(
        [(0, "x", 2), (1, "y", 2)], "id long, name string, arity int")
    th = [math.log(0.3), -1.0 / 3.0]
    unary = spark.createDataFrame([(0, th)], "id long, theta array<double>")
    tbl = [0.1, -0.2, 0.3, 1e-17]
    pairwise = spark.createDataFrame(
        [(0, 1, tbl)], "src long, dst long, table array<double>")
    p = str(tmp_path / "rt.alchemy")
    save_alchemy(variables, unary, pairwise, p)
    v2, u2, f2 = load_alchemy(spark, p)
    assert sorted(map(tuple, v2.collect())) == [(0, "x", 2), (1, "y", 2)]
    assert list(u2.collect()[0]["theta"]) == th
    assert list(f2.collect()[0]["table"]) == tbl


def test_load_alchemy_factor_graph_hand_file(spark, tmp_path):
    """General-arity loader: fids continue the variable numbering,
    tables load VERBATIM (file and engine are both first-var-fastest),
    priors are zeros, arity >= 3 accepted."""
    from graphlab_spark.sources.alchemy import load_alchemy_factor_graph

    f = tmp_path / "nary.alchemy"
    f.write_text(
        "variables:\n"
        "a\n"                      # arity defaults to 2
        "b\t3\n"
        "c\n"
        "factors:\n"
        "b // 1.0 2.0 3.0\n"
        "a / b // 10 11 20 21 30 31 /// 1.0\n"
        # arity-3 factor over (a, b, c): 2*3*2 = 12 values
        "a / b / c // 0 1 2 3 4 5 6 7 8 9 10 11\n")
    variables, factors = load_alchemy_factor_graph(spark, str(f))
    vs = {r["id"]: (r["card"], list(r["prior"])) for r in variables.collect()}
    assert vs == {0: (2, [0.0, 0.0]), 1: (3, [0.0, 0.0, 0.0]),
                  2: (2, [0.0, 0.0])}
    fs = {r["fid"]: r for r in factors.collect()}
    # 3 variables -> fids 3, 4, 5 in file order (_unique_var_id++)
    assert sorted(fs) == [3, 4, 5]
    assert (list(fs[3]["vids"]), list(fs[3]["cards"]),
            list(fs[3]["table"])) == ([1], [3], [1.0, 2.0, 3.0])
    # pairwise table verbatim in FILE order (a fastest), the '///'
    # weight suffix dropped
    assert (list(fs[4]["vids"]), list(fs[4]["cards"])) == ([0, 1], [2, 3])
    assert list(fs[4]["table"]) == [10.0, 11.0, 20.0, 21.0, 30.0, 31.0]
    assert (list(fs[5]["vids"]), list(fs[5]["cards"])) == \
        ([0, 1, 2], [2, 3, 2])
    assert list(fs[5]["table"]) == [float(x) for x in range(12)]


def test_load_alchemy_factor_graph_errors(spark, tmp_path):
    from graphlab_spark.sources.alchemy import load_alchemy_factor_graph

    bad1 = tmp_path / "unknown.alchemy"
    bad1.write_text("variables:\na\nfactors:\na / z // 1 2 3 4\n")
    with pytest.raises(ValueError, match="unknown variable"):
        load_alchemy_factor_graph(spark, str(bad1))
    bad2 = tmp_path / "dup.alchemy"
    bad2.write_text("variables:\na\nfactors:\na / a // 1 2 3 4\n")
    with pytest.raises(ValueError, match="repeats a variable"):
        load_alchemy_factor_graph(spark, str(bad2))
    bad3 = tmp_path / "short.alchemy"
    bad3.write_text("variables:\na\nb\nfactors:\na / b // 1 2 3\n")
    with pytest.raises(ValueError, match="arity-product"):
        load_alchemy_factor_graph(spark, str(bad3))


def test_alchemy_factor_graph_bp_end_to_end(spark, tmp_path):
    """File -> N-ary factor graph -> max-sum BP: the MAP of a small
    tree model written through the alchemy format matches brute-force
    enumeration (the factor-graph twin of the pairwise Gibbs
    end-to-end)."""
    from graphlab_spark.algos.factor_bp import factor_graph_bp
    from graphlab_spark.sources.alchemy import load_alchemy_factor_graph

    f = tmp_path / "tree.alchemy"
    # x,y binary; z ternary.  One arity-3 factor + one unary, values
    # chosen for a unique MAP at (x,y,z) = (1,0,2):
    # file order j = x + y*2 + z*4
    tbl = [0.1, 0.9, 0.3, 0.2,    # z=0
           0.0, 0.4, 0.1, 0.3,    # z=1
           0.2, 1.6, 0.5, 0.2]    # z=2
    f.write_text(
        "variables:\nx\ny\nz\t3\nfactors:\n"
        "z // 0.3 0.2 0.1\n"
        "x / y / z // " + " ".join(str(v) for v in tbl) + "\n")
    variables, factors = load_alchemy_factor_graph(spark, str(f))
    res = factor_graph_bp(variables, factors, iterations=20, bound=1e-12)
    assert res.converged
    got = {r["id"]: r["label"] for r in res.beliefs.collect()}
    # brute force over 2*2*3 assignments
    best, arg = -1e9, None
    for x in range(2):
        for y in range(2):
            for z in range(3):
                s = [0.3, 0.2, 0.1][z] + tbl[x + y * 2 + z * 4]
                if s > best:
                    best, arg = s, (x, y, z)
    assert (got[0], got[1], got[2]) == arg


def test_load_alchemy_bad_value_token(spark, tmp_path):
    """A malformed table value must raise the loader's per-line error,
    not a context-free ANSI cast failure (or a silent NULL with ANSI
    off that would NULL beliefs downstream)."""
    bad = tmp_path / "badval.alchemy"
    bad.write_text("variables:\na\nfactors:\na // 0.5 x.5\n")
    with pytest.raises(ValueError, match="unparseable table value"):
        load_alchemy(spark, str(bad))
