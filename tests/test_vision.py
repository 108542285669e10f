"""Computer-vision stitch match graph (functions/vision.py)."""

import pytest
from pyspark.sql import functions as F

from graphlab_spark.functions import vision as V


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_images_plants_truncated_copies(spark):
    docs = _docs(spark, [(0, "a" * 40), (1, "b" * 40), (5, "c" * 20)])
    imgs = V.images_from_documents(docs, copy_every=5)
    got = {r["img_id"]: r["payload"] for r in imgs.collect()}
    # doc 0 long enough for a copy; doc 5 too short (< 2 chunks); doc 1 not selected
    assert set(got) == {0, 1, 5, -1}     # copy of doc 0 at -(0+1)
    assert got[-1] == b"a" * 24  # 40 - 16


def test_features_arrow_equals_expression(spark):
    docs = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog again and again!"),
        (1, "short"),
        (2, "x" * 200),
    ])
    imgs = V.images_from_documents(docs)
    fe = V.compute_features(imgs)
    fa = V.compute_features_arrow(imgs)
    assert fe.exceptAll(fa).count() == 0 and fa.exceptAll(fe).count() == 0
    # doc 1 ("short") has no full 16-byte patch -> zero keypoints
    assert fe.filter(F.col("img_id") == 1).count() == 0
    # doc 2 (200 bytes) caps at K_KEYPOINTS
    assert fe.filter(F.col("img_id") == 2).count() == V.K_KEYPOINTS


def test_match_features_pairs_planted_copy(spark):
    docs = _docs(spark, [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu!"),       # 68 chars: copy keeps 3 full patches
        (1, "unrelated words entirely different text with nothing shared "
            "in any spot")])
    imgs = V.images_from_documents(docs, copy_every=5)  # copy of doc 0
    m = V.match_features(V.compute_features(imgs))
    rows = {(r["img_a"], r["img_b"]): r["matches"] for r in m.collect()}
    assert (-1, 0) in rows               # copy pairs with its original
    assert all(a == -1 and b == 0 for a, b in rows)  # and nothing else


def test_match_features_df_cap_drops_stop_features(spark):
    # 40 images sharing one identical payload: every keypoint descriptor
    # has document frequency 40 > df_cap -> no matches survive
    docs = _docs(spark, [(i, "common stop feature text padded long!")
                         for i in range(40)])
    imgs = docs.select(F.col("doc_id").alias("img_id"),
                       F.encode("text", "UTF-8").alias("payload"))
    feats = V.compute_features(imgs)
    assert V.match_features(feats, df_cap=32).count() == 0
    assert V.match_features(feats, df_cap=64).count() == 40 * 39 // 2


def test_panorama_groups_connected_components(spark):
    m = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 4), (10, 11, 6)],
        "img_a long, img_b long, matches long")
    got = {r["id"]: r["pano"] for r in V.panorama_groups(m).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_geometry_stubs_raise(spark):
    for fn, args in ((V.decode_pixels, (b"x",)),
                     (V.warp_images, (None, None)),
                     (V.find_seams, (None, None)),
                     (V.composite_images, (None,))):
        with pytest.raises(NotImplementedError):
            fn(*args)
