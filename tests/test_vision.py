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


def test_decode_pixels_netpbm_and_policy(spark):
    import numpy as np
    arr = (np.arange(32).reshape(4, 8) * 3 % 256).astype(np.uint8)
    from graphlab_spark.functions.multimodal import encode_pgm
    assert np.array_equal(V.decode_pixels(encode_pgm(arr)), arr)
    with pytest.raises(ValueError):
        V.decode_pixels(b"\x89PNG\r\n")  # compressed formats stay out


def test_warp_seam_composite_reconstructs_chain(spark):
    """Three 16-aligned overlapping windows of one byte string must
    recompose to the original: A=t[0:48], B=t[16:64], C=t[32:80] chain
    through pairwise 2-patch overlaps; warp places them at 0/16/32 in
    root coordinates and the composite canvas equals t exactly."""
    t = "".join(chr(65 + (i * 11) % 26) for i in range(80))
    imgs = spark.createDataFrame(
        [(0, bytearray(t[0:48], "ascii")),
         (1, bytearray(t[16:64], "ascii")),
         (2, bytearray(t[32:80], "ascii"))],
        "img_id long, payload binary")
    cams = V.camera_offsets(
        V.estimate_pair_transforms(V.content_features(imgs)))
    got = {r["id"]: (r["pano"], r["offset"]) for r in cams.collect()}
    assert got == {0: (0, 0.0), 1: (0, -1.0), 2: (0, -2.0)}

    warped = V.warp_images(imgs, cams)
    rows = {r["img_id"]: (r["pos0"], r["width"]) for r in warped.collect()}
    assert rows == {0: (0, 48), 1: (16, 48), 2: (32, 48)}

    seams = {r["img_id"]: r["start"]
             for r in V.find_seams(warped).collect()}
    # B overlaps [16,48): seam at (16+48)//2 = 32; C overlaps [32,64):
    # seam at (32+64)//2 = 48
    assert seams == {0: 0, 1: 32, 2: 48}

    comp = V.composite_images(imgs, cams).collect()
    assert len(comp) == 1
    r = comp[0]
    assert (r["pano"], r["n_images"], r["width"]) == (0, 3, 80)
    assert bytes(r["payload"]) == t.encode("ascii")


def test_composite_golden_on_planted_copy_corpus(spark):
    """images_with_shifted_copies plants prefix-truncated copies: each
    pure (original, copy) panorama must composite back to the ORIGINAL
    document bytes (copy content is a subset at offset +16)."""
    texts = {d: "".join(chr(97 + (d * 13 + i * 7) % 26) for i in range(70 + d))
             for d in range(4)}
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string")
    imgs = V.images_with_shifted_copies(docs, copy_every=1)
    cams = V.camera_offsets(
        V.estimate_pair_transforms(V.content_features(imgs)))
    comp = V.composite_images(imgs, cams)
    for r in comp.collect():
        members = {x["id"] for x in
                   cams.filter(F.col("pano") == r["pano"]).collect()}
        if len(members) == 2 and any(m < 0 for m in members):
            d = max(members)
            assert bytes(r["payload"]) == texts[d].encode("ascii"), d


def test_match_graph_scale_candidates_linear(spark):
    """1e5-image corpus: the visual-word matcher must stay linear under
    the df-cap and recover every planted overlap group exactly.

    Construction: 25k groups of 4 images.  Each image's payload is 8
    chunks of 16 bytes; the qdesc probe offsets (0/5/10/15) of chunk 0
    carry a GLOBAL constant (a stop-feature seen by all 100k images —
    must be dropped by the df cap, never joined), chunks 1..7 encode
    the group id (shared by exactly the 4 group members)."""
    n_groups, gsize = 25_000, 4
    imgs = spark.range(n_groups * gsize).select(
        F.col("id").alias("img_id"), (F.col("id") / gsize).cast("long").alias("g"))

    def block(k):
        if k == 0:   # global stop-feature chunk
            return F.lit("S" + "aaaa" + "T" + "aaaa" + "O" + "aaaa" + "P")
        p0 = F.char(F.lit(32) + F.pmod(F.col("g"), F.lit(90)))
        p5 = F.char(F.lit(32) + F.pmod(F.col("g") / 90, F.lit(90)).cast("long"))
        p10 = F.char(F.lit(32) + F.pmod(F.col("g") / 8100, F.lit(90)).cast("long"))
        p15 = F.char(F.lit(32) + F.lit(k * 10))
        return F.concat(p0, F.lit("aaaa"), p5, F.lit("aaaa"),
                        p10, F.lit("aaaa"), p15)

    payload = F.encode(F.concat(*[block(k) for k in range(8)]), "UTF-8")
    images = imgs.select("img_id", payload.alias("payload")).persist()

    feats = V.compute_features(images).persist()
    assert feats.count() == n_groups * gsize * 8  # every keypoint extracted

    # the stop-feature must be cut: its qdesc has df = 100k > DF_CAP,
    # and after the cut every surviving descriptor's df is exactly the
    # group size — the candidate join volume is sum(df^2) = linear.
    live_df = (feats.groupBy("qdesc")
               .agg(F.countDistinct("img_id").alias("df"))
               .filter(F.col("df") <= V.DF_CAP))
    assert live_df.agg(F.max("df")).first()[0] == gsize

    matches = V.match_features(feats).persist()
    # exactly C(4,2) pairs per group with all 7 group chunks matching
    assert matches.count() == n_groups * 6
    assert matches.filter(F.col("matches") != 7).count() == 0
    bad = matches.filter(
        (F.col("img_a") / gsize).cast("long")
        != (F.col("img_b") / gsize).cast("long")).count()
    assert bad == 0  # no cross-group pair survives

    # panorama grouping stays exact at this scale: pano = min of group
    panos = V.panorama_groups(matches)
    wrong = panos.filter(
        F.col("pano") != (F.col("id") / gsize).cast("long") * gsize).count()
    assert wrong == 0 and panos.count() == n_groups * gsize
    images.unpersist(); feats.unpersist(); matches.unpersist()


# -- camera estimation (round 4: stitch_main.cpp:214+ analog) ---------------

def test_pair_transform_recovers_planted_shift(spark):
    """A prefix-truncated copy sits one keypoint left of its original:
    the estimator must recover shift=+1 (copy is img_a — negative id),
    all matches inlying, with OpenCV's confidence formula."""
    from graphlab_spark.functions import vision as V
    text = "".join(chr(65 + (i * 7) % 26) for i in range(16 * 9))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    imgs = V.images_with_shifted_copies(docs, copy_every=1)
    t = V.estimate_pair_transforms(V.content_features(imgs)).collect()
    assert len(t) == 1
    r = t[0]
    assert (r["img_a"], r["img_b"]) == (-1, 0)
    assert r["shift"] == 1.0
    assert r["n_inliers"] == r["n_matches"]
    n = r["n_matches"]
    assert r["confidence"] == round(n / (8 + 0.3 * n), 6)


def test_camera_offsets_chain(spark):
    """Transforms forming a 3-image chain: offsets accumulate from the
    component root (min img id) along the BFS; a disconnected pair gets
    its own root."""
    from graphlab_spark.functions.vision import camera_offsets
    t = spark.createDataFrame(
        [(1, 2, 3, 1.0, 3, 0.5), (2, 3, 3, 2.0, 3, 0.5),
         (10, 11, 2, -4.0, 2, 0.4)],
        "img_a long, img_b long, n_matches long, shift double, "
        "n_inliers long, confidence double")
    got = {r["id"]: (r["pano"], r["offset"])
           for r in camera_offsets(t).collect()}
    assert got == {1: (1, 0.0), 2: (1, 1.0), 3: (1, 3.0),
                   10: (10, 0.0), 11: (10, -4.0)}


def test_camera_offsets_truncation_guard(spark):
    from graphlab_spark.functions.vision import camera_offsets
    t = spark.createDataFrame(
        [(1, 2, 2, 1.0, 2, 0.4), (2, 3, 2, 1.0, 2, 0.4)],
        "img_a long, img_b long, n_matches long, shift double, "
        "n_inliers long, confidence double")
    with pytest.raises(RuntimeError, match="still growing"):
        camera_offsets(t, max_supersteps=1)


def test_content_features_position_insensitive(spark):
    """The same patch content at different keypoint indices hashes
    identically (what compute_features deliberately does NOT do)."""
    from graphlab_spark.functions import vision as V
    text = "".join(chr(65 + (i * 7) % 26) for i in range(16 * 3))
    docs = spark.createDataFrame(
        [(0, text), (1, text[16:])], "doc_id long, text string")
    imgs = docs.select(F.col("doc_id").alias("img_id"),
                       F.encode("text", "UTF-8").alias("payload"))
    feats = V.content_features(imgs).collect()
    by_img = {}
    for r in feats:
        by_img.setdefault(r["img_id"], {})[r["kp"]] = r["qdesc"]
    # img 1's patch k holds img 0's patch k+1 content -> same qdesc
    assert by_img[1][0] == by_img[0][1]
    assert by_img[1][1] == by_img[0][2]
