"""Computer-vision toolkit analog — panorama stitching match graph.

Reference: ``/root/reference/toolkits/computer_vision/stitch_main.cpp``
(the toolkit's one GraphLab computation; ``grabcut.cpp`` in the same
directory is an interactive OpenCV GUI demo with no vertex program and
is out of scope).  The stitch pipeline is a chain of primitives this
engine already ships:

1. ``graph_feat.transform_vertices(compute_features)``
   (``stitch_main.cpp:137``) — per-image SURF feature extraction;
2. ``graph_feat.transform_edges(match_features)`` (``:141``) — pairwise
   descriptor matching on candidate image pairs;
3. ``map_reduce_vertices/edges(compile_*)`` (``:148,162``) — assemble
   the match graph and keep the connected component to stitch;
4. camera estimation / ``warp_images`` / ``find_seams`` /
   ``composite_images`` (``:302-313``) — OpenCV geometry.

Spark mapping: images are binary-payload rows (the multimodal column
convention, ``functions/multimodal.py``); feature extraction runs as an
Arrow ``mapInPandas`` batch kernel whose real decode step is stubbed
(no codec libraries in this container) while a deterministic
chunk-hash stand-in extractor IS real and replayed by a pure-expression
twin, so the whole match-graph phase is value-oracled.  Matching is a
quantized-descriptor equi-join — the visual-words / LSH form of
descriptor matching (bucket join on the quantized descriptor, never
all-pairs; a document-frequency cap drops stop-features the way image
retrieval drops stop-words), which is the matcher shape that survives
100 TB.  Panorama grouping is the engine's own hash-min connected
components over the match edges.  The OpenCV geometry tail
(``warp_images``/``find_seams``/``composite_images``) raises
``NotImplementedError`` with the same documented-stub policy as the
media codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.portable import FOLD, lcg_hash, sql_lcg_hash

K_KEYPOINTS = 8      # keypoints per image (16-byte stride over the payload)
CHUNK = 16           # bytes per keypoint patch
DF_CAP = 32          # drop descriptors seen in more images (stop-features)
MIN_MATCHES = 2      # match_features confidence floor

FEATURES_SCHEMA = "img_id long, kp int, qdesc long"


def images_from_documents(docs: DataFrame, copy_every: int = 5) -> DataFrame:
    """Synthetic image table from the documents corpus: payload = the
    UTF-8 text bytes (stand-in pixels, as ``multimodal.as_media_table``
    does), plus a planted overlapping copy — payload truncated by one
    16-byte patch — for every ``copy_every``-th doc, at img_id
    ``-(doc_id + 1)`` (doc ids are non-negative, so the copy id space
    never collides with a real image at any corpus size).
    Overlapping views are what a panorama input set looks like; organic
    near-identical byte payloads don't exist in the corpus."""
    base = docs.select(
        F.col("doc_id").alias("img_id"),
        F.encode("text", "UTF-8").alias("payload"))
    # copies live at -(doc_id+1): doc ids are non-negative, so the copy
    # id space can never collide with a real image at any corpus size
    copies = (
        docs.filter((F.col("doc_id") % copy_every == 0)
                    & (F.length("text") >= 2 * CHUNK))
        .select(
            (-(F.col("doc_id") + 1)).alias("img_id"),
            F.encode(F.expr(f"substring(text, 1, length(text) - {CHUNK})"),
                     "UTF-8").alias("payload"))
    )
    return base.unionByName(copies)


def _qdesc_expr(payload, kp: int):
    """Quantized descriptor of keypoint ``kp``: the patch's 4 stride
    bytes (offsets 0/5/10/15 inside the 16-byte window) folded mod 2^31
    per step (ANSI-BIGINT-safe on any engine) and LCG-mixed —
    position-sensitive, so equality is the quantized visual-word match.
    NULL when the payload has no full patch there.  The corpus is
    ASCII, so byte access is ``ascii(substring(decoded, pos, 1))`` —
    identical to the Arrow kernel's raw-byte indexing."""
    text = F.decode(payload, "UTF-8")
    probes = [
        F.when(F.octet_length(payload) >= (kp + 1) * CHUNK,
               F.ascii(F.substring(text, kp * CHUNK + off + 1, 1))
               .cast("long"))
        for off in (0, 5, 10, 15)
    ]
    folded = F.lit(kp).cast("long")
    for p in probes:
        folded = (folded * F.lit(FOLD) + p) % F.lit(2_147_483_648)
    return lcg_hash(folded)


def compute_features(images: DataFrame) -> DataFrame:
    """``transform_vertices(compute_features)`` (``stitch_main.cpp:137``)
    as pure column expressions: up to ``K_KEYPOINTS`` (img_id, kp,
    qdesc) rows per image.  A real extractor would decode pixels and
    run SURF here; see :func:`compute_features_arrow` for the
    batch-kernel seam where that code would live."""
    kps = F.array(*[
        F.struct(F.lit(k).alias("kp"),
                 _qdesc_expr(F.col("payload"), k).alias("qdesc"))
        for k in range(K_KEYPOINTS)
    ])
    # ASCII-only guard: the expression path reads characters while the
    # Arrow kernel reads bytes — only payloads where the two coincide
    # (octet count == char count) produce features, identically on both
    # paths, so a non-ASCII payload can never silently diverge.
    ascii_only = (F.octet_length("payload")
                  == F.length(F.decode("payload", "UTF-8")))
    return (
        images.filter(ascii_only)
        .select("img_id", F.explode(kps).alias("f"))
        .select("img_id", F.col("f.kp").alias("kp"),
                F.col("f.qdesc").alias("qdesc"))
        .filter(F.col("qdesc").isNotNull())
    )


def compute_features_arrow(images: DataFrame) -> DataFrame:
    """The same extractor as an Arrow ``mapInPandas`` kernel — the
    batch shape, schema, and partitioning a real SURF/ORB extractor
    would use (decode per batch, emit long-form keypoints).  Kept in
    exact agreement with :func:`compute_features` (tested), so the
    expression path can serve as its oracle."""
    M = 2_147_483_648
    A, C = 1_103_515_245, 12_345

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"img_id": [], "kp": [], "qdesc": []}
            for img_id, payload in zip(pdf["img_id"], pdf["payload"]):
                b = payload or b""
                if any(c >= 128 for c in b):   # ASCII guard, as above
                    continue
                for k in range(K_KEYPOINTS):
                    if len(b) < (k + 1) * CHUNK:
                        continue
                    folded = k
                    for off in (0, 5, 10, 15):
                        folded = (folded * FOLD + b[k * CHUNK + off]) % M
                    x = (folded * A + C) % M
                    out["img_id"].append(img_id)
                    out["kp"].append(k)
                    out["qdesc"].append((x * A + C) % M)
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=FEATURES_SCHEMA)


def decode_pixels(payload: bytes) -> object:
    """STUB: real pixel decode requires PIL/opencv (not installed)."""
    raise NotImplementedError("image codecs unavailable in this environment")


def match_features(features: DataFrame, df_cap: int = DF_CAP,
                   min_matches: int = MIN_MATCHES) -> DataFrame:
    """``transform_edges(match_features)`` (``stitch_main.cpp:141``) in
    its scalable form: instead of scoring a dense pair list, bucket-join
    keypoints on the quantized descriptor (visual-words matching) and
    count co-occurrences per image pair.  Descriptors present in more
    than ``df_cap`` images are dropped first — the stop-feature cut
    that keeps the bucket join linear (same role as the hot-shingle cap
    in ``dedup.jaccard_pairs``).  Returns (img_a, img_b, matches) with
    img_a < img_b and ``matches >= min_matches``."""
    live = (
        features.groupBy("qdesc")
        .agg(F.countDistinct("img_id").alias("__df"))
        .filter(F.col("__df") <= df_cap)
        .select("qdesc")
    )
    kept = features.join(live, "qdesc")
    a = kept.select(F.col("qdesc"), F.col("img_id").alias("img_a"))
    b = kept.select(F.col("qdesc"), F.col("img_id").alias("img_b"))
    return (
        a.join(b, "qdesc")
        .filter(F.col("img_a") < F.col("img_b"))
        .groupBy("img_a", "img_b")
        .agg(F.count("*").alias("matches"))
        .filter(F.col("matches") >= min_matches)
    )


def panorama_groups(matches: DataFrame) -> DataFrame:
    """``map_reduce_edges(compile_edges)`` + the leave-one-component
    step (``stitch_main.cpp:162``, OpenCV ``leaveBiggestComponent``):
    hash-min connected components over the match edges.  Returns
    (img_id, pano) for every matched image — ``pano`` is the min img_id
    of its component; unmatched images form no panorama (exactly the
    images the reference drops before stitching)."""
    from ..algos.connected_components import connected_components
    from ..graph import EdgeGraph
    edges = matches.select(F.col("img_a").alias("src"),
                           F.col("img_b").alias("dst"))
    g = EdgeGraph(edges)
    state = connected_components(g, resume=False).state
    g.unpersist()  # CC ran eagerly; state is lineage-truncated
    return state.select("id", F.col("component").alias("pano"))


# -- camera estimation (Homography-Based Initialization analog) --------------
#
# stitch_main.cpp:214-230 runs OpenCV's HomographyBasedEstimator after
# the match graph: per-pair transforms from matched keypoint
# coordinates, then per-image camera parameters propagated over the
# match graph's spanning structure.  The coordinate geometry here is
# the 1-D patch-index analog of that stage (the module's stand-in-pixel
# policy): transforms are least-squares shifts between matched keypoint
# positions, confidence uses OpenCV's matchers.cpp formula
# inliers / (8 + 0.3 * matches), and camera "offsets" are the
# homography-chain initialization — a level-synchronous BFS from each
# panorama root accumulating pairwise shifts.  Only the pixel-touching
# warp/seam/composite tail remains stubbed below.

def images_with_shifted_copies(docs: DataFrame,
                               copy_every: int = 5) -> DataFrame:
    """Like :func:`images_from_documents`, but the planted copy drops
    the FIRST patch (prefix truncation), so the copy's content sits one
    keypoint to the left of the original — a nonzero alignment for the
    estimator to recover (tail truncation would leave every match at
    shift 0)."""
    base = docs.select(
        F.col("doc_id").alias("img_id"),
        F.encode("text", "UTF-8").alias("payload"))
    copies = (
        docs.filter((F.col("doc_id") % copy_every == 0)
                    & (F.length("text") >= 2 * CHUNK))
        .select(
            (-(F.col("doc_id") + 1)).alias("img_id"),
            F.encode(F.expr(f"substring(text, {CHUNK + 1})"), "UTF-8")
            .alias("payload"))
    )
    return base.unionByName(copies)


def _content_desc_expr(payload, kp: int):
    """Position-INSENSITIVE variant of ``_qdesc_expr`` (fold seeded
    with 0, not kp): the same patch content hashes identically at any
    keypoint index, which is what alignment estimation needs — the
    position-folded words of :func:`compute_features` would never match
    a shifted copy."""
    text = F.decode(payload, "UTF-8")
    probes = [
        F.when(F.octet_length(payload) >= (kp + 1) * CHUNK,
               F.ascii(F.substring(text, kp * CHUNK + off + 1, 1))
               .cast("long"))
        for off in (0, 5, 10, 15)
    ]
    folded = F.lit(0).cast("long")
    for p in probes:
        folded = (folded * F.lit(FOLD) + p) % F.lit(2_147_483_648)
    return lcg_hash(folded)


def content_features(images: DataFrame) -> DataFrame:
    """(img_id, kp, qdesc) content descriptors for alignment
    estimation — same extraction plan shape as
    :func:`compute_features`, position-insensitive hash."""
    kps = F.array(*[
        F.struct(F.lit(k).alias("kp"),
                 _content_desc_expr(F.col("payload"), k).alias("qdesc"))
        for k in range(K_KEYPOINTS)
    ])
    ascii_only = (F.octet_length("payload")
                  == F.length(F.decode("payload", "UTF-8")))
    return (
        images.filter(ascii_only)
        .select("img_id", F.explode(kps).alias("f"))
        .select("img_id", F.col("f.kp").alias("kp"),
                F.col("f.qdesc").alias("qdesc"))
        .filter(F.col("qdesc").isNotNull())
    )


def estimate_pair_transforms(features: DataFrame, df_cap: int = DF_CAP,
                             min_matches: int = MIN_MATCHES) -> DataFrame:
    """(img_a, img_b, n_matches, shift, n_inliers, confidence):
    per-pair 1-D alignment from matched keypoint positions —
    ``shift`` is the least-squares translation ``avg(kp_b - kp_a)``,
    inliers are matches within 0.5 of it, and confidence is OpenCV's
    ``inliers / (8 + 0.3 * matches)`` (``modules/stitching``'s
    matchers formula, used by stitch_main's estimator input).  Same
    df-capped visual-word bucket join as :func:`match_features`
    (never all-pairs); the shift statistics are one window + one
    aggregation on the pair key (exchange reused)."""
    from pyspark.sql import Window
    live = (
        features.groupBy("qdesc")
        .agg(F.countDistinct("img_id").alias("__df"))
        .filter(F.col("__df") <= df_cap)
        .select("qdesc")
    )
    kept = features.join(live, "qdesc")
    a = kept.select("qdesc", F.col("img_id").alias("img_a"),
                    F.col("kp").alias("kp_a"))
    b = kept.select("qdesc", F.col("img_id").alias("img_b"),
                    F.col("kp").alias("kp_b"))
    d = (F.col("kp_b") - F.col("kp_a")).cast("double")
    w = Window.partitionBy("img_a", "img_b")
    scored = (
        a.join(b, "qdesc")
        .filter(F.col("img_a") < F.col("img_b"))
        .select("img_a", "img_b", d.alias("__d"))
        .withColumn("__t", F.avg("__d").over(w))
    )
    n = F.count(F.lit(1))
    inl = F.sum(F.when(F.abs(F.col("__d") - F.col("__t")) <= 0.5, 1)
                .otherwise(0))
    return (
        scored.groupBy("img_a", "img_b")
        .agg(n.cast("long").alias("n_matches"),
             F.round(F.first("__t"), 6).alias("shift"),
             inl.cast("long").alias("n_inliers"),
             F.round(inl / (F.lit(8.0) + 0.3 * n), 6).alias("confidence"))
        .filter(F.col("n_matches") >= min_matches)
    )


def camera_offsets(transforms: DataFrame,
                   max_supersteps: int = 64) -> DataFrame:
    """(img_id, pano, offset): the homography-chain initialization —
    every matched image's alignment relative to its panorama root
    (min img_id of its component, offset 0.0), accumulated by a
    level-synchronous BFS over the symmetrized pair-transform graph:
    ``offset(b) = offset(a) + shift(a, b)``; a vertex first reached
    from several frontier parents takes the minimum candidate offset
    (deterministic; with consistent transforms every path agrees).
    Same per-level lineage-cut discipline and truncation
    ``RuntimeError`` as ``algos/betweenness``'s forward BFS."""
    from ..algos.connected_components import connected_components
    from ..graph import EdgeGraph
    from ..plans.checkpoint import truncate_lineage

    edges = transforms.select(F.col("img_a").alias("src"),
                              F.col("img_b").alias("dst"),
                              F.col("shift").alias("t"))
    sym = truncate_lineage(edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     (-F.col("t")).alias("t"))))
    # the CC graph reuses the already-checkpointed sym blocks, so the
    # pair-transform pipeline is computed exactly once
    g = EdgeGraph(sym.select("src", "dst"))
    pano = connected_components(g, resume=False).state \
        .select(F.col("id"), F.col("component").alias("pano"))
    g.unpersist()
    visited = truncate_lineage(
        pano.filter(F.col("id") == F.col("pano"))
        .select("id", "pano", F.lit(0.0).alias("offset")))
    frontier = visited
    total = visited.count()
    exhausted = total == 0
    for _ in range(max_supersteps):
        cand = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .groupBy(sym["dst"].alias("nid"))
            .agg(F.min(frontier["offset"] + sym["t"]).alias("offset"))
        )
        new = (
            cand.join(visited.select(F.col("id").alias("__vid")),
                      cand["nid"] == F.col("__vid"), "left_anti")
            .join(pano.select(F.col("id").alias("__pid"), "pano"),
                  cand["nid"] == F.col("__pid"))
            .select(F.col("nid").alias("id"), "pano", "offset")
        )
        grown = truncate_lineage(visited.union(new))
        new_total = grown.count()
        if new_total == total:
            exhausted = True
            break
        frontier = truncate_lineage(new)
        visited, total = grown, new_total
    if not exhausted:
        raise RuntimeError(
            f"camera_offsets BFS still growing after {max_supersteps} "
            "supersteps — offsets would be silently incomplete; raise "
            "max_supersteps above the match-graph diameter")
    return visited.select("id", "pano", F.round("offset", 6).alias("offset"))


def warp_images(images: DataFrame, cameras: DataFrame) -> DataFrame:
    """STUB (``stitch_main.cpp:302``): spherical warp needs OpenCV."""
    raise NotImplementedError(
        "camera warp requires OpenCV (not installed); the match-graph "
        "and camera-estimation phases above are the distributed part "
        "of the pipeline")


def find_seams(images: DataFrame, matches: DataFrame) -> DataFrame:
    """STUB (``stitch_main.cpp:309``): graph-cut seams need OpenCV."""
    raise NotImplementedError(
        "seam finding requires OpenCV (not installed)")


def composite_images(images: DataFrame) -> DataFrame:
    """STUB (``stitch_main.cpp:313``): blending needs OpenCV."""
    raise NotImplementedError(
        "compositing requires OpenCV (not installed)")


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle replay)
# ---------------------------------------------------------------------------


def sql_images(copy_every: int = 5, table: str = "documents") -> str:
    return f"""
images AS (
  SELECT doc_id AS img_id, text AS payload FROM {table}
  UNION ALL
  SELECT -(doc_id + 1), substr(text, 1, length(text) - {CHUNK})
  FROM {table}
  WHERE doc_id % {copy_every} = 0 AND length(text) >= {2 * CHUNK})"""


def sql_features() -> str:
    """Twin of :func:`compute_features` over the ``images`` CTE.  The
    corpus is ASCII, so ``getbyte`` == ``ascii(substr(...))`` — the
    payload stays textual on the DuckDB side."""
    arms = []
    for k in range(K_KEYPOINTS):
        folded = str(k)
        for off in (0, 5, 10, 15):
            byte = f"ascii(substr(payload, {k * CHUNK + off} + 1, 1))"
            folded = f"(({folded} * {FOLD} + {byte}) % 2147483648)"
        arms.append(
            f"SELECT img_id, {k} AS kp, "
            f"{sql_lcg_hash(folded)} AS qdesc "
            f"FROM images WHERE length(payload) >= {(k + 1) * CHUNK} "
            f"AND strlen(payload) = length(payload)")  # ASCII guard
    return "features AS (" + " UNION ALL ".join(arms) + ")"


def sql_match_features(df_cap: int = DF_CAP,
                       min_matches: int = MIN_MATCHES) -> str:
    return f"""
live AS (SELECT qdesc FROM features GROUP BY qdesc
         HAVING count(DISTINCT img_id) <= {df_cap}),
kept AS (SELECT f.* FROM features f JOIN live l ON l.qdesc = f.qdesc),
matches AS (
  SELECT a.img_id AS img_a, b.img_id AS img_b,
         CAST(count(*) AS BIGINT) AS matches
  FROM kept a JOIN kept b ON a.qdesc = b.qdesc AND a.img_id < b.img_id
  GROUP BY 1, 2
  HAVING count(*) >= {min_matches})"""


def sql_images_shifted(copy_every: int = 5, table: str = "documents") -> str:
    """Twin of :func:`images_with_shifted_copies` (prefix-truncated
    planted copies — nonzero alignment)."""
    return f"""
images AS (
  SELECT doc_id AS img_id, text AS payload FROM {table}
  UNION ALL
  SELECT -(doc_id + 1), substr(text, {CHUNK + 1})
  FROM {table}
  WHERE doc_id % {copy_every} = 0 AND length(text) >= {2 * CHUNK})"""


def sql_content_features() -> str:
    """Twin of :func:`content_features` over the ``images`` CTE —
    the position-insensitive fold (seed 0, not kp)."""
    arms = []
    for k in range(K_KEYPOINTS):
        folded = "0"
        for off in (0, 5, 10, 15):
            byte = f"ascii(substr(payload, {k * CHUNK + off} + 1, 1))"
            folded = f"(({folded} * {FOLD} + {byte}) % 2147483648)"
        arms.append(
            f"SELECT img_id, {k} AS kp, "
            f"{sql_lcg_hash(folded)} AS qdesc "
            f"FROM images WHERE length(payload) >= {(k + 1) * CHUNK} "
            f"AND strlen(payload) = length(payload)")  # ASCII guard
    return "cfeatures AS MATERIALIZED (" + " UNION ALL ".join(arms) + ")"


def sql_pair_transforms(df_cap: int = DF_CAP,
                        min_matches: int = MIN_MATCHES) -> str:
    """Twin of :func:`estimate_pair_transforms` over ``cfeatures``."""
    return f"""
clive AS (SELECT qdesc FROM cfeatures GROUP BY qdesc
          HAVING count(DISTINCT img_id) <= {df_cap}),
ckept AS (SELECT f.* FROM cfeatures f JOIN clive l ON l.qdesc = f.qdesc),
cscored AS (
  SELECT img_a, img_b, d,
         avg(d) OVER (PARTITION BY img_a, img_b) AS t
  FROM (SELECT a.img_id AS img_a, b.img_id AS img_b,
               CAST(b.kp - a.kp AS DOUBLE) AS d
        FROM ckept a JOIN ckept b ON a.qdesc = b.qdesc
                                  AND a.img_id < b.img_id)),
transforms AS MATERIALIZED (
  SELECT img_a, img_b,
         CAST(count(*) AS BIGINT) AS n_matches,
         round(any_value(t), 6) AS shift,
         CAST(sum(CASE WHEN abs(d - t) <= 0.5 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_inliers,
         round(sum(CASE WHEN abs(d - t) <= 0.5 THEN 1 ELSE 0 END)
               / (8.0 + 0.3 * count(*)), 6) AS confidence
  FROM cscored
  GROUP BY img_a, img_b
  HAVING count(*) >= {min_matches})"""
