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
Arrow ``mapInPandas`` batch kernel (``decode_pixels`` handles
uncompressed Netpbm via the multimodal codec layer; compressed formats
need codec libraries this container doesn't ship) whose deterministic
chunk-hash extractor is replayed by a pure-expression twin, so the
whole match-graph phase is value-oracled.  Matching is a
quantized-descriptor equi-join — the visual-words / LSH form of
descriptor matching (bucket join on the quantized descriptor, never
all-pairs; a document-frequency cap drops stop-features the way image
retrieval drops stop-words), which is the matcher shape that survives
100 TB.  Panorama grouping is the engine's own hash-min connected
components over the match edges.  The geometry tail
(``warp_images``/``find_seams``/``composite_images``) is implemented in
the module's stand-in 1-D byte geometry (translation warp, mid-overlap
seams, per-panorama canvas overlay) — the distributed plumbing a real
OpenCV spherical warp/graph-cut/multi-band blend would consume; the
OpenCV pixel math itself stays out per the documented codec policy.
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
    """Decode uncompressed Netpbm payloads (PGM/PPM) via the
    multimodal codec layer; compressed formats (JPEG/PNG...) raise
    ``ValueError`` there — those genuinely need codec libraries this
    container doesn't ship (documented policy)."""
    from .multimodal import decode_image
    return decode_image(payload)


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
    """``stitch_main.cpp:302``'s warp in the module's stand-in 1-D byte
    geometry: each matched image is translated into its panorama's root
    coordinate frame.  ``camera_offsets`` accumulates
    ``offset(b) = offset(a) + avg(kp_b - kp_a)`` (how far b's content
    sits AHEAD inside b relative to a), so image b's origin in root
    coordinates is ``-offset`` patches: ``pos0 = floor(-offset*CHUNK
    + 0.5)`` bytes.  Returns (img_id, pano, pos0, width) — the real
    spherical warp is OpenCV pixel math (documented codec policy); the
    coordinate plumbing here is what it would consume."""
    pos0 = F.floor(-F.col("offset") * CHUNK + F.lit(0.5)).cast("long")
    return (
        images.join(cameras, images["img_id"] == cameras["id"])
        .select("img_id", "pano", pos0.alias("pos0"),
                F.octet_length("payload").cast("long").alias("width"))
    )


def find_seams(warped: DataFrame) -> DataFrame:
    """``stitch_main.cpp:309``'s seam finding in the 1-D stand-in: for
    images ordered by (pos0, img_id) within a panorama, each image
    starts contributing at the midpoint of its overlap with the
    coverage so far (``start = (pos0 + min(prev_end, end)) // 2`` when
    overlapping, else ``pos0``) — the 1-D analog of a mid-overlap
    graph-cut seam.  Returns (pano, img_id, pos0, width, start); the
    same rule drives :func:`composite_images` (asserted in tests)."""
    from pyspark.sql import Window
    w = Window.partitionBy("pano").orderBy("pos0", "img_id")
    end = F.col("pos0") + F.col("width")
    prev_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    seam = F.when(
        prev_end > F.col("pos0"),
        F.floor((F.col("pos0") + F.least(prev_end, end)) / 2)
    ).otherwise(F.col("pos0")).cast("long")
    return warped.select("pano", "img_id", "pos0", "width",
                         seam.alias("start"))


def composite_images(images: DataFrame, cameras: DataFrame) -> DataFrame:
    """``stitch_main.cpp:313``'s compositing in the 1-D stand-in: per
    panorama, overlay the warped byte rows on a shared canvas, each
    image contributing from its :func:`find_seams` start position.
    Grouped Arrow batches (``applyInPandas`` keyed by pano — a panorama
    is a small set of images, compositing is inherently per-panorama);
    returns (pano, n_images, width, payload).  Consistent overlaps
    (the planted shifted-copy corpus) reconstruct the original bytes
    exactly — the pytest golden."""
    import numpy as np

    warped = (
        images.join(cameras, images["img_id"] == cameras["id"])
        .select("pano", "img_id",
                F.floor(-F.col("offset") * CHUNK + F.lit(0.5))
                .cast("long").alias("pos0"), "payload")
    )

    def compose(key, pdf):
        pdf = pdf.sort_values(["pos0", "img_id"])
        base = int(pdf["pos0"].min())
        total = int((pdf["pos0"] + pdf["payload"].map(len)).max()) - base
        canvas = np.zeros(total, np.uint8)
        cur_end = None
        for pos0, payload in zip(pdf["pos0"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), np.uint8)
            pos0, end = int(pos0), int(pos0) + len(b)
            # same mid-overlap seam rule as find_seams
            start = (pos0 if cur_end is None or cur_end <= pos0
                     else (pos0 + min(cur_end, end)) // 2)
            canvas[start - base:end - base] = b[start - pos0:]
            cur_end = end if cur_end is None else max(cur_end, end)
        return pd.DataFrame({
            "pano": [key[0]], "n_images": [len(pdf)],
            "width": [total], "payload": [canvas.tobytes()],
        })

    return warped.groupBy("pano").applyInPandas(
        compose, "pano long, n_images long, width long, payload binary")


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
