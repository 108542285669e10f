"""Lloyd's k-means over an embedding table (clustering toolkit).

Reference analog: ``/root/reference/toolkits/clustering/kmeans.cpp``
(distributed Lloyd iterations: assign each datapoint to the nearest
center, recompute centers as cluster means, stop when assignments
stop changing).  The reference seeds with random sampling
(``kmeans.cpp`` ``--seed``); we seed deterministically with the k
points of smallest ``xxhash64(id)`` so runs reproduce at any
parallelism.

Spark plan per iteration: centers are a k x dim driver-side literal
(tiny), so assignment is a pure column expression — an array of k
squared distances via ``zip_with``/``aggregate`` folds, argmin by
``array_position(array_min)``; new centers come from one
``posexplode`` + grouped average (partial+final, one shuffle).  The
only driver action per iteration collects the k new centers — the
same all-reduce shape as the reference's cluster-center sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import no_aqe_loop


def _dist_sq(vec_col: str, center: list[float]) -> F.Column:
    arr = "array(" + ", ".join(repr(float(v)) for v in center) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr},"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


@no_aqe_loop
def kmeans(
    points: DataFrame,
    k: int = 4,
    iterations: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignments (id, cluster), centers list).

    ``init``: 'hash' seeds with the k points of smallest xxhash64(id)
    (pseudo-random, deterministic); 'first' seeds with the k smallest
    ids — engine-portable, used when an external SQL oracle must
    rebuild the same centers.  Stops early when no assignment changes.
    """
    pts = points.select(F.col(id_col).alias("id"),
                        F.col(vec_col).alias("v")).persist()
    order = F.xxhash64("id") if init == "hash" else F.col("id")
    init_rows = (
        pts.select("id", "v", order.alias("h"))
        .orderBy("h").limit(k).collect()
    )
    centers = [list(map(float, r["v"])) for r in init_rows]

    def cluster_expr(cs: list[list[float]]) -> F.Column:
        dists = F.array(*[_dist_sq("v", c) for c in cs])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    # assignment to the CURRENT centers, evaluated before any Lloyd
    # update so iterations=0 returns the init-center assignment
    # instead of crashing on a None
    assign = pts.select("id", "v", cluster_expr(centers).alias("cluster"))
    for it in range(iterations):
        assign = pts.select("id", "v", cluster_expr(centers).alias("cluster"))
        stats = (
            assign.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        new_centers = [list(c) for c in centers]
        for r in stats:
            new_centers[r["cluster"]][r["pos"]] = float(r["m"])
        # Convergence = exact center repeat, checked driver-side for
        # free: assignments are a pure function of the centers, so
        # assign_i == assign_{i-1}  <=>  new_centers == centers — the
        # same stopping superstep as an explicit change count, with
        # ONE Spark job per Lloyd iteration and no doubled distance
        # expressions (the r1 change-count join cost a second job; an
        # observe-based count re-derives the previous assignment and
        # doubles Catalyst analysis + codegen per iteration).
        if it > 0 and new_centers == centers:
            break
        centers = new_centers
    pts.unpersist()
    return assign.select("id", "cluster"), centers
