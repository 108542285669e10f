"""Cross-graph vertex join (SURVEY §2.3).

Reference: ``graph_vertex_join`` — vertices of two graphs emit integer
keys; matching pairs exchange data via ``prepare_injective_join`` +
``left_injective_join(join_op)``
(``/root/reference/src/graphlab/graph/graph_vertex_join.hpp:30-100``).
The "injective" contract (each key appears at most once per side) is the
reference's physical constraint; in Spark this is simply an equi-join.
We validate injectivity optionally (it is a semantic assertion there).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def injective_vertex_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    combine: Callable[[DataFrame], DataFrame] | None = None,
    validate: bool = False,
    how: str = "left",
) -> DataFrame:
    """Join two vertex-state DataFrames on emitted keys.

    ``combine`` receives the joined DataFrame (right columns suffixed
    ``_r`` on collision) and returns the merged state — the analog of the
    user ``join_op`` mutating left vertex data from right vertex data.
    """
    if validate:
        for df, key, side in ((left, left_key, "left"), (right, right_key, "right")):
            dup = df.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
            if dup:
                raise ValueError(f"{side} join key '{key}' is not injective")
    r = right
    for c in right.columns:
        if c in left.columns and c != right_key:
            r = r.withColumnRenamed(c, c + "_r")
    joined = left.join(r, left[left_key] == r[right_key], how)
    return combine(joined) if combine else joined
