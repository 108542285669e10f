"""graphlab_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the GraphLab / PowerGraph 2.2 workload
surface (reference at /root/reference, nddsg/graphlab) as iterative
DataFrame jobs: PageRank, connected components, community label
propagation, triangle counting, SSSP, k-core, approximate diameter —
plus the graph data-management operators (loaders, transforms, vertex
set algebra, cross-graph joins, whole-graph aggregates) and
training-data pipeline functions (dedup, similarity search, text
analysis) for transcript corpora.
"""

from .graph import EdgeGraph
from .session import get_spark

__all__ = ["EdgeGraph", "get_spark"]
__version__ = "0.1.0"
