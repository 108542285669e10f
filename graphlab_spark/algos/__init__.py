from .connected_components import component_size_histogram, connected_components
from .kcore import kcore_subgraph, kcore_table
from .label_propagation import label_propagation
from .pagerank import pagerank, total_rank
from .sssp import sssp
from .triangles import triangle_count_per_vertex, triangle_count_total, triangle_list

__all__ = [
    "pagerank", "total_rank", "connected_components", "component_size_histogram",
    "label_propagation", "triangle_list", "triangle_count_total",
    "triangle_count_per_vertex", "sssp", "kcore_subgraph", "kcore_table",
]
