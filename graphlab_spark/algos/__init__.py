from .als import als, predict, rmse
from .coloring import count_conflicts, greedy_coloring
from .jacobi import jacobi, residual_norm
from .kmeans import kmeans
from .connected_components import component_size_histogram, connected_components
from .directed_triangles import directed_census_totals, directed_triangle_census
from .kcore import kcore_subgraph, kcore_table
from .label_propagation import label_propagation
from .pagerank import pagerank, total_rank
from .sssp import sssp
from .triangles import triangle_count_per_vertex, triangle_count_total, triangle_list

__all__ = [
    "pagerank", "total_rank", "connected_components", "component_size_histogram",
    "label_propagation", "triangle_list", "triangle_count_total",
    "triangle_count_per_vertex", "sssp", "kcore_subgraph", "kcore_table",
    "greedy_coloring", "count_conflicts", "directed_triangle_census",
    "directed_census_totals", "als", "predict", "rmse", "kmeans",
    "jacobi", "residual_norm",
]
