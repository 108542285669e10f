from .adpredictor import adpredictor, clicks_from_lineitem, predict_ctr
from .als import add_implicit_ratings, als, predict, rmse, sparse_als, wals
from .betweenness import betweenness, harmonic_centrality
from .biassgd import biassgd, biassgd_predict, biassgd_rmse
from .cascades import bond_percolation, sir_cascade
from .catpath import catpath, catpath_articles, events_typed_edges
from .coloring import count_conflicts, greedy_coloring
from .connected_components import component_size_histogram, connected_components
from .dd import dd_dual_objective, dd_labels, dd_state
from .diameter import approx_diameter
from .directed_triangles import directed_census_totals, directed_triangle_census
from .jacobi import jacobi, residual_norm
from .kcore import kcore_subgraph, kcore_table
from .kmeans import kmeans
from .label_propagation import label_propagation
from .factor_bp import factor_bp_beliefs, factor_graph_bp
from .gibbs import chromatic_gibbs, gibbs_marginals, gibbs_run_statistics
from .lbp import lbp_beliefs
from .lda import lda_cvb0, word_topics
from .mplp import (mplp_dual_objective, mplp_duals, mplp_labels,
                   mplp_sparse_table_labels, mplp_table_labels,
                   sparse_table_to_dense)
from .nmf import nmf, nmf_objective
from .hits import hits
from .pagerank import pagerank, personalized_pagerank, total_rank
from .walks import random_walks
from .sgd import sgd, sgd_rmse
from .spectral import normalized_adjacency, spectral_clusters, spectral_embedding
from .sssp import sssp
from .svd import lanczos_svd, power_iteration_svd
from .svdpp import svdpp, svdpp_predict, svdpp_rmse
from .triangles import triangle_count_per_vertex, triangle_count_total, triangle_list
from .tsc import tsc

__all__ = [
    "hits", "personalized_pagerank", "random_walks",
    "pagerank", "total_rank", "connected_components", "component_size_histogram",
    "label_propagation", "triangle_list", "triangle_count_total",
    "triangle_count_per_vertex", "sssp", "kcore_subgraph", "kcore_table",
    "greedy_coloring", "count_conflicts", "directed_triangle_census",
    "directed_census_totals", "approx_diameter",
    "als", "wals", "sparse_als", "add_implicit_ratings", "predict", "rmse",
    "sgd", "sgd_rmse", "biassgd", "biassgd_predict", "biassgd_rmse",
    "svdpp", "svdpp_predict", "svdpp_rmse",
    "power_iteration_svd", "lanczos_svd", "nmf", "nmf_objective",
    "lda_cvb0", "word_topics",
    "normalized_adjacency", "spectral_embedding", "spectral_clusters",
    "chromatic_gibbs", "gibbs_marginals", "gibbs_run_statistics",
    "factor_bp_beliefs", "factor_graph_bp",
    "lbp_beliefs", "mplp_duals", "mplp_labels", "mplp_dual_objective",
    "mplp_table_labels", "mplp_sparse_table_labels",
    "sparse_table_to_dense",
    "dd_state", "dd_labels", "dd_dual_objective",
    "sir_cascade", "bond_percolation", "tsc",
    "catpath", "catpath_articles", "events_typed_edges",
    "adpredictor", "clicks_from_lineitem", "predict_ctr",
    "kmeans", "jacobi", "residual_norm",
    "betweenness", "harmonic_centrality",
]
