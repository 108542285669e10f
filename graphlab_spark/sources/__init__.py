from .alchemy import (load_alchemy, load_alchemy_factor_graph,
                      make_denoise_alchemy, save_alchemy)
from .parsers import (load_format, load_synthetic_als,
                      load_synthetic_clusters,
                      load_synthetic_clusters_portable,
                      load_synthetic_factor_graph,
                      load_synthetic_image, load_synthetic_powerlaw,
                      save_edges)
from .transcripts import (read_transcripts, synthetic_transcripts,
                          tool_transitions, transcripts_to_edges,
                          turn_latency_by_role)

__all__ = ["load_alchemy", "load_alchemy_factor_graph",
           "make_denoise_alchemy", "save_alchemy",
           "load_format", "load_synthetic_als", "load_synthetic_clusters",
           "load_synthetic_clusters_portable",
           "load_synthetic_factor_graph", "load_synthetic_image",
           "load_synthetic_powerlaw", "save_edges",
           "read_transcripts", "synthetic_transcripts",
           "tool_transitions", "transcripts_to_edges",
           "turn_latency_by_role"]
