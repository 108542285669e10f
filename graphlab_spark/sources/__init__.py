from .parsers import (load_format, load_synthetic_clusters,
                      load_synthetic_powerlaw, save_edges)
from .transcripts import (read_transcripts, synthetic_transcripts,
                          transcripts_to_edges)

__all__ = ["load_format", "load_synthetic_clusters",
           "load_synthetic_powerlaw", "save_edges",
           "read_transcripts", "synthetic_transcripts",
           "transcripts_to_edges"]
