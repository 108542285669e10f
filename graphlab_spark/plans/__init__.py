from .checkpoint import CheckpointManager, truncate_lineage
from .superstep import BSPResult, run_bsp

__all__ = ["CheckpointManager", "truncate_lineage", "BSPResult", "run_bsp"]
