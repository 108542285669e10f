"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal columns.  Each operator is pure-expression
(JVM-side) where possible, Arrow-batched `mapInPandas` where not, and
ships a DuckDB-replayable SQL twin for value-level verification."""

from . import (curation, dedup, multimodal, similarity,  # noqa: F401
               text, vision)
