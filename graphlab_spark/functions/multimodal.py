"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Schema convention:

    media(media_id long, kind string,            -- 'image'|'audio'|'video'
          payload binary, meta map<string,string>)

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
`mapInPandas` signatures) is real and tested; the actual codec work
(`decode_image` etc.) is STUBBED — the image/audio libraries are not in
this container — behind `NotImplementedError`, with a deterministic
fake feature extractor standing in so the pipeline shape can be
validated end-to-end.

Everything flows through `mapInPandas` with Arrow batches (never
per-row Python); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds
batch memory for large payloads, and payload columns are pruned from
the scan unless actually referenced (verified in tests via the parquet
ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<double>"
FEATURE_DIM = 8

_KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from `documents`: payload = utf-8 bytes
    of the text, kind cycles by doc_id (deterministic; used by tests and
    the driver harness — no real media ships in this environment)."""
    # pmod, not %: Spark's % preserves sign, so a negative doc_id would
    # hit element_at(0) (runtime error) or index from the array end
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.pmod("doc_id", F.lit(3)) + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv (not installed)."""
    raise NotImplementedError("image codecs unavailable in this environment")


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError("audio codecs unavailable in this environment")


def sample_video_frames(payload: bytes, every_n: int) -> list:
    raise NotImplementedError("video codecs unavailable in this environment")


def _fake_feature(payload: pd.Series) -> pd.Series:
    """Deterministic stand-in for a real per-item feature extractor:
    FEATURE_DIM stride-summed byte statistics, vectorized per batch."""
    def feat(b: bytes) -> list[float]:
        if b is None or len(b) == 0:
            return [0.0] * FEATURE_DIM
        return [float(sum(b[i::FEATURE_DIM]) % 997) for i in range(FEATURE_DIM)]
    return payload.map(feat)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    `mapInPandas` receives an iterator of pandas batches (one Arrow
    batch each); a real implementation would decode payloads with a
    codec here — the batch shape, schema, and partitioning are exactly
    what that implementation would use.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)),
                    "feature": _fake_feature(pdf["payload"]),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-expression metadata pass (no UDF): per-item byte length and
    head byte — the query the driver's oracle verifies value-for-value."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )


def sql_media_stats(table: str = "documents") -> str:
    """DuckDB twin of media_from_documents |> media_stats."""
    return f"""
SELECT doc_id AS media_id,
       CASE ((doc_id % 3) + 3) % 3 WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM {table}
"""
