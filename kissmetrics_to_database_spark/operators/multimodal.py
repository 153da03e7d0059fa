"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference to object storage); decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects. The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT
in this container, so the decode kernel is a clearly-marked
deterministic fake behind the same signature — the Spark-side
contract (schema, batch shape, partitioning) is real and tested.

At scale:
- payload partitions should be sized by bytes not rows
  (``spark.sql.files.maxPartitionBytes``); metadata-only queries never
  touch the binary column thanks to parquet column pruning;
- decode stages are embarrassingly parallel; ``mapInPandas`` keeps
  Arrow batches bounded via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, first_byte long, "
    "fake_width long, fake_height long, fake_format string"
)

_FORMATS = ["png", "jpeg", "webp"]


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stand-in acquisition step: materialize an opaque binary column
    (UTF-8 bytes of the text here; real pipelines read image bytes)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def fake_decode_kernel(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode.

    A real implementation would be e.g. PIL.Image.open(BytesIO(b)) —
    unavailable in this container. The fake derives "image" metadata
    from the bytes alone so tests and oracles are exact.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return {
        "n_bytes": n,
        "first_byte": first,
        "fake_width": 64 + (n % 577),
        "fake_height": 64 + ((n * 31 + first) % 421),
        "fake_format": _FORMATS[n % 3],
    }


def real_decode_kernel(payload: bytes) -> dict:  # pragma: no cover
    """The production decode hook. Requires an image codec library."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "swap in PIL/libvips here and keep the same return schema"
    )


def decode_images(df: DataFrame, kernel=fake_decode_kernel) -> DataFrame:
    """Decode a binary payload column to typed metadata via
    ``mapInPandas`` (Arrow-batched; one Python roundtrip per batch,
    never per row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [kernel(b) for b in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
