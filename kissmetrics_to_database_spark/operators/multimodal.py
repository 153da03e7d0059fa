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


FEATURES_SCHEMA = "doc_id long, n_bytes long, entropy double, byte_hist array<long>"


def extract_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """REAL feature extraction over the raw bytes (no codec needed):
    coarse byte histogram + Shannon entropy per payload — the standard
    cheap signal for corrupt/blank/duplicate media triage at scale.

    Arrow-batched mapInPandas; numpy vectorized inside the batch.
    ``bins`` must be a power of two (the binning is a bit shift).
    """
    if bins & (bins - 1) or not 0 < bins <= 256:
        raise ValueError(f"bins must be a power of two in (0, 256], got {bins}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = arr.size
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[
                    :bins
                ]
                probs = hist[hist > 0] / max(n, 1)
                entropy = float(-(probs * np.log2(probs)).sum()) if n else 0.0
                out_rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": n,
                        "entropy": round(entropy, 6),
                        "byte_hist": hist.astype("int64").tolist(),
                    }
                )
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """Resize stage — requires an image library (PIL/libvips).

    The Spark-side contract is fixed: binary in → binary out, same
    partitioning, `mapInPandas` batch shape identical to
    :func:`decode_images`. Swap the kernel in production.
    """
    raise NotImplementedError(
        "image resize requires PIL/libvips, not present in this container"
    )


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:  # pragma: no cover
    """Video frame sampling — requires ffmpeg/pyav. One input row →
    many output rows (frame index + binary frame), i.e. a flat-map
    shape under ``mapInPandas`` yielding multiple rows per input."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/pyav, not present in this container"
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
