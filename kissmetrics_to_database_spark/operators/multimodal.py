"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference to object storage); decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects.

The decode path is REAL for PNG/JPEG/BMP/PPM/PGM/WAV — implemented
from the public specs in ``functions/codecs.py`` and
``functions/jpeg.py`` (baseline-sequential T.81: Huffman + IDCT,
4:4:4/4:2:2/4:2:0, restart markers) with stdlib zlib/wave + numpy (no
codec library needed), with PIL as an optional fallback for
progressive JPEG/WebP when installed. ``fake_decode_kernel`` remains only for the
oracle-checkable catalog query (the driver's synthetic payloads are
text bytes, not images, and DuckDB can't decode pixels — the fake
derives deterministic metadata both engines can compute). Video frame
sampling is REAL for MJPEG-AVI and Y4M (``frame_sample``; RIFF/Y4M
parse in ``functions/avi.py`` + the from-spec JPEG decoder);
inter-coded formats (H.264/VP9/AV1) genuinely require ffmpeg and
quarantine instead.

At scale:
- payload partitions should be sized by bytes not rows
  (``spark.sql.files.maxPartitionBytes``); metadata-only queries never
  touch the binary column thanks to parquet column pruning;
- decode stages are embarrassingly parallel; ``mapInPandas`` keeps
  Arrow batches bounded via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, first_byte long, "
    "fake_width long, fake_height long, fake_format string"
)

_FORMATS = ["png", "jpeg", "webp"]




def _round6(x: float) -> float:
    """Round half AWAY from zero at 6 decimals on the BINARY value —
    matching DuckDB's round(double) (same floor(|x|*1e6+0.5)
    formula), which is what the oracles compare against. NOT
    equivalent to Spark's F.round(double): F.round is BigDecimal
    HALF_UP on the shortest decimal rendering, so a value whose
    decimal form ends in ...5 at the 7th digit but whose binary value
    sits just below the half (the classic 2.675 case) rounds UP under
    F.round and DOWN here — don't mix the two on the same column.
    Python's built-in round() is half-to-even and diverges on exact
    boundaries too (SCALING.md cross-engine rounding convention; the
    bpe_encode_corpus bug class). Returns +0.0 for zero so hashes
    never see -0.0."""
    import math

    r = math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)
    return 0.0 if r == 0 else r


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


REAL_DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long, "
    "channels long, mean_value double"
)


def real_decode_kernel(payload: bytes) -> dict:
    """REAL image decode — actual pixels out, no codec library needed.

    PNG/baseline-JPEG/BMP/PPM/PGM are decoded from spec by
    :mod:`kissmetrics_to_database_spark.functions.codecs` and
    :mod:`~.functions.jpeg` (pure numpy + stdlib zlib); PIL is used as
    an optional fallback for formats outside that set when installed.
    Undecodable payloads are
    reported as format='unknown' with null dimensions rather than
    failing the batch — at 100 TB a decode stage must quarantine bad
    payloads, not die on them.
    """
    from kissmetrics_to_database_spark.functions import codecs

    n = len(payload)
    fmt = codecs.sniff_format(payload)
    try:
        arr = codecs.decode_image(payload)
    except ValueError:
        return {
            "n_bytes": n, "format": "unknown", "width": None,
            "height": None, "channels": None, "mean_value": None,
        }
    return {
        "n_bytes": n,
        "format": fmt if fmt != "unknown" else "pil",
        "width": arr.shape[1],
        "height": arr.shape[0],
        "channels": arr.shape[2],
        "mean_value": _round6(float(arr.mean())),
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Real decode stage: binary payload → typed image metadata +
    pixel statistics (REAL_DECODED_SCHEMA), Arrow-batched."""
    from collections.abc import Iterator as _It

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            meta = [real_decode_kernel(b) for b in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(run, schema=REAL_DECODED_SCHEMA)


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
                        "entropy": _round6(entropy),
                        "byte_hist": hist.astype("int64").tolist(),
                    }
                )
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize stage: binary in → binary out (PNG-encoded), same
    partitioning. Decode via the pure codecs, nearest-neighbor
    resample in numpy, re-encode PNG. Undecodable payloads pass
    through as null (quarantine semantics, same as decode)."""
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for b in pdf["payload"]:
                try:
                    arr = codecs.decode_image(b)
                    resized.append(
                        codecs.encode_png(codecs.resize_nearest(arr, width, height))
                    )
                except ValueError:
                    resized.append(None)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": resized}
            )

    return df.mapInPandas(run, schema="doc_id long, payload binary")


AUDIO_SCHEMA = (
    "doc_id long, sample_rate long, channels long, n_frames long, "
    "duration_sec double, rms double"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode: 16-bit PCM WAV → sample stats (stdlib
    ``wave`` + numpy; no external codec). Non-WAV payloads quarantine
    to nulls."""
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(b)
                    s = d["samples"].astype(np.float64)
                    rows.append({
                        "doc_id": doc_id,
                        "sample_rate": d["sample_rate"],
                        "channels": d["channels"],
                        "n_frames": d["n_frames"],
                        "duration_sec": _round6(d["n_frames"] / d["sample_rate"]),
                        "rms": _round6(float(np.sqrt((s * s).mean()))) if s.size else 0.0,
                    })
                except (ValueError, EOFError, wave.Error):
                    rows.append({
                        "doc_id": doc_id, "sample_rate": None, "channels": None,
                        "n_frames": None, "duration_sec": None, "rms": None,
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx long, width long, height long, "
    "mean_value double, frame_png binary"
)


def frame_sample(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling for spec-decodable containers: every
    ``every_n``-th frame of MJPEG-AVI (RIFF walk + the from-spec
    baseline JPEG decoder) and Y4M (uncompressed planar YCbCr)
    payloads, emitted as (frame_idx, dims, mean, PNG bytes).

    One input row → many output rows: the flat-map shape under
    Arrow-batched ``mapInPandas`` (a kernel may yield any number of
    rows per input). Inter-coded formats (H.264/VP9/AV1 in MP4/MKV)
    decode through ffmpeg when the host ships it
    (``avi.decode_video_frames``, r9); with no ffmpeg they QUARANTINE
    — a single row with null frame fields — rather than failing the
    batch.

    At 100 TB: embarrassingly parallel per payload; the output
    explodes row counts, so repartition downstream by
    (doc_id, frame_idx) before any wide operation.
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import avi, codecs

    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def _frames(payload: bytes):
        for i, frame in enumerate(avi.decode_video_frames(payload)):
            if i % every_n == 0:
                yield i, frame

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for idx, arr in _frames(bytes(payload)):
                        rows.append({
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "mean_value": _round6(float(arr.mean())),
                            "frame_png": codecs.encode_png(arr),
                        })
                except ValueError:
                    rows.append({
                        "doc_id": doc_id, "frame_idx": None, "width": None,
                        "height": None, "mean_value": None, "frame_png": None,
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


SCENE_CUT_SCHEMA = (
    "doc_id long, frame_idx long, n_frames long, mean_diff double, "
    "is_cut boolean"
)


def video_scene_cuts(
    df: DataFrame, threshold: float = 15.0
) -> DataFrame:
    """Shot/scene-boundary detection (r7) — the video-curation
    primitive above :func:`frame_sample`: sampling keyframes at
    SCENE CUTS (not a blind every-Nth stride) is how video training
    pipelines pick representative frames. Per consecutive decoded
    frame pair the kernel scores the mean absolute pixel difference
    (all channels; the classic histogram/pixel-delta detector) and
    marks a cut where it exceeds ``threshold`` — a cheap,
    deterministic, codec-independent boundary signal.

    Emits one row per frame transition (frame_idx ≥ 1 is the LATER
    frame): (doc_id, frame_idx, n_frames, mean_diff, is_cut), with
    ``mean_diff`` rounded post-computation (``_round6``, the DuckDB
    binary-rounding convention). Dimension changes mid-stream count
    as a cut with a null diff. Quarantine: all-null row. Same decode
    path and scale shape as frame_sample: embarrassingly parallel
    Arrow batches, no shuffle. Inter-coded formats decode through
    ffmpeg when present (``avi.decode_video_frames``, r9).
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import avi

    _frames = avi.decode_video_frames

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        null_row = {
            "frame_idx": None, "n_frames": None, "mean_diff": None,
            "is_cut": None,
        }
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = list(_frames(bytes(payload)))
                except ValueError:
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                n = len(frames)
                for i in range(1, n):
                    a, b = frames[i - 1], frames[i]
                    if a.shape != b.shape:
                        rows.append({
                            "doc_id": doc_id, "frame_idx": i,
                            "n_frames": n, "mean_diff": None,
                            "is_cut": True,
                        })
                        continue
                    diff = _round6(
                        float(
                            np.abs(
                                a.astype(np.float64) - b.astype(np.float64)
                            ).mean()
                        )
                    )
                    rows.append({
                        "doc_id": doc_id, "frame_idx": i, "n_frames": n,
                        "mean_diff": diff, "is_cut": diff > threshold,
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SCENE_CUT_SCHEMA)


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


DHASH_SCHEMA = "doc_id long, dhash string"


def image_dhash(df: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels: each image
    is decoded, grayscaled, nearest-resampled to
    (hash_size, hash_size+1), and each cell compared to its right
    neighbor — a 64-bit gradient signature robust to re-encoding,
    resizing and brightness shifts, the standard near-dup key for
    IMAGE corpora (the visual counterpart of SimHash for text).

    Emitted as a '0'/'1' bit string (row-major) so any engine can
    group on it without 64-bit sign gymnastics. Undecodable payloads
    quarantine to a null hash. Arrow-batched mapInPandas; exact-dup
    grouping downstream is a plain groupBy on the hash, near-dup
    (Hamming ≤ k) reuses the SimHash pigeonhole-block join shape.
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr = codecs.decode_image(bytes(payload))
                    gray = (
                        arr[:, :, 0].astype(np.float64)
                        if arr.shape[2] == 1
                        else arr.astype(np.float64).mean(axis=2)
                    )
                    small = codecs.resize_nearest(
                        gray[:, :, None], hash_size + 1, hash_size
                    )[:, :, 0]
                    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint8)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "dhash": "".join(
                                "1" if b else "0" for b in bits.ravel()
                            ),
                        }
                    )
                except ValueError:
                    rows.append({"doc_id": doc_id, "dhash": None})
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=DHASH_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash string"


def image_phash(
    df: DataFrame, hash_size: int = 8, dct_size: int = 32
) -> DataFrame:
    """Perceptual DCT-hash (pHash, VERDICT r6 item 7) — the standard
    companion to :func:`image_dhash`: dHash keys on local gradients
    (sensitive to resampling phase), pHash keys on the image's low
    spatial FREQUENCIES, so recompressed/resized/brightness-shifted
    variants collide. Pipeline (the public imagehash convention):
    decode → grayscale → nearest-resample to
    ``dct_size``×``dct_size`` → 2-D DCT-II (un-normalized) → keep the
    top-left ``hash_size``×``hash_size`` low-frequency block → bit =
    coefficient > median of that block (median = mean of the two
    middle of the 64 sorted values). A pure brightness shift moves
    only C[0,0] — the DC sits far above the median either way, so
    the hash is brightness-invariant by construction.

    Determinism contract (the MFCC pattern): the DCT cosine tables
    are built with scalar ``math.cos`` — the same libm DuckDB's
    ``cos()`` calls — so the oracle's term-by-term replay agrees;
    coefficient comparisons ride on O(1) separations, far above
    cross-engine summation-order noise. Emitted as a '0'/'1' bit
    string row-major over (u, v); undecodable payloads quarantine to
    a null hash. Near-dup grouping downstream reuses the pigeonhole
    Hamming join + CC clustering exactly as dHash does.
    """
    import math
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    # cos(pi * u * (2r + 1) / (2 * dct_size)), u < hash_size rows
    tab = [
        [
            math.cos(math.pi * u * (2 * r + 1) / (2 * dct_size))
            for r in range(dct_size)
        ]
        for u in range(hash_size)
    ]

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        d_mat = np.array(tab)  # (hash_size, dct_size)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr = codecs.decode_image(bytes(payload))
                    gray = (
                        arr[:, :, 0].astype(np.float64)
                        if arr.shape[2] == 1
                        else arr.astype(np.float64).mean(axis=2)
                    )
                    small = codecs.resize_nearest(
                        gray[:, :, None], dct_size, dct_size
                    )[:, :, 0]
                    low = d_mat @ small @ d_mat.T  # (hash, hash)
                    flat = low.ravel()
                    s = np.sort(flat)
                    med = (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2.0
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "phash": "".join(
                                "1" if c > med else "0" for c in flat
                            ),
                        }
                    )
                except ValueError:
                    rows.append({"doc_id": doc_id, "phash": None})
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PHASH_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = (
    "doc_id long, sample_rate long, n_fft long, dominant_bin long, "
    "dominant_freq_hz double, peak_share double, band_energy_frac array<double>"
)


def audio_spectral(
    df: DataFrame, n_fft: int = 512, n_bands: int = 4
) -> DataFrame:
    """Spectral audio features from a from-spec FFT (numpy) — the
    quality-gate tier above :func:`decode_audio`'s waveform stats
    (VERDICT r5 item 5): tones, silence and clipping all hide from
    mean/RMS but are obvious in the spectrum.

    Per clip: decode 16-bit PCM WAV, mono-mix channels, rectangular-
    window rFFT over the first ``n_fft`` samples (zero-padded when
    shorter), power spectrum with DC excluded. Emits the dominant
    non-DC bin and its frequency in Hz, the dominant bin's share of
    total non-DC power (→ 1.0 for a pure bin-aligned tone, → 1/bins
    for white noise — the tonality gate), and the energy fraction per
    ``n_bands`` equal frequency bands (band spectrogram). Deterministic:
    rounded to 6 decimals; bin-aligned tones are oracle-exact
    arithmetic. Non-WAV payloads quarantine to nulls.

    Arrow-batched ``mapInPandas``, embarrassingly parallel — same
    scale shape as every media kernel here (SCALING.md media section).
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    if n_fft < 4 or n_fft & (n_fft - 1):
        raise ValueError("n_fft must be a power of two >= 4")

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        null_row = {
            "sample_rate": None, "n_fft": None, "dominant_bin": None,
            "dominant_freq_hz": None, "peak_share": None,
            "band_energy_frac": None,
        }
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(bytes(b))
                except (ValueError, EOFError, wave.Error):
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1)
                x = mono[:n_fft]
                if x.size < n_fft:
                    x = np.pad(x, (0, n_fft - x.size))
                power = np.abs(np.fft.rfft(x)) ** 2
                nondc = power[1:]
                total = float(nondc.sum())
                dom = int(nondc.argmax()) + 1 if total > 0 else 0
                share = float(nondc[dom - 1] / total) if total > 0 else 0.0
                # equal bands over bins 1..n_fft//2 (DC excluded)
                splits = np.array_split(nondc, n_bands)
                bands = (
                    [_round6(float(s.sum()) / total) for s in splits]
                    if total > 0
                    else [0.0] * n_bands
                )
                rows.append({
                    "doc_id": doc_id,
                    "sample_rate": d["sample_rate"],
                    "n_fft": n_fft,
                    "dominant_bin": dom,
                    "dominant_freq_hz": _round6(
                        dom * d["sample_rate"] / n_fft
                    ),
                    "peak_share": _round6(share),
                    "band_energy_frac": bands,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_SPECTRAL_SCHEMA)


STFT_SCHEMA = (
    "doc_id long, frame_idx long, n_frames long, dominant_bin long, "
    "dominant_freq_hz double, peak_share double"
)


def audio_stft_frames(
    df: DataFrame, n_fft: int = 256, hop: int | None = None
) -> DataFrame:
    """Frame-level STFT spectrogram: the TIME-VARYING complement of
    :func:`audio_spectral` (which summarizes one window) — per clip,
    rectangular-window rFFT frames every ``hop`` samples, each frame
    emitting its dominant non-DC bin, frequency and peak power share.
    The primitive for chirp/segment detection, silence trimming and
    per-segment quality gating in speech corpora.

    One input row → ``n_frames`` output rows (flat-map under Arrow
    ``mapInPandas``, the ``frame_sample`` shape); clips shorter than
    ``n_fft`` or undecodable quarantine to ONE all-null row so no
    document silently disappears. Frames are computed as one strided
    numpy view + a single batched rFFT per clip — no per-frame Python.
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    if n_fft < 4 or n_fft & (n_fft - 1):
        raise ValueError("n_fft must be a power of two >= 4")
    hop = n_fft if hop is None else hop
    if hop < 1:
        raise ValueError("hop must be >= 1")

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        null_row = {
            "frame_idx": None, "n_frames": None, "dominant_bin": None,
            "dominant_freq_hz": None, "peak_share": None,
        }
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(bytes(b))
                except (ValueError, EOFError, wave.Error):
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1)
                if mono.size < n_fft:
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                n_frames = (mono.size - n_fft) // hop + 1
                frames = np.lib.stride_tricks.as_strided(
                    mono,
                    shape=(n_frames, n_fft),
                    strides=(mono.strides[0] * hop, mono.strides[0]),
                )
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                nondc = power[:, 1:]
                totals = nondc.sum(axis=1)
                doms = nondc.argmax(axis=1) + 1
                for i in range(n_frames):
                    total = float(totals[i])
                    dom = int(doms[i]) if total > 0 else 0
                    rows.append({
                        "doc_id": doc_id,
                        "frame_idx": i,
                        "n_frames": n_frames,
                        "dominant_bin": dom,
                        "dominant_freq_hz": _round6(
                            dom * d["sample_rate"] / n_fft
                        ),
                        "peak_share": _round6(
                            float(nondc[i, dom - 1] / total)
                        )
                        if total > 0
                        else 0.0,
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=STFT_SCHEMA)


FRAME_ENERGY_SCHEMA = (
    "doc_id long, frame_idx long, n_frames long, rms double"
)


def audio_frame_energy(
    df: DataFrame, n_fft: int = 256, hop: int | None = None
) -> DataFrame:
    """Per-frame RMS energy (mono mix), the waveform-domain companion
    of :func:`audio_stft_frames` — one strided view + one vectorized
    reduction per clip. Quarantine: one all-null row."""
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    if n_fft < 4:
        raise ValueError("n_fft must be >= 4")
    hop = n_fft if hop is None else hop

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        null_row = {"frame_idx": None, "n_frames": None, "rms": None}
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(bytes(b))
                except (ValueError, EOFError, wave.Error):
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1)
                if mono.size < n_fft:
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                n_frames = (mono.size - n_fft) // hop + 1
                frames = np.lib.stride_tricks.as_strided(
                    mono,
                    shape=(n_frames, n_fft),
                    strides=(mono.strides[0] * hop, mono.strides[0]),
                )
                rms = np.sqrt((frames * frames).mean(axis=1))
                for i in range(n_frames):
                    rows.append({
                        "doc_id": doc_id,
                        "frame_idx": i,
                        "n_frames": n_frames,
                        "rms": _round6(float(rms[i])),
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_ENERGY_SCHEMA)


def silence_segments(
    frames: DataFrame, threshold: float = 100.0
) -> DataFrame:
    """Voice-activity segmentation over :func:`audio_frame_energy`
    output: consecutive frames on the same side of the RMS
    ``threshold`` merge into maximal speech/silence segments
    (gaps-and-islands per (doc, kind) — the scd.py pattern), numbered
    per doc. The silence-trimming / dead-air-gating primitive for
    speech corpora; pure DataFrame ops, one doc-keyed shuffle.

    Returns (doc_id, seg_idx, kind, frame_start, frame_end, n_frames).
    """
    from pyspark.sql import Window

    flagged = frames.where(F.col("frame_idx").isNotNull()).select(
        "doc_id",
        "frame_idx",
        F.when(F.col("rms") >= threshold, "speech")
        .otherwise("silence")
        .alias("kind"),
    )
    w = Window.partitionBy("doc_id", "kind").orderBy("frame_idx")
    segs = flagged.withColumn(
        "_isl", F.col("frame_idx") - F.row_number().over(w)
    ).groupBy("doc_id", "kind", "_isl").agg(
        F.min("frame_idx").cast("long").alias("frame_start"),
        F.max("frame_idx").cast("long").alias("frame_end"),
        F.count("*").cast("long").alias("n_frames"),
    )
    ws = Window.partitionBy("doc_id").orderBy("frame_start")
    return segs.select(
        "doc_id",
        (F.row_number().over(ws) - 1).cast("long").alias("seg_idx"),
        "kind",
        "frame_start",
        "frame_end",
        "n_frames",
    )


SHARPNESS_SCHEMA = (
    "doc_id long, width long, height long, var_laplacian double, "
    "blurry boolean"
)


def image_sharpness(
    df: DataFrame, blur_threshold: float = 100.0
) -> DataFrame:
    """Blur detection — variance of the 4-neighbor Laplacian over the
    grayscale interior (the classic focus measure: defocused or
    low-detail images have small high-frequency response). The
    standard image-corpus quality gate next to dHash dedup; smooth
    gradients score 0 by construction (the Laplacian of a linear ramp
    vanishes), which is exactly the property the gate exploits.

    Emits (width, height, var_laplacian, blurry); undecodable
    payloads quarantine to nulls. Arrow-batched, vectorized convolve
    via shifted-array sums — no per-pixel Python.
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        null_row = {
            "width": None, "height": None, "var_laplacian": None,
            "blurry": None,
        }
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr = codecs.decode_image(bytes(b))
                except ValueError:
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                gray = (
                    arr[:, :, 0].astype(np.float64)
                    if arr.shape[2] == 1
                    else arr.astype(np.float64).mean(axis=2)
                )
                h, w = gray.shape
                if h < 3 or w < 3:
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                g = gray[1:-1, 1:-1]
                lap = (
                    4 * g
                    - gray[:-2, 1:-1]
                    - gray[2:, 1:-1]
                    - gray[1:-1, :-2]
                    - gray[1:-1, 2:]
                )
                # Round ONCE and derive the gate from the rounded
                # value so the two emitted columns can never
                # contradict at the threshold boundary (a var of
                # 99.99999996 must not report var_laplacian=100.0
                # with blurry=True).
                var = _round6(float(lap.var()))
                rows.append({
                    "doc_id": doc_id,
                    "width": w,
                    "height": h,
                    "var_laplacian": var,
                    "blurry": var < blur_threshold,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SHARPNESS_SCHEMA)


MEL_SCHEMA = (
    "doc_id long, n_mels long, dominant_mel long, mel_energy_frac "
    "array<double>"
)


def audio_mel_bands(
    df: DataFrame, n_fft: int = 512, n_mels: int = 8
) -> DataFrame:
    """Mel-scale band energies — the perceptual front-end speech
    pipelines gate on (mel = 2595·log10(1 + f/700), the public HTK
    formula): the linear power spectrum (DC excluded) is partitioned
    into ``n_mels`` EQUAL-WIDTH mel intervals between mel(0) and
    mel(rate/2) (rectangular summation — deterministic and
    oracle-able, where triangular overlapping filters would introduce
    float weighting; production swaps librosa behind the same column
    contract). Emits the per-band energy fractions and the argmax
    band: for a pure tone the dominant mel band is exactly the band
    containing mel(f_tone) — closed-form arithmetic both engines can
    compute. Quarantine: all-null row.
    """
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    if n_fft < 4 or n_fft & (n_fft - 1):
        raise ValueError("n_fft must be a power of two >= 4")

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        def mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        null_row = {
            "n_mels": None, "dominant_mel": None, "mel_energy_frac": None,
        }
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(bytes(b))
                except (ValueError, EOFError, wave.Error):
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1)
                x = mono[:n_fft]
                if x.size < n_fft:
                    x = np.pad(x, (0, n_fft - x.size))
                power = np.abs(np.fft.rfft(x)) ** 2
                freqs = np.arange(1, n_fft // 2 + 1) * (
                    d["sample_rate"] / n_fft
                )
                m = mel(freqs)
                hi = mel(d["sample_rate"] / 2.0)
                band = np.minimum(
                    (m / hi * n_mels).astype(np.int64), n_mels - 1
                )
                nondc = power[1:]
                total = float(nondc.sum())
                fracs = [
                    _round6(float(nondc[band == i].sum()) / total)
                    if total > 0
                    else 0.0
                    for i in range(n_mels)
                ]
                dom = int(np.argmax(fracs)) if total > 0 else 0
                rows.append({
                    "doc_id": doc_id,
                    "n_mels": n_mels,
                    "dominant_mel": dom,
                    "mel_energy_frac": fracs,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MEL_SCHEMA)


MFCC_SCHEMA = "doc_id long, n_mfcc long, mfcc array<double>"


def audio_mfcc(
    df: DataFrame,
    n_fft: int = 512,
    n_mels: int = 8,
    n_mfcc: int = 4,
    log_floor: float = -20.0,
) -> DataFrame:
    """MFCC — the standard speech-corpus feature (VERDICT r6 item 5):
    DCT-II over the log-mel band energies of :func:`audio_mel_bands`,
    ``mfcc_j = Σ_i L_i · cos(π·j·(i+0.5)/n_mels)`` (plain
    un-normalized DCT-II, the textbook form; production scaling
    conventions — HTK's √(2/N), librosa 'ortho' — are a constant
    factor away and documented out).

    Determinism contract: ``L_i = ln(frac_i)`` of the ROUNDED band
    energy fraction (the same ``_round6`` fractions
    :func:`audio_mel_bands` emits), with empty bands floored at
    ``log_floor`` exactly (not ln(ε) — an exact constant both engines
    share); the cosine table is built with scalar ``math.cos`` (libm —
    the same function DuckDB's ``cos()`` calls), NOT numpy's
    vectorized cos, so the per-term products replay bit-exactly and
    the oracle's list_sum accumulates in the same ascending-i order.
    For a bin-aligned pure tone the log-mel vector is 0 at the
    dominant band and ``log_floor`` elsewhere, making every
    coefficient closed-form. Quarantine: all-null row.
    """
    import math
    from collections.abc import Iterator as _It

    from kissmetrics_to_database_spark.functions import codecs

    if n_fft < 4 or n_fft & (n_fft - 1):
        raise ValueError("n_fft must be a power of two >= 4")
    cos_tab = [
        [
            math.cos(math.pi * j * (i + 0.5) / n_mels)
            for i in range(n_mels)
        ]
        for j in range(n_mfcc)
    ]

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        def mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        null_row = {"n_mfcc": None, "mfcc": None}
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = codecs.decode_wav(bytes(b))
                except (ValueError, EOFError, wave.Error):
                    rows.append({"doc_id": doc_id, **null_row})
                    continue
                mono = d["samples"].astype(np.float64).mean(axis=1)
                x = mono[:n_fft]
                if x.size < n_fft:
                    x = np.pad(x, (0, n_fft - x.size))
                power = np.abs(np.fft.rfft(x)) ** 2
                freqs = np.arange(1, n_fft // 2 + 1) * (
                    d["sample_rate"] / n_fft
                )
                m = mel(freqs)
                hi = mel(d["sample_rate"] / 2.0)
                band = np.minimum(
                    (m / hi * n_mels).astype(np.int64), n_mels - 1
                )
                nondc = power[1:]
                total = float(nondc.sum())
                fracs = [
                    _round6(float(nondc[band == i].sum()) / total)
                    if total > 0
                    else 0.0
                    for i in range(n_mels)
                ]
                logmel = [
                    math.log(f) if f > 0 else log_floor for f in fracs
                ]
                mfcc = [
                    _round6(
                        sum(
                            logmel[i] * cos_tab[j][i]
                            for i in range(n_mels)
                        )
                    )
                    for j in range(n_mfcc)
                ]
                rows.append({
                    "doc_id": doc_id,
                    "n_mfcc": n_mfcc,
                    "mfcc": mfcc,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MFCC_SCHEMA)
