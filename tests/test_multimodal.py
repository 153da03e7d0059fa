"""Multimodal plumbing: payload attachment, decode schema/batching,
byte-feature extraction against pure-Python ground truth."""

from __future__ import annotations

import math

import pytest

from kissmetrics_to_database_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "aaaa"), (2, "x")], ["doc_id", "text"]
    )


def test_decode_fake_kernel_deterministic(spark):
    payload = multimodal.attach_binary_payload(_docs(spark))
    out = {r["doc_id"]: r.asDict() for r in multimodal.decode_images(payload).collect()}
    assert out[0]["n_bytes"] == 11
    assert out[0]["first_byte"] == ord("h")
    assert out[0]["fake_width"] == 64 + 11 % 577
    assert out[0]["fake_format"] == ["png", "jpeg", "webp"][11 % 3]
    # pure function of bytes → stable across runs
    again = {r["doc_id"]: r.asDict() for r in multimodal.decode_images(payload).collect()}
    assert out == again


def test_extract_features_matches_python(spark):
    payload = multimodal.attach_binary_payload(_docs(spark))
    out = {r["doc_id"]: r for r in multimodal.extract_features(payload).collect()}

    for doc_id, text in [(0, "hello world"), (1, "aaaa"), (2, "x")]:
        b = text.encode()
        hist = [0] * 16
        for byte in b:
            hist[byte >> 4] += 1
        probs = [h / len(b) for h in hist if h > 0]
        entropy = round(-sum(p * math.log2(p) for p in probs), 6)
        r = out[doc_id]
        assert r["n_bytes"] == len(b)
        assert list(r["byte_hist"]) == hist
        assert abs(r["entropy"] - entropy) < 1e-9

    # all-identical bytes → zero entropy
    assert out[1]["entropy"] == 0.0


def _gradient_frame(h, w, shift):
    import numpy as np

    y = np.linspace(0, 200, h)[:, None]
    x = np.linspace(0, 200, w)[None, :]
    base = (y + x) / 2 + shift
    return np.clip(
        np.stack([base, base[::-1], np.full((h, w), 90.0)], 2), 0, 255
    ).astype(np.uint8)


def test_frame_sample_mjpeg_avi_real(spark):
    # the former ffmpeg stub, now REAL for MJPEG-AVI: RIFF walk +
    # from-spec baseline JPEG decode, every_n sampling, PNG frames out
    import numpy as np

    from kissmetrics_to_database_spark.functions import avi, codecs, jpeg

    frames = [_gradient_frame(16, 24, 10 * i) for i in range(6)]
    payload = avi.build_mjpeg_avi(
        [jpeg.encode_jpeg(f, q=2) for f in frames], 24, 16, fps=10
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\x00\x00notvideo"))],
        "doc_id long, payload binary",
    )
    out = multimodal.frame_sample(df, every_n=2).collect()
    sampled = sorted(
        (r for r in out if r.doc_id == 1), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in sampled] == [0, 2, 4]
    assert all((r.width, r.height) == (24, 16) for r in sampled)
    # the PNG payload decodes back to the JPEG-decoded frame exactly
    png0 = codecs.decode_png(bytes(sampled[0].frame_png))
    assert np.abs(
        png0.astype(int) - frames[0].astype(int)
    ).max() <= 16  # JPEG quantization bound only; PNG step is lossless
    # non-video payload quarantines to a single null row
    quarantined = [r for r in out if r.doc_id == 2]
    assert len(quarantined) == 1 and quarantined[0].frame_idx is None


def test_frame_sample_y4m_uncompressed(spark):
    import numpy as np

    from kissmetrics_to_database_spark.functions import avi, codecs

    frames = [_gradient_frame(8, 8, 30 * i) for i in range(3)]
    payload = avi.build_y4m(frames, fps=5, colorspace="444")
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    out = sorted(
        multimodal.frame_sample(df, every_n=1).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    # C444 YCbCr round trip is near-exact (rounding only)
    got = codecs.decode_png(bytes(out[1].frame_png))
    assert np.abs(got.astype(int) - frames[1].astype(int)).max() <= 2


def test_real_decode_quarantines_text_payloads(spark):
    # synthetic text bytes are not an image: the real kernel must
    # quarantine (format='unknown', null dims), never crash the batch
    payload = multimodal.attach_binary_payload(_docs(spark))
    out = {r["doc_id"]: r.asDict() for r in multimodal.decode_media(payload).collect()}
    assert all(v["format"] == "unknown" and v["width"] is None for v in out.values())
    assert out[0]["n_bytes"] == 11


def test_truncated_payloads_quarantine_not_crash(spark):
    # ADVICE r4: a mid-entropy-truncated JPEG used to escape as
    # IndexError, a truncated AVI as struct.error, a cut PNG IDAT as
    # zlib.error — killing the whole mapInPandas task. All must now
    # quarantine the single row.
    import numpy as np

    from kissmetrics_to_database_spark.functions import avi, codecs, jpeg

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    jpg = jpeg.encode_jpeg(img)
    png = codecs.encode_png(img)
    avi_b = avi.build_mjpeg_avi([jpg], 16, 16)
    bad = [
        (1, jpg[: len(jpg) // 2]),        # cut entropy stream
        (2, png[: len(png) // 2]),        # cut mid-IDAT
        (3, avi_b[:30]),                  # cut RIFF header chunks
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in bad], "doc_id long, payload binary"
    )
    decoded = {r["doc_id"]: r for r in multimodal.decode_media(df).collect()}
    assert len(decoded) == 3
    assert all(r["width"] is None for r in decoded.values())

    sampled = multimodal.frame_sample(df).collect()
    assert len(sampled) == 3
    assert all(r["frame_idx"] is None for r in sampled)


def test_image_dhash_invariances(spark):
    # the perceptual contract: identical pixels under different
    # encodings hash identically; a global brightness shift (no
    # clipping) preserves every left<right comparison; a genuinely
    # different image differs
    import numpy as np

    from kissmetrics_to_database_spark.functions import codecs

    yy, xx = np.mgrid[0:20, 0:24]
    base = ((5 * xx + 3 * yy) % 200).astype(np.uint8)
    rows = [
        (1, codecs.encode_ppm(base)),                       # PGM
        (2, codecs.encode_png(base)),                       # same pixels, PNG
        (3, codecs.encode_ppm((base + 30).astype(np.uint8))),  # brightness
        (4, codecs.encode_ppm(base[:, ::-1].copy())),       # mirrored image
        (5, b"not an image"),                               # quarantine
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r["dhash"] for r in multimodal.image_dhash(df).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]
    assert got[5] is None
    assert len(got[1]) == 64 and set(got[1]) <= {"0", "1"}
