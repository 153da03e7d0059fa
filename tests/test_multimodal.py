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


def test_frame_sample_stub_raises_clearly(spark):
    # resize is REAL now (see test_codecs.py); only video frame
    # sampling still genuinely requires ffmpeg.
    payload = multimodal.attach_binary_payload(_docs(spark))
    with pytest.raises(NotImplementedError, match="ffmpeg|pyav"):
        multimodal.frame_sample_stub(payload, 10)


def test_real_decode_quarantines_text_payloads(spark):
    # synthetic text bytes are not an image: the real kernel must
    # quarantine (format='unknown', null dims), never crash the batch
    payload = multimodal.attach_binary_payload(_docs(spark))
    out = {r["doc_id"]: r.asDict() for r in multimodal.decode_media(payload).collect()}
    assert all(v["format"] == "unknown" and v["width"] is None for v in out.values())
    assert out[0]["n_bytes"] == 11
