"""Container-level tests for functions/avi.py (MJPEG-AVI + Y4M)."""

from __future__ import annotations

import numpy as np
import pytest

from kissmetrics_to_database_spark.functions import avi, jpeg


def _frame(h, w, shift=0):
    y = np.linspace(0, 200, h)[:, None]
    x = np.linspace(0, 200, w)[None, :]
    return np.clip(
        np.stack([(y + x) / 2 + shift, y + 0 * x, 0 * y + x], 2), 0, 255
    ).astype(np.uint8)


def test_avi_roundtrip_header_and_frames():
    frames = [_frame(16, 24, 5 * i) for i in range(4)]
    payload = avi.build_mjpeg_avi(
        [jpeg.encode_jpeg(f, q=2) for f in frames], 24, 16, fps=10
    )
    meta = avi.parse_avi(payload)
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["fps"] == 10.0
    assert meta["n_frames"] == 4 and len(meta["frames"]) == 4
    assert meta["handler"] == "MJPG"
    decoded = jpeg.decode_jpeg(meta["frames"][2])
    assert np.abs(decoded.astype(int) - frames[2].astype(int)).max() <= 16


def test_avi_odd_sized_chunks_stay_aligned():
    # JPEG payloads of odd byte length force the RIFF word-alignment
    # padding path; frame boundaries must survive
    frames = [_frame(8, 8, i) for i in range(3)]
    encoded = [jpeg.encode_jpeg(f, q=2) for f in frames]
    encoded = [e + b"\x00" if len(e) % 2 == 0 else e for e in encoded]
    payload = avi.build_mjpeg_avi(encoded, 8, 8)
    meta = avi.parse_avi(payload)
    assert [len(f) for f in meta["frames"]] == [len(e) for e in encoded]


def test_y4m_420_roundtrip():
    frames = [_frame(16, 16, 10 * i) for i in range(2)]
    meta = avi.parse_y4m(avi.build_y4m(frames, fps=30, colorspace="420"))
    assert (meta["width"], meta["height"], meta["fps"]) == (16, 16, 30.0)
    assert meta["colorspace"].startswith("420")
    err = np.abs(
        meta["frames"][0].astype(int) - frames[0].astype(int)
    )
    assert err.mean() < 4.0  # chroma box-average + nearest upsample


def test_sniff_video_and_error_paths():
    assert avi.sniff_video(b"RIFF\x00\x00\x00\x00AVI ") == "avi"
    assert avi.sniff_video(b"YUV4MPEG2 W8 H8\n") == "y4m"
    assert avi.sniff_video(b"\x00\x00\x00\x18ftypmp42") == "unknown"
    with pytest.raises(ValueError, match="RIFF"):
        avi.parse_avi(b"nope")
    with pytest.raises(ValueError, match="Y4M"):
        avi.parse_y4m(b"nope")
    with pytest.raises(ValueError, match="colorspace"):
        avi.parse_y4m(b"YUV4MPEG2 W8 H8 C422\nFRAME\n" + b"\x00" * 200)
