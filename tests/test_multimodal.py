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


class TestAudioSpectral:
    def _wav(self, samples, rate=16000):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs

        return codecs.encode_wav(
            np.asarray(samples, dtype=np.int16), sample_rate=rate
        )

    def test_pure_tone_exact(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        t = np.arange(512)
        tone = np.rint(9000 * np.sin(2 * np.pi * 11 * t / 512))
        df = spark.createDataFrame(
            [(0, bytearray(self._wav(tone)))], "doc_id long, payload binary"
        )
        [r] = multimodal.audio_spectral(df, n_fft=512).collect()
        assert r["dominant_bin"] == 11
        assert r["dominant_freq_hz"] == round(11 * 16000 / 512, 6)
        assert r["peak_share"] == 1.0
        # bin 11 of 256 non-DC bins -> entirely inside band 0 of 4
        assert r["band_energy_frac"][0] == 1.0
        assert r["band_energy_frac"][1:] == [0.0, 0.0, 0.0]

    def test_two_tones_band_split(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        t = np.arange(512)
        # equal-amplitude tones in band 0 (bin 10) and band 3 (bin 220)
        x = 6000 * np.sin(2 * np.pi * 10 * t / 512) + 6000 * np.sin(
            2 * np.pi * 220 * t / 512
        )
        df = spark.createDataFrame(
            [(0, bytearray(self._wav(np.rint(x))))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_spectral(df, n_fft=512, n_bands=4).collect()
        b = r["band_energy_frac"]
        assert abs(b[0] - 0.5) < 1e-4 and abs(b[3] - 0.5) < 1e-4
        assert r["dominant_bin"] in (10, 220)
        assert abs(r["peak_share"] - 0.5) < 1e-4

    def test_stereo_mono_mix_and_short_clip_pad(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        t = np.arange(256)  # shorter than n_fft=512 -> zero-padded
        tone = np.rint(7000 * np.sin(2 * np.pi * 16 * t / 256))
        stereo = np.stack([tone, tone], axis=1)
        df = spark.createDataFrame(
            [(0, bytearray(self._wav(stereo, rate=8000)))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_spectral(df, n_fft=512).collect()
        # 16 cycles over 256 samples = 32 cycles over 512 -> bin 32
        assert r["dominant_bin"] == 32
        assert r["sample_rate"] == 8000

    def test_non_wav_quarantines(self, spark):
        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame(
            [(0, bytearray(b"not audio at all"))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_spectral(df).collect()
        assert r["dominant_bin"] is None and r["peak_share"] is None

    def test_bad_n_fft_rejected(self, spark):
        import pytest as _pytest

        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame([], "doc_id long, payload binary")
        with _pytest.raises(ValueError, match="power of two"):
            multimodal.audio_spectral(df, n_fft=500)


class TestAudioStft:
    def _wav(self, samples, rate=16000):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs

        return codecs.encode_wav(
            np.asarray(samples, dtype=np.int16), sample_rate=rate
        )

    def test_chirp_segments_tracked_per_frame(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        n = 256
        t = np.arange(4 * n)
        k = np.where(t < 2 * n, 5, 40)
        x = np.rint(9000 * np.sin(2 * np.pi * k * t / n))
        df = spark.createDataFrame(
            [(0, bytearray(self._wav(x)))], "doc_id long, payload binary"
        )
        rows = sorted(
            multimodal.audio_stft_frames(df, n_fft=256).collect(),
            key=lambda r: r["frame_idx"],
        )
        assert [r["dominant_bin"] for r in rows] == [5, 5, 40, 40]
        assert all(r["peak_share"] == 1.0 for r in rows)
        assert all(r["n_frames"] == 4 for r in rows)

    def test_overlap_hop_frame_count(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        n = 256
        t = np.arange(4 * n)
        x = np.rint(8000 * np.sin(2 * np.pi * 8 * t / n))
        df = spark.createDataFrame(
            [(0, bytearray(self._wav(x)))], "doc_id long, payload binary"
        )
        rows = multimodal.audio_stft_frames(df, n_fft=256, hop=128).collect()
        # (1024 - 256) / 128 + 1 = 7 frames, all the same tone
        assert len(rows) == 7
        assert all(r["dominant_bin"] == 8 for r in rows)

    def test_short_and_bad_clips_quarantine_one_row(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        short = np.rint(1000 * np.sin(np.arange(100)))
        df = spark.createDataFrame(
            [
                (0, bytearray(self._wav(short))),
                (1, bytearray(b"junk bytes")),
            ],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in multimodal.audio_stft_frames(df).collect()}
        assert len(out) == 2
        assert out[0]["frame_idx"] is None and out[1]["frame_idx"] is None


class TestSilenceSegments:
    def test_alternating_segments(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        n = 128
        t = np.arange(5 * n)
        frame = t // n
        tone = np.rint(8000 * np.sin(2 * np.pi * 4 * t / n))
        x = np.where(np.isin(frame, (1, 2)), tone, 0.0).astype(np.int16)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(x, sample_rate=8000)))],
            "doc_id long, payload binary",
        )
        frames = multimodal.audio_frame_energy(df, n_fft=128)
        segs = [
            (r["seg_idx"], r["kind"], r["frame_start"], r["frame_end"])
            for r in multimodal.silence_segments(frames)
            .orderBy("seg_idx")
            .collect()
        ]
        assert segs == [
            (0, "silence", 0, 0),
            (1, "speech", 1, 2),
            (2, "silence", 3, 4),
        ]

    def test_all_silence_single_segment(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        x = np.zeros(512, np.int16)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(x)))],
            "doc_id long, payload binary",
        )
        frames = multimodal.audio_frame_energy(df, n_fft=128)
        segs = multimodal.silence_segments(frames).collect()
        assert len(segs) == 1
        assert segs[0]["kind"] == "silence" and segs[0]["n_frames"] == 4

    def test_quarantined_rows_excluded(self, spark):
        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame(
            [(0, bytearray(b"nope"))], "doc_id long, payload binary"
        )
        frames = multimodal.audio_frame_energy(df)
        assert multimodal.silence_segments(frames).count() == 0


class TestImageSharpness:
    def _png(self, img):
        from kissmetrics_to_database_spark.functions import codecs

        return codecs.encode_png(img)

    def test_checkerboard_exact_variance_and_ramp_zero(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        yy, xx = np.mgrid[0:10, 0:10]
        checker = (((yy + xx) % 2 == 0) * 30).astype(np.uint8)[:, :, None]
        ramp = (yy * 7).astype(np.uint8)[:, :, None]
        flat = np.full((10, 10, 1), 99, np.uint8)
        df = spark.createDataFrame(
            [
                (0, bytearray(self._png(checker))),
                (1, bytearray(self._png(ramp))),
                (2, bytearray(self._png(flat))),
                (3, bytearray(b"garbage")),
            ],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in multimodal.image_sharpness(df).collect()}
        assert out[0]["var_laplacian"] == 16 * 30 * 30  # exact
        assert out[0]["blurry"] is False
        assert out[1]["var_laplacian"] == 0.0 and out[1]["blurry"] is True
        assert out[2]["var_laplacian"] == 0.0 and out[2]["blurry"] is True
        assert out[3]["var_laplacian"] is None

    def test_rgb_uses_channel_mean_and_tiny_quarantines(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[::2, ::2] = 60
        rgb[1::2, 1::2] = 60
        tiny = np.full((2, 2, 1), 10, np.uint8)
        df = spark.createDataFrame(
            [
                (0, bytearray(self._png(rgb))),
                (1, bytearray(self._png(tiny))),
            ],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in multimodal.image_sharpness(df).collect()}
        assert out[0]["var_laplacian"] > 0
        assert out[1]["var_laplacian"] is None  # interior too small


class TestMelBands:
    def test_pure_tone_single_band(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        t = np.arange(512)
        tone = np.rint(9000 * np.sin(2 * np.pi * 20 * t / 512)).astype(
            np.int16
        )
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(tone, sample_rate=16000)))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_mel_bands(df, n_fft=512, n_mels=8).collect()
        # f = 20*16000/512 = 625 Hz; mel(625)/mel(8000)*8 -> band 2
        import math

        mel = lambda f: 2595 * math.log10(1 + f / 700)  # noqa: E731
        expect = min(int(mel(625) / mel(8000) * 8), 7)
        assert r["dominant_mel"] == expect
        assert r["mel_energy_frac"][expect] == 1.0
        assert sum(r["mel_energy_frac"]) == 1.0

    def test_white_noise_spreads_low_bands_widest(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        rng = np.random.default_rng(0)
        noise = rng.integers(-20000, 20000, 512).astype(np.int16)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(noise, sample_rate=16000)))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_mel_bands(df, n_fft=512, n_mels=8).collect()
        fr = r["mel_energy_frac"]
        # flat linear spectrum: HIGH mel bands cover more linear
        # bandwidth, so energy increases with band index on average
        assert fr[-1] > fr[0]
        assert abs(sum(fr) - 1.0) < 1e-4

    def test_quarantine(self, spark):
        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame(
            [(0, bytearray(b"x"))], "doc_id long, payload binary"
        )
        [r] = multimodal.audio_mel_bands(df).collect()
        assert r["dominant_mel"] is None


class TestMfcc:
    def test_pure_tone_closed_form_dct(self, spark):
        # a bin-aligned tone makes the log-mel vector [0 at band b,
        # -20 floor elsewhere], so mfcc_j == -20·Σ_{i≠b} cos(πj(i+½)/8)
        # — the closed-form DCT-II the oracle replays
        import math

        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        t = np.arange(512)
        tone = np.rint(9000 * np.sin(2 * np.pi * 20 * t / 512)).astype(
            np.int16
        )
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(tone, sample_rate=16000)))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_mfcc(
            df, n_fft=512, n_mels=8, n_mfcc=4
        ).collect()
        mel = lambda f: 2595 * math.log10(1 + f / 700)  # noqa: E731
        b = min(int(mel(20 * 16000 / 512) / mel(8000) * 8), 7)
        for j in range(4):
            want = sum(
                0.0 if i == b
                else -20.0 * math.cos(math.pi * j * (i + 0.5) / 8)
                for i in range(8)
            )
            assert abs(r["mfcc"][j] - round(want, 6)) < 1e-9, (j, b)
        assert r["mfcc"][0] == -140.0  # 7 floored bands at cos(0)=1
        assert r["n_mfcc"] == 4

    def test_flat_bands_kill_higher_coefficients(self, spark):
        # if every band has identical energy the DCT-II of a constant
        # vector is zero for all j >= 1 — the defining property
        import numpy as np

        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        # synthesize equal energy per MEL band: one bin-aligned tone
        # in each band, equal amplitude in the FFT domain is not
        # needed — use the operator's own band map to place one tone
        # per band with equal power
        import math

        mel = lambda f: 2595 * math.log10(1 + f / 700)  # noqa: E731
        rate, n_fft = 16000, 512
        bins_by_band: dict[int, int] = {}
        for k in range(1, n_fft // 2 + 1):
            bnd = min(int(mel(k * rate / n_fft) / mel(rate / 2) * 8), 7)
            bins_by_band.setdefault(bnd, k)
        t = np.arange(n_fft)
        x = np.zeros(n_fft)
        for k in bins_by_band.values():
            x += 4000 * np.cos(2 * np.pi * k * t / n_fft)
        tone = np.rint(x).astype(np.int16)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_wav(tone, sample_rate=rate)))],
            "doc_id long, payload binary",
        )
        [r] = multimodal.audio_mfcc(df, n_fft=n_fft).collect()
        # all 8 bands hold frac 0.125 -> logmel constant -> c_j≈0, j>=1
        for j in range(1, 4):
            assert abs(r["mfcc"][j]) < 1e-3, r["mfcc"]

    def test_quarantine(self, spark):
        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame(
            [(0, bytearray(b"nope"))], "doc_id long, payload binary"
        )
        [r] = multimodal.audio_mfcc(df).collect()
        assert r["n_mfcc"] is None and r["mfcc"] is None


class TestPhash:
    def _hash(self, spark, imgs):
        from kissmetrics_to_database_spark.functions import codecs
        from kissmetrics_to_database_spark.operators import multimodal

        df = spark.createDataFrame(
            [(i, bytearray(codecs.encode_ppm(img)))
             for i, img in enumerate(imgs)],
            "doc_id long, payload binary",
        )
        return {
            r["doc_id"]: r["phash"]
            for r in multimodal.image_phash(df).collect()
        }

    def test_brightness_and_resize_invariant(self, spark):
        import numpy as np

        yy, xx = np.mgrid[0:32, 0:32]
        base = (
            (3 * xx + 7 * yy + (yy * 13 + xx * 29) * 2654435761 % 97)
            % 180
        ).astype(np.uint8)
        brighter = (base.astype(np.int64) + 40).astype(np.uint8)
        y2, x2 = np.mgrid[0:64, 0:64]
        upscaled = (
            (3 * (x2 // 2) + 7 * (y2 // 2)
             + ((y2 // 2) * 13 + (x2 // 2) * 29) * 2654435761 % 97)
            % 180
        ).astype(np.uint8)
        h = self._hash(spark, [base, brighter, upscaled])
        assert len(h[0]) == 64 and set(h[0]) <= {"0", "1"}
        assert h[0] == h[1]  # +40 brightness moves only the DC
        assert h[0] == h[2]  # 2x nearest upscale resamples exactly

    def test_small_edit_small_distance_big_edit_large(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.integers(0, 200, (32, 32)).astype(np.uint8)
        tweaked = base.copy()
        tweaked[:3, :3] = 255  # small low-freq dent
        other = rng.integers(0, 200, (32, 32)).astype(np.uint8)
        h = self._hash(spark, [base, tweaked, other])
        d_small = sum(a != b for a, b in zip(h[0], h[1]))
        d_other = sum(a != b for a, b in zip(h[0], h[2]))
        assert d_small < d_other
        assert d_other > 10  # unrelated textures differ broadly

    def test_dc_bit_set_and_quarantine(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.operators import multimodal

        img = np.full((32, 32), 200, np.uint8)
        img[0, 0] = 10  # break exact constancy
        h = self._hash(spark, [img])
        assert h[0][0] == "1"  # DC far above the AC median
        df = spark.createDataFrame(
            [(0, bytearray(b"junk"))], "doc_id long, payload binary"
        )
        [r] = multimodal.image_phash(df).collect()
        assert r["phash"] is None


class TestSceneCuts:
    def test_two_scene_y4m_exact_boundary(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import avi
        from kissmetrics_to_database_spark.operators import multimodal

        frames = [np.full((8, 8, 3), 50, np.uint8)] * 3 + [
            np.full((8, 8, 3), 90, np.uint8)
        ] * 2
        df = spark.createDataFrame(
            [(0, bytearray(avi.build_y4m(frames, colorspace="444")))],
            "doc_id long, payload binary",
        )
        rows = sorted(
            multimodal.video_scene_cuts(df, threshold=15.0).collect(),
            key=lambda r: r["frame_idx"],
        )
        assert [r["frame_idx"] for r in rows] == [1, 2, 3, 4]
        assert [r["mean_diff"] for r in rows] == [0.0, 0.0, 40.0, 0.0]
        assert [r["is_cut"] for r in rows] == [False, False, True, False]
        assert all(r["n_frames"] == 5 for r in rows)

    def test_dimension_change_counts_as_cut_and_quarantine(self, spark):
        import numpy as np

        from kissmetrics_to_database_spark.functions import avi, jpeg
        from kissmetrics_to_database_spark.operators import multimodal

        # MJPEG stream with a mid-stream dimension change
        f1 = jpeg.encode_jpeg(np.full((16, 16, 1), 80, np.uint8), q=1)
        f2 = jpeg.encode_jpeg(np.full((24, 16, 1), 80, np.uint8), q=1)
        payload = avi.build_mjpeg_avi([f1, f2], 16, 16)
        df = spark.createDataFrame(
            [(0, bytearray(payload)), (1, bytearray(b"garbage"))],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in multimodal.video_scene_cuts(df).collect()}
        assert out[0]["is_cut"] is True and out[0]["mean_diff"] is None
        assert out[1]["frame_idx"] is None  # quarantine
