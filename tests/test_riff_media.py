"""Audio/video multimodal legs: WAV PCM decode + AVI/MJPEG frame
sampling, validated against the independent test-side RIFF writers
(riff_ref_writer) standalone and through the Spark operators."""

from __future__ import annotations

import numpy as np
import pytest

from riff_ref_writer import avi_mjpeg_bytes, wav_bytes

from openocr_spark.kernels.media_decode import decode_bytes
from openocr_spark.kernels.riff_media import decode_avi_frames, decode_wav
from openocr_spark.operators.multimodal import audio_stats, video_frame_sample


def _tone(n=480, ch=2, rate=8000):
    t = np.arange(n) / rate
    left = np.sin(2 * np.pi * 440 * t)
    right = 0.5 * np.sin(2 * np.pi * 220 * t)
    return np.stack([left, right][:ch], axis=1)


@pytest.mark.parametrize(
    "bits,ieee", [(8, False), (16, False), (24, False), (32, False), (32, True), (64, True)]
)
def test_wav_roundtrip_all_widths(bits, ieee):
    x = _tone()
    data = wav_bytes(x, 8000, bits=bits, ieee_float=ieee)
    got, rate = decode_wav(data)
    assert rate == 8000 and got.shape == x.shape
    # quantization error bounded by one step of the narrowest width
    tol = 1e-6 if ieee else 2.0 ** -(bits - 1) + 1e-6
    np.testing.assert_allclose(got, x, atol=tol)


def test_wav_compressed_fails_loudly():
    data = bytearray(wav_bytes(_tone(), 8000))
    data[20] = 0x55  # fmt tag -> some compressed codec id
    with pytest.raises(NotImplementedError, match="fail-loud boundary"):
        decode_wav(bytes(data))


def _frames(k=5, h=24, w=32):
    rng = np.random.default_rng(42)
    return [
        (rng.integers(0, 256, size=(h, w)).astype(np.uint8) // 16 * 16)
        for _ in range(k)
    ]


def test_avi_mjpeg_frames_decode():
    frames = _frames()
    data = avi_mjpeg_bytes(frames)
    got = decode_avi_frames(data)
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        assert a.shape == b.shape
        # near-lossless qtable: frames match to small JPEG error
        assert float(np.abs(a.astype(int) - b.astype(int)).mean()) < 3.0


def test_avi_every_n_strides_at_chunk_level():
    frames = _frames(7)
    data = avi_mjpeg_bytes(frames)
    got = decode_avi_frames(data, every_n=3)
    assert len(got) == 3  # frames 0, 3, 6


def test_avi_through_decode_bytes_pages():
    data = avi_mjpeg_bytes(_frames(3))
    pages = decode_bytes(data)
    assert len(pages) == 3 and all(p.dtype == np.uint8 for p in pages)


def test_wav_through_decode_bytes_fails_with_pointer():
    with pytest.raises(NotImplementedError, match="decode_wav"):
        decode_bytes(wav_bytes(_tone(), 8000))


def test_non_mjpeg_avi_fails_loudly():
    frames = _frames(1)
    data = bytearray(avi_mjpeg_bytes(frames))
    i = data.find(b"\xff\xd8")  # corrupt the frame codec
    data[i] = 0x00
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi_frames(bytes(data))


def test_audio_stats_operator(spark):
    x = _tone()
    rows = audio_stats(
        spark.createDataFrame(
            [("a1", bytearray(wav_bytes(x, 8000)))], "media_ref string, payload binary"
        )
    ).collect()
    r = rows[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 2, 480)
    assert r.duration_ms == pytest.approx(60.0)
    assert r.rms == pytest.approx(float(np.sqrt(np.mean(x**2))), abs=1e-3)
    assert r.peak == pytest.approx(float(np.abs(x).max()), abs=1e-3)


def test_video_frame_sample_operator(spark):
    frames = _frames(6)
    rows = video_frame_sample(
        spark.createDataFrame(
            [("v1", bytearray(avi_mjpeg_bytes(frames)))],
            "media_ref string, payload binary",
        ),
        every_n=2,
    ).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 2, 4]
    assert all(
        (r.height, r.width) == frames[0].shape and 0 <= r.mean_px <= 255
        for r in rows
    )


# ------------------- review-finding regressions (r6 second pass) ----


def test_wav_extensible_pcm_decodes():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping the PCM SubFormat GUID
    is the mandated layout for >16-bit / >2-channel PCM — it must
    decode, not be mislabeled as compressed audio."""
    import struct

    x = _tone(240, ch=2)
    base = wav_bytes(x, 8000, bits=24)
    # rebuild with an extensible fmt chunk: tag 0xFFFE + 22-byte ext
    i = base.find(b"fmt ")
    (fmt_size,) = struct.unpack_from("<I", base, i + 4)
    fmt_body = bytearray(base[i + 8 : i + 8 + fmt_size])
    struct.pack_into("<H", fmt_body, 0, 0xFFFE)
    ext = struct.pack("<HHI", 22, 24, 0b11) + struct.pack(
        "<I", 1
    ) + bytes.fromhex("00001000800000aa00389b71")
    new_fmt = bytes(fmt_body) + ext
    data_chunk = base[i + 8 + fmt_size :]
    rebuilt = (
        base[:i]
        + b"fmt "
        + struct.pack("<I", len(new_fmt))
        + new_fmt
        + data_chunk
    )
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    got, rate = decode_wav(rebuilt)
    assert rate == 8000 and got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=2.0**-23 + 1e-6)


def test_wav_trailing_garbage_tolerated():
    """The walk is bounded by the RIFF size field: bytes appended past
    a complete valid file must not abort the decode."""
    x = _tone()
    data = wav_bytes(x, 8000) + b"\x99" * 37
    got, rate = decode_wav(data)
    assert rate == 8000 and got.shape == x.shape


def test_wav_float_nonfinite_sanitized():
    """NaN/inf float samples sanitize (NaN->0, +-inf -> +-1) instead of
    poisoning downstream stats — the EXR/PFM non-finite stance."""
    x = _tone(n=16, ch=1)
    data = bytearray(wav_bytes(x, 8000, bits=32, ieee_float=True))
    i = data.find(b"data") + 8
    data[i : i + 4] = np.array([np.nan], "<f4").tobytes()
    data[i + 4 : i + 8] = np.array([np.inf], "<f4").tobytes()
    got, _ = decode_wav(bytes(data))
    assert np.isfinite(got).all()
    assert got[0, 0] == 0.0 and got[1, 0] == 1.0


def test_avi_drop_frames_skipped():
    """Zero-length '00dc' chunks are the AVI drop-frame timing
    placeholder — a valid file, not a foreign codec."""
    import struct

    frames = _frames(3)
    data = avi_mjpeg_bytes(frames)
    i = data.find(b"00dc")
    empty = b"00dc" + struct.pack("<I", 0)
    patched = bytearray(data[:i] + empty + data[i:])
    # the insert sits inside the movi LIST: grow its declared size too
    m = patched.find(b"movi")
    (movi_size,) = struct.unpack_from("<I", patched, m - 4)
    struct.pack_into("<I", patched, m - 4, movi_size + len(empty))
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    got = decode_avi_frames(bytes(patched))
    assert len(got) == 3


def test_avi_second_stream_ignored():
    """Chunks from a second video stream id must not interleave into
    the first stream's frame sequence (the player-0 convention)."""
    import struct

    frames = _frames(2)
    data = avi_mjpeg_bytes(frames)
    i = data.find(b"00dc")
    j = data.find(b"00dc", i + 4)
    foreign = bytearray(data)
    foreign[j : j + 2] = b"01"  # second chunk now belongs to stream 01
    got = decode_avi_frames(bytes(foreign))
    assert len(got) == 1  # only stream 00's frame


def test_avi_deep_list_nesting_bounded():
    """~600 nested LISTs must terminate with a clean result or error —
    never RecursionError (iterative walk)."""
    import struct

    inner = b""
    for _ in range(600):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"rec " + inner
    data = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert decode_avi_frames(data) == []


def test_avi_aggregate_allocation_capped():
    """The TOTAL decoded samples are capped, not just per-frame — a
    long clip cannot materialize gigabytes from one row."""
    import struct

    from openocr_spark.kernels import riff_media

    frames = _frames(4, h=16, w=16)
    data = avi_mjpeg_bytes(frames)
    orig = riff_media.MAX_DECODE_SAMPLES
    riff_media.MAX_DECODE_SAMPLES = 16 * 16 * 2  # cap at two frames
    try:
        with pytest.raises(NotImplementedError, match="aggregate cap"):
            decode_avi_frames(data)
        assert len(decode_avi_frames(data, every_n=2)) == 2  # stride fits
    finally:
        riff_media.MAX_DECODE_SAMPLES = orig


def test_wav_roundtrip_property():
    """Randomized (n, channels, rate, width) round trips within one
    quantization step — the property-level version of the width matrix."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=2000)
    @given(
        n=st.integers(1, 300),
        ch=st.integers(1, 6),
        rate=st.sampled_from([8000, 16000, 44100, 192000]),
        width=st.sampled_from([(8, False), (16, False), (24, False),
                               (32, False), (32, True), (64, True)]),
        seed=st.integers(0, 2**16),
    )
    def check(n, ch, rate, width, seed):
        bits, ieee = width
        rng = np.random.default_rng(seed)
        x = (rng.random((n, ch)) * 2 - 1).astype(np.float64) * 0.999
        got, got_rate = decode_wav(wav_bytes(x, rate, bits=bits, ieee_float=ieee))
        assert got_rate == rate and got.shape == (n, ch)
        tol = 1e-6 if ieee else 2.0 ** -(bits - 1) + 1e-6
        np.testing.assert_allclose(got, x, atol=tol)

    check()
