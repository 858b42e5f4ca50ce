"""Test-side RIFF writers (WAV + AVI/MJPEG) built independently from
the published container layouts — the encoder counterpart policy every
from-scratch decoder in this repo is validated under. Frames for AVI
come from the independent test-side JPEG encoder (jpeg_ref_encoder)."""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def wav_bytes(
    samples: np.ndarray, rate: int, bits: int = 16, ieee_float: bool = False
) -> bytes:
    """samples: (n, channels) float in [-1, 1]."""
    n, ch = samples.shape
    if ieee_float:
        fmt_tag, payload = 3, samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        fmt_tag = 1
        payload = (
            np.clip(np.round(samples * 128.0 + 128.0), 0, 255)
            .astype(np.uint8)
            .tobytes()
        )
    elif bits == 16:
        fmt_tag = 1
        payload = (
            np.clip(np.round(samples * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    elif bits == 24:
        fmt_tag = 1
        v = np.clip(np.round(samples * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(
            np.int64
        )
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32).ravel()
        payload = (
            np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=1)
            .astype(np.uint8)
            .tobytes()
        )
    else:  # 32-bit int
        fmt_tag = 1
        payload = (
            np.clip(
                np.round(samples * float(1 << 31)), -(1 << 31), (1 << 31) - 1
            )
            .astype("<i4")
            .tobytes()
        )
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block, block, bits)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_bytes(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Minimal spec-shaped AVI: hdrl(avih + strl(strh, strf)) + movi
    with one 00dc MJPEG chunk per frame."""
    from jpeg_ref_encoder import encode_jpeg

    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, qtable=[1] * 64) for f in frames]
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # usec per frame
        0, 0, 0x10,        # max bytes/sec, padding, flags (HASINDEX off)
        len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
