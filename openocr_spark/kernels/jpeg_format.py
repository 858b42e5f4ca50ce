"""From-scratch baseline JPEG (JFIF) decoder — numpy only.

Closes the last entropy-codec stub in media_decode (the reference
decodes JPEG via cv2.imdecode, opendet/preprocess/__init__.py:85-143):
segment parse (DQT/DHT/SOF0/DRI/SOS), canonical Huffman decode with
0xFF00 byte-unstuffing and RSTn restart handling, DC-diff + AC
run-length/EOB/ZRL, dequantize → inverse zigzag → 8×8 IDCT (separable
cosine basis, one matmul pair per block), interleaved MCU layout with
arbitrary (h,v) sampling factors (4:4:4 and 4:2:0 covered by tests),
nearest-neighbor chroma upsample, BT.601 YCbCr→RGB.

Scope: BASELINE sequential DCT (SOF0), 8-bit samples, 1 or 3
components. Progressive (SOF2), arithmetic coding, and 12-bit raise
NotImplementedError.

Decoding is exact per the spec's integer pipeline except IDCT rounding,
which is float64 cosine transform + round-half-away — tests bound the
round-trip error against an independent test-side encoder.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# separable IDCT basis: block = A.T @ coef @ A,  A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_A = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])


def idct_8x8(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


class _HuffTable:
    """Canonical Huffman table (DHT BITS/HUFFVAL): decode by walking
    code lengths 1..16, comparing against the running min-code per
    length — the spec's DECODE procedure (ITU T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.val_ptr[ln] = k
            self.min_code[ln] = code
            self.max_code[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n
        self.vals = vals


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past EOI (spec allows)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker — consumed by restart(), not here
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("JPEG: expected restart marker")


def _huff_decode(r: _BitReader, t: _HuffTable) -> int:
    code = r.bit()
    for ln in range(1, 17):
        if t.max_code[ln] >= 0 and code <= t.max_code[ln]:
            return t.vals[t.val_ptr[ln] + code - t.min_code[ln]]
        code = (code << 1) | r.bit()
    raise NotImplementedError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t received bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(height, width, n_components) from the SOF0 header without
    decoding the scan — used by the PDF writer to size /DCTDecode
    image XObjects."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        if marker == 0xC0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", data, pos + 2)
            return h, w, nc
        if marker == 0xDA:
            break  # scan before SOF0 — malformed
        pos += seglen
    raise NotImplementedError("JPEG: no SOF0 header")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array: (h, w) for grayscale, (h, w, 3) RGB
    for YCbCr. Raises NotImplementedError for non-baseline streams."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:
            raise NotImplementedError("JPEG: bad segment length")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                qtables[tq] = np.frombuffer(body, np.uint8, 64, b).astype(np.int32)
                b += 64
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                htables[(tc, th)] = _HuffTable(bits, body[b + 17 : b + 17 + n])
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("JPEG: 12-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG: only baseline sequential DCT (SOF0) supported, got SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise NotImplementedError("JPEG: SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen
    raise NotImplementedError("JPEG: no scan data")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c in comps
    }
    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart()
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int32)
                        t = _huff_decode(r, htables[(0, td)])
                        diff = _extend(r.bits(t), t) if t else 0
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, htables[(1, ta)])
                            rrrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrrr == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise NotImplementedError("JPEG: AC index overflow")
                            zz[k] = _extend(r.bits(ssss), ssss)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * q
                        block = idct_8x8(coef.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # crop to frame size per component (sampling-scaled), upsample, color-convert
    out_planes = []
    for c in comps:
        ph = -(-h * c["v"] // vmax)
        pw = -(-w * c["h"] // hmax)
        p = planes[c["id"]][:ph, :pw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    if len(out_planes) == 1:
        return clip(out_planes[0])
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.dstack([clip(r_), clip(g_), clip(b_)])
