"""Test-side baseline JPEG ENCODER — written independently of the
package decoder (its own bit writer, canonical-code assignment, forward
DCT, zigzag) so decode(encode(px)) validates kernels/jpeg_format
against the T.81 spec rather than against a sibling implementation.

Supports: grayscale (1 component), YCbCr 4:4:4 and 4:2:0 (2×2-mean
subsample), restart intervals, quality-scaled Annex K quant tables or
an all-ones table for near-lossless round trips, and (r5) 4-component
CMYK/YCCK plus 3-component Adobe-RGB with the APP14 transform marker
(both baseline and progressive).
"""

from __future__ import annotations

import struct

import numpy as np

ZIG = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K Table K.1 (luminance quantization, zigzag order)
K1 = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
# K.3/K.5: standard luminance DC/AC Huffman (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_C = np.array([
    [np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8) * 1.0 for _ in range(1)]
    for u in range(8)
])
_BASIS = np.array([
    [(np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])


def fdct_8x8(block: np.ndarray) -> np.ndarray:
    return _BASIS @ block @ _BASIS.T


def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_value(w, v: int, t: int) -> None:
    if t:
        w.write(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(w, coef_q: np.ndarray, pred: int, dc_c, ac_c) -> int:
    zz = coef_q.reshape(-1)[ZIG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    w.write(*dc_c[t])
    _enc_value(w, diff, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            w.write(*ac_c[0x00])  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(*ac_c[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        w.write(*ac_c[(run << 4) | s])
        _enc_value(w, v, s)
        run = 0
    return dc


def _dqt_seg(q) -> bytes:
    """DQT segment: Pq=0 (8-bit) when every value fits a byte, else
    Pq=1 (16-bit big-endian) per T.81 B.2.4.1."""
    if max(int(v) for v in q) <= 255:
        return _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    return _seg(
        0xDB,
        bytes([0x10]) + b"".join(struct.pack(">H", int(v)) for v in q),
    )


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _color_planes(
    img: np.ndarray, subsample: bool, adobe_transform: int | None
) -> tuple[list[np.ndarray], list[tuple[int, int]], bytes]:
    """(planes, sampling factors, APP14 segment) for gray / RGB / CMYK
    input. adobe_transform: None = no APP14 (YCbCr for 3ch, plain CMYK
    ink for 4ch); 0 = Adobe direct (RGB for 3ch; inverted CMYK for
    4ch); 2 = Adobe YCCK (4ch: BT.601 forward over the INVERTED C/M/Y
    planes — the Photoshop convention the package decoder documents)."""
    h, w = img.shape[:2]
    nch = 1 if img.ndim == 2 else img.shape[2]
    app14 = b""
    if adobe_transform is not None:
        app14 = _seg(
            0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, adobe_transform)
        )
    if nch == 1:
        return [img.astype(np.float64)], [(1, 1)], app14
    if nch == 3:
        if adobe_transform == 0:  # Adobe RGB: components stored directly
            return (
                [img[:, :, i].astype(np.float64) for i in range(3)],
                [(1, 1)] * 3,
                app14,
            )
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:  # 4ch: CMYK ink values in
        c, m, y, k = (img[:, :, i].astype(np.float64) for i in range(4))
        if adobe_transform == 2:  # YCCK over the inverted planes
            ic, im, iy = 255.0 - c, 255.0 - m, 255.0 - y
            planes = [
                0.299 * ic + 0.587 * im + 0.114 * iy,
                128.0 - 0.168736 * ic - 0.331264 * im + 0.5 * iy,
                128.0 + 0.5 * ic - 0.418688 * im - 0.081312 * iy,
                255.0 - k,
            ]
            samps = (
                [(2, 2), (1, 1), (1, 1), (2, 2)]
                if subsample
                else [(1, 1)] * 4
            )
        elif adobe_transform == 0:  # Adobe CMYK: stored inverted
            planes = [255.0 - c, 255.0 - m, 255.0 - y, 255.0 - k]
            samps = [(1, 1)] * 4
        else:  # plain CMYK (no APP14): ink values stored directly
            planes = [c, m, y, k]
            samps = [(1, 1)] * 4
    if subsample and samps[0] == (2, 2):
        for i in (1, 2):
            p = planes[i]
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            planes[i] = (pad[0::2, 0::2] + pad[0::2, 1::2]
                         + pad[1::2, 0::2] + pad[1::2, 1::2]) / 4.0
    return planes, samps, app14


def encode_jpeg(
    img: np.ndarray,
    qtable: list[int] | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    adobe_transform: int | None = None,
    extended: bool = False,
    noninterleaved: bool = False,
) -> bytes:
    """img: (h, w) gray, (h, w, 3) RGB, or (h, w, 4) CMYK-ink uint8.
    qtable: 64 zigzag-order values (default Annex K.1); pass [1]*64 for
    a near-lossless round trip. subsample=True → 4:2:0 chroma (2×2
    mean). adobe_transform: emit an APP14 marker (see _color_planes).
    extended=True → SOF1 extended sequential (identical entropy layer;
    the decode process is the same as baseline per T.81 Annex F).
    noninterleaved=True → one scan per component in block-raster order
    over the component's own grid (T.81 A.2.2: Ns=1 scans are never
    MCU-padded), the layout libjpeg emits for -scans scripts."""
    q = np.array(qtable if qtable is not None else K1, dtype=np.int32)
    h, w = img.shape[:2]
    planes, samps, app14 = _color_planes(img, subsample, adobe_transform)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    # pad each plane to whole MCUs
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))

    dc_c, ac_c = _codes(DC_BITS, DC_VALS), _codes(AC_BITS, AC_VALS)
    wtr = _BitWriter()
    pred = [0] * len(planes)
    deq = np.empty(64, np.int32)
    deq[ZIG] = np.arange(64)  # natural-order index of each zigzag slot
    qnat = np.empty(64, np.int32)
    qnat[[ZIG[i] for i in range(64)]] = q  # quant table in natural order
    scan_blobs: list[tuple[list[int], bytes]] = []  # (comp ids, data)
    if noninterleaved:
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
            ph = -(-h * sv // vmax)
            pw = -(-w * sh // hmax)
            bh, bw = -(-ph // 8), -(-pw // 8)
            wtr = _BitWriter()
            chunks: list[bytes] = []
            pred_c = 0
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and n and n % restart_interval == 0:
                        wtr.pad()
                        chunks.append(bytes(wtr.buf))
                        chunks.append(bytes(
                            [0xFF, 0xD0 + ((n // restart_interval - 1) % 8)]
                        ))
                        wtr = _BitWriter()
                        pred_c = 0
                    block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                    cq = np.round(
                        fdct_8x8(block) / qnat.reshape(8, 8)
                    ).astype(np.int32)
                    pred_c = _encode_block(wtr, cq, pred_c, dc_c, ac_c)
                    n += 1
            wtr.pad()
            chunks.append(bytes(wtr.buf))
            scan_blobs.append(([ci], b"".join(chunks)))
    else:
        mcu_count = 0
        out_chunks = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    wtr.pad()
                    out_chunks.append(bytes(wtr.buf))
                    out_chunks.append(bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]))
                    wtr = _BitWriter()
                    pred = [0] * len(planes)
                for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
                    for by in range(sv):
                        for bx in range(sh):
                            y0 = (my * sv + by) * 8
                            x0 = (mx * sh + bx) * 8
                            block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                            coef = fdct_8x8(block)
                            cq = np.round(coef / qnat.reshape(8, 8)).astype(np.int32)
                            pred[ci] = _encode_block(wtr, cq, pred[ci], dc_c, ac_c)
                mcu_count += 1
        wtr.pad()
        out_chunks.append(bytes(wtr.buf))
        scan_blobs.append((list(range(len(planes))), b"".join(out_chunks)))

    head = bytearray(b"\xff\xd8")
    head += app14
    head += _dqt_seg(q)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    head += _seg(0xC1 if extended else 0xC0, sof)
    head += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    head += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    body = bytearray()
    for comp_ids, blob in scan_blobs:
        sos = bytes([len(comp_ids)])
        for i in comp_ids:
            sos += bytes([i + 1, 0x00])
        sos += bytes([0, 63, 0])
        body += _seg(0xDA, sos) + blob
    return bytes(head) + bytes(body) + b"\xff\xd9"


# --- progressive (SOF2) encoder ---------------------------------------
#
# Emits a libjpeg-style scan script with spectral selection AND
# successive approximation (first scans at Al>0, refinement scans down
# to Al=0), EOBn block-run codes, and the two-buffer correction-bit
# ordering of T.81 G.1.2.3 — so the package decoder's progressive path
# is validated against an independent implementation of the hairiest
# part of the format. Fully-refined output must decode bit-identical
# to the baseline encoding of the same image.

# fixed Huffman tables valid for any progressive symbol stream we emit:
# DC categories 0..11 as 4-bit codes; every AC symbol (EOBn r 0..14,
# ZRL, (run<<4)|size for size 1..14) as 8-bit codes (240 < 256 keeps
# the canonical code incomplete, as the spec prefers)
P_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
P_DC_VALS = list(range(12))
P_AC_VALS = [r << 4 for r in range(15)] + [0xF0] + [
    (run << 4) | s for run in range(16) for s in range(1, 15)
]
P_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(P_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _ScanWriter:
    """BitWriter + restart-marker segmentation for one scan."""

    def __init__(self, restart_interval: int) -> None:
        self.w = _BitWriter()
        self.chunks: list[bytes] = []
        self.ri = restart_interval
        self.unit = 0
        self.rst = 0

    def tick(self) -> bool:
        """Advance the MCU/block counter; True => state reset needed
        (caller must flush its EOB run BEFORE calling maybe_restart)."""
        due = self.ri and self.unit and self.unit % self.ri == 0
        return bool(due)

    def restart(self) -> None:
        self.w.pad()
        self.chunks.append(bytes(self.w.buf))
        self.chunks.append(bytes([0xFF, 0xD0 + (self.rst % 8)]))
        self.rst += 1
        self.w = _BitWriter()

    def done(self) -> bytes:
        self.w.pad()
        self.chunks.append(bytes(self.w.buf))
        return b"".join(self.chunks)


def _emit_eobrun(w: _BitWriter, ac_c, st: dict) -> None:
    """Flush the pending EOB block-run symbol plus the correction bits
    buffered for the skipped blocks (T.81 G.1.2.3 ordering)."""
    if st["eobrun"] > 0:
        rr = st["eobrun"].bit_length() - 1
        w.write(*ac_c[rr << 4])
        if rr:
            w.write(st["eobrun"] - (1 << rr), rr)
        st["eobrun"] = 0
    for b in st["be"]:
        w.write(b, 1)
    st["be"] = []


def _enc_dc_prog(w, dc_c, zz, pred: int, ah: int, al: int) -> int:
    dc = int(zz[0]) >> al  # arithmetic shift (two's complement, like C)
    if ah == 0:
        diff = dc - pred
        t = _category(diff)
        w.write(*dc_c[t])
        _enc_value(w, diff, t)
        return dc
    w.write(dc & 1, 1)  # refinement: bit Al of the signed value
    return pred


def _enc_ac_first(w, ac_c, zz, ss: int, se: int, al: int, st: dict) -> None:
    band = [int(zz[k]) for k in range(ss, se + 1)]
    temp = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
    if not any(temp):
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_c, st)
        return
    _emit_eobrun(w, ac_c, st)
    run = 0
    last_nz = max(i for i, v in enumerate(temp) if v)
    for i in range(last_nz + 1):
        v = temp[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(*ac_c[0xF0])
            run -= 16
        s = _category(v)
        w.write(*ac_c[(run << 4) | s])
        _enc_value(w, v, s)
        run = 0
    if last_nz < len(temp) - 1:
        st["eobrun"] = 1  # trailing zeros: buffer the EOB for run merging


def _enc_ac_refine(w, ac_c, zz, ss: int, se: int, al: int, st: dict) -> None:
    band = [int(zz[k]) for k in range(ss, se + 1)]
    absv = [abs(v) >> al for v in band]
    eobpos = max((i for i, t in enumerate(absv) if t == 1), default=-1)
    run = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eobpos:
            _emit_eobrun(w, ac_c, st)
            w.write(*ac_c[0xF0])
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:  # history-nonzero: correction bit rides behind a symbol
            br.append(t & 1)
            continue
        _emit_eobrun(w, ac_c, st)  # newly-nonzero: (run, ±2^Al)
        w.write(*ac_c[(run << 4) | 1])
        w.write(1 if band[i] >= 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st["eobrun"] += 1
        st["be"].extend(br)
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_c, st)


def encode_jpeg_progressive(
    img: np.ndarray,
    qtable: list[int] | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    adobe_transform: int | None = None,
) -> bytes:
    """Progressive (SOF2) encoding of the same pixel pipeline as
    encode_jpeg: fully refined, so decoding must be bit-identical to
    decoding the baseline encoding. Scan script (libjpeg-flavored):
    interleaved DC at Al=1, per-component AC bands (1-5)/(6-63) at
    Al=2, AC refine 2→1, interleaved DC refine, AC refine 1→0.
    adobe_transform: as in encode_jpeg (CMYK/YCCK/Adobe-RGB APP14)."""
    q = np.array(qtable if qtable is not None else K1, dtype=np.int32)
    h, w = img.shape[:2]
    planes, samps, app14 = _color_planes(img, subsample, adobe_transform)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qnat = np.empty(64, np.int32)
    qnat[[ZIG[i] for i in range(64)]] = q

    # quantized coefficient blocks, zigzag order, MCU-padded grids
    coefs = []
    grids = []  # (padded_bh, padded_bw, ceil_bh, ceil_bw)
    for p, (sh, sv) in zip(planes, samps):
        tbh, tbw = mcus_y * sv, mcus_x * sh
        pad = np.pad(
            p, ((0, tbh * 8 - p.shape[0]), (0, tbw * 8 - p.shape[1])), mode="edge"
        )
        cz = np.zeros((tbh, tbw, 64), np.int32)
        for by in range(tbh):
            for bx in range(tbw):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                cq = np.round(fdct_8x8(blk) / qnat.reshape(8, 8)).astype(np.int32)
                cz[by, bx] = cq.reshape(-1)[ZIG]
        coefs.append(cz)
        cw = -(-(-(-w * sh // hmax)) // 8)
        ch = -(-(-(-h * sv // vmax)) // 8)
        grids.append((tbh, tbw, ch, cw))

    dc_c = _codes(P_DC_BITS, P_DC_VALS)
    ac_c = _codes(P_AC_BITS, P_AC_VALS)
    nc = len(planes)

    head = bytearray(b"\xff\xd8")
    head += app14
    head += _dqt_seg(q)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    head += _seg(0xC2, sof)  # SOF2 progressive
    head += _seg(0xC4, bytes([0x00]) + bytes(P_DC_BITS) + bytes(P_DC_VALS))
    head += _seg(0xC4, bytes([0x10]) + bytes(P_AC_BITS) + bytes(P_AC_VALS))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    out = bytearray(head)

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if ss == 0 else 0
            ta = 0
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def dc_scan(ah, al):
        sw = _ScanWriter(restart_interval)
        pred = [0] * nc
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if sw.tick():
                    sw.restart()
                    pred = [0] * nc
                for ci, (sh, sv) in enumerate(samps):
                    for by in range(sv):
                        for bx in range(sh):
                            pred[ci] = _enc_dc_prog(
                                sw.w, dc_c,
                                coefs[ci][my * sv + by, mx * sh + bx],
                                pred[ci], ah, al,
                            )
                sw.unit += 1
        return sos(list(range(1, nc + 1)), 0, 0, ah, al) + sw.done()

    def ac_scan(ci, ss, se, ah, al):
        sw = _ScanWriter(restart_interval)
        st = {"eobrun": 0, "be": []}
        _tbh, _tbw, cbh, cbw = grids[ci]
        enc = _enc_ac_first if ah == 0 else _enc_ac_refine
        for by in range(cbh):
            for bx in range(cbw):
                if sw.tick():
                    _emit_eobrun(sw.w, ac_c, st)
                    sw.restart()
                sw.unit += 1
                enc(sw.w, ac_c, coefs[ci][by, bx], ss, se, al, st)
        _emit_eobrun(sw.w, ac_c, st)
        return sos([ci + 1], ss, se, ah, al) + sw.done()

    out += dc_scan(0, 1)
    for ci in range(nc):
        out += ac_scan(ci, 1, 5, 0, 2)
        out += ac_scan(ci, 6, 63, 0, 2)
    for ci in range(nc):
        out += ac_scan(ci, 1, 63, 2, 1)
    out += dc_scan(1, 0)
    for ci in range(nc):
        out += ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# lossless >8-bit: diff categories reach SSSS=16 (the +32768 special
# case, no appended bits) — 17 symbols as canonical 5-bit codes
L16_DC_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
L16_DC_VALS = list(range(17))


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 4,
    pt: int = 0,
    prec: int = 8,
    restart_interval: int = 0,
    multi_scan: bool = False,
) -> bytes:
    """T.81 Annex H lossless (SOF3): per-sample Huffman-coded
    differences against the selected spatial predictor (1-7), point
    transform Pt, sample-interleaved 1×1 components, precision 2..16
    (pass uint16 samples for prec > 8; diffs are coded modulo 2^16
    with the SSSS=16 special case), restart intervals (prediction
    resets to the default after each RSTn). img: (h, w) gray or
    (h, w, 3) RGB — decodes back bit-exactly (high-bits-truncated to
    uint8 by the package decoder when prec > 8). multi_scan=True emits
    ONE SCAN PER COMPONENT (non-interleaved, T.81 A.2.2) instead of a
    single sample-interleaved scan — the layout that exposes decoders
    which return after the first lossless scan."""
    h, w = img.shape[:2]
    nch = 1 if img.ndim == 2 else img.shape[2]
    planes = [img] if nch == 1 else [img[:, :, i] for i in range(nch)]
    arrs = [p.astype(np.int64) >> pt for p in planes]
    dc_bits, dc_vals = (
        (L16_DC_BITS, L16_DC_VALS) if prec > 8 else (DC_BITS, DC_VALS)
    )
    dc_c = _codes(dc_bits, dc_vals)
    default = 1 << (prec - 1 - pt)

    def scan_chunks(scan_arrs: list) -> list[bytes]:
        chunks: list[bytes] = []
        wtr = _BitWriter()
        unit = 0
        rst = 0
        fresh = True
        ra_row = 0  # T.81 H.1.1: Ra predicts the first line of the
        # scan AND of each restart interval
        for y in range(h):
            for x in range(w):
                if restart_interval and unit and unit % restart_interval == 0:
                    wtr.pad()
                    chunks.append(bytes(wtr.buf))
                    chunks.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                    rst += 1
                    wtr = _BitWriter()
                    fresh = True
                    ra_row = y
                for arr in scan_arrs:
                    s = int(arr[y, x])
                    if fresh:
                        px = default
                    elif y == ra_row:
                        px = int(arr[y, x - 1])
                    elif x == 0:
                        px = int(arr[y - 1, 0])
                    else:
                        a = int(arr[y, x - 1])
                        b = int(arr[y - 1, x])
                        c = int(arr[y - 1, x - 1])
                        px = (
                            a, b, c, a + b - c,
                            a + ((b - c) >> 1), b + ((a - c) >> 1),
                            (a + b) >> 1,
                        )[predictor - 1]
                    # modulo-2^16 reduction into [-32768, 32767];
                    # -32768 is transmitted as SSSS=16 with no appended
                    # bits (H.1.2.1)
                    diff = ((s - px + 32768) & 0xFFFF) - 32768
                    if diff == -32768:
                        wtr.write(*dc_c[16])
                    else:
                        t = _category(diff)
                        wtr.write(*dc_c[t])
                        _enc_value(wtr, diff, t)
                fresh = False
                unit += 1
        wtr.pad()
        chunks.append(bytes(wtr.buf))
        return chunks

    def sos_seg(comp_ids: list) -> bytes:
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([predictor, 0, pt])
        return _seg(0xDA, sos)

    head = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, nch)
    for i in range(nch):
        sof += bytes([i + 1, 0x11, 0])
    head += _seg(0xC3, sof)  # SOF3: lossless sequential Huffman
    head += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    body = bytearray()
    if multi_scan and nch > 1:
        for i in range(nch):
            body += sos_seg([i + 1])
            body += b"".join(scan_chunks([arrs[i]]))
    else:
        body += sos_seg([i + 1 for i in range(nch)])
        body += b"".join(scan_chunks(arrs))
    return bytes(head) + bytes(body) + b"\xff\xd9"


# 12-bit baseline: DC categories reach 12..15 (beyond the 8-bit K.3
# table) and AC sizes reach 14 — use the progressive tables' canonical
# layouts, which already cover the full symbol ranges.
def encode_jpeg_12bit(img16: np.ndarray, qtable: list[int] | None = None) -> bytes:
    """Baseline (SOF0) encoding of a 12-bit GRAYSCALE image
    (uint16 values 0..4095): level shift 2048, extended-range Huffman
    tables. The package decoder down-converts to uint8 by high-bits
    truncation (the 16-bit-PNG convention)."""
    assert img16.ndim == 2 and int(img16.max()) <= 4095
    q = np.array(qtable if qtable is not None else [1] * 64, dtype=np.int32)
    h, w = img16.shape
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    pad = np.pad(
        img16.astype(np.float64),
        ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge",
    )
    qnat = np.empty(64, np.int32)
    qnat[[ZIG[i] for i in range(64)]] = q
    # 16 DC categories (0..15) as a canonical 5-bit-codes table
    dc_bits16 = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals16 = list(range(16))
    dc_c = _codes(dc_bits16, dc_vals16)
    ac_c = _codes(P_AC_BITS, P_AC_VALS)
    wtr = _BitWriter()
    pred = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            blk = pad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 2048.0
            cq = np.round(fdct_8x8(blk) / qnat.reshape(8, 8)).astype(np.int32)
            pred = _encode_block(wtr, cq, pred, dc_c, ac_c)
    wtr.pad()
    head = bytearray(b"\xff\xd8")
    head += _dqt_seg(q)
    # SOF1 extended sequential — the conforming marker for 12-bit
    # Huffman sequential (T.81 B.2.2: baseline SOF0 is 8-bit only)
    head += _seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    head += _seg(0xC4, bytes([0x00]) + bytes(dc_bits16) + bytes(dc_vals16))
    head += _seg(0xC4, bytes([0x10]) + bytes(P_AC_BITS) + bytes(P_AC_VALS))
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return bytes(head) + bytes(wtr.buf) + b"\xff\xd9"
