"""Test-side TIFF ENCODER — written independently of the package
decoder (its own bit writer, its own G3/G4 mode-selection logic, its
own LZW string-table growth, its own IFD serialization) so that
decode(encode(px)) validates kernels/tiff_format against the TIFF6 /
ITU-T T.4/T.6 specs rather than against a sibling implementation.

Only the spec-fixed run-length/mode CODE TABLES are shared with the
package (imported and inverted here) — the same stance as the JPEG Qe
table: published constants are the interoperability contract, the
machinery on each side is independent.

Supports: both byte orders; strips and tiles; compressions none /
PackBits / TIFF-LZW (MSB-first, early change, mid-stream CLEAR) /
Deflate(+predictor 2) / CCITT MH (2) / G3 1D and 2D (3) / G4 (4) /
new-style JPEG (7, inline tables or the JPEGTables split); photometrics
WhiteIsZero / BlackIsZero / RGB / Palette / CMYK; 1/4/8/16-bit samples;
planar configuration 2; FillOrder 2; multi-page IFD chains.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from openocr_spark.kernels.tiff_format import (
    _BLACK_CODES,
    _MODE_CODES,
    _WHITE_CODES,
)

# inverted spec tables: run length -> bit string
_WHITE_ENC = {v: k for k, v in _WHITE_CODES.items()}
_BLACK_ENC = {v: k for k, v in _BLACK_CODES.items()}
_MODE_ENC = {m: b for b, m in _MODE_CODES}
_EOL = "000000000001"

_REVERSE8 = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


def _pack_bits(bits: str) -> bytes:
    pad = (-len(bits)) % 8
    bits = bits + "0" * pad
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def _enc_run(run: int, white: bool) -> str:
    table = _WHITE_ENC if white else _BLACK_ENC
    out = []
    while run >= 2624:
        out.append(table[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        out.append(table[makeup])
        run -= makeup
    out.append(table[run])
    return "".join(out)


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the row changes color (row: bool, True=black)."""
    d = np.flatnonzero(np.diff(row.astype(np.int8)) != 0) + 1
    t = list(d)
    if row[0]:
        t.insert(0, 0)
    return t


def _enc_1d_row(row: np.ndarray) -> str:
    """Modified-Huffman code one row (white run first, possibly 0)."""
    width = len(row)
    trans = _transitions(row) + [width]
    out = []
    prev, white = 0, True
    for t in trans:
        out.append(_enc_run(t - prev, white))
        prev, white = t, not white
        if prev >= width:
            break
    return "".join(out)


def _enc_2d_row(row: np.ndarray, ref_trans: list[int], width: int) -> str:
    """T.6 / T.4-2D code one row against reference transitions."""
    ct = _transitions(row)
    out = []
    a0 = -1
    white = True
    ci = 0  # index into ct of the next coding-line transition > a0
    while a0 < width:
        while ci < len(ct) and ct[ci] <= a0:
            ci += 1
        a1 = ct[ci] if ci < len(ct) else width
        a2 = ct[ci + 1] if ci + 1 < len(ct) else width
        # b1: first reference transition > a0 introducing color opposite
        # to the current run color (transition j introduces black iff j even)
        j = 0
        while j < len(ref_trans) and (
            ref_trans[j] <= a0 or ((j & 1) == 1) == white
        ):
            j += 1
        b1 = ref_trans[j] if j < len(ref_trans) else width
        b2 = ref_trans[j + 1] if j + 1 < len(ref_trans) else width
        if b2 < a1:
            out.append(_MODE_ENC["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            out.append(_MODE_ENC[{0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                                  -1: "VL1", -2: "VL2", -3: "VL3"}[d]])
            a0 = a1
            ci += 1
            white = not white
        else:
            start = max(a0, 0)
            out.append(_MODE_ENC["H"])
            out.append(_enc_run(a1 - start, white))
            out.append(_enc_run(a2 - a1, not white))
            a0 = a2
            ci += 2
    return "".join(out)


def encode_ccitt(ink: np.ndarray, compression: int, t4_2d: bool = False,
                 fill_order: int = 1) -> bytes:
    """ink: (h, w) bool/0-1 array, True = black. → fax strip bytes."""
    ink = ink.astype(bool)
    h, w = ink.shape
    bits: list[str] = []
    if compression == 2:  # MH, byte-aligned rows
        acc = ""
        for y in range(h):
            acc += _enc_1d_row(ink[y])
            acc += "0" * ((-len(acc)) % 8)
        bits.append(acc)
    elif compression == 3:
        ref: list[int] = []
        for y in range(h):
            bits.append(_EOL)
            if t4_2d:
                if y == 0:
                    bits.append("1")
                    bits.append(_enc_1d_row(ink[y]))
                else:
                    bits.append("0")
                    bits.append(_enc_2d_row(ink[y], ref, w))
            else:
                bits.append(_enc_1d_row(ink[y]))
            ref = _transitions(ink[y])
    elif compression == 4:
        ref = []
        for y in range(h):
            bits.append(_enc_2d_row(ink[y], ref, w))
            ref = _transitions(ink[y])
        bits.append(_EOL + _EOL)  # EOFB
    else:
        raise ValueError(compression)
    data = _pack_bits("".join(bits))
    if fill_order == 2:
        data = data.translate(_REVERSE8)
    return data


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW writer: MSB-first packing, CLEAR first, early
    code-width change, mid-stream CLEAR before the 12-bit table fills."""
    CLEAR, EOI = 256, 257
    out_bits: list[str] = []

    def emit(code: int, width: int) -> None:
        out_bits.append(format(code, f"0{width}b"))

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == (1 << 12) - 2:  # leave room: CLEAR and reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(EOI, width)
    return _pack_bits("".join(out_bits))


def packbits_encode(row: bytes) -> bytes:
    """PackBits one row (literal/replicate greedy, spec Appendix)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run
        j = i
        while j < n - 1 and row[j] == row[j + 1] and j - i < 127:
            j += 1
        if j > i:  # replicate run of length j-i+1 >= 2
            out.append(257 - (j - i + 1))
            out.append(row[i])
            i = j + 1
        else:
            # literal run until next replicate of >=3 or 128 bytes
            k = i
            while (
                k < n
                and k - i < 128
                and not (k < n - 2 and row[k] == row[k + 1] == row[k + 2])
            ):
                k += 1
            out.append(k - i - 1)
            out += row[i:k]
            i = k
    return bytes(out)


def _predict2(arr: np.ndarray) -> np.ndarray:
    """Horizontal differencing along the row (inverse of decoder cumsum)."""
    out = arr.copy()
    out[:, 1:] = (arr[:, 1:].astype(np.int64) - arr[:, :-1].astype(np.int64)).astype(arr.dtype)
    return out


# ----------------------------------------------------------- IFD assembly


class _IFDWriter:
    def __init__(self, bo: str) -> None:
        self.bo = bo
        self.blob = bytearray(b"II*\x00\x00\x00\x00\x00" if bo == "<" else b"MM\x00*\x00\x00\x00\x00")
        self.prev_link: int | None = 4  # offset of the pointer to patch

    def put(self, data: bytes) -> int:
        if len(self.blob) % 2:
            self.blob += b"\x00"
        off = len(self.blob)
        self.blob += data
        return off

    def add_ifd(self, entries: list[tuple[int, int, list[int] | bytes]]) -> None:
        bo = self.bo
        size = {1: 1, 3: 2, 4: 4, 7: 1}
        fmt = {3: "H", 4: "I"}
        # out-of-line values first
        resolved = []
        for tag, typ, vals in sorted(entries):
            if typ == 7 or typ == 1:
                raw = bytes(vals)
                cnt = len(raw)
            else:
                raw = struct.pack(bo + f"{len(vals)}{fmt[typ]}", *vals)
                cnt = len(vals)
            if len(raw) <= 4:
                resolved.append((tag, typ, cnt, raw.ljust(4, b"\x00")))
            else:
                off = self.put(raw)
                resolved.append((tag, typ, cnt, struct.pack(bo + "I", off)))
        if len(self.blob) % 2:
            self.blob += b"\x00"
        ifd_off = len(self.blob)
        self.blob += struct.pack(bo + "H", len(resolved))
        for tag, typ, cnt, val4 in resolved:
            self.blob += struct.pack(bo + "HHI", tag, typ, cnt) + val4
        self.blob += b"\x00\x00\x00\x00"  # next-IFD, patched by the next add
        struct.pack_into(bo + "I", self.blob, self.prev_link, ifd_off)
        self.prev_link = ifd_off + 2 + 12 * len(resolved)

    def tobytes(self) -> bytes:
        return bytes(self.blob)


def _pack_samples(px: np.ndarray, bps: int, bo: str) -> bytes:
    """(rows, width*spp) sample array → byte-padded row bytes."""
    if bps == 8:
        return px.astype(np.uint8).tobytes()
    if bps == 16:
        dt = np.dtype(np.uint16).newbyteorder(bo)
        return px.astype(np.uint16).astype(dt).tobytes()
    rows = []
    for y in range(px.shape[0]):
        bits = "".join(format(int(v), f"0{bps}b") for v in px[y])
        rows.append(_pack_bits(bits))
    return b"".join(rows)


def write_tiff(pages: list[dict], byte_order: str = "<") -> bytes:
    """pages: list of dicts with keys
      pixels: (h,w) | (h,w,3) | (h,w,4) ndarray (uint8/uint16/bool)
      compression: 1|2|3|4|5|7|8|32773   (default 1)
      photometric: overrides the inferred value
      bps: bits per sample (default from dtype)
      rows_per_strip / tile=(tw,th) / planar=2 / predictor=2
      t4_2d: G3 2D rows / fill_order=2 / palette: (3, 2**bps) uint8
      jpeg_split_tables: move DQT/DHT into the JPEGTables tag
      jpeg_bytes: pre-encoded JPEG stream for compression 7
    """
    wtr = _IFDWriter(byte_order)
    for page in pages:
        px = np.asarray(page["pixels"])
        comp = page.get("compression", 1)
        h, w = px.shape[:2]
        spp = 1 if px.ndim == 2 else px.shape[2]
        if px.dtype == bool:
            bps = page.get("bps", 1)
        elif px.dtype == np.uint16:
            bps = 16
        else:
            bps = page.get("bps", 8)
        planar = page.get("planar", 1)
        predictor = page.get("predictor", 1)
        fill_order = page.get("fill_order", 1)
        palette = page.get("palette")
        if "photometric" in page:
            photo = page["photometric"]
        elif palette is not None:
            photo = 3
        elif comp in (2, 3, 4):
            photo = 0
        elif spp == 3:
            photo = 2
        elif spp == 4:
            photo = 5
        else:
            photo = 1

        entries: list[tuple[int, int, list[int] | bytes]] = [
            (256, 4, [w]), (257, 4, [h]),
            (258, 3, [bps] * spp), (259, 3, [comp]),
            (277, 3, [spp]),
            (284, 3, [planar]),
        ]
        if not page.get("omit_photometric"):
            # real scanners sometimes omit tag 262 on fax pages; the
            # option lets tests pin the reader's min-is-white default
            entries.append((262, 3, [photo]))
        if predictor != 1:
            entries.append((317, 3, [predictor]))
        if comp == 3 and page.get("t4_2d"):
            entries.append((292, 4, [1]))
        if fill_order != 1:
            entries.append((266, 3, [fill_order]))
        if palette is not None:
            pal16 = (np.asarray(palette, dtype=np.uint16) * 257).reshape(3, -1)
            entries.append((320, 3, [int(v) for v in pal16.ravel()]))

        def compress_segment(seg: np.ndarray, seg_h: int, seg_w: int, seg_spp: int) -> bytes:
            flat = seg.reshape(seg_h, seg_w * seg_spp)
            if comp in (2, 3, 4):
                return encode_ccitt(flat.astype(bool), comp,
                                    page.get("t4_2d", False), fill_order)
            if comp == 1:
                return _pack_samples(flat, bps, byte_order)
            if comp == 5:
                return lzw_encode(_pack_samples(flat, bps, byte_order))
            if comp == 8:
                data = flat
                if predictor == 2:  # per-channel horizontal differencing
                    data = _predict2(flat.reshape(seg_h, seg_w, seg_spp)).reshape(seg_h, -1)
                return zlib.compress(_pack_samples(data, bps, byte_order))
            if comp == 32773:
                row_len = (seg_w * seg_spp * bps + 7) // 8
                raw = _pack_samples(flat, bps, byte_order)
                return b"".join(
                    packbits_encode(raw[y * row_len : (y + 1) * row_len])
                    for y in range(seg_h)
                )
            raise ValueError(comp)

        if comp == 7:
            stream = page["jpeg_bytes"]
            if page.get("jpeg_split_tables"):
                tables, stripped = _split_jpeg_tables(stream)
                entries.append((347, 7, tables))
                stream = stripped
            off = wtr.put(stream)
            entries += [(273, 4, [off]), (278, 4, [h]), (279, 4, [len(stream)])]
        elif page.get("tile"):
            tw, th = page["tile"]
            offs, cnts = [], []
            planes = range(spp) if planar == 2 else [None]
            for plane in planes:
                for ty in range(0, h, th):
                    for tx in range(0, w, tw):
                        if planar == 2:
                            tile = np.zeros((th, tw), px.dtype)
                            sub = px[ty : ty + th, tx : tx + tw, plane]
                            tile[: sub.shape[0], : sub.shape[1]] = sub
                            data = compress_segment(tile, th, tw, 1)
                        else:
                            tile = np.zeros((th, tw, spp) if spp > 1 else (th, tw), px.dtype)
                            sub = px[ty : ty + th, tx : tx + tw]
                            tile[: sub.shape[0], : sub.shape[1]] = sub
                            data = compress_segment(tile, th, tw, spp)
                        offs.append(wtr.put(data))
                        cnts.append(len(data))
            entries += [(322, 4, [tw]), (323, 4, [th]),
                        (324, 4, offs), (325, 4, cnts)]
        else:
            rps = page.get("rows_per_strip", h)
            offs, cnts = [], []
            planes = range(spp) if planar == 2 else [None]
            for plane in planes:
                for y in range(0, h, rps):
                    seg_h = min(rps, h - y)
                    if planar == 2:
                        seg = px[y : y + seg_h, :, plane]
                        data = compress_segment(seg, seg_h, w, 1)
                    else:
                        seg = px[y : y + seg_h]
                        data = compress_segment(seg, seg_h, w, spp)
                    offs.append(wtr.put(data))
                    cnts.append(len(data))
            entries += [(273, 4, offs), (278, 4, [rps]), (279, 4, cnts)]
        wtr.add_ifd(entries)
    return wtr.tobytes()


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full JPEG stream → (JPEGTables value, abbreviated strip stream):
    DQT(0xDB)/DHT(0xC4) segments move to SOI+tables+EOI, the rest keeps
    its order (TIFF TechNote 2 abbreviated format)."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xD9:
            rest += stream[pos:]
            break
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            rest += stream[pos:]
            break
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)
