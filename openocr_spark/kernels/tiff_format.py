"""From-scratch TIFF decoder — numpy + stdlib zlib only.

The reference reads TIFF implicitly through cv2.imread/imdecode
(opendet/preprocess/__init__.py:85-143, tools/utils/utility.py:76-107
route every non-GIF/PDF path through cv2, whose build decodes TIFF) —
the same justification as the r4 CMYK-JPEG work: scanned-document
corpora, exactly this engine's target, are dominated by bilevel CCITT
Group-4 TIFFs, and a 100-TB crawl WILL contain them. Decoding must not
silently skip the most common scanned-page container.

Container: classic TIFF (42), both byte orders (`II`/`MM`), full IFD
chain → one output page per IFD (multi-page TIFF is the fax/scanner
convention; cv2.imread takes page 1 of the same chain, cv2.imreadmulti
all of them — we return the page list, matching this package's
check_and_read 1→N contract that PDF already uses). Strip AND tile
layouts, PlanarConfiguration 1 (chunky) and 2 (separate planes).

Compressions: 1 none; 2 CCITT modified Huffman (byte-aligned rows);
3 Group 3 / T.4 (1D and 2D per T4Options, EOL + fill bits);
4 Group 4 / T.6 MMR (pass/horizontal/vertical modes); 5 TIFF-LZW
(MSB-first packing, early code-width change); 7 new-style JPEG
(abbreviated streams merged with the JPEGTables tag, decoded by
kernels/jpeg_format — the full T.81 matrix applies inside TIFF too);
8/32946 Deflate (stdlib zlib, like the PNG/PDF paths); 32773 PackBits.
Old-style JPEG (6) fails loudly (deprecated by TIFF TechNote 2; its
wire format is famously underspecified). Horizontal predictor (317=2)
for LZW/Deflate at 8 and 16 bits; FillOrder 2 (bit-reversed fax bytes).

Photometrics: 0 WhiteIsZero, 1 BlackIsZero, 2 RGB, 3 Palette (16-bit
ColorMap, high byte), 5 Separated/CMYK (composited against the K plate
with the same (255−ink)(255−K)/255 convention the CMYK-JPEG path
uses), 6 YCbCr (via the JPEG codec). BitsPerSample 1/2/4/8 exact;
16-bit down-converts by high byte — the deliberate convention shared
with the 16-bit-PNG and 12-bit-JPEG paths.

The T.4/T.6 run-length and mode code tables below are spec-fixed
constants (ITU-T T.4 tables 2-4, T.6 table 1) — shared with the
test-side encoder under the same stance as the JPEG Qe table: the
*machinery* on each side is independent, the published constants are
the interoperability contract itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from openocr_spark.kernels.media_decode import check_dims

# ---------------------------------------------------------------- container

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, off: int, bo: str) -> tuple[dict[int, list], int]:
    """One IFD at `off` → ({tag: values}, next_ifd_offset)."""
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: skippable per TIFF6 "readers must skip"
        total = size * cnt
        voff = e + 8 if total <= 4 else struct.unpack_from(bo + "I", data, e + 8)[0]
        raw = data[voff : voff + total]
        if typ in (3, 8):
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ in (4, 9, 11):
            vals = list(struct.unpack(bo + f"{cnt}" + ("I" if typ == 4 else ("i" if typ == 9 else "f")), raw))
        elif typ in (5, 10):
            ints = struct.unpack(bo + f"{2 * cnt}" + ("I" if typ == 5 else "i"), raw)
            vals = [ints[2 * k] / (ints[2 * k + 1] or 1) for k in range(cnt)]
        elif typ in (1, 6):
            vals = list(raw)
        else:  # ASCII / UNDEFINED / DOUBLE: keep raw bytes
            vals = [raw]
        tags[tag] = vals
    (nxt,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)
    return tags, nxt


def _tag1(tags: dict, tag: int, default=None):
    v = tags.get(tag)
    return v[0] if v else default


# ------------------------------------------------------------ bit utilities


class _Bits:
    """MSB-first bit reader over a bytes buffer (fax / LZW side)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.d):
            raise EOFError("fax bitstream exhausted")
        self.pos = p + 1
        return (self.d[p >> 3] >> (7 - (p & 7))) & 1

    def peek(self, n: int) -> int:
        v = 0
        p = self.pos
        for _ in range(n):
            byte = self.d[p >> 3] if p >> 3 < len(self.d) else 0
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        return v

    def skip(self, n: int) -> None:
        self.pos += n

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >> 3 >= len(self.d)


_REVERSE8 = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


# ------------------------------------------------- T.4 / T.6 code constants
# ITU-T T.4 tables 2/3 (terminating + makeup) and the shared extended
# makeup set; strings are the code bits MSB-first. Spec-fixed constants.

_WHITE_CODES = {
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4, "1100": 5,
    "1110": 6, "1111": 7, "10011": 8, "10100": 9, "00111": 10, "01000": 11,
    "001000": 12, "000011": 13, "110100": 14, "110101": 15, "101010": 16,
    "101011": 17, "0100111": 18, "0001100": 19, "0001000": 20, "0010111": 21,
    "0000011": 22, "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # makeup
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960, "011010101": 1024,
    "011010110": 1088, "011010111": 1152, "011011000": 1216,
    "011011001": 1280, "011011010": 1344, "011011011": 1408,
    "010011000": 1472, "010011001": 1536, "010011010": 1600, "011000": 1664,
    "010011011": 1728,
}

_BLACK_CODES = {
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4, "0011": 5,
    "0010": 6, "00011": 7, "000101": 8, "000100": 9, "0000100": 10,
    "0000101": 11, "0000111": 12, "00000100": 13, "00000111": 14,
    "000011000": 15, "0000010111": 16, "0000011000": 17, "0000001000": 18,
    "00001100111": 19, "00001101000": 20, "00001101100": 21,
    "00000110111": 22, "00000101000": 23, "00000010111": 24,
    "00000011000": 25, "000011001010": 26, "000011001011": 27,
    "000011001100": 28, "000011001101": 29, "000001101000": 30,
    "000001101001": 31, "000001101010": 32, "000001101011": 33,
    "000011010010": 34, "000011010011": 35, "000011010100": 36,
    "000011010101": 37, "000011010110": 38, "000011010111": 39,
    "000001101100": 40, "000001101101": 41, "000011011010": 42,
    "000011011011": 43, "000001010100": 44, "000001010101": 45,
    "000001010110": 46, "000001010111": 47, "000001100100": 48,
    "000001100101": 49, "000001010010": 50, "000001010011": 51,
    "000000100100": 52, "000000110111": 53, "000000111000": 54,
    "000000100111": 55, "000000101000": 56, "000001011000": 57,
    "000001011001": 58, "000000101011": 59, "000000101100": 60,
    "000001011010": 61, "000001100110": 62, "000001100111": 63,
    # makeup
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

_EXT_MAKEUP = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

_WHITE_CODES.update(_EXT_MAKEUP)
_BLACK_CODES.update(_EXT_MAKEUP)

# decode maps keyed by (bit-length, code-value) for a linear peek loop
_WHITE_DEC = {(len(k), int(k, 2)): v for k, v in _WHITE_CODES.items()}
_BLACK_DEC = {(len(k), int(k, 2)): v for k, v in _BLACK_CODES.items()}

# T.4/T.6 two-dimensional mode codes
_MODE_CODES = [  # (bits, length, mode)
    ("1", "V0"), ("011", "VR1"), ("010", "VL1"), ("001", "H"),
    ("0001", "P"), ("000011", "VR2"), ("000010", "VL2"),
    ("0000011", "VR3"), ("0000010", "VL3"),
]
_MODE_DEC = {(len(b), int(b, 2)): m for b, m in _MODE_CODES}

_EOL = "000000000001"


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length: zero or more makeup codes + a
    terminating code (T.4 §4.1.2 — runs ≥64 are makeup + terminating,
    runs ≥2624 chain extended makeups)."""
    table = _WHITE_DEC if white else _BLACK_DEC
    total = 0
    while True:
        ln, code = 0, 0
        val = None
        while ln < 14:
            code = (code << 1) | bits.bit()
            ln += 1
            val = table.get((ln, code))
            if val is not None:
                break
        if val is None:
            raise NotImplementedError("invalid T.4 run-length code in fax stream")
        total += val
        if val < 64:  # terminating code ends the run
            return total


def _sync_eol(bits: _Bits) -> bool:
    """Consume fill bits + one EOL; False if the stream ends instead."""
    zeros = 0
    while True:
        if bits.exhausted() and zeros < 11:
            return False
        try:
            b = bits.bit()
        except EOFError:
            return False
        if b == 0:
            zeros += 1
        else:
            if zeros >= 11:
                return True
            zeros = 0  # noise before a real EOL — keep scanning


def _decode_1d_row(bits: _Bits, width: int) -> list[int]:
    """One MH-coded row → its changing-element positions."""
    trans: list[int] = []
    pos, white = 0, True
    while pos < width:
        run = _read_run(bits, white)
        pos += run
        trans.append(min(pos, width))
        white = not white
    return trans


def _decode_2d_row(bits: _Bits, ref: list[int], width: int) -> list[int]:
    """One T.6/T.4-2D row against reference transitions `ref`."""
    trans: list[int] = []
    a0 = -1
    white = True
    while a0 < width:
        # b1: first ref transition > a0 introducing the color OPPOSITE
        # to a0's run color. Rows start white, so transition i (0-based)
        # introduces black for even i, white for odd i: when the current
        # run is white we want an even-index transition, else odd.
        i = 0
        while i < len(ref) and (ref[i] <= a0 or ((i & 1) == 1) == white):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        ln, code = 0, 0
        mode = None
        while ln < 7:
            code = (code << 1) | bits.bit()
            ln += 1
            mode = _MODE_DEC.get((ln, code))
            if mode is not None:
                break
        if mode is None:
            raise NotImplementedError("unsupported T.6 extension/uncompressed mode")
        if mode == "P":
            a0 = b2  # color unchanged, no transition recorded
        elif mode == "H":
            start = max(a0, 0)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            a1 = min(start + r1, width)
            a2 = min(a1 + r2, width)
            trans.append(a1)
            trans.append(a2)
            a0 = a2
        else:  # vertical family
            d = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3, "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = min(max(b1 + d, 0), width)
            trans.append(a1)
            a0 = a1
            white = not white
    return trans


def _rows_to_bits(rows: list[list[int]], width: int) -> np.ndarray:
    """Changing-element rows → (n, width) uint8 {0,1} (1 = black)."""
    out = np.zeros((len(rows), width), dtype=np.uint8)
    for y, trans in enumerate(rows):
        row = out[y]
        prev, ink = 0, 0
        for t in trans:
            if ink:
                row[prev:t] = 1
            prev, ink = t, ink ^ 1
        if ink and prev < width:
            row[prev:] = 1
    return out


def decode_ccitt(data: bytes, width: int, nrows: int, compression: int,
                 t4_options: int = 0, fill_order: int = 1) -> np.ndarray:
    """CCITT strip → (nrows, width) uint8 {0,1}, 1 = black ink.

    compression 2 = modified Huffman (byte-aligned 1D rows, no EOL),
    3 = T.4 Group 3 (EOL-framed; T4Options bit0 selects mixed 1D/2D),
    4 = T.6 Group 4 MMR (all-2D, imaginary all-white reference row).
    """
    if fill_order == 2:
        data = data.translate(_REVERSE8)
    bits = _Bits(data)
    rows: list[list[int]] = []
    if compression == 2:
        for _ in range(nrows):
            rows.append(_decode_1d_row(bits, width))
            bits.byte_align()
    elif compression == 3:
        two_d = bool(t4_options & 1)
        ref: list[int] = []
        for _ in range(nrows):
            if not _sync_eol(bits):
                break  # short strip: remaining rows stay white
            if two_d:
                tag = bits.bit()
                row = _decode_1d_row(bits, width) if tag else _decode_2d_row(bits, ref, width)
            else:
                row = _decode_1d_row(bits, width)
            rows.append(row)
            ref = row
    elif compression == 4:
        ref = []  # imaginary all-white reference line
        for _ in range(nrows):
            rows.append(_decode_2d_row(bits, ref, width))
            ref = rows[-1]
    else:
        raise NotImplementedError(f"CCITT compression {compression}")
    while len(rows) < nrows:
        rows.append([])
    return _rows_to_bits(rows, width)


# ----------------------------------------------------------------- TIFF LZW


def tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (TIFF6 §13): MSB-first code packing, Clear=256,
    EOI=257, and the 'early change' — code width bumps at 2^n - 1
    (one code earlier than GIF's LSB-first variant in gif LZW)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bits = _Bits(data)
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256
        table.append(b"")  # 257
        return 9

    width = reset()
    prev: bytes | None = None
    while len(out) < max_out:
        if (bits.pos + width) > 8 * len(data):
            break
        code = bits.peek(width)
        bits.skip(width)
        if code == EOI:
            break
        if code == CLEAR:
            width = reset()
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    return bytes(out[:max_out])


def packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:max_out])


# ------------------------------------------------------------- segment glue


def _merge_jpeg_tables(tables: bytes, strip: bytes) -> bytes:
    """Abbreviated JPEG-in-TIFF (TIFF TechNote 2): JPEGTables holds
    SOI + DQT/DHT + EOI; each strip holds SOI + frame without tables.
    Splice the table segments right after the strip's SOI."""
    if len(tables) >= 4 and tables[:2] == b"\xff\xd8":
        body = tables[2:]
        if body[-2:] == b"\xff\xd9":
            body = body[:-2]
    else:
        body = tables
    if strip[:2] != b"\xff\xd8":
        raise NotImplementedError("JPEG-in-TIFF strip without SOI")
    return strip[:2] + body + strip[2:]


def _unpack_bits_rows(raw: bytes, nrows: int, width: int, spp: int, bps: int) -> np.ndarray:
    """Byte-padded rows of sub-byte samples → (nrows, width*spp) uint8
    sample values (not yet scaled)."""
    row_bytes = (width * spp * bps + 7) // 8
    need = row_bytes * nrows
    buf = np.frombuffer(raw[:need].ljust(need, b"\x00"), dtype=np.uint8)
    buf = buf.reshape(nrows, row_bytes)
    bits = np.unpackbits(buf, axis=1)[:, : width * spp * bps]
    bits = bits.reshape(nrows, width * spp, bps)
    weights = (1 << np.arange(bps - 1, -1, -1)).astype(np.uint16)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def _scale_to_8bit(samples: np.ndarray, bps: int) -> np.ndarray:
    if bps == 8:
        return samples.astype(np.uint8)
    if bps == 16:
        return (samples >> 8).astype(np.uint8)  # high byte, the shared convention
    maxv = (1 << bps) - 1
    return ((samples.astype(np.uint16) * 255 + maxv // 2) // maxv).astype(np.uint8)


def _decode_segment(comp: int, raw: bytes, seg_h: int, width: int, spp: int,
                    bps: int, tags: dict, bo: str) -> np.ndarray:
    """One strip/tile → (seg_h, width, spp) uint8 samples."""
    fill_order = _tag1(tags, 266, 1)
    predictor = _tag1(tags, 317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} (floating-point)")
    if comp in (2, 3, 4):
        if bps != 1 or spp != 1:
            raise NotImplementedError("CCITT data must be bilevel 1-bit")
        t4opts = _tag1(tags, 292, 0) if comp == 3 else _tag1(tags, 293, 0)
        ink = decode_ccitt(raw, width, seg_h, comp, t4opts, fill_order)
        # CCITT 1 = black ink; photometric handling later maps to gray.
        return ink.reshape(seg_h, width, 1)
    if comp == 7:
        tables = bytes(tags[347][0]) if 347 in tags else b""
        stream = _merge_jpeg_tables(tables, raw) if tables else raw
        from openocr_spark.kernels.jpeg_format import decode_jpeg

        px = decode_jpeg(stream, apply_orientation=False)
        if px.ndim == 2:
            px = px[:, :, None]
        return px[:seg_h, :width, :]
    if comp == 6:
        raise NotImplementedError(
            "old-style JPEG-in-TIFF (compression 6) is deprecated and "
            "underspecified (TIFF TechNote 2) — re-encode as compression 7"
        )
    if comp == 1:
        buf = raw
    elif comp == 5:
        buf = tiff_lzw_decode(raw, seg_h * ((width * spp * bps + 7) // 8))
    elif comp in (8, 32946):
        buf = zlib.decompress(raw)
    elif comp == 32773:
        buf = packbits_decode(raw, seg_h * ((width * spp * bps + 7) // 8))
    else:
        raise NotImplementedError(f"TIFF compression {comp}")

    if bps in (1, 2, 4):
        if predictor == 2:
            raise NotImplementedError("TIFF predictor 2 with sub-byte samples")
        samples = _unpack_bits_rows(buf, seg_h, width, spp, bps)
        samples = samples.reshape(seg_h, width, spp)
        return samples  # scaled by caller (palette needs raw indices)
    if bps == 8:
        need = seg_h * width * spp
        arr = np.frombuffer(buf[:need].ljust(need, b"\x00"), dtype=np.uint8)
        arr = arr.reshape(seg_h, width, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
        return arr
    if bps == 16:
        need = seg_h * width * spp * 2
        dt = np.dtype(np.uint16).newbyteorder("<" if bo == "<" else ">")
        arr = np.frombuffer(buf[:need].ljust(need, b"\x00"), dtype=dt).reshape(seg_h, width, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint64), axis=1).astype(np.uint16)
        return arr.astype(np.uint16)
    raise NotImplementedError(f"TIFF BitsPerSample {bps}")


def _decode_ifd(data: bytes, tags: dict, bo: str) -> np.ndarray:
    width = _tag1(tags, 256)
    height = _tag1(tags, 257)
    if not width or not height:
        raise NotImplementedError("TIFF IFD without ImageWidth/ImageLength")
    spp = _tag1(tags, 277, 1)
    check_dims(width, height, "TIFF", max(int(spp), 1))
    if width * height > 100_000 * len(data):
        # even the most compressible real page (an all-white G4 fax,
        # ~40,000:1) cannot put this many pixels in this few bytes; a
        # corrupt dimension tag otherwise yields a minutes-long decode
        # into a plausible-looking giant blank canvas
        raise NotImplementedError(
            f"TIFF dims {width}x{height} impossible for a "
            f"{len(data)}-byte file"
        )
    bps_list = tags.get(258, [1])
    if len(set(bps_list)) != 1:
        raise NotImplementedError("heterogeneous BitsPerSample")
    bps = bps_list[0]
    comp = _tag1(tags, 259, 1)
    photo = _tag1(tags, 262, 1)
    if 262 not in tags and comp in (2, 3, 4):
        # fax pages missing PhotometricInterpretation default to
        # MinIsWhite (libtiff's "assuming min-is-white" behavior), not
        # the general default of 1 — else ink would render inverted
        photo = 0
    planar = _tag1(tags, 284, 1)

    tiled = 322 in tags
    if tiled:
        tw, th = _tag1(tags, 322), _tag1(tags, 323)
        offsets, counts = tags[324], tags[325]
    else:
        tw, th = width, _tag1(tags, 278, height)
        offsets = tags.get(273, [])
        counts = tags.get(279, [len(data) - offsets[0] if offsets else 0])

    n_planes = spp if planar == 2 else 1
    seg_spp = 1 if planar == 2 else spp
    per_plane = len(offsets) // max(n_planes, 1)

    # JPEG-compressed (comp 7) chunky pages: the DECODED channel count
    # is authoritative — a CMYK/YCCK JPEG inside a spp=4 photometric-5
    # TIFF already lands as RGB from decode_jpeg's APP14 handling, so
    # the canvas is sized from the first decoded segment, not the tag
    canvas = None
    if comp != 7 or planar == 2:
        canvas = np.zeros((height, width, spp),
                          dtype=np.uint16 if bps == 16 else np.uint8)
    for plane in range(n_planes):
        segs = list(zip(offsets[plane * per_plane : (plane + 1) * per_plane],
                        counts[plane * per_plane : (plane + 1) * per_plane]))
        if tiled:
            tiles_across = (width + tw - 1) // tw
            for idx, (off, cnt) in enumerate(segs):
                ty, tx = divmod(idx, tiles_across)
                raw = data[off : off + cnt]
                px = _decode_segment(comp, raw, th, tw, seg_spp, bps, tags, bo)
                y0, x0 = ty * th, tx * tw
                hh = min(th, height - y0)
                ww = min(tw, width - x0)
                if canvas is None:
                    canvas = np.zeros((height, width, px.shape[2]), np.uint8)
                if planar == 2:
                    canvas[y0 : y0 + hh, x0 : x0 + ww, plane] = px[:hh, :ww, 0]
                else:
                    nc = canvas.shape[2]
                    canvas[y0 : y0 + hh, x0 : x0 + ww, :] = px[:hh, :ww, :nc]
        else:
            rps = th
            y = 0
            for off, cnt in segs:
                if y >= height:
                    break
                seg_h = min(rps, height - y)
                raw = data[off : off + cnt]
                px = _decode_segment(comp, raw, seg_h, width, seg_spp, bps, tags, bo)
                if canvas is None:
                    canvas = np.zeros((height, width, px.shape[2]), np.uint8)
                if planar == 2:
                    canvas[y : y + seg_h, :, plane] = px[:seg_h, :, 0]
                else:
                    nc = canvas.shape[2]
                    canvas[y : y + seg_h, :, :] = px[:seg_h, :, :nc]
                y += seg_h

    if canvas is None:
        raise NotImplementedError("TIFF page with no image segments")

    # ---- photometric interpretation → gray (h,w) or RGB (h,w,3) uint8
    if comp in (2, 3, 4):
        # canvas holds fax ink bits (1 = a black run). Photometric 0
        # (WhiteIsZero, the fax default) images ink as black; photometric
        # 1 (BlackIsZero) inverts the sample meaning (TIFF6), matching
        # libtiff/cv2 and this module's own uncompressed bilevel path.
        ink = canvas[:, :, 0] > 0
        if photo == 1:
            return np.where(ink, 255, 0).astype(np.uint8)
        return np.where(ink, 0, 255).astype(np.uint8)
    if comp == 7 and canvas.shape[2] in (1, 3):
        px = canvas.astype(np.uint8)
        return px[:, :, 0] if px.shape[2] == 1 else px
    if photo == 3:  # palette: indices, ColorMap has 3 planes of 2^bps SHORTs
        cmap = tags.get(320)
        if not cmap:
            raise NotImplementedError("palette TIFF without ColorMap")
        n = 1 << bps
        lut = (np.array(cmap, dtype=np.uint16).reshape(3, n) >> 8).astype(np.uint8)
        idx = canvas[:, :, 0].astype(np.int32)
        return np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
    gray8 = _scale_to_8bit(canvas, bps)
    if photo == 0:  # WhiteIsZero
        gray8 = (255 - gray8.astype(np.int16)).astype(np.uint8)
    if spp == 1:
        return gray8[:, :, 0]
    if photo == 5 or (spp == 4 and photo not in (2, 6)):
        c, m, ye, k = (gray8[:, :, i].astype(np.uint16) for i in range(4))
        r = ((255 - c) * (255 - k)) // 255
        g = ((255 - m) * (255 - k)) // 255
        b = ((255 - ye) * (255 - k)) // 255
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    if spp >= 3:  # RGB (+ ExtraSamples alpha dropped, like the PNG path)
        return gray8[:, :, :3]
    raise NotImplementedError(f"TIFF photometric {photo} with {spp} samples")


def _enc_run_bits(run: int, white: bool) -> str:
    """Run length → T.4 code bits (makeups + terminating)."""
    enc = _WHITE_ENC if white else _BLACK_ENC
    out = []
    while run >= 2624:
        out.append(enc[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        out.append(enc[makeup])
        run -= makeup
    out.append(enc[run])
    return "".join(out)


def encode_tiff_pages(gray: np.ndarray, ink: np.ndarray) -> bytes:
    """Minimal TIFF WRITE sink (the encode side of S8/S10, like
    encode_png): a two-IFD little-endian chain — page 0 the uint8 gray
    image uncompressed (single strip, BlackIsZero), page 1 the bool ink
    page CCITT-MH coded (compression 2, WhiteIsZero, byte-aligned 1D
    rows). Lossless by construction; decode_tiff round-trips both pages
    bit-exact (pinned by test and by the decode_roundtrip driver
    oracle). The full compression/photometric matrix is exercised by
    the independent test-side encoder; this sink stays deliberately
    small."""
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    ink = np.ascontiguousarray(ink).astype(bool)

    blob = bytearray(b"II*\x00\x00\x00\x00\x00")
    link = 4  # offset of the pointer to patch with each IFD's position

    def put(data: bytes) -> int:
        if len(blob) % 2:
            blob.append(0)
        off = len(blob)
        blob.extend(data)
        return off

    def add_ifd(entries: list[tuple[int, int, int, int]]) -> None:
        nonlocal link
        if len(blob) % 2:
            blob.append(0)
        ifd = len(blob)
        blob.extend(struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in sorted(entries):
            blob.extend(struct.pack("<HHII", tag, typ, cnt, val))
        blob.extend(b"\x00\x00\x00\x00")
        struct.pack_into("<I", blob, link, ifd)
        link = ifd + 2 + 12 * len(entries)

    h, w = gray.shape
    off = put(gray.tobytes())
    add_ifd([
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, off), (277, 3, 1, 1),
        (278, 4, 1, h), (279, 4, 1, h * w),
    ])

    ih, iw = ink.shape
    bits: list[str] = []
    for y in range(ih):
        row = ink[y]
        # alternating white-first runs (a 0-length leading white run is
        # legal and required when the row starts black, T.4 §4.1.2)
        acc = []
        pos, white = 0, True
        while pos < iw:
            if white:
                run_end = pos
                while run_end < iw and not row[run_end]:
                    run_end += 1
            else:
                run_end = pos
                while run_end < iw and row[run_end]:
                    run_end += 1
            acc.append(_enc_run_bits(run_end - pos, white))
            pos, white = run_end, not white
        rowbits = "".join(acc)
        bits.append(rowbits + "0" * ((-len(rowbits)) % 8))
    allbits = "".join(bits)
    fax = bytes(int(allbits[i : i + 8], 2) for i in range(0, len(allbits), 8))
    off = put(fax)
    add_ifd([
        (256, 4, 1, iw), (257, 4, 1, ih), (258, 3, 1, 1), (259, 3, 1, 2),
        (262, 3, 1, 0), (273, 4, 1, off), (277, 3, 1, 1),
        (278, 4, 1, ih), (279, 4, 1, len(fax)),
    ])
    return bytes(blob)


_WHITE_ENC = {v: k for k, v in _WHITE_CODES.items()}
_BLACK_ENC = {v: k for k, v in _BLACK_CODES.items()}


def decode_tiff(data: bytes) -> list[np.ndarray]:
    """Full-chain TIFF decode → one ndarray per IFD page, each
    (h, w) uint8 gray or (h, w, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise NotImplementedError("not a classic TIFF (II*/MM* magic)")
    (off,) = struct.unpack_from(bo + "I", data, 4)
    pages: list[np.ndarray] = []
    seen: set[int] = set()
    while off and off not in seen and len(pages) < 512:
        seen.add(off)
        tags, off = _read_ifd(data, off, bo)
        pages.append(_decode_ifd(data, tags, bo))
    if not pages:
        raise NotImplementedError("TIFF with no decodable IFD")
    return pages
