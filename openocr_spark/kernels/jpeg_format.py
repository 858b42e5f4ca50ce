"""From-scratch JPEG (JFIF) decoder — numpy only.

Closes the last entropy-codec stub in media_decode (the reference
decodes JPEG via cv2.imdecode, opendet/preprocess/__init__.py:85-143):
segment parse (DQT/DHT/SOF/DRI/SOS), canonical Huffman decode via a
16-bit LUT (one peek per symbol) with 0xFF00 byte-unstuffing and RSTn
restart handling, DC-diff + AC run-length/EOB/ZRL into a per-component
zigzag coefficient store, then dequantize → inverse zigzag → 8×8 IDCT
batched as one einsum per component (separable cosine basis) — the
same reconstruction path sequential and progressive scans share.
Interleaved MCU layout with arbitrary (h,v) sampling factors (4:4:4
and 4:2:0 covered by tests) and non-interleaved single-component
scans (T.81 A.2.2), nearest-neighbor chroma upsample, BT.601
YCbCr→RGB. EXIF orientation (APP1 tag 0x0112) is applied by default,
matching cv2.imread/imdecode.

Scope: baseline sequential (SOF0) AND progressive (SOF2 — spectral
selection, successive approximation with DC/AC refinement scans, EOBn
block runs, per-scan restart intervals; T.81 Annex G), 8-bit samples,
1, 3, or 4 components. The Adobe APP14 marker's color-transform flag
is honored (r5, VERDICT r4 next-round #2): 3-component transform=0 →
components are RGB directly (no YCbCr matrix); 4-component transform=0
→ CMYK, transform=2 → YCCK (BT.601 inverse on the first three planes,
K passthrough). Adobe-marked streams store CMYK/YCCK samples INVERTED
(0 = full ink — the Photoshop convention libjpeg documents and passes
through); plain 4-component streams without APP14 are direct CMYK ink.
Output is always RGB (h, w, 3) for color (CMYK composited against the
K plate: ch = (255−ink)·(255−K)/255), (h, w) for grayscale — the
scanned-document corpora this engine targets embed CMYK JPEGs inside
PDF /DCTDecode streams, which route here too. ARITHMETIC coding is
decoded in BOTH modes (T.81 Annex D/F QM coder — kernels/jpeg_arith,
r5): sequential SOF9 and progressive SOF10 (spectral selection +
successive approximation over the shared coefficient store), including
DAC conditioning and restart intervals; 16-bit (Pq=1) quantization
tables parse. LOSSLESS is decoded in BOTH entropy modes: Huffman SOF3
(Annex H.1: the 7 spatial predictors + point transform, bit-exact, 2-
to 16-bit precision) and arithmetic SOF11 (Annex H.2: the same
prediction pipeline with differences QM-coded under the
two-dimensional (Da, Db) conditioning model —
jpeg_arith.decode_lossless_arith_scan). 12-bit DCT precision decodes
with high-bits down-conversion to uint8 (the 16-bit-PNG convention).
HIERARCHICAL mode (T.81 Annex J, late-r5) is decoded too: DHP opens
the pyramid, EXP expands the reference components (J.1.1.2
interpolation), and differential frames — SOF5/6/7 Huffman,
SOF13/14/15 arithmetic — fold into the running reference (PRED = 0
DC coding, no level shift, clamped add for DCT frames, mod-2^16 add
for lossless frames), so every T.81 frame type now decodes.

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
    """Canonical Huffman table (DHT BITS/HUFFVAL). Decoding uses a
    full 16-bit lookup table: every legal code of length L fills the
    2^(16-L) LUT slots sharing its prefix with (symbol, L), so one
    16-bit peek resolves any symbol in O(1) instead of the spec's
    bit-at-a-time DECODE walk (F.2.2.3) — the entropy decode is the
    hot loop of every Huffman scan. Slots no code reaches keep length
    0 and fail loud."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        lut_sym = np.zeros(1 << 16, np.uint8)
        lut_len = np.zeros(1 << 16, np.uint8)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lo = code << (16 - ln)
                hi = lo + (1 << (16 - ln))
                lut_sym[lo:hi] = vals[k]
                lut_len[lo:hi] = ln
                code += 1
                k += 1
            code <<= 1
        self.lut_sym = lut_sym.tolist()
        self.lut_len = lut_len.tolist()


_HUFF_CACHE: dict[bytes, _HuffTable] = {}


def _huff_table(bits: list[int], vals: bytes) -> _HuffTable:
    """Content-keyed cache for decoded DHT tables: the LUT build is
    ~ms-scale, and real corpora overwhelmingly reuse a handful of
    tables (the Annex K / libjpeg defaults), so building each distinct
    table once amortizes it to nothing across a partition's files."""
    key = bytes(bits) + vals
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) >= 64:  # bound executor memory
            _HUFF_CACHE.clear()
        t = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = t
    return t


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # Refill to >= 41 buffered bits (was: >= 25), with a bulk fast
        # path: a 4-byte chunk with no 0xFF needs no unstuff/marker
        # handling and lands in one int.from_bytes — this loop is the
        # hottest line of the JPEG entropy decode (guide §1.2 per-task
        # work). Locals + end-of-call state writeback avoid ~10
        # attribute accesses per buffered byte. Consumers read only the
        # low `nbits` bits of `acc` (every read masks/shifts), so
        # masking once at the end instead of every byte is equivalent.
        d = self.data
        pos = self.pos
        acc = self.acc
        nb = self.nbits
        n = len(d)
        while nb <= 40:
            if pos + 4 <= n:
                chunk = d[pos : pos + 4]
                if 0xFF not in chunk:
                    acc = (acc << 32) | int.from_bytes(chunk, "big")
                    nb += 32
                    pos += 4
                    continue
            if pos >= n:
                acc <<= 8
                nb += 8  # pad with zeros past EOI (spec allows)
                continue
            b = d[pos]
            if b == 0xFF:
                nxt = d[pos + 1] if pos + 1 < n else 0xD9
                if nxt == 0x00:
                    pos += 2
                else:
                    # restart (consumed by restart(), not here) or any
                    # other marker: stop producing real bits, pad zeros
                    acc <<= 8
                    nb += 8
                    continue
            else:
                pos += 1
            acc = (acc << 8) | b
            nb += 8
        self.pos = pos
        self.acc = acc & ((1 << nb) - 1)
        self.nbits = nb

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:  # _fill leaves ≥ 41 buffered bits, n ≤ 16
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        """The next 16 bits without consuming (zero-padded past the
        end of the entropy segment, like the rest of the reader)."""
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

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
    w = r.peek16()
    ln = t.lut_len[w]
    if ln == 0:
        raise NotImplementedError("JPEG: invalid Huffman code")
    r.nbits -= ln  # consume exactly the code's bits
    return t.lut_sym[w]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t received bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(height, width, n_components) from the SOF0/SOF2 header without
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
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            # TEM / RSTn are standalone (no length word); 0xFF is fill
            # before a marker — treating their following bytes as a
            # segment length misparses the stream (ADVICE r4 item 4)
            pos -= 1 if marker == 0xFF else 0
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB, 0xDE):
            # any non-differential SOF — or DHP, which carries the
            # full-resolution dims of a hierarchical stream
            _prec, h, w, nc = struct.unpack_from(">BHHB", data, pos + 2)
            return h, w, nc
        if marker == 0xDA:
            break  # scan before SOF — malformed
        pos += seglen
    raise NotImplementedError("JPEG: no non-hierarchical SOF header")


def exif_orientation(data: bytes) -> int:
    """EXIF orientation (tag 0x0112, 1..8) from the first Exif APP1
    segment, or 1 when absent/off-spec. Marker-segment scan only — the
    entropy-coded data is never touched. Off-spec TIFF structures
    (truncated IFD, bad byte-order mark, out-of-range value) degrade
    to 1, matching cv2's tolerant reader rather than failing a decode
    over metadata."""
    if data[:2] != b"\xff\xd8":
        return 1
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):  # EOI / SOS — no APP1 coming
            return 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            pos -= 1 if marker == 0xFF else 0
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:
            return 1
        if marker == 0xE1 and data[pos + 2 : pos + 8] == b"Exif\x00\x00":
            tiff = data[pos + 8 : pos + seglen]
            try:
                if tiff[:2] == b"II":
                    end = "<"
                elif tiff[:2] == b"MM":
                    end = ">"
                else:
                    return 1
                magic, ifd0 = struct.unpack_from(end + "HI", tiff, 2)
                if magic != 42:
                    return 1
                (count,) = struct.unpack_from(end + "H", tiff, ifd0)
                for i in range(count):
                    tag, typ, n = struct.unpack_from(
                        end + "HHI", tiff, ifd0 + 2 + 12 * i
                    )
                    if tag == 0x0112 and typ == 3 and n == 1:
                        (v,) = struct.unpack_from(
                            end + "H", tiff, ifd0 + 2 + 12 * i + 8
                        )
                        return v if 1 <= v <= 8 else 1
            except struct.error:
                return 1
            return 1  # Exif APP1 present but no orientation entry
        pos += seglen
    return 1


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Transform stored pixels to display orientation (EXIF 1..8) —
    the composition cv2.imread / PIL exif_transpose apply. Operates on
    the first two axes only, so (h, w) and (h, w, 3) both work."""
    if orientation == 2:
        px = px[:, ::-1]
    elif orientation == 3:
        px = px[::-1, ::-1]
    elif orientation == 4:
        px = px[::-1, :]
    elif orientation == 5:
        px = np.swapaxes(px, 0, 1)
    elif orientation == 6:
        px = np.swapaxes(px, 0, 1)[:, ::-1]
    elif orientation == 7:
        px = np.swapaxes(px, 0, 1)[::-1, ::-1]
    elif orientation == 8:
        px = np.swapaxes(px, 0, 1)[::-1, :]
    return np.ascontiguousarray(px)


def decode_jpeg(data: bytes, apply_orientation: bool = True) -> np.ndarray:
    """Public entry: `_decode_stream` + EXIF orientation. cv2 applies
    the orientation tag by default in BOTH imread (tools/infer_e2e.py:289)
    and imdecode (opendet/preprocess/__init__.py:104 DecodeImage), so
    the default here matches; PDF /DCTDecode streams pass False —
    PDF renderers ignore EXIF inside embedded images."""
    px = _decode_stream(data)
    if apply_orientation:
        ori = exif_orientation(data)
        if ori != 1:
            px = apply_exif_orientation(px, ori)
    return px


def _decode_stream(data: bytes) -> np.ndarray:
    """JPEG → uint8 array: (h, w) for grayscale, (h, w, 3) RGB for
    YCbCr / Adobe-RGB / CMYK / YCCK (see module docstring for the
    APP14 conventions). Decodes every T.81 frame type: sequential /
    progressive / lossless, Huffman or arithmetic entropy coding,
    non-differential or hierarchical (DHP/EXP + differential frames).
    Raises NotImplementedError on malformed streams."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    adobe: int | None = None  # APP14 color-transform flag
    conditioning: dict = {}  # DAC: ("dc",tb)->(L,U) / ("ac",tb)->Kx
    coef_store: dict[int, np.ndarray] | None = None  # progressive only
    hier: dict | None = None  # Annex J state: full dims + reference comps
    pending_exp: tuple[int, int] | None = None  # EXP before the next SOF
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker expected")
        marker = data[pos + 1]
        if marker == 0xFF:  # 0xFF fill bytes before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # stray RSTn / TEM between scans (length-less)
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
                if pq:  # 16-bit precision table (big-endian u16 × 64)
                    qtables[tq] = (
                        np.frombuffer(body, ">u2", 64, b).astype(np.int32)
                    )
                    b += 128
                else:
                    qtables[tq] = np.frombuffer(body, np.uint8, 64, b).astype(
                        np.int32
                    )
                    b += 64
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                htables[(tc, th)] = _huff_table(bits, body[b + 17 : b + 17 + n])
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB,
                        0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF, 0xDE):
            # Non-differential: SOF0 baseline / SOF1 extended sequential
            # (identical decode process, 12-bit and 4-table ids allowed)
            # / SOF2 progressive / SOF3 lossless / SOF9 arith-sequential
            # / SOF10 arith-progressive / SOF11 arith-lossless.
            # Differential (hierarchical frames only): SOF5/6/7 Huffman,
            # SOF13/14/15 arithmetic. 0xDE is DHP — same segment syntax,
            # opens hierarchical mode with the full-resolution dims.
            if hier is not None and coef_store is not None:
                # a new frame header closes the previous (store-based:
                # sequential or progressive Huffman) hierarchical
                # frame: reconstruct and fold it now
                _hier_fold(
                    hier, frame, _progressive_planes(frame, qtables, coef_store)
                )
                coef_store = None
            # a multi-scan lossless frame left incomplete by the next
            # SOF must fail loudly, not fold/assemble without its
            # missing components (mirrors the EOI check)
            if frame is not None and frame.get("_lossless_planes") and len(
                frame["_lossless_planes"]
            ) < len(frame["comps"]):
                missing = [c["id"] for c in frame["comps"]
                           if c["id"] not in frame["_lossless_planes"]]
                raise NotImplementedError(
                    "JPEG: lossless frame ended with undecoded "
                    f"components {missing}"
                )
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            from openocr_spark.kernels.media_decode import check_dims
            check_dims(w, h, "JPEG", max(nc, 1))
            lossless = marker in (0xC3, 0xC7, 0xCB, 0xCF)
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            if lossless or marker == 0xDE:
                if not 2 <= prec <= 16:
                    raise NotImplementedError(
                        f"JPEG: lossless precision {prec} (T.81 allows 2..16)"
                    )
            elif prec not in (8, 12):
                raise NotImplementedError(f"JPEG: {prec}-bit DCT precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if marker == 0xDE:  # DHP
                if hier is not None:
                    raise NotImplementedError("JPEG: second DHP segment")
                hier = {"h": h, "w": w, "prec": prec, "ref": {},
                        "nframes": 0}
                pos += seglen
                continue
            if differential and hier is None:
                raise NotImplementedError(
                    "JPEG: differential frame outside hierarchical mode"
                )
            frame = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
                "arith": marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF),
                "lossless": lossless,
                "differential": differential,
            }
            if hier is not None:
                if not differential and hier["nframes"]:
                    raise NotImplementedError(
                        "JPEG: non-differential frame after the first "
                        "hierarchical frame"
                    )
                if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                    raise NotImplementedError(
                        "JPEG: subsampled hierarchical frame components "
                        "(resolution levels carry the scaling)"
                    )
                frame["exp"] = pending_exp
                pending_exp = None
                frame["_raw_planes"] = True
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            b = 0
            while b + 1 < len(body):
                tc, tb = body[b] >> 4, body[b] & 0x0F
                v = body[b + 1]
                if tc == 0:
                    conditioning[("dc", tb)] = (v & 0x0F, v >> 4)  # (L, U)
                else:
                    conditioning[("ac", tb)] = v  # Kx
                b += 2
        elif marker == 0xDF:  # EXP — expand reference before next frame
            pending_exp = (body[0] >> 4, body[0] & 0x0F)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE:  # APP14 — Adobe color-transform marker
            # "Adobe" + version(2) + flags0(2) + flags1(2) + transform(1)
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe = body[11]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise NotImplementedError("JPEG: SOS before SOF")
            frame["adobe"] = adobe
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if not frame.get("lossless"):
                # freeze each component's quant table at its first scan
                # (libjpeg's binding semantics): dequantization of the
                # coefficient store is DEFERRED to the frame fold / EOI,
                # by which time a later frame's DQT may have redefined
                # the same table id — the live qtables dict must not
                # retro-affect this frame
                for comp, _, _ in scan:
                    if "qsnap" not in comp:
                        if comp["tq"] not in qtables:
                            raise NotImplementedError(
                                f"JPEG: scan before DQT {comp['tq']}"
                            )
                        comp["qsnap"] = qtables[comp["tq"]].copy()
            out = None
            if frame.get("lossless"):
                # Ss = predictor selector (1..7; 0 in differential
                # frames), Al = point transform
                if hier is not None and (ahal & 0x0F) != 0:
                    raise NotImplementedError(
                        "JPEG: point transform in hierarchical lossless scan"
                    )
                pt = ahal & 0x0F
                if pt != frame.setdefault("_pt", pt):
                    raise NotImplementedError(
                        "JPEG: point transform changes between lossless scans"
                    )
                # a lossless frame may carry several scans (one
                # component per scan, T.81 A.2.2 — like the sequential
                # store-based path): decode each scan to raw planes,
                # accumulate, assemble only when every frame component
                # has been seen
                was_raw = frame.get("_raw_planes", False)
                frame["_raw_planes"] = True
                if frame.get("arith"):
                    from openocr_spark.kernels.jpeg_arith import (
                        decode_lossless_arith_scan,
                    )

                    scan_planes = decode_lossless_arith_scan(
                        data, pos + seglen, frame, scan, restart_interval,
                        conditioning, ss, pt,
                    )
                else:
                    scan_planes = _decode_lossless_scan(
                        data, pos + seglen, frame, scan, htables,
                        restart_interval, ss, pt,
                    )
                frame["_raw_planes"] = was_raw
                store = frame.setdefault("_lossless_planes", {})
                store.update(scan_planes)
                if len(store) < len(frame["comps"]):
                    pos = _next_marker(data, pos + seglen)
                    continue
                if was_raw:  # hierarchical fold consumes raw planes
                    out = dict(store)
                else:
                    out = lossless_output(
                        [store[c["id"]] for c in frame["comps"]],
                        frame["prec"], pt,
                    )
            elif frame.get("arith") and frame["progressive"]:
                from openocr_spark.kernels.jpeg_arith import (
                    progressive_arith_scan,
                )

                if coef_store is None:
                    coef_store = _alloc_coef_store(frame)
                progressive_arith_scan(
                    data, pos + seglen, frame, scan, restart_interval,
                    conditioning, ss, se, ahal >> 4, ahal & 0x0F,
                    coef_store,
                )
                pos = _next_marker(data, pos + seglen)
                continue
            elif frame.get("arith"):
                # sequential arithmetic: same store-based flow as the
                # Huffman branch below (batched IDCT at EOI / the next
                # frame header; multi-scan non-interleaved frames work)
                from openocr_spark.kernels.jpeg_arith import decode_arith_scan

                if coef_store is None:
                    coef_store = _alloc_coef_store(frame)
                decode_arith_scan(
                    data, pos + seglen, frame, scan,
                    restart_interval, conditioning, coef_store,
                )
                pos = _next_marker(data, pos + seglen)
                continue
            elif not frame["progressive"]:
                # sequential Huffman: entropy-decode into the zigzag
                # coefficient store; reconstruction is the shared
                # batched-IDCT path at EOI / the next frame header —
                # this also lets a sequential frame carry several
                # non-interleaved scans (one per component, T.81 A.2.2)
                if coef_store is None:
                    coef_store = _alloc_coef_store(frame)
                _sequential_scan(
                    data, pos + seglen, frame, scan, htables,
                    restart_interval, coef_store,
                )
                pos = _next_marker(data, pos + seglen)
                continue
            else:
                if coef_store is None:
                    coef_store = _alloc_coef_store(frame)
                _progressive_scan(
                    data, pos + seglen, frame, scan, htables, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F, coef_store,
                )
                pos = _next_marker(data, pos + seglen)
                continue
            if hier is None:
                return out  # single-frame stream: out is the image
            _hier_fold(hier, frame, out)  # raw per-component planes
            pos = _next_marker(data, pos + seglen)
            continue
        pos += seglen
    if hier is not None:
        if coef_store is not None:  # store-based final frame ends at EOI
            _hier_fold(
                hier, frame, _progressive_planes(frame, qtables, coef_store)
            )
        if frame is not None and frame.get("_lossless_planes") and len(
            frame["_lossless_planes"]
        ) < len(frame["comps"]):
            missing = [c["id"] for c in frame["comps"]
                       if c["id"] not in frame["_lossless_planes"]]
            raise NotImplementedError(
                "JPEG: lossless frame ended with undecoded "
                f"components {missing}"
            )
        if frame is None or not hier["ref"]:
            raise NotImplementedError("JPEG: hierarchical stream with no frames")
        return _hier_assemble(hier, frame, adobe)
    if coef_store is not None:
        frame["adobe"] = adobe
        return _progressive_reconstruct(frame, qtables, coef_store)
    if frame is not None and frame.get("_lossless_planes"):
        missing = [c["id"] for c in frame["comps"]
                   if c["id"] not in frame["_lossless_planes"]]
        raise NotImplementedError(
            f"JPEG: lossless frame ended with undecoded components {missing}"
        )
    raise NotImplementedError("JPEG: no scan data")


def _decode_lossless_scan(
    data, pos, frame, scan, htables, restart_interval, predictor, pt
):
    """T.81 Annex H lossless process: per-sample Huffman-coded
    differences against one of the 7 spatial predictors, modulo-65536
    reconstruction, point transform Pt, 2..16-bit precision (>8-bit
    down-converts to uint8 by high-bits truncation, the 16-bit-PNG
    convention), restart intervals (prediction resets to the default at
    each RSTn, T.81 H.1.1). Sample-interleaved MCUs with 1×1 sampling
    (the only layout real lossless files use). Output follows the
    module conventions: gray (1 comp) or RGB-stacked (3 comps,
    components taken as direct color planes)."""
    h, w = frame["h"], frame["w"]
    prec = frame["prec"]
    if any(c["h"] != 1 or c["v"] != 1 for c, _t, _a in scan):
        raise NotImplementedError("JPEG: subsampled lossless components")
    # differential frames (hierarchical): Ss = 0 — no spatial
    # prediction, the coded values ARE the differences vs the reference
    diff_frame = bool(frame.get("differential"))
    if diff_frame:
        if predictor != 0:
            raise NotImplementedError(
                "JPEG: differential lossless scan requires Ss = 0"
            )
        if pt != 0:
            raise NotImplementedError(
                "JPEG: point transform in differential lossless scan"
            )
    elif not 1 <= predictor <= 7:
        raise NotImplementedError(f"JPEG: lossless predictor {predictor}")
    planes = {c["id"]: np.zeros((h, w), np.int32) for c, _t, _a in scan}
    r = _BitReader(data, pos)
    default = 1 << (prec - 1 - pt)
    unit = 0  # lossless MCU = one sample position across scan components
    fresh = True  # next sample starts a scan/restart interval
    ra_row = 0  # row where the current restart interval began: T.81
    # H.1.1 uses the 1-D Ra predictor for the FIRST LINE of the scan
    # AND of each restart interval (libjpeg's jdlossls behavior), not
    # just for the single sample after RSTn
    for y in range(h):
        for x in range(w):
            if restart_interval and unit and unit % restart_interval == 0:
                r.restart()
                fresh = True
                ra_row = y
            for comp, td, _ta in scan:
                t = _huff_decode(r, htables[(0, td)])
                diff = 32768 if t == 16 else (_extend(r.bits(t), t) if t else 0)
                p = planes[comp["id"]]
                if diff_frame:
                    px = 0
                elif fresh:
                    px = default
                elif y == ra_row:
                    px = int(p[y, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    a = int(p[y, x - 1])
                    b = int(p[y - 1, x])
                    c = int(p[y - 1, x - 1])
                    px = (
                        a, b, c, a + b - c,
                        a + ((b - c) >> 1), b + ((a - c) >> 1),
                        (a + b) >> 1,
                    )[predictor - 1]
                p[y, x] = (px + diff) & 0xFFFF
            fresh = False
            unit += 1
    if frame.get("_raw_planes"):
        return planes
    return lossless_output(
        [planes[comp["id"]] for comp, _t, _a in scan], prec, pt
    )


def lossless_output(raw_planes: list, prec: int, pt: int):
    """Shared lossless output stage (Huffman SOF3 + arithmetic SOF11):
    undo the point transform, down-convert >8-bit precision to uint8 by
    high-bits truncation (the 16-bit-PNG convention), stack color."""
    out = []
    for plane in raw_planes:
        vals = (plane.astype(np.int64)) << pt
        if prec > 8:
            out.append((np.clip(vals, 0, (1 << prec) - 1) >> (prec - 8))
                       .astype(np.uint8))
        else:
            out.append(np.clip(vals, 0, 255).astype(np.uint8))
    if len(out) == 1:
        return out[0]
    if len(out) == 3:
        return np.dstack(out)
    raise NotImplementedError(
        f"JPEG: {len(out)}-component lossless frame not supported"
    )


# --- hierarchical mode (Annex J: DHP / EXP / differential frames) ------


def _exp_upsample(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 reference-component expansion: output even samples copy
    the input, odd samples are the rounded mean of the two neighbours,
    the final odd sample replicates the edge. Doubles each expanded
    dimension exactly (the next frame header crops to its own dims)."""
    p = np.asarray(p, np.int64)
    if eh:
        q = np.empty((p.shape[0], 2 * p.shape[1]), np.int64)
        q[:, 0::2] = p
        if p.shape[1] > 1:
            q[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        q[:, -1] = p[:, -1]
        p = q
    if ev:
        q = np.empty((2 * p.shape[0], p.shape[1]), np.int64)
        q[0::2, :] = p
        if p.shape[0] > 1:
            q[1:-1:2, :] = (p[:-1, :] + p[1:, :] + 1) >> 1
        q[-1, :] = p[-1, :]
        p = q
    return p


def _hier_fold(hier: dict, frame: dict, planes: dict) -> None:
    """Fold one hierarchical frame's decoded planes into the running
    reference components: apply the frame's pending EXP expansion to
    the references, then replace (non-differential first frame) or add
    (differential: clamped to the sample range for DCT frames,
    modulo-2^16 for lossless frames — T.81 J.1)."""
    fh, fw = frame["h"], frame["w"]
    exp = frame.get("exp")
    if exp:
        eh, ev = exp
        for cid in hier["ref"]:
            hier["ref"][cid] = _exp_upsample(hier["ref"][cid], eh, ev)
    mx = (1 << frame["prec"]) - 1
    for c in frame["comps"]:
        cid = c["id"]
        if cid not in planes:
            continue  # component not in this frame's scans
        p = np.asarray(planes[cid])
        if frame.get("lossless"):
            newp = p.astype(np.int64)[:fh, :fw]
        else:
            newp = np.round(p.astype(np.float64)[:fh, :fw]).astype(np.int64)
        if not frame.get("differential"):
            hier["ref"][cid] = (
                newp & 0xFFFF if frame.get("lossless")
                else np.clip(newp, 0, mx)
            )
            continue
        ref = hier["ref"].get(cid)
        if ref is None:
            raise NotImplementedError(
                "JPEG: differential frame for a component with no reference"
            )
        if ref.shape[0] < fh or ref.shape[1] < fw:
            raise NotImplementedError(
                "JPEG: reference smaller than differential frame "
                "(missing EXP segment?)"
            )
        ref = ref[:fh, :fw]
        if frame.get("lossless"):
            hier["ref"][cid] = (ref + newp) & 0xFFFF
        else:
            hier["ref"][cid] = np.clip(ref + newp, 0, mx)
    hier["nframes"] += 1


def _hier_assemble(hier: dict, frame: dict, adobe) -> np.ndarray:
    """Final hierarchical output: the accumulated full-resolution
    reference components through the shared crop/color stage (all
    hierarchical components are 1×1-sampled — resolution differences
    live in the frame dims per level, not in sampling factors). A
    pyramid whose FINAL frame is lossless carries direct color planes
    (the lossless convention of this module); DCT-final pyramids go
    through the DCT color transform selected by comps + APP14."""
    order = [c["id"] for c in frame["comps"]]
    if frame.get("lossless"):
        return lossless_output([hier["ref"][cid] for cid in order],
                               hier["prec"], 0)
    out_frame = {
        "h": hier["h"], "w": hier["w"], "prec": hier["prec"],
        "comps": [dict(c, h=1, v=1) for c in frame["comps"]],
        "adobe": adobe,
    }
    planes = {cid: p.astype(np.float64) for cid, p in hier["ref"].items()}
    return _assemble(planes, out_frame)


def _sequential_scan(data, pos, frame, scan, htables, restart_interval, store):
    """Sequential-DCT Huffman entropy decode (SOF0/SOF1, differential
    SOF5 in hierarchical streams) into the zigzag coefficient store —
    reconstruction is the batched-IDCT path shared with progressive
    (_progressive_planes), so dequant + inverse zigzag + IDCT run as
    one einsum per component instead of per-block tiny-ndarray ops.
    Interleaved scans (Ns>1) walk the padded MCU grid; single-component
    scans are non-interleaved per T.81 A.2.2 — block raster over the
    component's own grid with one data unit per MCU — which also lets
    a sequential frame spread its components across several scans.
    Per block, coefficients accumulate in a plain Python list (the
    entropy loop is serial bit work; per-coefficient ndarray stores
    measured ~2× slower) and land in the store with one assignment."""
    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c, _td, _ta in scan}
    # differential frames (hierarchical mode) code DC directly
    # (PRED = 0); _progressive_planes omits their level shift
    diff_frame = bool(frame.get("differential"))

    # hoist the per-scan-component Huffman tables + stores out of the
    # per-block loop: the (class, id) dict lookups allocated a key
    # tuple per block (two per block, hot path — guide §1.2)
    resolved = {
        c["id"]: (htables[(0, td)], htables[(1, ta)], store[c["id"]])
        for c, td, ta in scan
    }

    def decode_block(cid, tdc, tac, cstore, by, bx):
        # _huff_decode/_extend/bits are inlined here (the only per-
        # coefficient call sites of the sequential scan): the bodies
        # are copied line for line — peek16's fill check + 16-bit LUT
        # probe, EXTEND's two-branch sign mapping — so the consumed bit
        # stream and the raised invalid-code error are unchanged
        # (guide §1.2 per-task work; pinned by the codec fuzz suite).
        zz = [0] * 64
        dc_len, dc_sym = tdc.lut_len, tdc.lut_sym
        ac_len, ac_sym = tac.lut_len, tac.lut_sym
        if r.nbits < 16:
            r._fill()
        w16 = (r.acc >> (r.nbits - 16)) & 0xFFFF
        t = dc_len[w16]
        if t == 0:
            raise NotImplementedError("JPEG: invalid Huffman code")
        r.nbits -= t
        t = dc_sym[w16]
        if t:
            if r.nbits < t:
                r._fill()
            r.nbits -= t
            v = (r.acc >> r.nbits) & ((1 << t) - 1)
            diff = v - (1 << t) + 1 if v < (1 << (t - 1)) else v
        else:
            diff = 0
        if diff_frame:
            zz[0] = diff
        else:
            pred[cid] += diff
            zz[0] = pred[cid]
        k = 1
        while k < 64:
            if r.nbits < 16:
                r._fill()
            w16 = (r.acc >> (r.nbits - 16)) & 0xFFFF
            ln = ac_len[w16]
            if ln == 0:
                raise NotImplementedError("JPEG: invalid Huffman code")
            r.nbits -= ln
            rs = ac_sym[w16]
            rrrr, ssss = rs >> 4, rs & 0x0F
            if ssss == 0:
                if rrrr == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                break  # EOB
            k += rrrr
            if k > 63:
                raise NotImplementedError("JPEG: AC index overflow")
            if r.nbits < ssss:
                r._fill()
            r.nbits -= ssss
            v = (r.acc >> r.nbits) & ((1 << ssss) - 1)
            zz[k] = v - (1 << ssss) + 1 if v < (1 << (ssss - 1)) else v
            k += 1
        cstore[by, bx] = zz

    n = 0  # MCUs since scan start (restart intervals count MCUs)
    if len(scan) > 1:  # interleaved: MCU order over the padded grid
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = -(-frame["w"] // (8 * hmax))
        mcus_y = -(-frame["h"] // (8 * vmax))
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and n and n % restart_interval == 0:
                    r.restart()
                    for cid in pred:
                        pred[cid] = 0
                for comp, _td, _ta in scan:
                    cid = comp["id"]
                    tdc, tac, cstore = resolved[cid]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            decode_block(
                                cid, tdc, tac, cstore,
                                my * comp["v"] + by, mx * comp["h"] + bx,
                            )
                n += 1
    else:
        comp, _td, _ta = scan[0]
        cid = comp["id"]
        tdc, tac, cstore = resolved[cid]
        bh, bw = _comp_blocks(frame, comp)
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n and n % restart_interval == 0:
                    r.restart()
                    pred[cid] = 0
                decode_block(cid, tdc, tac, cstore, by, bx)
                n += 1


def _assemble(planes: dict, frame: dict) -> np.ndarray:
    """Crop each component plane to frame size (sampling-scaled),
    nearest-neighbor upsample, then the color transform selected by
    component count + the Adobe APP14 flag: BT.601 YCbCr→RGB (3comp
    default), direct RGB (3-comp Adobe transform=0), CMYK/YCCK→RGB
    (4-comp; Adobe samples are stored inverted)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    adobe = frame.get("adobe")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        ph = -(-h * c["v"] // vmax)
        pw = -(-w * c["h"] // hmax)
        p = planes[c["id"]][:ph, :pw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))
    mx = float((1 << prec) - 1)
    if prec == 8:
        clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    else:
        # >8-bit samples down-convert by high-bits truncation, the same
        # convention as the 16-bit PNG path (media_decode)
        clip = lambda a: (  # noqa: E731
            np.clip(np.round(a), 0, mx).astype(np.uint16) >> (prec - 8)
        ).astype(np.uint8)
    if len(out_planes) == 1:
        return clip(out_planes[0])
    if len(out_planes) == 3:
        if adobe == 0:
            # Adobe transform=0 with 3 components: RGB stored directly
            return np.dstack([clip(p) for p in out_planes])
        y, cb, cr = out_planes
        r_ = y + 1.402 * (cr - half)
        g_ = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        b_ = y + 1.772 * (cb - half)
        return np.dstack([clip(r_), clip(g_), clip(b_)])
    if len(out_planes) != 4:
        raise NotImplementedError(
            f"JPEG: {len(out_planes)}-component frame not supported"
        )
    if prec != 8:
        # Adobe CMYK/YCCK is an 8-bit convention; the 128-centered
        # transforms below must not silently mis-center wider samples
        raise NotImplementedError(f"JPEG: {prec}-bit 4-component frame")
    c_, m_, ye, k_ = out_planes
    if adobe == 2:
        # YCCK: Photoshop applies RGB→YCbCr to the INVERTED C/M/Y
        # planes, so the BT.601 inverse recovers them in the same
        # inverted (brightness) domain the Adobe-CMYK case stores
        y0, cb, cr = c_, m_, ye
        c_ = y0 + 1.402 * (cr - 128.0)
        m_ = y0 - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        ye = y0 + 1.772 * (cb - 128.0)
    if adobe is None:
        # plain CMYK ink values → invert into the brightness domain
        c_, m_, ye, k_ = 255.0 - c_, 255.0 - m_, 255.0 - ye, 255.0 - k_
    cl = lambda a: np.clip(a, 0.0, 255.0)  # noqa: E731  pre-product clamp
    c_, m_, ye, k_ = cl(c_), cl(m_), cl(ye), cl(k_)
    # composite against the K plate: ch = (255−ink_ch)·(255−ink_K)/255,
    # and in the inverted domain (255−ink) is the stored value itself
    return np.dstack(
        [clip(c_ * k_ / 255.0), clip(m_ * k_ / 255.0), clip(ye * k_ / 255.0)]
    )


# --- progressive (SOF2) ------------------------------------------------
#
# A progressive frame spreads each block's 64 coefficients over many
# scans (spectral selection Ss..Se × successive approximation Ah/Al,
# T.81 Annex G). Scans accumulate QUANTIZED coefficients into a
# per-component store; dequant + IDCT happen once at EOI. DC scans may
# interleave components (MCU order); AC scans are single-component in
# block-raster order over that component's own grid.


def _next_marker(data: bytes, pos: int) -> int:
    """Skip entropy-coded bytes: stop at the next real marker (0xFF
    followed by anything but 0x00 stuffing, RSTn, or 0xFF fill).
    Jumps between 0xFF sightings with bytes.find (C-level scan)
    instead of walking every entropy byte in Python — same stopping
    byte, same return value, including the return-n end cases."""
    n = len(data)
    while pos + 1 < n:
        ff = data.find(b"\xff", pos, n - 1)
        if ff < 0:
            return n
        pos = ff
        nxt = data[pos + 1]
        if nxt == 0xFF:
            pos += 1  # fill byte
            continue
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return pos
        pos += 2


def _alloc_coef_store(frame: dict) -> dict[int, np.ndarray]:
    """Per-component (blocks_y, blocks_x, 64) int32 in ZIGZAG order,
    MCU-padded so interleaved DC scans cover the full grid."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in comps
    }


def _comp_blocks(frame: dict, c: dict) -> tuple[int, int]:
    """Non-interleaved block-grid dims for one component (T.81 A.2.2:
    ceil of the sampling-scaled pixel dims over 8)."""
    comps = frame["comps"]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    pw = -(-frame["w"] * c["h"] // hmax)
    ph = -(-frame["h"] * c["v"] // vmax)
    return -(-ph // 8), -(-pw // 8)


def _dc_prog(r: _BitReader, blk: np.ndarray, htab, ah: int, al: int, pred: dict, cid: int) -> None:
    if ah == 0:  # first DC scan: diff-coded point-transformed DC
        t = _huff_decode(r, htab)
        diff = _extend(r.bits(t), t) if t else 0
        pred[cid] += diff
        blk[0] = pred[cid] << al
    elif r.bit():  # refinement: one bit, OR into position Al
        blk[0] |= 1 << al


def _ac_first(r: _BitReader, blk: np.ndarray, htab, ss: int, se: int, al: int, eobrun: int) -> int:
    """First AC scan for one block (T.81 G.1.2.2): run-length coded
    point-transformed coefficients with EOBn block-run codes."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, htab)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1  # EOBn: this block + (2^r - 1 + ext) more
            if run:
                eobrun += r.bits(run)
            break
        k += run
        if k > se:
            raise NotImplementedError("JPEG: AC index past Se")
        blk[k] = _extend(r.bits(s), s) << al
        k += 1
    return eobrun


def _refine_nonzero(r: _BitReader, blk: np.ndarray, k: int, p1: int, m1: int) -> None:
    """Apply one correction bit to an already-nonzero coefficient."""
    if r.bit() and (blk[k] & p1) == 0:
        blk[k] += p1 if blk[k] >= 0 else m1


def _ac_refine(r: _BitReader, blk: np.ndarray, htab, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC refinement scan for one block (T.81 G.1.2.3): each symbol
    either appends a new ±2^Al coefficient or extends the zero run,
    while every already-nonzero coefficient passed on the way emits a
    correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, htab)
            run, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise NotImplementedError("JPEG: AC-refine magnitude != 1")
                val = p1 if r.bit() else m1
            elif run != 15:  # EOBn
                eobrun = 1 << run
                if run:
                    eobrun += r.bits(run)
                break
            # advance over `run` zero-history slots, correcting nonzeros
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(r, blk, k, p1, m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    raise NotImplementedError("JPEG: AC-refine index past Se")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of this block's band
            if blk[k] != 0:
                _refine_nonzero(r, blk, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(data, pos, frame, scan, htables, restart_interval,
                      ss, se, ah, al, store) -> None:
    comps = frame["comps"]
    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    # differential frames: DC coded directly (PRED = 0) — zeroing the
    # predictor after every block makes _dc_prog store the raw value
    diff_frame = bool(frame.get("differential"))
    eobrun = 0
    unit = 0  # restart counting: MCUs (interleaved) or blocks

    def maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            r.restart()
            pred = {c["id"]: 0 for c in comps}
            eobrun = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise NotImplementedError("JPEG: DC scan with Se != 0")
        if len(scan) > 1:  # interleaved, MCU order
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-frame["w"] // (8 * hmax))
            mcus_y = -(-frame["h"] // (8 * vmax))
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for comp, td, _ta in scan:
                        cid = comp["id"]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                blk = store[cid][my * comp["v"] + by, mx * comp["h"] + bx]
                                _dc_prog(r, blk, htables.get((0, td)), ah, al, pred, cid)
                                if diff_frame:
                                    pred[cid] = 0
                    unit += 1
        else:
            comp, td, _ta = scan[0]
            bh, bw = _comp_blocks(frame, comp)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    _dc_prog(r, store[comp["id"]][by, bx], htables.get((0, td)),
                             ah, al, pred, comp["id"])
                    if diff_frame:
                        pred[comp["id"]] = 0
                    unit += 1
        return

    # AC scan: always single-component, block-raster over its own grid
    if len(scan) != 1:
        raise NotImplementedError("JPEG: interleaved AC scan")
    comp, _td, ta = scan[0]
    htab = htables[(1, ta)]
    arr = store[comp["id"]]
    bh, bw = _comp_blocks(frame, comp)
    dec = _ac_first if ah == 0 else _ac_refine
    for by in range(bh):
        for bx in range(bw):
            maybe_restart()
            eobrun = dec(r, arr[by, bx], htab, ss, se, al, eobrun)
            unit += 1


def _progressive_planes(frame, qtables, store) -> dict:
    """Dequantize the accumulated coefficient store, batch-IDCT every
    block (one einsum pair per component) → per-component sample
    planes (level-shifted unless the frame is differential)."""
    shift = 0.0 if frame.get("differential") else float(
        1 << (frame["prec"] - 1)
    )
    planes = {}
    for c in frame["comps"]:
        # prefer the table frozen at the component's first scan; the
        # live dict is only a fallback for components that never
        # appeared in a scan (their coefficients are all zero anyway)
        q = c.get("qsnap")
        if q is None:
            q = qtables[c["tq"]]
        q = q.astype(np.int64)
        zz = store[c["id"]].astype(np.int64) * q  # zigzag order
        bh, bw = zz.shape[:2]
        coef = np.zeros((bh, bw, 64), np.float64)
        coef[..., ZIGZAG] = zz
        # batched matmul pair, (Aᵀ @ C) @ A, instead of the previous
        # three-operand un-optimized einsum: einsum without a
        # contraction path evaluates the O(8⁴)-per-block nested loop
        # and was the single hottest line of baseline-JPEG decode
        # (measured 2.4 ms → 0.12 ms per plane batch, guide §1.2).
        # Per-term product association is unchanged ((Aᵀ·c)·A), only
        # the float64 ADDITION grouping of the double contraction
        # differs — within this stage's documented tolerance contract
        # (module docstring: IDCT is the one non-integer-exact stage,
        # error-bounded by tests, no hash-gated query consumes DCT
        # output), and verified to leave every uint8 pixel of the
        # 20k-item bench corpus byte-identical.
        blocks = (_A.T @ coef.reshape(bh, bw, 8, 8)) @ _A + shift
        planes[c["id"]] = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return planes


def _progressive_reconstruct(frame, qtables, store) -> np.ndarray:
    return _assemble(_progressive_planes(frame, qtables, store), frame)
