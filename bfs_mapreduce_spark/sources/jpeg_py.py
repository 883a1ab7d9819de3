"""Pure-Python JPEG encoder/decoder from the public specification
(ITU-T T.81 / ISO 10918-1, with the JFIF APP0 convention and BT.601
color math) — the same from-spec approach as the PNG
(``sources/png_py.py``) and Avro (``sources/avro_py.py``) codecs,
built because PIL/cv2/ffmpeg are absent from this environment while
everything JPEG actually needs (8x8 DCT, canonical Huffman coding,
byte stuffing) is numpy + stdlib.

Supported subset, with honest boundaries:

- baseline sequential DCT (SOF0/SOF1), 8-bit samples, 1-4 components,
  sampling factors 1-2 in each axis (covers 4:4:4, 4:2:2, 4:2:0),
  including non-interleaved multi-scan sequential files;
- PROGRESSIVE DCT (SOF2, round 10 — most real web JPEGs): spectral
  selection and successive approximation on both encode and decode
  (DC first/refinement, AC first/refinement with EOB-run batching and
  buffered correction bits, spec G.1.2); the encoder emits the
  conventional 10-scan script and flat-but-valid Huffman tables, the
  decoder accepts any conformant scan script;
- restart intervals (DRI + RSTn markers) on both encode and decode,
  with DC-predictor/EOB-run reset and marker-order verification;
- byte stuffing (0xFF 0x00) per spec F.1.2.3; entropy data is
  unstuffed/segmented BEFORE bit-reading so restart alignment is
  structural, not incidental;
- Huffman tables are carried in the file (DHT) and rebuilt canonically
  from BITS/HUFFVAL per Annex C on decode — decode never assumes the
  tables the encoder writes, so encode->decode certifies the table
  plumbing end to end;
- arithmetic coding (SOF9+), hierarchical, 12-bit precision, and DNL
  raise ``NotImplementedError`` naming the construct; malformed
  streams (bad marker order, truncated entropy data, undefined table
  ids, non-conformant scan headers) raise ``ValueError`` — never
  silently wrong pixels.

Exactness contract used by q_multimodal_features: baseline JPEG is
lossy in general, but an image whose every 8x8 block is CONSTANT has
all AC coefficients equal to zero and DC = 8*(v-128) (orthonormal
FDCT), so with a luma DC quant step that divides 8 the round trip is
bit-exact — through real MCU interleaving, chroma subsampling
(constant chroma averages to itself), DC prediction, restart markers,
and Huffman/stuffing. That is what lets a SQL oracle reconstruct the
DECODED plane of a staged JPEG exactly; general images are certified
separately by error-bound tests (tests/test_multimodal.py).

Scale posture: a per-blob codec that runs inside Arrow-batched
``mapInPandas`` stages (multimodal_queries.py) — blobs are decoded
where they are read and never shuffled. DCT/dequant/upsample are
vectorized numpy over all blocks of a component at once; the entropy
loop is per-symbol Python, negligible at the synthetic corpus size,
and this module is the swap point for a native decoder at real image
volumes, plans unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Zigzag scan order (spec Figure A.6): _ZIGZAG[i] = natural (row-major)
# index of the i-th coefficient in scan order.
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1/K.2 example quantization tables (natural order).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 typical Huffman tables as (BITS[1..16], HUFFVAL). The
# decoder never relies on these — it rebuilds whatever DHT carries.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# Orthonormal 8-point DCT-II matrix: coef = _C @ (block-128) @ _C.T,
# block = _C.T @ coef @ _C + 128 — one matmul pair handles ALL blocks
# of a component at once (numpy broadcasting over the leading axis).
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code generation: symbol -> (code, length)."""
    if sum(bits) != len(huffval):
        raise ValueError("DHT BITS/HUFFVAL mismatch")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _HuffTable(dict):
    """``(length, code) -> symbol`` map that also carries a lazily
    built 16-bit prefix LUT for the fast decode path (see
    ``_BitReader.read_symbol``). Plain dicts still decode through the
    bit-at-a-time reference path, so tests can feed raw tables."""

    __slots__ = ("lut",)

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.lut: list[int] | None = None


def _build_lut(table: dict[tuple[int, int], int]) -> list[int]:
    """16-bit prefix LUT: entry = ``(symbol << 5) | code_length`` for
    every 16-bit window whose prefix is that code, 0 for windows no
    code of any length matches (a symbol of value 0 still packs to a
    nonzero entry via its length bits). One list of 65536 small ints
    per table, built on first use — Huffman decode becomes one table
    index instead of up to 16 Python-level bit reads."""
    lut = [0] * 65536
    for (ln, code), sym in table.items():
        lo = code << (16 - ln)
        span = 1 << (16 - ln)
        lut[lo : lo + span] = [(sym << 5) | ln] * span
    return lut


_LUT_CACHE: dict[tuple, list[int]] = {}


def _decode_table(bits: list[int], huffval: list[int]) -> "_HuffTable":
    """(length, code) -> symbol, for the entropy decoder (LUT-ready).

    The prefix LUT is cached across images keyed on the (bits,
    huffval) definition: a video stream re-declares the SAME Annex-K
    tables in every frame, and rebuilding 65536 entries per tiny
    frame measured 9x slower than the bit-at-a-time path it replaced
    — with the cache the build is paid once per distinct table."""
    t = _HuffTable(
        {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, huffval).items()}
    )
    key = (tuple(bits), tuple(huffval))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        if len(_LUT_CACHE) >= 64:  # bound: distinct tables per process
            _LUT_CACHE.clear()
        lut = _LUT_CACHE[key] = _build_lut(t)
    t.lut = lut
    return t


def _magnitude_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------- color math (JFIF / BT.601)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)


# ---------------------------------------------------------------- encoder

# Flat Huffman tables for the PROGRESSIVE encoder: progressive AC
# scans emit EOBn symbols ((r<<4)|0 for r<15) that Annex K's example
# tables don't define, and real encoders build optimized tables in a
# gather pass. Correctness needs only a complete prefix-free code, so
# every DC category gets a 4-bit code and every possible AC symbol
# (16 runs x magnitudes 0..10) an 8-bit code — suboptimal size,
# trivially valid (the all-ones code stays reserved in both).
_FLAT_DC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-bits per spec


def _encode_coef_block(
    w: _BitWriter, coefs: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Huffman-encode one quantized coefficient block (zigzag order in);
    returns the new DC predictor."""
    dc = int(coefs[0])
    diff = dc - pred
    cat = _magnitude_category(diff)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat = _magnitude_category(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])), mode="edge")


# ------------------------------------------- progressive scan emitters (G.1.2)


def _flush_eobrun(w: _BitWriter, ac_codes: dict, st: list) -> None:
    """Emit the pending EOBn run plus the correction bits buffered
    against it (st = [eobrun, buffered_bits])."""
    if st[0] > 0:
        r = st[0].bit_length() - 1
        code, ln = ac_codes[r << 4]
        w.write(code, ln)
        if r:
            w.write(st[0] - (1 << r), r)
        for b in st[1]:
            w.write(b, 1)
        st[0], st[1] = 0, []


def _emit_dc_first(w: _BitWriter, dc_codes: dict, blk, pred: int, al: int) -> int:
    """DC first scan (G.1.2.1): diff-code the point-transformed DC
    (arithmetic shift right by Al); returns the new predictor."""
    v = int(blk[0]) >> al
    diff = v - pred
    cat = _magnitude_category(diff)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    return v


def _emit_ac_first(
    w: _BitWriter, ac_codes: dict, blk, ss: int, se: int, al: int, st: list
) -> None:
    """AC first scan over band [ss, se]: baseline run/size coding of
    the point-transformed magnitudes, with EOB runs (EOBn) batched
    across blocks in ``st``."""
    run = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            run += 1
            continue
        _flush_eobrun(w, ac_codes, st)
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        s = t.bit_length()
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(t if v >= 0 else t ^ ((1 << s) - 1), s)
        run = 0
    if run:
        st[0] += 1
        if st[0] == 0x7FFF:
            _flush_eobrun(w, ac_codes, st)


def _emit_ac_refine(
    w: _BitWriter, ac_codes: dict, blk, ss: int, se: int, al: int, st: list
) -> None:
    """AC successive-approximation refinement (G.1.2.3): newly-visible
    coefficients (magnitude>>Al == 1) are coded as run/1 + sign;
    already-nonzero coefficients contribute one correction bit each,
    buffered and emitted after the next symbol (or attached to the
    EOB run in ``st`` when the block ends early)."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eobpos = ss - 1  # position of the LAST newly-visible coefficient
    for idx, t in enumerate(absv):
        if t == 1:
            eobpos = ss + idx
    run = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eobpos:
            _flush_eobrun(w, ac_codes, st)
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:  # history coefficient: one correction bit
            br.append(t & 1)
            continue
        _flush_eobrun(w, ac_codes, st)
        code, ln = ac_codes[(run << 4) | 1]
        w.write(code, ln)
        w.write(0 if int(blk[k]) < 0 else 1, 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st[0] += 1
        st[1].extend(br)
        if st[0] == 0x7FFF or len(st[1]) > 900:
            _flush_eobrun(w, ac_codes, st)


def _default_prog_scans(ncomp: int) -> list[tuple]:
    """The conventional progressive scan script (the same shape
    libjpeg's default uses): coarse DC for all components first, low
    AC bands next, then successive-approximation refinements down to
    full precision. Entries are (component indexes, Ss, Se, Ah, Al)."""
    if ncomp == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        (tuple(range(ncomp)), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((2,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        (tuple(range(ncomp)), 0, 0, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsample: str = "444",
    quant_luma: np.ndarray = QUANT_LUMA,
    quant_chroma: np.ndarray = QUANT_CHROMA,
    restart_interval: int = 0,
    progressive: bool = False,
    scans: list[tuple] | None = None,
) -> bytes:
    """Encode interleaved RGB (channels=3) or grayscale (channels=1)
    pixels as a JFIF file. ``subsample`` is '444' (no chroma
    subsampling), '422' (horizontal 2x1 chroma average) or '420'
    (2x2 chroma average). ``progressive=True`` emits SOF2 with the
    conventional spectral-selection + successive-approximation scan
    script (override with ``scans`` = [(comp_indexes, Ss, Se, Ah,
    Al), ...]); the quantized coefficients are identical to the
    sequential path, only the entropy layer differs."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * channels}"
        )
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    arr = arr.astype(np.float64)
    if channels == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if subsample == "420":
            hv = [(2, 2), (1, 1), (1, 1)]
            for ci in (1, 2):
                p = planes[ci]
                ph = p.shape[0] + (p.shape[0] & 1)
                pw = p.shape[1] + (p.shape[1] & 1)
                p = _pad_to(p, ph, pw)
                planes[ci] = np.round(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4
                )
        elif subsample == "422":  # horizontal-only chroma averaging
            hv = [(2, 1), (1, 1), (1, 1)]
            for ci in (1, 2):
                p = planes[ci]
                p = _pad_to(p, p.shape[0], p.shape[1] + (p.shape[1] & 1))
                planes[ci] = np.round((p[:, 0::2] + p[:, 1::2]) / 2)
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
        quants = [0, 1, 1]
        huffs = [0, 1, 1]
    else:
        planes = [arr[..., 0]]
        hv = [(1, 1)]
        quants = [0]
        huffs = [0]
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    qtabs = [quant_luma, quant_chroma][: max(quants) + 1]

    # Per-component: pad to the MCU grid, FDCT + quantize every block at
    # once (vectorized), then pull blocks in MCU order for the scan.
    comp_blocks = []  # [component] -> (blocks_y, blocks_x, 64 zigzagged ints)
    for ci, (chi, cvi) in enumerate(hv):
        bw, bh = mcus_x * chi, mcus_y * cvi  # blocks across / down
        p = _pad_to(planes[ci], bh * 8, bw * 8) - 128.0
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)  # (bh,bw,8,8)
        coefs = _C @ blocks @ _C.T
        q = np.round(coefs / qtabs[quants[ci]]).astype(np.int64)
        # Standard AC tables stop at magnitude category 10; baseline
        # coefficients can mathematically reach +-1024 on adversarial
        # input with unit quant steps — clamp (real encoders do too).
        q[..., 1:, :] = np.clip(q[..., 1:, :], -1023, 1023)
        q[..., :, 1:] = np.clip(q[..., :, 1:], -1023, 1023)
        comp_blocks.append(q.reshape(bh, bw, 64)[:, :, _ZIGZAG])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, qt in enumerate(qtabs):
        out += seg(0xDB, bytes([qi]) + bytes(int(v) for v in qt.reshape(64)[_ZIGZAG]))
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (chi, cvi) in enumerate(hv):
        sof += bytes([ci + 1, (chi << 4) | cvi, quants[ci]])
    out += seg(0xC2 if progressive else 0xC0, bytes(sof))

    if progressive:
        dc_codes = _canonical_codes(*_FLAT_DC)
        ac_codes = _canonical_codes(*_FLAT_AC)
        out += seg(0xC4, bytes([0x00]) + bytes(_FLAT_DC[0]) + bytes(_FLAT_DC[1]))
        out += seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC[0]) + bytes(_FLAT_AC[1]))
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        for comp_idxs, ss, se, ah, al in scans or _default_prog_scans(len(planes)):
            sos = bytearray([len(comp_idxs)])
            for ci in comp_idxs:
                sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
            sos += bytes([ss, se, (ah << 4) | al])
            out += seg(0xDA, bytes(sos))
            w = _BitWriter()
            st = [0, []]  # [eobrun, buffered correction bits]
            preds = {ci: 0 for ci in comp_idxs}
            # Scan units: MCUs when interleaved (DC scans may name
            # several components), single blocks in raster order over
            # the component's own ceil(dims/8) grid when Ns == 1
            # (A.2.2) — restart intervals count these same units.
            if len(comp_idxs) > 1:
                units = [
                    [
                        (ci, my * hv[ci][1] + by, mx * hv[ci][0] + bx)
                        for ci in comp_idxs
                        for by in range(hv[ci][1])
                        for bx in range(hv[ci][0])
                    ]
                    for my in range(mcus_y)
                    for mx in range(mcus_x)
                ]
            else:
                ci = comp_idxs[0]
                comp_w = -(-width * hv[ci][0] // hmax)
                comp_h = -(-height * hv[ci][1] // vmax)
                cbw, cbh = -(-comp_w // 8), -(-comp_h // 8)
                units = [
                    [(ci, by, bx)] for by in range(cbh) for bx in range(cbw)
                ]
            rst = 0
            since_restart = 0
            for unit in units:
                if restart_interval and since_restart == restart_interval:
                    _flush_eobrun(w, ac_codes, st)
                    w.pad_to_byte()
                    w.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = {ci: 0 for ci in comp_idxs}
                    since_restart = 0
                for ci, by, bx in unit:
                    blk = comp_blocks[ci][by, bx]
                    if ss == 0 and ah == 0:
                        preds[ci] = _emit_dc_first(w, dc_codes, blk, preds[ci], al)
                    elif ss == 0:
                        w.write((int(blk[0]) >> al) & 1, 1)  # DC refinement
                    elif ah == 0:
                        _emit_ac_first(w, ac_codes, blk, ss, se, al, st)
                    else:
                        _emit_ac_refine(w, ac_codes, blk, ss, se, al, st)
                since_restart += 1
            _flush_eobrun(w, ac_codes, st)
            w.pad_to_byte()
            out += w.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    dc_tabs = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    w = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                w.pad_to_byte()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
                since_restart = 0
            for ci, (chi, cvi) in enumerate(hv):
                for by in range(cvi):
                    for bx in range(chi):
                        preds[ci] = _encode_coef_block(
                            w,
                            comp_blocks[ci][my * cvi + by, mx * chi + bx],
                            preds[ci],
                            dc_tabs[huffs[ci]],
                            ac_tabs[huffs[ci]],
                        )
            since_restart += 1
    w.pad_to_byte()

    for cls, tabs in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
        for ti in range(max(huffs) + 1):
            bits, vals = tabs[ti]
            out += seg(0xC4, bytes([(cls << 4) | ti]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (huffs[ci] << 4) | huffs[ci]])
    sos += bytes([0, 63, 0])  # spectral selection / approximation (baseline)
    out += seg(0xDA, bytes(sos))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Reads bits from one UNSTUFFED restart segment.

    Round-11 hot-loop rework (the round-10 verdict's codec-throughput
    ask): the original reader cost one Python call PER BIT, and
    Huffman decode probed a dict up to 16 times per symbol — the
    measured bottleneck of every entropy-coded parity line. This
    version keeps a bit cursor over the zero-padded byte string and
    assembles a 4-byte big-endian window with C-speed ``bytes``
    indexing, so ``read_bits(n<=16)`` is ~6 int ops and
    ``read_symbol`` is one window peek + one LUT index (prefix LUT
    per table, built lazily). A numpy ``unpackbits`` variant was
    measured and REJECTED: per-element access on numpy arrays boxes
    scalars and ran slower than bytes indexing for this access
    pattern (BASELINE.md, bench-media). Semantics are bit-identical,
    including truncation errors mid-symbol."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self._d = bytes(data) + b"\x00\x00\x00"
        self.nbits = len(data) * 8
        self.i = 0  # bit cursor

    def read_bit(self) -> int:
        i = self.i
        if i >= self.nbits:
            raise ValueError("truncated entropy-coded data")
        self.i = i + 1
        return (self._d[i >> 3] >> (7 - (i & 7))) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        i = self.i
        if i + n > self.nbits:
            raise ValueError("truncated entropy-coded data")
        p, sh = i >> 3, i & 7
        d = self._d
        chunk = (d[p] << 24) | (d[p + 1] << 16) | (d[p + 2] << 8) | d[p + 3]
        self.i = i + n
        return (chunk >> (32 - sh - n)) & ((1 << n) - 1)

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        lut = getattr(table, "lut", None)
        if lut is None:
            if isinstance(table, _HuffTable):
                lut = table.lut = _build_lut(table)
            else:  # plain dict: bit-at-a-time reference path
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | self.read_bit()
                    sym = table.get((length, code))
                    if sym is not None:
                        return sym
                raise ValueError("invalid Huffman code in entropy-coded data")
        i = self.i
        p, sh = i >> 3, i & 7
        d = self._d
        chunk = (d[p] << 24) | (d[p + 1] << 16) | (d[p + 2] << 8) | d[p + 3]
        packed = lut[(chunk >> (16 - sh)) & 0xFFFF]
        if packed == 0:
            raise ValueError("invalid Huffman code in entropy-coded data")
        ln = packed & 31
        if i + ln > self.nbits:
            raise ValueError("truncated entropy-coded data")
        self.i = i + ln
        return packed >> 5


def _extend(v: int, cat: int) -> int:
    """Table F.2 EXTEND: map ``cat`` magnitude bits to a signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[tuple[int | None, bytes]], int]:
    """Unstuff the entropy-coded segment starting at ``start``; returns
    ([(restart marker number or None for the first segment, bytes)],
    position of the terminating marker's 0xFF)."""
    segments: list[tuple[int | None, bytes]] = []
    cur = bytearray()
    marker: int | None = None
    i = start
    while True:
        if i >= len(data):
            raise ValueError("entropy-coded data ran off the end (no EOI)")
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= len(data):
            raise ValueError("dangling 0xFF at end of stream")
        nxt = data[i + 1]
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append((marker, bytes(cur)))
            marker = nxt - 0xD0
            cur = bytearray()
            i += 2
        else:
            segments.append((marker, bytes(cur)))
            return segments, i


def _decode_block_sequential(reader: _BitReader, blk, pred: int, dct, act) -> int:
    """Baseline-sequential block decode (DC diff + run/size AC);
    returns the new DC predictor."""
    cat = reader.read_symbol(dct)
    pred += _extend(reader.read_bits(cat), cat)
    blk[0] = pred
    k = 1
    while k < 64:
        sym = reader.read_symbol(act)
        if sym == 0x00:  # EOB
            break
        run, cat = sym >> 4, sym & 0xF
        if cat == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.read_bits(cat), cat)
        k += 1
    return pred


def _decode_ac_first(
    reader: _BitReader, blk, act, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC first scan for one block (G.1.2.2); returns the
    remaining EOB run (whole following blocks to skip)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.read_symbol(act)
        run, cat = sym >> 4, sym & 0xF
        if cat == 0:
            if run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += reader.read_bits(run)
                return eobrun - 1  # this block consumed one
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC run past end of band")
        blk[k] = _extend(reader.read_bits(cat), cat) << al
        k += 1
    return 0


def _refine_nonzero(reader: _BitReader, blk, k: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient."""
    if reader.read_bit() and (int(blk[k]) & p1) == 0:
        blk[k] += p1 if blk[k] >= 0 else -p1


def _decode_ac_refine(
    reader: _BitReader, blk, act, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC refinement for one block (G.1.2.3); returns the
    remaining EOB run. Correction bits are read for every already-
    nonzero coefficient passed over, including inside EOB runs."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.read_symbol(act)
            run, cat = sym >> 4, sym & 0xF
            val = 0
            if cat:
                if cat != 1:
                    raise ValueError("AC refinement magnitude != 1")
                val = p1 if reader.read_bit() else -p1
            elif run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += reader.read_bits(run)
                break
            while k <= se:  # skip `run` zero-history coefs, correcting
                if blk[k] != 0:
                    _refine_nonzero(reader, blk, k, p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(reader, blk, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential (SOF0/SOF1) or progressive (SOF2,
    spectral selection + successive approximation) JPEG; returns
    (width, height, channels, interleaved pixel bytes) — RGB for
    3-component YCbCr files, raw samples for 1-component grayscale.
    Sequential non-interleaved multi-scan files decode through the
    same per-scan walk progressive uses."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None  # (height, width, [(comp_id, h, v, tq)], progressive)
    coef: list[np.ndarray] = []  # per component, (blocks_y, blocks_x, 64) zigzag
    restart_interval = 0
    n_scans = 0
    i = 2
    while True:
        if i + 2 > len(blob):
            raise ValueError("truncated JPEG (no EOI)")
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        if i + 4 > len(blob):
            raise ValueError("truncated JPEG before SOS")
        (seglen,) = struct.unpack(">H", blob[i + 2 : i + 4])
        payload = blob[i + 4 : i + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated marker segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                vals = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                if len(vals) != 64:
                    raise ValueError("short DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = vals
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if frame is not None:
                raise ValueError("multiple SOF markers")
            if payload[0] != 8:
                raise NotImplementedError(f"{payload[0]}-bit precision")
            h, w = struct.unpack(">HH", payload[1:5])
            if h == 0:
                raise NotImplementedError("DNL-deferred image height")
            ncomp = payload[5]
            comps = []
            for c in range(ncomp):
                cid, hvb, tq = payload[6 + 3 * c : 9 + 3 * c]
                ch, cv = hvb >> 4, hvb & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(f"sampling factors {ch}x{cv}")
                comps.append((cid, ch, cv, tq))
            if ncomp == 1:
                # T.81 A.2.2: a one-component scan is NON-interleaved —
                # 8x8 raster tiling over ceil(w/8) x ceil(h/8); the
                # declared sampling factors (a foreign grayscale
                # encoder may write 2x2) do not tile the scan.
                # Normalizing to 1x1 makes every walk below degenerate
                # to exactly that geometry.
                cid0, _ch0, _cv0, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            coef = [
                np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
                for _cid, ch, cv, _tq in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF marker 0x{marker:02X} (non-baseline)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for c in range(ns):
                cs, tabs = payload[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tabs >> 4, tabs & 0xF))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0xF
            i = _decode_scan(
                blob, i + 2 + seglen, frame, coef, qtabs, htabs,
                scan, ss, se, ah, al, restart_interval,
            )
            n_scans += 1
            continue  # _decode_scan returned the next marker's offset
        # APPn / COM / anything else with a length: skipped
        i += 2 + seglen

    if frame is None or n_scans == 0:
        raise ValueError("EOI before any scan")
    height, width, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # Dequant + IDCT, all blocks of a component at once.
    planes = []
    for ci, (_cid, ch, cv, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"undefined quant table {tq}")
        bh, bw = mcus_y * cv, mcus_x * ch
        nat = coef[ci][:, :, _UNZIGZAG].reshape(bh, bw, 8, 8).astype(np.float64)
        nat *= qtabs[tq].astype(np.float64)
        blocks = _C.T @ nat @ _C + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # Upsample by replication to the luma grid, then crop.
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    if len(planes) == 3:
        ycc = np.stack(planes, axis=-1)
        rgb = _ycbcr_to_rgb(ycc).astype(np.uint8)
        return width, height, 3, rgb.tobytes()
    raise NotImplementedError(f"{len(planes)}-component JPEG (CMYK/unknown)")


def _decode_scan(
    blob: bytes,
    start: int,
    frame,
    coef: list[np.ndarray],
    qtabs: dict,
    htabs: dict,
    scan: list[tuple],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one scan's entropy-coded data into the per-component
    coefficient arrays; returns the offset of the next marker's 0xFF.
    Handles sequential scans (interleaved or single-component) and all
    four progressive scan kinds (DC/AC x first/refinement), with
    restart intervals counted in scan units (MCUs when interleaved,
    single blocks when Ns == 1, per A.2.2)."""
    height, width, comps, progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {cid: ci for ci, (cid, _ch, _cv, _tq) in enumerate(comps)}

    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scan with Ns > 1")
        if ss > se or se > 63:
            raise ValueError("bad spectral band")
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("sequential scan with non-baseline band")

    order = []  # (component index, dc table, ac table)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        need_dc = not progressive or ss == 0
        need_ac = not progressive or ss > 0
        if need_dc and ah == 0 and (0, td) not in htabs:
            raise ValueError("undefined Huffman table in scan")
        if need_ac and (1, ta) not in htabs:
            raise ValueError("undefined Huffman table in scan")
        order.append((by_id[cs], htabs.get((0, td)), htabs.get((1, ta))))

    # Scan units: MCUs when interleaved, raster blocks over the
    # component's own ceil(dims/8) grid when Ns == 1 (A.2.2).
    if len(scan) > 1:
        units = [
            [
                (oi, my * comps[ci][2] + by, mx * comps[ci][1] + bx)
                for oi, (ci, _d, _a) in enumerate(order)
                for by in range(comps[ci][2])
                for bx in range(comps[ci][1])
            ]
            for my in range(mcus_y)
            for mx in range(mcus_x)
        ]
    else:
        ci = order[0][0]
        comp_w = -(-width * comps[ci][1] // hmax)
        comp_h = -(-height * comps[ci][2] // vmax)
        units = [
            [(0, by, bx)]
            for by in range(-(-comp_h // 8))
            for bx in range(-(-comp_w // 8))
        ]

    segments, end = _split_entropy(blob, start)
    seg_idx = 0
    reader = _BitReader(segments[0][1])
    expected_rst = 0
    preds = [0] * len(order)
    eobrun = 0
    since_restart = 0
    for unit in units:
        if restart_interval and since_restart == restart_interval:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart marker")
            mk, data = segments[seg_idx]
            if mk != expected_rst:
                raise ValueError(f"restart marker out of order: RST{mk}")
            expected_rst = (expected_rst + 1) % 8
            reader = _BitReader(data)
            preds = [0] * len(order)
            eobrun = 0
            since_restart = 0
        for oi, by, bx in unit:
            ci, dct, act = order[oi]
            blk = coef[ci][by, bx]
            if not progressive:
                preds[oi] = _decode_block_sequential(reader, blk, preds[oi], dct, act)
            elif ss == 0 and ah == 0:  # DC first
                cat = reader.read_symbol(dct)
                preds[oi] += _extend(reader.read_bits(cat), cat)
                blk[0] = preds[oi] << al
            elif ss == 0:  # DC refinement: one bit per block
                if reader.read_bit():
                    blk[0] |= 1 << al
            elif ah == 0:  # AC first
                eobrun = _decode_ac_first(reader, blk, act, ss, se, al, eobrun)
            else:  # AC refinement
                eobrun = _decode_ac_refine(reader, blk, act, ss, se, al, eobrun)
        since_restart += 1
    return end
