"""Pure-Python baseline-sequential JPEG encoder/decoder from the
public specification (ITU-T T.81 / ISO 10918-1, with the JFIF APP0
convention and BT.601 color math) — the same from-spec approach as the
PNG (``sources/png_py.py``) and Avro (``sources/avro_py.py``) codecs,
built because PIL/cv2/ffmpeg are absent from this environment while
everything baseline JPEG actually needs (8x8 DCT, canonical Huffman
coding, byte stuffing) is numpy + stdlib.

Supported subset, with honest boundaries:

- baseline sequential DCT (SOF0), 8-bit samples, 1-4 components,
  sampling factors 1-2 in each axis (covers 4:4:4, 4:2:2, 4:2:0);
- restart intervals (DRI + RSTn markers) on both encode and decode,
  with DC-predictor reset and marker-order verification;
- byte stuffing (0xFF 0x00) per spec F.1.2.3; entropy data is
  unstuffed/segmented BEFORE bit-reading so restart alignment is
  structural, not incidental;
- Huffman tables are carried in the file (DHT) and rebuilt canonically
  from BITS/HUFFVAL per Annex C on decode — decode never assumes the
  Annex K defaults the encoder writes, so encode->decode certifies the
  table plumbing end to end;
- progressive (SOF2), arithmetic coding (SOF9+), hierarchical, 12-bit
  precision, and DNL raise ``NotImplementedError`` naming the
  construct; malformed streams (bad marker order, truncated entropy
  data, undefined table ids) raise ``ValueError`` — never silently
  wrong pixels.

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


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, huffval).items()}


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
) -> bytes:
    """Encode interleaved RGB (channels=3) or grayscale (channels=1)
    pixels as a baseline-sequential JFIF file. ``subsample`` is '444'
    (no chroma subsampling), '422' (horizontal 2x1 chroma average) or
    '420' (2x2 chroma average)."""
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

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, qt in enumerate(qtabs):
        out += seg(0xDB, bytes([qi]) + bytes(int(v) for v in qt.reshape(64)[_ZIGZAG]))
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (chi, cvi) in enumerate(hv):
        sof += bytes([ci + 1, (chi << 4) | cvi, quants[ci]])
    out += seg(0xC0, bytes(sof))
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
    """Reads bits from one UNSTUFFED restart segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy-coded data")


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


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG; returns (width, height,
    channels, interleaved pixel bytes) — RGB for 3-component YCbCr
    files, raw samples for 1-component grayscale."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None  # (height, width, [(comp_id, h, v, tq)])
    restart_interval = 0
    i = 2
    scan = None
    while scan is None:
        if i + 4 > len(blob):
            raise ValueError("truncated JPEG before SOS")
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = blob[i + 1]
        if marker == 0xD9:
            raise ValueError("EOI before any scan")
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
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq.
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
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
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
        # APPn / COM / anything else with a length: skipped
        i += 2 + seglen

    height, width, comps = frame
    if len(comps) == 1:
        # T.81 A.2.2: a one-component scan is NON-interleaved — the MCU
        # is a single 8x8 block over ceil(w/8) x ceil(h/8) in raster
        # order, and the frame's declared sampling factors (a foreign
        # grayscale encoder may write 2x2) do not tile the scan.
        # Normalizing to 1x1 here makes the interleaved walk below
        # degenerate to exactly that geometry.
        cid0, _ch0, _cv0, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) baseline")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    order = []  # per scan component: (plane index, h, v, tq, dc table, ac table)
    for idx, (cs, td, ta) in enumerate(scan):
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        ch, cv, tq = by_id[cs]
        if tq not in qtabs:
            raise ValueError(f"undefined quant table {tq}")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("undefined Huffman table in scan")
        order.append((idx, ch, cv, tq, htabs[(0, td)], htabs[(1, ta)]))

    coef = [
        np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
        for _, ch, cv, _, _, _ in order
    ]
    segments, end = _split_entropy(blob, i)
    seg_idx = 0
    reader = _BitReader(segments[0][1])
    expected_rst = 0
    preds = [0] * len(order)
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
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
                since_restart = 0
            for oi, (_, ch, cv, _, dct, act) in enumerate(order):
                for by in range(cv):
                    for bx in range(ch):
                        blk = coef[oi][my * cv + by, mx * ch + bx]
                        cat = reader.read_symbol(dct)
                        preds[oi] += _extend(reader.read_bits(cat), cat)
                        blk[0] = preds[oi]
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
            since_restart += 1

    # Dequant + IDCT, all blocks of a component at once.
    planes = []
    for oi, (_, ch, cv, tq, _, _) in enumerate(order):
        bh, bw = mcus_y * cv, mcus_x * ch
        nat = coef[oi][:, :, _UNZIGZAG].reshape(bh, bw, 8, 8).astype(np.float64)
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
