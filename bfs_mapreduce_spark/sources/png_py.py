"""Pure-Python PNG encoder/decoder from the public specification
(W3C PNG spec / RFC 2083) — the same from-spec approach as the Avro
container (``sources/avro_py.py``), built because PIL/cv2 are absent
from this environment while everything PNG actually needs (zlib, CRC32)
is in the stdlib.

Supported subset, with honest boundaries:

- 8-bit samples; color types 0 (grayscale), 2 (RGB), 6 (RGBA);
- non-interlaced only (Adam7 raises ``NotImplementedError``);
- all five scanline filters (None/Sub/Up/Average/Paeth, spec §9
  'Filtering') on both encode and decode;
- chunk CRCs verified on decode — a corrupt chunk is a ``ValueError``,
  never silently wrong pixels; unknown ancillary chunks are skipped
  (per spec), unknown CRITICAL chunks raise.

Scale posture: this is a per-blob codec that runs inside Arrow-batched
``mapInPandas``/``pandas_udf`` stages (multimodal_queries.py) — blobs
are decoded where they are read and never shuffled. The per-byte
filter loops are pure Python; for the synthetic 8x8 corpus they are
negligible, and on a cluster with real image volumes this module is
the swap point for a native decoder, plans unchanged.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor (spec §9.4) — nearest of left/up/up-left to the
    linear gradient p = a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ft: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ft`` to a raw scanline (encode side)."""
    if ft == 0:  # None
        return row
    out = bytearray(len(row))
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ft == 1:  # Sub
            out[x] = (row[x] - a) & 0xFF
        elif ft == 2:  # Up
            out[x] = (row[x] - b) & 0xFF
        elif ft == 3:  # Average
            out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            out[x] = (row[x] - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
    return bytes(out)


def _unfilter_row(ft: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """Reconstruct a scanline in place (decode side, spec §9)."""
    if ft == 0:
        return
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ft == 1:
            cur[x] = (cur[x] + a) & 0xFF
        elif ft == 2:
            cur[x] = (cur[x] + b) & 0xFF
        elif ft == 3:
            cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:
            cur[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_choice=None,
) -> bytes:
    """Encode raw 8-bit samples as a single-IDAT PNG.

    ``filter_choice(row_index) -> 0..4`` selects the per-scanline
    filter (default: all 0) — the tests use a rotating choice so every
    filter's encode/decode pair is exercised on real data."""
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} not supported")
    stride = width * _CHANNELS[color_type]
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel plane size {len(pixels)} != {stride}*{height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ft = int(filter_choice(r)) if filter_choice else 0
        raw.append(ft)
        raw += _filter_row(ft, row, prev, _CHANNELS[color_type])
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, reconstructed pixel bytes).

    Walks chunks with CRC verification, concatenates IDAT streams,
    inflates, and reverses the per-scanline filters."""
    if blob[:8] != PNG_SIG:
        raise ValueError(f"not a png (bad signature {blob[:8]!r})")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ValueError(f"truncated {typ!r} chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"crc mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            seen_iend = True
            break
        elif not typ[0] & 0x20:  # critical bit clear = critical chunk
            raise NotImplementedError(f"critical chunk {typ!r} not supported")
        # ancillary chunks (tEXt, tIME, ...) are skipped per spec
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit samples not supported (8 only)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} not supported")
    if comp != 0 or filt != 0:
        raise ValueError(f"bad compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != {(stride + 1) * height} "
            f"for {width}x{height}x{channels}"
        )
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        cur = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        _unfilter_row(ft, cur, prev, channels)
        out += cur
        prev = bytes(cur)
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------- APNG
# Animated PNG (the W3C PNG spec's APNG chapter, formerly the Mozilla
# APNG spec — a public format): an acTL chunk declares the frame
# count, each frame is announced by an fcTL chunk (sequence number,
# geometry, delay, dispose/blend ops) and carried by IDAT (first
# frame) or fdAT (sequence number + IDAT-style payload). Supported
# subset, honest boundaries: full-size frames only (zero x/y offset,
# dispose op 0 = none / blend op 0 = source — exactly what a frame
# SAMPLING pipeline needs); offset/composited animations raise.


def encode_apng(
    width: int,
    height: int,
    frames: list[bytes],
    color_type: int = 2,
    filter_choice=None,
    delay=(1, 10),
) -> bytes:
    """Encode full-size frames as an APNG (first frame in IDAT, rest
    in fdAT, consecutive sequence numbers, per-spec fcTL metadata)."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} not supported")
    stride = width * _CHANNELS[color_type]
    out = bytearray(PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))  # loop forever
    seq = 0
    for i, pixels in enumerate(frames):
        if len(pixels) != stride * height:
            raise ValueError(f"frame {i}: plane size {len(pixels)} != {stride * height}")
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay[0], delay[1], 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        raw = bytearray()
        prev = bytes(stride)
        for r in range(height):
            row = pixels[r * stride : (r + 1) * stride]
            ft = int(filter_choice(r)) if filter_choice else 0
            raw.append(ft)
            raw += _filter_row(ft, row, prev, _CHANNELS[color_type])
            prev = row
        data = zlib.compress(bytes(raw))
        if i == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng_frames(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """→ (width, height, channels, [frame pixel planes]).

    Walks chunks with CRC verification, validates consecutive APNG
    sequence numbers, and reconstructs every frame's full pixel plane
    (inflate + per-scanline unfilter, same machinery as decode_png).
    A plain PNG (no acTL) raises ValueError — use decode_png; a
    PNG-aware-but-APNG-blind reader would instead silently show only
    the first frame, which for a frame SAMPLER is data loss."""
    if blob[:8] != PNG_SIG:
        raise ValueError(f"not a png (bad signature {blob[:8]!r})")
    pos = 8
    ihdr = None
    n_frames = None
    frames_raw: list[bytearray] = []
    expected_seq = 0
    saw_prefix_idat = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ValueError(f"truncated {typ!r} chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"crc mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"acTL":
            n_frames, _plays = struct.unpack(">II", data)
        elif typ == b"fcTL":
            seq, fw, fh, x, y, _dn, _dd, dispose, blend = struct.unpack(
                ">IIIIIHHBB", data
            )
            if seq != expected_seq:
                raise ValueError(f"APNG sequence gap: got {seq}, want {expected_seq}")
            expected_seq += 1
            if ihdr is None:
                raise ValueError("fcTL before IHDR")
            if (fw, fh) != (ihdr[0], ihdr[1]) or x or y or dispose or blend:
                raise NotImplementedError(
                    "offset/composited APNG frames not supported (full-size, "
                    "dispose=none, blend=source only)"
                )
            frames_raw.append(bytearray())
        elif typ == b"IDAT":
            if not frames_raw:
                # IDAT preceding every fcTL: per spec the default image
                # is NOT part of the animation. Defer judgement — if no
                # acTL ever appears this is just a plain PNG (clean
                # ValueError below); with acTL it is the hidden-default
                # form, which this frame sampler does not model.
                saw_prefix_idat = True
                continue
            frames_raw[-1] += data
        elif typ == b"fdAT":
            (seq,) = struct.unpack(">I", data[:4])
            if seq != expected_seq:
                raise ValueError(f"APNG sequence gap: got {seq}, want {expected_seq}")
            expected_seq += 1
            if not frames_raw:
                raise ValueError("fdAT before any fcTL")
            frames_raw[-1] += data[4:]
        elif typ == b"IEND":
            break
        elif not typ[0] & 0x20:
            raise NotImplementedError(f"critical chunk {typ!r} not supported")
    if ihdr is None:
        raise ValueError("missing IHDR")
    if n_frames is None:
        raise ValueError("no acTL: plain PNG, not an APNG (use decode_png)")
    if saw_prefix_idat:
        raise NotImplementedError(
            "APNG with a hidden default image (IDAT before every fcTL) "
            "not supported"
        )
    if len(frames_raw) != n_frames:
        raise ValueError(f"acTL declares {n_frames} frames, found {len(frames_raw)}")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS:
        raise NotImplementedError(f"depth {depth} / color type {color_type}")
    if interlace:
        raise NotImplementedError("Adam7 interlacing not supported")
    channels = _CHANNELS[color_type]
    stride = width * channels
    frames: list[bytes] = []
    for raw_z in frames_raw:
        raw = zlib.decompress(bytes(raw_z))
        if len(raw) != (stride + 1) * height:
            raise ValueError(
                f"inflated frame size {len(raw)} != {(stride + 1) * height}"
            )
        out = bytearray()
        prev = bytes(stride)
        for r in range(height):
            ft = raw[r * (stride + 1)]
            cur = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
            _unfilter_row(ft, cur, prev, channels)
            out += cur
            prev = bytes(cur)
        frames.append(bytes(out))
    return width, height, channels, frames
