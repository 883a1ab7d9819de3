"""From-spec GIF87a/89a codec (pure Python + numpy) — palette images
with real LZW entropy coding.

Why this exists: the container has no image libraries (no PIL, no
imageio), and GIF is the third of the three dominant still-image web
formats (after JPEG and PNG, both already implemented from spec in
this package). Everything here is written from the public GIF89a
specification (CompuServe, 1990-07-31; the W3C-hosted plain-text spec)
— the same from-spec pattern as sources/png_py.py and jpeg_py.py. The
reference repo has no binary formats at all (its only source is a
whitespace edge list, Graph.py:2-16); this module serves the
multimodal tier of SURVEY.md §2.10.

Supported, both directions:

- logical screen + global color table (any power-of-two size 2..256);
- local color tables (decode; the encoder always writes a global one);
- variable-code-width LZW (3..12 bits, LSB-first bit packing), CLEAR /
  EOI codes, dictionary growth to 4096 with clear-and-reset when full;
- interlaced row order (the four passes of spec §20, appendix E);
- first-frame compositing onto the background color when the image
  rectangle covers only part of the logical screen.

Honest refusals (never silently wrong pixels):

- transparency (a Graphic Control Extension with the transparent-color
  flag) — a still-image decode would have to invent an RGB value for
  transparent pixels, so it raises instead;
- anything after the first image (animated GIFs) is ignored by
  ``decode_gif`` BY CONTRACT (the universal "still" semantics: frame
  1) — animation sampling lives with the APNG machinery
  (png_py.decode_apng_frames);
- encoding more than 256 distinct colors (GIF cannot; callers quantize
  first or use the PNG/JPEG encoders).

LZW notes (spec appendix F): codes are packed least-significant-bit
first; the initial code width is ``min_code_size + 1``; the decoder
grows the width when its table reaches ``2**width`` entries (no "early
change" — that is TIFF's variant, not GIF's); the encoder mirrors that
schedule by simulating the decoder's table size, which keeps the two
ends in lockstep by construction (and the ImageIO cross-certification
in tests/test_multimodal.py pins it against an independent
implementation in both directions).
"""

from __future__ import annotations

import struct

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9
_MAX_CODE = 4096  # 12-bit code space, spec appendix F

# interlace passes: (first row, row step) — spec §20 / appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifFormatError(ValueError):
    """Structurally invalid GIF (bad signature, truncated block,
    out-of-range LZW code, missing trailer)."""


def _interlace_order(height: int) -> list[int]:
    order: list[int] = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, height, step))
    return order


# ---------------------------------------------------------------- LZW


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW per spec appendix F. The output width
    schedule SIMULATES the decoder's table growth (decoder adds one
    entry per code received, starting with the second code after a
    CLEAR), so both ends switch widths on exactly the same code
    boundary without early-change ambiguity."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    # decoder-side table size / codes-seen-since-clear (simulated)
    dec_size = eoi + 1
    dec_seen = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits, width, dec_size, dec_seen
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # decoder state after it processes THIS code
        if code == clear:
            width = min_code_size + 1
            dec_size = eoi + 1
            dec_seen = 0
            return
        if code == eoi:
            return
        dec_seen += 1
        if dec_seen >= 2 and dec_size < _MAX_CODE:
            dec_size += 1
        if dec_size == (1 << width) and width < 12:
            width += 1

    emit(clear)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode`; also accepts foreign encoders'
    streams (including the kwkwk self-reference case and deferred
    table-full handling). Stops after ``expected`` indices or EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise GifFormatError(
                    f"LZW stream truncated: {len(out)}/{expected} indices"
                )
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise GifFormatError(f"first LZW code {code} is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the kwkwk case, spec appendix F
        else:
            raise GifFormatError(f"LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise GifFormatError(
            f"LZW stream ended at {len(out)}/{expected} indices"
        )
    return bytes(out[:expected])


# ------------------------------------------------------------- encode


def encode_gif(
    width: int, height: int, rgb: bytes, *, interlace: bool = False
) -> bytes:
    """Encode an RGB24 plane as a single-image GIF89a with a global
    color table. Lossless for planes with <= 256 distinct colors
    (raises ValueError beyond — GIF's hard format limit; quantize
    first or use the PNG encoder). Deterministic: the palette is the
    sorted unique color list."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} bytes, got {len(rgb)}")
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    palette, inverse = np.unique(px, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors: GIF holds at most 256 "
            "(quantize first, or use encode_png)"
        )
    # color table size must be a power of two >= 2 (spec §18: 2^(N+1))
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    ct_size = 1 << ct_bits
    table = palette.tobytes() + b"\x00" * (3 * (ct_size - len(palette)))

    indices = inverse.astype(np.uint8)
    if interlace:
        rows = indices.reshape(height, width)
        indices = rows[_interlace_order(height)].reshape(-1)
    idx_bytes = indices.tobytes()

    mcs = max(2, ct_bits)  # LZW minimum code size, spec appendix F
    lzw = _lzw_encode(idx_bytes, mcs)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT flag, color resolution, GCT size
    packed = 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += table
    # image descriptor at (0,0), no local table
    out += struct.pack(
        "<BHHHHB", _IMAGE_SEP, 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(_TRAILER)
    return bytes(out)


# ------------------------------------------------------------- decode


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(blob):
            raise GifFormatError("truncated in sub-block chain")
        n = blob[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(blob):
            raise GifFormatError("truncated sub-block")
        parts.append(blob[pos : pos + n])
        pos += n


def decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST image of a GIF to ``(width, height, 3,
    rgb_bytes)`` at logical-screen geometry — the universal still
    semantics (later frames of an animation are ignored by contract;
    see module docstring). Transparency raises NotImplementedError
    rather than inventing pixel values."""
    w, h, _n, frames = decode_gif_frames(blob, max_frames=1)
    return w, h, 3, frames[0]


def decode_gif_frames(
    blob: bytes, max_frames: int | None = None
) -> tuple[int, int, int, list[bytes]]:
    """Walk EVERY image of a (possibly animated) GIF, compositing each
    onto the logical-screen canvas per its Graphic Control Extension's
    disposal method, and return ``(width, height, n_frames,
    [rgb_bytes])`` — one full-canvas RGB snapshot per frame, the shape
    frame-sampling pipelines consume (same contract as
    png_py.decode_apng_frames). Supported disposals: 0/1 (leave in
    place — the next frame draws over) and 2 (restore the frame's
    rectangle to the background color). Disposal 3 (restore-previous)
    and transparency raise NotImplementedError — both would otherwise
    produce silently wrong pixels. The NETSCAPE looping extension and
    other application/comment blocks are skipped structurally."""
    import numpy as np

    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF signature")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(blob):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    frames: list[bytes] = []
    canvas: np.ndarray | None = None
    disposal = 0  # from the GCE preceding the next image
    pending_restore: tuple[int, int, int, int] | None = None

    while True:
        if pos >= len(blob):
            raise GifFormatError("missing trailer")
        sep = blob[pos]
        pos += 1
        if sep == _TRAILER:
            break
        if sep == _EXTENSION:
            if pos >= len(blob):
                raise GifFormatError("truncated extension")
            label = blob[pos]
            data, pos = _read_subblocks(blob, pos + 1)
            if label == _GCE_LABEL and len(data) >= 1:
                if data[0] & 0x01:
                    raise NotImplementedError(
                        "GIF transparency: a still-image decode cannot "
                        "assign RGB to transparent pixels; composite "
                        "with an explicit background instead"
                    )
                disposal = (data[0] >> 2) & 0x07
                if disposal >= 3:
                    raise NotImplementedError(
                        f"GIF disposal method {disposal} "
                        "(restore-previous) is not supported"
                    )
            continue
        if sep != _IMAGE_SEP:
            raise GifFormatError(f"unexpected block 0x{sep:02x}")

        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        if left + iw > sw or top + ih > sh:
            raise GifFormatError("image rectangle exceeds logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(
                blob[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise GifFormatError("no color table (neither global nor local)")

        mcs = blob[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise GifFormatError(f"LZW minimum code size {mcs} out of range")
        lzw, pos = _read_subblocks(blob, pos)
        indices = np.frombuffer(_lzw_decode(lzw, mcs, iw * ih), dtype=np.uint8)
        if int(indices.max(initial=0)) >= len(ct):
            raise GifFormatError("pixel index beyond color table")
        rows = indices.reshape(ih, iw)
        if ipacked & 0x40:
            deinter = np.empty_like(rows)
            deinter[_interlace_order(ih)] = rows
            rows = deinter
        frame = ct[rows]  # (ih, iw, 3)

        if canvas is None:
            if iw == sw and ih == sh:
                canvas = frame.copy()
            else:
                if gct is None or bg_index >= len(gct):
                    raise GifFormatError("partial first frame without background")
                canvas = np.tile(gct[bg_index], (sh, sw, 1))
                canvas[top : top + ih, left : left + iw] = frame
        else:
            canvas = canvas.copy()
            if pending_restore is not None:
                rl, rt, rw, rh = pending_restore
                canvas[rt : rt + rh, rl : rl + rw] = gct[bg_index]
            canvas[top : top + ih, left : left + iw] = frame
        frames.append(canvas.tobytes())
        if disposal == 2:
            if gct is None or bg_index >= len(gct):
                raise GifFormatError("disposal 2 without a background color")
            pending_restore = (left, top, iw, ih)
        else:
            pending_restore = None
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, len(frames), frames

    if not frames:
        raise GifFormatError("no image data before trailer")
    return sw, sh, len(frames), frames


def encode_gif_frames(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Encode full-rect RGB24 frames as an animated GIF89a: one global
    color table over the UNION of all frames' colors (<= 256 total —
    GIF's hard limit; raises beyond), a NETSCAPE2.0 infinite-loop
    application extension, and per frame a Graphic Control Extension
    (disposal 1 = leave in place, ``delay_cs`` hundredths of a second)
    followed by a full-screen image. Lossless by construction, so
    ``decode_gif_frames`` returns the input frames byte-for-byte."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError(
                f"every frame must be {width * height * 3} bytes, got {len(f)}"
            )
    px = np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(-1, 3)
    palette, inverse = np.unique(px, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors across frames: GIF holds "
            "at most 256 (quantize first, or use encode_apng)"
        )
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    ct_size = 1 << ct_bits
    table = palette.tobytes() + b"\x00" * (3 * (ct_size - len(palette)))
    mcs = max(2, ct_bits)

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += table
    # NETSCAPE2.0 looping extension (loop forever), spec-conformant
    # application extension framing
    out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0"
    out += bytes([3, 1, 0, 0, 0])

    per_frame = len(frames[0]) // 3
    idx = inverse.astype(np.uint8)
    for k in range(len(frames)):
        out += bytes([_EXTENSION, _GCE_LABEL, 4])
        # disposal 1 (leave in place), no user input, no transparency
        out += struct.pack("<BHB", 0x04, delay_cs, 0)
        out.append(0)  # GCE terminator
        f_idx = idx[k * per_frame : (k + 1) * per_frame]
        if interlace:
            rows = f_idx.reshape(height, width)
            f_idx = rows[_interlace_order(height)].reshape(-1)
        out += struct.pack(
            "<BHHHHB", _IMAGE_SEP, 0, 0, width, height,
            0x40 if interlace else 0,
        )
        out.append(mcs)
        lzw = _lzw_encode(f_idx.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(_TRAILER)
    return bytes(out)
