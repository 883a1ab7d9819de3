"""Minimal from-spec AVI (RIFF) container with MJPEG video frames.

Why this exists: the multimodal tier's video operator was an honest
``NotImplementedError`` ("needs ffmpeg") since round 2 — but a large
and well-documented slice of real video is MOTION JPEG in an AVI
container (the classic capture/webcam format), and this package
already owns a from-spec JPEG codec (sources/jpeg_py.py). An AVI is
just RIFF framing (the same chunk grammar as the WAV walker in
operators/multimodal_queries.py) around per-frame JPEGs, all from
public specs: the Microsoft AVI RIFF file reference and ITU-T T.81.
So the container layer is implemented for real here, and the
remaining video refusal narrows to inter-frame codecs (H.26x/VP/AV1 —
genuinely impossible without external decoders).

Writer: single 'vids' stream, 'MJPG' handler, one '00dc' chunk per
frame inside the 'movi' LIST, chunks padded to even length per RIFF;
avih/strh/strf headers carry geometry, rate and frame count. Reader:
walks the RIFF tree structurally (no offset guessing), validates the
MJPG fourcc, and hands each frame's bytes to ``decode_jpeg``.

Not implemented (explicit refusals, never silent): non-MJPG
compression fourccs, multi-stream files (audio+video interleave), and
palettized DIB frames.
"""

from __future__ import annotations

import struct


class AviFormatError(ValueError):
    """Structurally invalid AVI (bad RIFF framing, missing lists,
    truncated chunk)."""


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    *,
    fps: int = 10,
) -> bytes:
    """Wrap already-encoded JPEG frames as a single-stream MJPEG AVI.
    The frames are stored byte-for-byte (this is a container, not a
    transcode), so whatever ``jpeg_py.encode_jpeg`` guarantees about a
    frame survives the round trip exactly."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    n = len(jpeg_frames)
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no idx1 chunk is written, so AVIF_HASINDEX (0x10) must be OFF — a strict player told the file has an index would look for a missing one
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in jpeg_frames))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for every chunk in
    [pos, end); enforces RIFF even-padding and bounds."""
    while pos < end:
        if pos + 8 > end:
            raise AviFormatError("truncated chunk header")
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            raise AviFormatError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def decode_avi_mjpeg_frames(
    blob: bytes, max_frames: int | None = None
) -> tuple[int, int, int, list[bytes]]:
    """Decode every MJPEG frame of an AVI to RGB planes:
    ``(width, height, n_frames, [rgb_bytes])`` — the same contract as
    ``gif_py.decode_gif_frames`` / ``png_py.decode_apng_frames``, so
    frame-sampling pipelines treat all three containers uniformly.
    Structural walk only: headers are validated (MJPG fourcc, one
    video stream), frames decoded by the from-spec JPEG decoder."""
    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI signature")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    end = min(8 + riff_size, len(blob))

    width = height = None
    movi_span = None
    for fourcc, start, size in _walk_chunks(blob, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = blob[start : start + 4]
        if list_type == b"hdrl":
            for f2, s2, z2 in _walk_chunks(blob, start + 4, start + size):
                if f2 == b"avih":
                    if z2 < 40:
                        raise AviFormatError("avih header too short")
                    fields = struct.unpack("<10I", blob[s2 : s2 + 40])
                    if fields[6] != 1:
                        raise NotImplementedError(
                            f"{fields[6]}-stream AVI: only single-"
                            "stream MJPEG files are supported"
                        )
                    width, height = fields[8], fields[9]
                elif f2 == b"LIST" and blob[s2 : s2 + 4] == b"strl":
                    for f3, s3, z3 in _walk_chunks(blob, s2 + 4, s2 + z2):
                        if f3 == b"strh":
                            if blob[s3 : s3 + 4] != b"vids":
                                raise NotImplementedError(
                                    f"stream type {blob[s3:s3+4]!r}: "
                                    "only video streams supported"
                                )
                            if blob[s3 + 4 : s3 + 8] not in (b"MJPG", b"mjpg"):
                                raise NotImplementedError(
                                    f"codec {blob[s3+4:s3+8]!r}: only "
                                    "MJPG (Motion JPEG) is decodable "
                                    "without external libraries"
                                )
        elif list_type == b"movi":
            movi_span = (start + 4, start + size)
    if width is None or movi_span is None:
        raise AviFormatError("missing hdrl/avih or movi list")

    frames: list[bytes] = []
    for fourcc, start, size in _walk_chunks(blob, movi_span[0], movi_span[1]):
        if fourcc[2:4] not in (b"dc", b"db"):
            continue  # index/other records inside movi
        w, h, _ch, rgb = decode_jpeg(blob[start : start + size])
        if (w, h) != (width, height):
            raise AviFormatError(
                f"frame geometry {w}x{h} != container {width}x{height}"
            )
        frames.append(rgb)
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise AviFormatError("no video frames in movi list")
    return width, height, len(frames), frames
