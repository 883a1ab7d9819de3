"""Puffin file format + Iceberg v3 deletion vectors, from the public
specs alone (no Iceberg jars in this environment).

Puffin (https://iceberg.apache.org/puffin-spec/) is Iceberg's blob
container for stats and deletion vectors::

    Magic Blob1 Blob2 ... BlobN Footer
    Footer = Magic FooterPayload FooterPayloadSize(4, LE) Flags(4) Magic
    Magic  = 0x50 0x46 0x41 0x31  ("PFA1")

FooterPayload is UTF-8 JSON (optionally lz4-compressed, signalled by
footer flag bit 0 — refused loudly here) describing each blob:
``{"blobs": [{"type", "fields", "snapshot-id", "sequence-number",
"offset", "length", "properties": {...}}], "properties": {...}}``.

The ``deletion-vector-v1`` blob type (Iceberg v3 table spec,
"Deletion vectors") holds one data file's deleted row positions::

    combined length of magic+vector : 4 bytes, BIG-endian
    magic                           : 0xD1 0xD3 0x39 0x64
    vector                          : portable 64-bit RoaringBitmap
    crc-32 of (magic + vector)      : 4 bytes, BIG-endian

and its blob metadata carries ``properties["referenced-data-file"]``
(the one data file it masks) and ``properties["cardinality"]``.

The portable 64-bit RoaringBitmap format (RoaringFormatSpec,
"64-bit implementations")::

    u64 LE   number of (high-key, 32-bit bitmap) pairs
    per pair, ordered by unsigned high key:
      u32 LE high key (upper 32 bits of the values)
      a standard-serialization 32-bit RoaringBitmap

Standard 32-bit serialization: cookie 12346 (no run containers;
followed by u32 container count, then always an offset header) or
cookie 12347 in the low 16 bits with (count-1) in the high 16 bits
(run containers present; followed by a run-flag bitset, offsets only
when count >= 4); then per-container descriptors (u16 key, u16
cardinality-1); then the containers in key order — array (u16
values), bitmap (8192 bytes, 1024 u64 LE words) or run (u16 n_runs,
then u16 start / u16 length-1 pairs).

This module implements BOTH directions: :func:`read_deletion_vector`
/ :func:`read_puffin_footer` for importing foreign v3 tables, and
:func:`write_puffin_dvs` for forging spec-true fixtures in tests (the
same method round 15 used for v2 delete manifests — the writer exists
so the READER is tested against bytes produced independently of it;
round-trip plus hand-pinned byte vectors in tests/test_puffin.py).

Reference parity: the reference repo has no lakehouse surface (its
whole pipeline is Graph.py + BFS_map_reduce.py); this module is part
of the engine-ambition tier (SURVEY.md §2.10 sinks/lakehouse).
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd39d"  # 0xD1 0xD3 0x39 0x64
DV_BLOB_TYPE = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


# ---------------------------------------------------------------- roaring (32-bit)
def _rb32_serialize(values: list[int]) -> bytes:
    """Standard-serialize a sorted list of u32 values: containers are
    chosen by serialized size (array 2B/value, bitmap 8 KiB fixed,
    run 2+4B/run) — the RoaringBitmap library's own economy rule, so
    all three container kinds appear in real outputs and the reader
    gets exercised against each."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    containers: list[tuple[int, str, bytes, int]] = []  # key, kind, payload, card
    for k in keys:
        lows = by_key[k]  # sorted: input is sorted and grouped by high
        runs: list[tuple[int, int]] = []
        for lo in lows:
            if runs and lo == runs[-1][0] + runs[-1][1]:
                runs[-1] = (runs[-1][0], runs[-1][1] + 1)
            else:
                runs.append((lo, 1))
        size_array = 2 * len(lows) if len(lows) <= _ARRAY_MAX else 1 << 30
        size_bitmap = 8192
        size_run = 2 + 4 * len(runs)
        best = min(size_array, size_bitmap, size_run)
        if best == size_run:
            payload = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln - 1) for s, ln in runs
            )
            containers.append((k, "run", payload, len(lows)))
        elif best == size_array:
            payload = struct.pack(f"<{len(lows)}H", *lows)
            containers.append((k, "array", payload, len(lows)))
        else:
            words = [0] * 1024
            for lo in lows:
                words[lo >> 6] |= 1 << (lo & 63)
            payload = struct.pack("<1024Q", *words)
            containers.append((k, "bitmap", payload, len(lows)))
    n = len(containers)
    has_runs = any(kind == "run" for _k, kind, _p, _c in containers)
    out = bytearray()
    if has_runs:
        out += struct.pack("<I", _SERIAL_COOKIE | ((n - 1) << 16))
        bitset = bytearray((n + 7) // 8)
        for i, (_k, kind, _p, _c) in enumerate(containers):
            if kind == "run":
                bitset[i // 8] |= 1 << (i % 8)
        out += bytes(bitset)
    else:
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k, _kind, _p, card in containers:
        out += struct.pack("<HH", k, card - 1)
    write_offsets = (not has_runs) or n >= _NO_OFFSET_THRESHOLD
    if write_offsets:
        off = len(out) + 4 * n
        for _k, _kind, p, _c in containers:
            out += struct.pack("<I", off)
            off += len(p)
    for _k, _kind, p, _c in containers:
        out += p
    return bytes(out)


def _rb32_deserialize(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard-serialization 32-bit bitmap at ``buf[pos:]``;
    return (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbits = (n + 7) // 8
        run_flags = buf[pos : pos + nbits]
        pos += nbits
        is_run = [bool(run_flags[i // 8] & (1 << (i % 8))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(
            f"not a RoaringBitmap: cookie {cookie} (expected "
            f"{_SERIAL_COOKIE_NO_RUN} or {_SERIAL_COOKIE} in low bits)"
        )
    desc = []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        desc.append((k, cm1 + 1))
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets are redundant
    values: list[int] = []
    for i, (k, card) in enumerate(desc):
        base = k << 16
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + s, base + s + lm1 + 1))
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + lo for lo in lows)
    return values, pos


# ---------------------------------------------------------------- roaring64 portable
def rb64_serialize(values: list[int]) -> bytes:
    """Portable-serialize a list of u64 values (sorted internally)."""
    values = sorted(set(int(v) for v in values))
    if any(v < 0 or v >> 64 for v in values):
        raise ValueError("deletion-vector positions must be u64")
    by_high: dict[int, list[int]] = {}
    for v in values:
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(by_high)))
    for hi in sorted(by_high):
        out += struct.pack("<I", hi)
        out += _rb32_serialize(by_high[hi])
    return bytes(out)


def rb64_deserialize(buf: bytes) -> list[int]:
    (n_high,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_high):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _rb32_deserialize(buf, pos)
        values.extend((hi << 32) | lo for lo in lows)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after portable roaring64: {len(buf) - pos}"
        )
    return values


# ---------------------------------------------------------------- DV blob framing
def dv_blob_bytes(positions: list[int]) -> bytes:
    """Serialize one data file's deleted positions as a
    deletion-vector-v1 blob (length + magic + vector + crc)."""
    vec = rb64_serialize(positions)
    body = DV_MAGIC + vec
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + body + struct.pack(">I", crc)


def dv_blob_positions(blob: bytes) -> list[int]:
    """Parse a deletion-vector-v1 blob; validates framing, magic and
    CRC-32 — a truncated or bit-flipped DV must fail loudly, never
    resurrect rows."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)} B)")
    (body_len,) = struct.unpack_from(">I", blob, 0)
    if 4 + body_len + 4 != len(blob):
        raise ValueError(
            f"deletion-vector length field {body_len} inconsistent with "
            f"blob size {len(blob)}"
        )
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4]!r} (want {DV_MAGIC!r})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    actual = zlib.crc32(body) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"deletion-vector CRC mismatch: stored {crc:#x}, computed "
            f"{actual:#x}"
        )
    return rb64_deserialize(body[4:])


# ---------------------------------------------------------------- puffin files
def read_puffin_footer(path: str) -> dict:
    """The FileMetadata JSON of a Puffin file (blob index)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 20 or data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path!r} is not a Puffin file (magic mismatch)")
    flags = data[-8:-4]
    (payload_size,) = struct.unpack_from("<i", data, len(data) - 12)
    if flags[0] & 0x01:
        raise NotImplementedError(
            f"{path!r} has an lz4-compressed footer payload — "
            "unsupported in this environment (no lz4); refusing rather "
            "than guessing"
        )
    start = len(data) - 12 - payload_size
    if start < 8 or data[start - 4 : start] != MAGIC:
        raise ValueError(
            f"{path!r}: footer framing invalid (payload_size="
            f"{payload_size})"
        )
    return json.loads(data[start : start + payload_size].decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    if len(blob) != length:
        raise ValueError(
            f"{path!r}: blob truncated (wanted {length} B at {offset}, "
            f"got {len(blob)})"
        )
    return blob


def read_deletion_vector(
    path: str, offset: int | None = None, length: int | None = None,
    referenced_data_file: str | None = None,
) -> list[int]:
    """Deleted positions for one data file. With ``offset``/``length``
    (the manifest entry's ``content_offset`` /
    ``content_size_in_bytes``) the footer is never read — the v3 fast
    path. Otherwise the footer locates the deletion-vector-v1 blob
    whose ``referenced-data-file`` matches."""
    if offset is not None and length is not None:
        return dv_blob_positions(read_blob(path, offset, length))
    meta = read_puffin_footer(path)
    for b in meta.get("blobs") or []:
        if b.get("type") != DV_BLOB_TYPE:
            continue
        ref = (b.get("properties") or {}).get("referenced-data-file")
        if referenced_data_file is None or ref == referenced_data_file:
            return dv_blob_positions(read_blob(path, b["offset"], b["length"]))
    raise ValueError(
        f"{path!r} has no {DV_BLOB_TYPE} blob for "
        f"{referenced_data_file!r}"
    )


def write_puffin_dvs(
    path: str,
    dvs: dict[str, list[int]],
    *,
    snapshot_id: int = 1,
    sequence_number: int = 1,
) -> list[dict]:
    """Write a Puffin file with one deletion-vector-v1 blob per
    ``{data_file_path: positions}`` entry; returns the blob metadata
    list (offset/length per blob — what a v3 manifest entry records
    as content_offset/content_size_in_bytes)."""
    blobs_meta: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for ref, positions in dvs.items():
            blob = dv_blob_bytes(positions)
            off = f.tell()
            f.write(blob)
            blobs_meta.append(
                {
                    "type": DV_BLOB_TYPE,
                    "fields": [],
                    "snapshot-id": snapshot_id,
                    "sequence-number": sequence_number,
                    "offset": off,
                    "length": len(blob),
                    "properties": {
                        "referenced-data-file": ref,
                        "cardinality": str(len(set(positions))),
                    },
                }
            )
        payload = json.dumps(
            {"blobs": blobs_meta, "properties": {}}
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        f.write(MAGIC)
    return blobs_meta
