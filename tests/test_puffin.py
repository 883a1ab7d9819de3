"""Round 16 (verdict ask #2): Puffin deletion-vector import — the
from-spec roaring64 codec, DV blob framing, puffin file framing, and
the end-to-end v3 table adoption."""

import json
import os
import random
import struct
import zlib

import pytest

from bfs_mapreduce_spark.sources import puffin_py as pf


# ---------------------------------------------------------------- roaring codec
def test_rb32_array_container_pinned_bytes():
    """Hand-computed standard-serialization bytes for a small array
    container — pins the writer to the RoaringFormatSpec, not to
    itself."""
    buf = pf._rb32_serialize([1, 3, 5, 70000])
    # two high-16 keys: 0 -> {1,3,5} (array wins: 6B < run 14B),
    # 1 -> {4464} (70000 = 1*65536 + 4464; run 6B, array 2B -> array)
    exp = struct.pack("<II", 12346, 2)            # cookie, 2 containers
    exp += struct.pack("<HH", 0, 2)               # key 0, card-1
    exp += struct.pack("<HH", 1, 0)               # key 1, card-1
    exp += struct.pack("<II", 24, 30)             # offsets
    exp += struct.pack("<3H", 1, 3, 5)
    exp += struct.pack("<H", 4464)
    assert buf == exp
    vals, pos = pf._rb32_deserialize(buf, 0)
    assert vals == [1, 3, 5, 70000] and pos == len(buf)


def test_rb32_run_container_pinned_bytes():
    """A dense run [10..200] serializes as ONE run container under the
    economy rule, with the 12347 cookie and LSB-first run-flag bits."""
    buf = pf._rb32_serialize(list(range(10, 201)))
    exp = struct.pack("<I", 12347 | (0 << 16))    # cookie, count-1=0
    exp += b"\x01"                                # run-flag bitset
    exp += struct.pack("<HH", 0, 190)             # key 0, card-1
    # < NO_OFFSET_THRESHOLD containers: no offset header
    exp += struct.pack("<H", 1)                   # one run
    exp += struct.pack("<HH", 10, 190)            # start, length-1
    assert buf == exp
    vals, _ = pf._rb32_deserialize(buf, 0)
    assert vals == list(range(10, 201))


def test_rb32_bitmap_container_roundtrip():
    """> 4096 scattered values (no long runs) force a bitmap container."""
    rng = random.Random(7)
    vals = sorted(rng.sample(range(0, 65536), 9000))
    buf = pf._rb32_serialize(vals)
    (cookie,) = struct.unpack_from("<I", buf, 0)
    assert cookie == 12346  # no run containers
    got, _ = pf._rb32_deserialize(buf, 0)
    assert got == vals


def test_rb64_multi_highkey_roundtrip():
    """64-bit positions spanning several 32-bit buckets, mixed
    container kinds, survive a portable-serialization roundtrip."""
    rng = random.Random(42)
    vals = sorted(
        set(
            [rng.randrange(0, 1 << 20) for _ in range(5000)]
            + [(1 << 32) + v for v in range(100, 5300)]       # run
            + [(5 << 32) + rng.randrange(0, 1 << 16) for _ in range(6000)]
        )
    )
    assert pf.rb64_deserialize(pf.rb64_serialize(vals)) == vals


def test_rb64_rejects_trailing_garbage():
    buf = pf.rb64_serialize([1, 2, 3]) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        pf.rb64_deserialize(buf)


# ---------------------------------------------------------------- DV blob framing
def test_dv_blob_framing_and_crc():
    positions = [0, 5, 7, 1 << 33]
    blob = pf.dv_blob_bytes(positions)
    (body_len,) = struct.unpack_from(">I", blob, 0)
    assert blob[4:8] == b"\xd1\xd39d"
    assert len(blob) == 4 + body_len + 4
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    assert crc == zlib.crc32(blob[4 : 4 + body_len]) & 0xFFFFFFFF
    assert pf.dv_blob_positions(blob) == sorted(positions)
    # a flipped bit fails the CRC loudly (never resurrects rows)
    bad = bytearray(blob)
    bad[10] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        pf.dv_blob_positions(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        pf.dv_blob_positions(blob[:4] + b"XXXX" + blob[8:])
    with pytest.raises(ValueError, match="inconsistent|short"):
        pf.dv_blob_positions(blob[:-1])


# ---------------------------------------------------------------- puffin files
def test_puffin_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "dv.puffin")
    metas = pf.write_puffin_dvs(
        p,
        {"/data/a.parquet": [3, 1, 4, 1, 5], "/data/b.parquet": [10]},
        snapshot_id=9,
        sequence_number=2,
    )
    footer = pf.read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"] * 2
    assert footer["blobs"][0]["properties"]["cardinality"] == "4"
    # fast path: manifest-recorded offsets, footer never consulted
    m0 = metas[0]
    assert pf.read_deletion_vector(p, m0["offset"], m0["length"]) == [1, 3, 4, 5]
    # footer path: locate by referenced-data-file
    assert pf.read_deletion_vector(
        p, referenced_data_file="/data/b.parquet"
    ) == [10]
    with pytest.raises(ValueError, match="no deletion-vector"):
        pf.read_deletion_vector(p, referenced_data_file="/data/nope.parquet")


def test_puffin_refuses_compressed_footer_and_bad_magic(tmp_path):
    p = str(tmp_path / "z.puffin")
    pf.write_puffin_dvs(p, {"/d.parquet": [1]})
    data = bytearray(open(p, "rb").read())
    data[-8] |= 0x01  # set the lz4-compressed flag bit
    comp = str(tmp_path / "c.puffin")
    open(comp, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="lz4"):
        pf.read_puffin_footer(comp)
    bad = str(tmp_path / "bad.puffin")
    open(bad, "wb").write(b"NOPE" + bytes(data[4:]))
    with pytest.raises(ValueError, match="magic"):
        pf.read_puffin_footer(bad)


# ---------------------------------------------------------------- v3 import e2e
def test_import_iceberg_v3_deletion_vectors(spark, tmp_path):
    """Forge a v3 table: data file A (seq 1), data file B (seq 3), a
    puffin DV (seq 2) masking A's rows 1 and 3. Import must apply the
    DV to A only (B is newer AND unreferenced), and the MoR state must
    match the survivors exactly."""
    from bfs_mapreduce_spark.sources import iceberg_meta as im
    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.avro_py import write_avro

    loc = str(tmp_path / "foreign")
    data_dir, meta_dir = os.path.join(loc, "data"), os.path.join(loc, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    import pyarrow as pa
    import pyarrow.parquet as pq

    fa = os.path.join(data_dir, "a.parquet")
    fb = os.path.join(data_dir, "b.parquet")
    pq.write_table(pa.table({"k": pa.array([10, 11, 12, 13, 14], pa.int64())}), fa)
    pq.write_table(pa.table({"k": pa.array([20, 21], pa.int64())}), fb)
    fdv = os.path.join(data_dir, "deletes.puffin")
    metas = pf.write_puffin_dvs(fdv, {fa: [1, 3]}, sequence_number=2)

    entry_schema = im._manifest_entry_schema()
    entry_schema["fields"][-1]["type"]["fields"] += [
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ]

    def entry(path, content, seq, fmt="PARQUET", ref=None, off=None, ln=None):
        return {
            "status": 1,
            "snapshot_id": 3,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": path,
                "file_format": fmt,
                "partition": {},
                "record_count": 0,
                "file_size_in_bytes": os.path.getsize(path),
                "referenced_data_file": ref,
                "content_offset": off,
                "content_size_in_bytes": ln,
            },
        }

    m_data = os.path.join(meta_dir, "manifest-data.avro")
    write_avro(m_data, entry_schema, [entry(fa, 0, 1), entry(fb, 0, 3)])
    m_del = os.path.join(meta_dir, "manifest-del.avro")
    write_avro(
        m_del,
        entry_schema,
        [entry(fdv, 1, 2, fmt="PUFFIN", ref=fa,
               off=metas[0]["offset"], ln=metas[0]["length"])],
    )

    def list_row(path, content, seq):
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": 1,
            "added_snapshot_id": 3,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 0,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    lp = os.path.join(meta_dir, "snap-3.avro")
    write_avro(lp, im._MANIFEST_LIST_SCHEMA,
               [list_row(m_data, 0, 3), list_row(m_del, 1, 2)])
    md = {
        "format-version": 3,
        "table-uuid": "00000000-0000-0000-0000-0000000000dv",
        "location": loc,
        "last-sequence-number": 3,
        "last-updated-ms": 0,
        "last-column-id": 1,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "current-snapshot-id": 3,
        "snapshots": [{"snapshot-id": 3, "sequence-number": 3,
                       "timestamp-ms": 0, "summary": {"operation": "overwrite"},
                       "manifest-list": lp, "schema-id": 0}],
        "snapshot-log": [],
        "metadata-log": [],
    }
    json.dump(md, open(os.path.join(meta_dir, "v1.metadata.json"), "w"))
    open(os.path.join(meta_dir, "version-hint.text"), "w").write("1")

    plan = im.iceberg_snapshot_plan(loc)
    assert len(plan["dvs"]) == 1 and plan["dvs"][0][2] == fa

    root = str(tmp_path / "adopted")
    os.makedirs(root)
    im.import_iceberg_table(spark, loc, root)
    got = sorted(r["k"] for r in ts.read(spark, root).collect())
    # A's positions 1 and 3 (k=11, 13) are DV-masked; B untouched
    assert got == [10, 12, 14, 20, 21]
    # the import is an upsert-op commit (adds + masks in one)
    assert ts.read_manifest(root)["operation"] == "upsert"


def test_import_refuses_dv_without_reference(spark, tmp_path):
    """A puffin position-delete entry with no referenced_data_file is
    spec-invalid — refuse, never guess scope."""
    from bfs_mapreduce_spark.sources import iceberg_meta as im
    from bfs_mapreduce_spark.sources.avro_py import write_avro

    loc = str(tmp_path / "foreign2")
    data_dir, meta_dir = os.path.join(loc, "data"), os.path.join(loc, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    import pyarrow as pa
    import pyarrow.parquet as pq

    fa = os.path.join(data_dir, "a.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), fa)
    fdv = os.path.join(data_dir, "d.puffin")
    pf.write_puffin_dvs(fdv, {fa: [0]})

    entry_schema = im._manifest_entry_schema()

    def entry(path, content, seq, fmt):
        return {
            "status": 1, "snapshot_id": 1, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {"content": content, "file_path": path,
                          "file_format": fmt, "partition": {},
                          "record_count": 0,
                          "file_size_in_bytes": os.path.getsize(path)},
        }

    m_data = os.path.join(meta_dir, "m-data.avro")
    write_avro(m_data, entry_schema, [entry(fa, 0, 1, "PARQUET")])
    m_del = os.path.join(meta_dir, "m-del.avro")
    write_avro(m_del, entry_schema, [entry(fdv, 1, 1, "PUFFIN")])

    def list_row(path, content):
        return {"manifest_path": path, "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": 1, "min_sequence_number": 1,
                "added_snapshot_id": 1, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 0, "existing_rows_count": 0,
                "deleted_rows_count": 0}

    lp = os.path.join(meta_dir, "snap-1.avro")
    write_avro(lp, im._MANIFEST_LIST_SCHEMA,
               [list_row(m_data, 0), list_row(m_del, 1)])
    md = {
        "format-version": 3, "table-uuid": "0-0-0-0-1", "location": loc,
        "last-sequence-number": 1, "last-updated-ms": 0, "last-column-id": 1,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0, "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "sequence-number": 1,
                       "timestamp-ms": 0, "summary": {"operation": "append"},
                       "manifest-list": lp, "schema-id": 0}],
        "snapshot-log": [], "metadata-log": [],
    }
    json.dump(md, open(os.path.join(meta_dir, "v1.metadata.json"), "w"))
    open(os.path.join(meta_dir, "version-hint.text"), "w").write("1")

    with pytest.raises(NotImplementedError, match="referenced_data_file"):
        im.iceberg_snapshot_plan(loc)


def test_import_refusal_sweeps_staged_copies(spark, tmp_path):
    """ADVICE (round 15): a refusal AFTER the import staged normalized
    position-delete copies (e.g. an equality delete keying an unknown
    field id) must sweep those copies — no orphan parquet under the
    new root."""
    from bfs_mapreduce_spark.sources import iceberg_meta as im
    from bfs_mapreduce_spark.sources.avro_py import write_avro

    loc = str(tmp_path / "foreign3")
    data_dir, meta_dir = os.path.join(loc, "data"), os.path.join(loc, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    import pyarrow as pa
    import pyarrow.parquet as pq

    fa = os.path.join(data_dir, "a.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}), fa)
    fpos = os.path.join(data_dir, "pos.parquet")
    pq.write_table(
        pa.table({"file_path": pa.array([fa]), "pos": pa.array([0], pa.int64())}),
        fpos,
    )
    feq = os.path.join(data_dir, "eq.parquet")
    pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), feq)

    entry_schema = im._manifest_entry_schema()
    entry_schema["fields"][-1]["type"]["fields"].append(
        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}],
         "default": None, "field-id": 135})

    def entry(path, content, seq, eq_ids=None):
        return {"status": 1, "snapshot_id": 2, "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {"content": content, "file_path": path,
                              "file_format": "PARQUET", "partition": {},
                              "record_count": 0,
                              "file_size_in_bytes": os.path.getsize(path),
                              "equality_ids": eq_ids}}

    m_data = os.path.join(meta_dir, "m-data.avro")
    write_avro(m_data, entry_schema, [entry(fa, 0, 1)])
    m_del = os.path.join(meta_dir, "m-del.avro")
    # eq delete keys field id 99 — absent from the schema: refuses
    write_avro(m_del, entry_schema,
               [entry(fpos, 1, 2), entry(feq, 2, 2, eq_ids=[99])])

    def list_row(path, content):
        return {"manifest_path": path, "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": 2, "min_sequence_number": 1,
                "added_snapshot_id": 2, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 0, "existing_rows_count": 0,
                "deleted_rows_count": 0}

    lp = os.path.join(meta_dir, "snap-2.avro")
    write_avro(lp, im._MANIFEST_LIST_SCHEMA,
               [list_row(m_data, 0), list_row(m_del, 1)])
    md = {
        "format-version": 2, "table-uuid": "0-0-0-0-2", "location": loc,
        "last-sequence-number": 2, "last-updated-ms": 0, "last-column-id": 1,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0, "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [{"snapshot-id": 2, "sequence-number": 2,
                       "timestamp-ms": 0, "summary": {"operation": "overwrite"},
                       "manifest-list": lp, "schema-id": 0}],
        "snapshot-log": [], "metadata-log": [],
    }
    json.dump(md, open(os.path.join(meta_dir, "v1.metadata.json"), "w"))
    open(os.path.join(meta_dir, "version-hint.text"), "w").write("1")

    root = str(tmp_path / "adopted3")
    os.makedirs(root)
    with pytest.raises(NotImplementedError, match="field id 99"):
        im.import_iceberg_table(spark, loc, root)
    # the staged normalized pos-delete copy was swept with the refusal
    staged = []
    for dirpath, _dirs, names in os.walk(os.path.join(root, "data")):
        staged += [n for n in names if n.endswith(".parquet")]
    assert staged == [], f"orphaned staged copies: {staged}"
