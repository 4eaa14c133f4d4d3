"""Multimodal plumbing tests: schema, determinism, batch shape."""

from __future__ import annotations

import pytest

from mcp_memory_libsql_spark.io.tables import load_tables
from mcp_memory_libsql_spark.multimodal import media as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media(load_tables(spark, sf_dir)["documents"])


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]


def test_features_deterministic(media):
    a = sorted(map(tuple, mm.extract_features(media).collect()))
    b = sorted(map(tuple, mm.extract_features(media).collect()))
    assert a == b


def test_feature_values(media):
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    rows = {r.media_id: r for r in media.collect()}
    for mid, f in list(feats.items())[:20]:
        payload = bytes(rows[mid].payload)
        assert f.n_bytes == len(payload)
        assert abs(f.mean_intensity - sum(payload) / len(payload)) < 1e-9
        assert 1 <= len(f.frame_hashes) <= 10


def test_resize_updates_meta_only(media):
    resized = mm.resize_stub(media, 32, 32)
    r = resized.limit(1).collect()[0]
    assert (r.meta.width, r.meta.height) == (32, 32)


def test_decode_stub_rejects_unknown_kind():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"x", "hologram")


def _bmp_wav_of(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return mm.encode_media(df)


def test_codec_roundtrip(spark):
    # lengths chosen to exercise BMP row padding (w % 4 in all classes)
    texts = ["a" * n + "xyz"[: n % 3] for n in (41, 42, 43, 44, 300)]
    rows = _bmp_wav_of(spark, texts).collect()
    for r in rows:
        payload = bytes(r.payload)
        data = mm.decode_media(payload, r.kind)
        src = None
        for t in texts:
            if data == t.encode():
                src = t
        assert src is not None, (r.kind, len(payload), len(data))
        if r.kind == "image":
            assert payload[:2] == b"BM" and len(payload) > len(data)
        elif r.kind == "audio":
            assert payload[:4] == b"RIFF" and len(payload) == len(data) + 44
        else:
            # video: genuine AVI container — RIFF/AVI magic, and the
            # frame parser recovers per-chunk boundaries that
            # concatenate back to the sample stream
            assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
            frames = mm.make_frame_parser()(payload, "video", 1)
            assert b"".join(frames) == data
            assert len(frames) == len(src) % 10 + 1


def test_decoder_malformed_falls_back_to_passthrough():
    assert mm.decode_media(b"BM" + b"\x00" * 60, "image") == b"BM" + b"\x00" * 60
    assert mm.decode_media(b"RIFFxxxxWAVE", "audio") == b"RIFFxxxxWAVE"
    assert mm.decode_media(b"plain bytes", "video") == b"plain bytes"
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"x", "hologram")


def test_neardup_container_invariant(spark):
    # same sample stream, different container bytes -> hamming 0;
    # one-char change -> tiny hamming; unrelated docs -> no pair
    base = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame(
        [
            (0, base, "en", "s", len(base)),          # image (BMP)
            (2100000, base + " ", "en", "s", len(base) + 1),  # image variant
            (3, "Z" * 400, "en", "s", 400),            # image, unrelated
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    media = mm.encode_media(df)
    pairs = mm.media_neardup(media, max_hamming=3).collect()
    assert [(p.media_a, p.media_b) for p in pairs] == [(0, 2100000)]
    assert pairs[0].hamming <= 3
    # exact digest dedup misses the same pair (different containers)
    assert mm.media_dedup(media).count() == 0


def test_neardup_gate_finds_injected_reencodes(spark, sf_dir):
    from mcp_memory_libsql_spark.registry import QUERIES

    pairs = QUERIES["mm_neardup"](spark, sf_dir).collect()
    assert pairs, "injected re-encodes produced no near-dup pairs"
    found = {(p.media_a, p.media_b) for p in pairs}
    docs = load_tables(spark, sf_dir)["documents"]
    injected = {
        (i, i + 2100000)
        for (i,) in docs.where("doc_id % 7 = 0").select("doc_id").collect()
    }
    # a one-char histogram delta flips a bit only on knife-edge votes:
    # the overwhelming majority of injected pairs must be recovered
    assert len(found & injected) >= 0.9 * len(injected)
    assert all(p.hamming <= 3 for p in pairs)


def test_decoder_bounds_malformed_headers():
    # corrupt BMP claiming a 2^31 height must pass through instantly
    # instead of allocating rows for the claimed pixel array
    import struct
    import time

    bad = bytearray(b"BM" + b"\x00" * 100)
    struct.pack_into("<I", bad, 10, 54)       # pixel offset
    struct.pack_into("<ii", bad, 18, 1, 0x7FFFFFFF)  # w=1, h=2^31-1
    struct.pack_into("<H", bad, 28, 8)        # bpp=8
    t0 = time.monotonic()
    assert mm.decode_media(bytes(bad), "image") == bytes(bad)
    assert time.monotonic() - t0 < 0.5
    # truncated WAV data chunk: silent-suffix slicing would mangle the
    # payload; malformed must mean passthrough
    trunc = (
        b"RIFF\x24\x00\x00\x00WAVE"
        + b"data" + struct.pack("<I", 1 << 20) + b"short"
    )
    assert mm.decode_media(trunc, "audio") == trunc


def test_decoder_is_kind_gated(spark):
    # a video payload whose TEXT happens to start with a RIFF/WAVE (or
    # BM) magic must NOT be container-parsed: video is a passthrough
    # kind, and the oracle computes over the full text
    import struct

    riffy = b"RIFFxxxxWAVEjunkdata" + struct.pack("<I", 3) + b"abc tail"
    assert mm.decode_media(riffy, "video") == riffy
    bmpy = b"BM" + b"\x01" * 60
    assert mm.decode_media(bmpy, "video") == bmpy
    assert mm.decode_media(bmpy, "audio") == bmpy


def test_mm_neardup_non_ascii_oracle_parity(spark):
    # the oracle histograms UTF-8 BYTES (hex(encode(ch)) expansion);
    # this pins byte-parity with Spark's np.bincount on non-ASCII text
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from mcp_memory_libsql_spark.oracles_vector import ORACLES
    from tests.parity import compare

    texts = [
        ("café au lait, s'il vous plaît — déjà vu " * 6).strip(),
        ("über allen Gipfeln ist Ruh, größer als Maß " * 6).strip(),
        ("naïve façade, crème brûlée, jalapeño niño " * 6).strip(),
        ("plain ascii filler words repeated many times " * 6).strip(),
        ("数据 管道 质量 评分 重复 检测 相似 搜索 " * 6).strip(),
    ]
    rows = [
        (i, texts[i % len(texts)] + f" tail{i}", "xx", "s", 0)
        for i in range(21)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    reenc = (
        docs.where(F.col("doc_id") % 7 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" ")))
        .withColumn("doc_id", F.col("doc_id") + F.lit(2100000))
    )
    result = mm.media_neardup(
        mm.encode_media(docs.unionByName(reenc)), max_hamming=3
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ),
    )
    cmp = compare(result, con, ORACLES["mm_neardup"])
    assert cmp["ok"], cmp
    assert cmp["spark_rows"] >= 3  # injected pairs actually found


def test_mm_neardup_fat_bucket_split_oracle_parity(spark):
    # 280 byte-identical payloads (+ the gate's %7 re-encode
    # injection) drive every chunk bucket over cap=256, so the
    # fat-bucket SPLIT fires: sub-keying, post-split keep-rule, and
    # the surviving pair set must hash-match the DuckDB mirror (the
    # sf gate corpora rarely exceed the cap, so this is the split's
    # dedicated parity exercise).
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from mcp_memory_libsql_spark.oracles_vector import ORACLES
    from tests.parity import compare

    text = "mass replicated boilerplate page body " * 4
    rows = [(i, text, "en", "s", len(text)) for i in range(280)]
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    reenc = (
        docs.where(F.col("doc_id") % 7 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" ")))
        .withColumn("doc_id", F.col("doc_id") + F.lit(2100000))
    )
    result = mm.media_neardup(
        mm.encode_media(docs.unionByName(reenc)), max_hamming=3
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ),
    )
    cmp = compare(result, con, ORACLES["mm_neardup"])
    con.close()
    assert cmp["ok"], cmp
    # the old drop-rule would have returned ZERO pairs here; the split
    # must retain a bounded, non-empty subset
    assert cmp["spark_rows"] > 0


def test_video_stats_real_frame_sizes(spark):
    # balanced split: sizes differ by at most 1 and sum to the stream
    texts = ["v" * 47, "w" * 10, ""]
    df = spark.createDataFrame(
        [(3 * i + 2, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    rows = {r.media_id: r for r in mm.video_stats(mm.encode_media(df)).collect()}
    for i, t in enumerate(texts):
        r = rows[3 * i + 2]
        k = len(t) % 10 + 1
        assert r.n_frames == k
        assert r.total_bytes == len(t)
        assert r.max_frame_bytes - r.min_frame_bytes <= 1


def test_container_audit_formulas(spark):
    # known layouts: BMP 14+40+1024+padded-row, WAV 44+L, AVI framing
    texts = ["a" * 41, "b" * 42, "c" * 43]
    df = spark.createDataFrame(
        [(i, texts[i], "en", "s", len(texts[i])) for i in range(3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = {r.kind: r for r in mm.container_audit(mm.encode_media(df)).collect()}
    assert rows["image"].payload_bytes == 14 + 40 + 1024 + 44  # 41 -> pad 44
    assert rows["audio"].payload_bytes == 44 + 42
    L, k = 43, 43 % 10 + 1
    sizes = [((i + 1) * L) // k - (i * L) // k for i in range(k)]
    assert rows["video"].payload_bytes == 100 + sum(8 + s + s % 2 for s in sizes)
    for r in rows.values():
        assert r.content_bytes in (41, 42, 43)
        assert 0 < r.overhead_ratio < 1
