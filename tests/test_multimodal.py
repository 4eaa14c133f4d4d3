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
