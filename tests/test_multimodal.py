"""Multimodal plumbing tests: Arrow-batched feature extraction over
binary payloads — real schema/batch path, stubbed decode kernel."""

from __future__ import annotations

import hashlib

import pytest

from tfl_realtime_lakehouse_spark.operators import multimodal as M
from tfl_realtime_lakehouse_spark.sources.tables import read_table


def test_assets_schema_and_feature_extraction(spark, sf_smoke):
    def shape(schema):  # names + types; nullability differs for literals
        return [(f.name, f.dataType) for f in schema.fields]

    assets = M.documents_as_assets(read_table(spark, sf_smoke, "documents"))
    assert shape(assets.schema) == shape(M.ASSET_SCHEMA)
    feats = M.extract_features(assets, fake_decode=True)
    assert shape(feats.schema) == shape(M.FEATURE_SCHEMA)
    rows = feats.limit(5).collect()
    assert rows
    for r in rows:
        assert r.n_bytes > 0
        assert len(r.payload_digest) == 32
        assert len(r.feature) == 8
        assert all(0.0 <= v < 1.0 for v in r.feature)


def test_feature_is_deterministic_digest(spark):
    assets = spark.createDataFrame(
        [(1, "image", "application/octet-stream", b"hello", None, None, None)],
        M.ASSET_SCHEMA,
    )
    row = M.extract_features(assets).collect()[0]
    assert row.payload_digest == hashlib.md5(b"hello").hexdigest()
    expected = [b / 256.0 for b in hashlib.md5(b"hello").digest()[:8]]
    assert row.feature == expected


def test_real_decode_is_explicitly_stubbed(spark):
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")
    assets = spark.createDataFrame(
        [(1, "image", "application/octet-stream", b"x", None, None, None)],
        M.ASSET_SCHEMA,
    )
    with pytest.raises(Exception):  # surfaced through the Spark task
        M.extract_features(assets, fake_decode=False).collect()
