from __future__ import annotations

import hashlib

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.multimodal import (
    decode_image_batch,
    media_table,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle


def test_metadata_oracle_parity_smoke(spark):
    assert_matches_oracle(
        QUERIES["multimodal_metadata"](spark, SF_SMOKE),
        ORACLES["multimodal_metadata"],
        SF_SMOKE,
    )


@pytest.mark.slow
def test_metadata_oracle_parity_sf001(spark):
    assert_matches_oracle(
        QUERIES["multimodal_metadata"](spark, SF_ORACLE),
        ORACLES["multimodal_metadata"],
        SF_ORACLE,
    )


def test_media_payload_roundtrip(spark):
    """Binary payload survives the engine opaque: md5 of collected bytes
    equals md5 of the source text."""
    rows = media_table(spark, SF_SMOKE).limit(20).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(500).collect()
    }
    assert rows
    for r in rows:
        assert bytes(r.payload) == docs[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(bytes(r.payload))


def test_features_batch_shape_and_values(spark):
    """mapInPandas feature extraction: one feature row per media row,
    values reproducible from the payload bytes driver-side."""
    feats = {r.doc_id: r for r in QUERIES["multimodal_features"](spark, SF_SMOKE).collect()}
    media = {r.doc_id: bytes(r.payload) for r in media_table(spark, SF_SMOKE).collect()}
    assert set(feats) == set(media)
    import numpy as np

    for doc_id in list(media)[:25]:
        px = np.frombuffer(media[doc_id], dtype=np.uint8)
        f = feats[doc_id]
        assert f.n_bytes == len(px)
        assert f.max_byte == int(px.max())
        assert abs(f.mean_byte - float(px.mean())) < 1e-12
        assert (
            f.hist_0 + f.hist_1 + f.hist_2 + f.hist_3 == len(px)
        )


def test_real_decode_is_explicitly_stubbed():
    """The codec-less container must fail loudly, not fake-decode silently."""
    with pytest.raises(NotImplementedError):
        decode_image_batch([b"\x89PNG"])
