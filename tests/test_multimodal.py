"""Multimodal plumbing: binary round-trips through Arrow, stub seams."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import multimodal as M
from tests.conftest import SF_SMOKE


def _media(spark):
    from kinesis_stream_consumer_spark.plans.queries import _t

    docs = _t(spark, SF_SMOKE, "documents").limit(50)
    return M.as_media(docs, "doc_id", F.col("text"), "image/fake")


def test_resize_binary_roundtrip(spark):
    media = _media(spark)
    out = M.resize_images(media, 224, 224)
    rows = out.collect()
    assert len(rows) == 50
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        assert (r["width"], r["height"]) == (224, 224)
        expect = hashlib.sha256(src[r["media_id"]] + b"|224x224").digest()
        assert bytes(r["payload"]) == expect  # binary survived Arrow intact
        assert r["n_bytes"] == len(expect)


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")
