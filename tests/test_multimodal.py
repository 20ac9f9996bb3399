from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_spark.operators.multimodal import (
    _decode_media_real,
    attach_binary,
    decode_features,
)


def test_attach_binary_schema(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    out = attach_binary(df, "text", "doc_id")
    assert [f.name for f in out.schema.fields] == ["item_id", "payload", "meta"]
    row = out.first()
    assert bytes(row.payload) == b"hello"
    assert row.meta.modality == "text"
    assert row.meta.n_chars == 5


def test_decode_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "")], "doc_id long, text string"
    )
    feats = {
        r.item_id: r
        for r in decode_features(attach_binary(df, "text", "doc_id")).collect()
    }
    assert feats[1].n_bytes == 3
    assert feats[1].header_sum == ord("a") + ord("b") + ord("c")
    assert feats[1].byte_mean == round((97 + 98 + 99) / 3, 4)
    assert feats[2].n_bytes == 0 and feats[2].header_sum == 0


def test_real_decode_seam_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_media_real(b"\x89PNG", "image")
