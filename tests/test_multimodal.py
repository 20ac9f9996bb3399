from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_spark.operators.multimodal import (
    _decode_media_real,
    attach_binary,
    decode_features,
    resize_payloads,
    sample_frames,
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


def test_resize_strided_sampling(spark):
    df = spark.createDataFrame(
        [(1, "x" * 250), (2, "short")], "doc_id long, text string"
    )
    out = {
        r.item_id: r
        for r in resize_payloads(
            attach_binary(df, "text", "doc_id", modality="image"), 100
        ).collect()
    }
    # long payload shrunk to exactly target_bytes; short passes through
    assert len(out[1].payload) == 100
    assert out[1].meta.orig_bytes == 250
    assert out[1].meta.target_bytes == 100
    assert bytes(out[2].payload) == b"short"
    # determinism: strided sample of a uniform payload stays uniform
    assert set(bytes(out[1].payload)) == {ord("x")}


def test_frame_sampling_fan_out(spark):
    # 250 bytes / 64-byte frames -> 4 frames total; every 2nd -> 0, 2
    df = spark.createDataFrame([(1, "a" * 250)], "doc_id long, text string")
    rows = (
        sample_frames(
            attach_binary(df, "text", "doc_id", modality="video"),
            frame_bytes=64,
            every_n=2,
        )
        .orderBy("frame_no")
        .collect()
    )
    assert [r.frame_no for r in rows] == [0, 2]
    assert all(r.n_frames_total == 4 for r in rows)
    assert [len(r.frame) for r in rows] == [64, 64]


def test_frame_sampling_short_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "")], "doc_id long, text string"
    )
    rows = sample_frames(
        attach_binary(df, "text", "doc_id"), frame_bytes=64, every_n=3
    ).collect()
    # sub-frame payload -> one partial frame; empty payload -> no rows
    assert len(rows) == 1
    assert rows[0].item_id == 1 and len(rows[0].frame) == 4


def test_perceptual_hash_deterministic_and_locality(spark):
    from cdc_spark.operators.dedup import simhash_pairs
    from cdc_spark.operators.multimodal import perceptual_hash

    base = "the quick brown fox jumps over the lazy dog " * 8
    tweaked = base.replace("lazy", "hazy")  # small byte-level edit
    other = "completely different content with other words " * 8
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, tweaked), (4, other)],
        "doc_id long, text string",
    )
    hashed = perceptual_hash(attach_binary(df, "text", "doc_id", "image"))
    by_id = {r.item_id: r.simhash for r in hashed.collect()}
    # identical payloads hash identically
    assert by_id[1] == by_id[2]
    # a small edit stays within a few bits; unrelated content doesn't
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(by_id[1], by_id[3]) <= 12
    assert ham(by_id[1], by_id[4]) > 12
    # the banded pair join surfaces exactly the near pairs
    pairs = simhash_pairs(
        hashed, "item_id", bits=64, bands=4, max_hamming=12
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got and (1, 3) in got
    assert not any(4 in p for p in got)


def test_perceptual_hash_empty_payload(spark):
    from cdc_spark.operators.multimodal import perceptual_hash

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rows = perceptual_hash(
        attach_binary(df, "text", "doc_id", "image")
    ).collect()
    assert rows[0].simhash == 0


def test_frame_energy_exact_and_short_payloads(spark):
    from cdc_spark.operators.multimodal import attach_binary, frame_energy

    rows = [
        (1, "a" * 130),   # 2 full 64-byte frames, 2 bytes dropped
        (2, "b" * 63),    # shorter than one frame: no row
        (3, ""),          # empty: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.item_id: r
        for r in frame_energy(
            attach_binary(df, "text", "doc_id"), window=64
        ).collect()
    }
    assert set(out) == {1}
    r = out[1]
    # 'a' = 97 -> (97-128)^2 = 961 per sample, 64 samples per frame
    assert r.n_windows == 2
    assert r.peak_energy == 961 * 64
    assert r.total_energy == 2 * 961 * 64
    assert r.peak_idx == 0  # tie between frames -> first


def test_frame_energy_peak_localization(spark):
    from cdc_spark.operators.multimodal import attach_binary, frame_energy

    # frame 0 quiet ('~'=126, energy 4/sample), frame 1 loud ('a'=97)
    text = "~" * 64 + "a" * 64
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = frame_energy(
        attach_binary(df, "text", "doc_id"), window=64
    ).first()
    assert r.peak_idx == 1
    assert r.peak_energy == 961 * 64
    assert r.total_energy == 4 * 64 + 961 * 64
