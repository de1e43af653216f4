"""Multimodal binary-column plumbing: schemas, batch shapes, determinism."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from paas_auditor_spark.functions import multimodal
from paas_auditor_spark.sources import bootstrap


@pytest.fixture(scope="module")
def blobs_df(spark):
    rows = [(i, bytes([i] * (10 + i))) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_binary_features_len_and_hash(blobs_df):
    out = {r["doc_id"]: r for r in multimodal.binary_features(blobs_df).collect()}
    assert len(out) == 5
    for i in range(5):
        blob = bytes([i] * (10 + i))
        assert out[i]["byte_len"] == len(blob)
        assert out[i]["sha256_hex"] == hashlib.sha256(blob).hexdigest()


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_image_meta_deterministic(blobs_df):
    a = multimodal.image_meta_features(blobs_df).collect()
    b = multimodal.image_meta_features(blobs_df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(1 <= r["width"] <= 64 and 1 <= r["height"] <= 64 for r in a)


def test_resize_output_shape(blobs_df):
    out = multimodal.resize_images(blobs_df, target_w=8, target_h=4).collect()
    assert len(out) == 5
    assert all(len(r["resized"]) == 32 for r in out)
    assert all((r["width"], r["height"]) == (8, 4) for r in out)


def test_sample_frames_fanout_and_determinism(blobs_df):
    frames = multimodal.sample_frames(blobs_df, n_frames=3)
    out = frames.collect()
    assert len(out) == 15  # 5 docs x 3 frames
    per_doc = frames.groupBy("doc_id").agg(
        F.countDistinct("frame_idx").alias("n")
    ).collect()
    assert all(r["n"] == 3 for r in per_doc)
    # deterministic fake decode: same (blob, idx) -> same frame bytes
    one = [r for r in out if r["doc_id"] == 0 and r["frame_idx"] == 0][0]
    expect = hashlib.sha256(bytes([0] * 10) + (0).to_bytes(4, "big")).digest()
    assert bytes(one["frame"]) == expect


def test_bootstrap_idempotent(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    paths = bootstrap.init_warehouse(spark, wh)
    events = bootstrap.read_table(spark, wh, bootstrap.EVENTS_TABLE)
    cursors = bootstrap.read_table(spark, wh, bootstrap.CURSORS_TABLE)
    assert events.count() == 0 and cursors.count() == 0
    assert "guid" in events.columns and "name" in cursors.columns
    # re-init is a no-op and keeps any data written in between
    events_path = paths[bootstrap.EVENTS_TABLE]
    spark.createDataFrame(
        [("g1",)], "guid string"
    ).createOrReplaceTempView("probe")  # unrelated view, no write
    bootstrap.init_warehouse(spark, wh)
    assert bootstrap.read_table(spark, wh, bootstrap.EVENTS_TABLE).count() == 0
    assert events_path.endswith(bootstrap.EVENTS_TABLE)
