"""Multimodal suite: binary-column plumbing, pack→decode round-trip,
resize / frame-sampling / audio-feature mapInPandas stages."""

import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.functions.multimodal import (
    audio_features,
    decode_image_real,
    decode_media,
    pack_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, documents):
    return pack_fake_media(documents.limit(200)).cache()


def test_pack_schema_and_binary(media):
    assert dict(media.dtypes)["media"] == "binary"
    assert media.count() == 200
    kinds = {r["media_type"] for r in
             media.select("media_type").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}
    assert len(kinds) >= 2  # hash spreads modalities


def test_decode_round_trips_metadata(media):
    dec = decode_media(media)
    joined = dec.alias("d").join(media.alias("m"), "doc_id")
    # decoded geometry (parsed from bytes) == packed metadata columns
    bad = joined.filter(
        (F.col("d.media_type") != F.col("m.media_type"))
        | ((F.col("d.media_type") == "image")
           & ((F.col("d.width") != F.col("m.width"))
              | (F.col("d.height") != F.col("m.height"))))
        | ((F.col("d.media_type") == "audio")
           & (F.col("d.sample_rate") != F.col("m.sample_rate")))
        | ((F.col("d.media_type") == "video")
           & (F.col("d.n_frames") != F.col("m.n_frames")))
    ).count()
    assert bad == 0
    stats = dec.agg(F.min("mean_byte"), F.max("mean_byte")).first()
    assert 0.0 <= stats[0] and stats[1] <= 255.0


def test_undecodable_blob_dropped(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTAMEDIA...")), (2, bytearray(b"FIMG" + b"\x00" * 8))],
        "doc_id long, media binary")
    out = decode_media(df).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_resize_images(media):
    resized = resize_images(media, 32, 24)
    imgs = decode_media(resized).filter(F.col("media_type") == "image")
    geo = imgs.select("width", "height").distinct().collect()
    assert [(r["width"], r["height"]) for r in geo] == [(32, 24)]
    # non-image rows untouched
    before = media.filter(F.col("media_type") != "image").count()
    after = resized.filter(F.col("media_type") != "image").count()
    assert before == after


def test_sample_frames(media):
    frames = sample_frames(media, every_k=25)
    vids = decode_media(media).filter(F.col("media_type") == "video") \
        .select("doc_id", "n_frames")
    joined = frames.groupBy("doc_id").agg(
        F.count("*").alias("got"), F.max("frame_idx").alias("max_idx")
    ).join(vids, "doc_id")
    for r in joined.collect():
        expect = (r["n_frames"] + 24) // 25
        assert r["got"] == expect
        assert r["max_idx"] < r["n_frames"]
    assert joined.count() == vids.count()


def test_audio_features(media):
    feats = audio_features(media)
    n_audio = media.filter(F.col("media_type") == "audio").count()
    assert feats.count() == n_audio
    row = feats.first()
    assert row["duration_s"] == pytest.approx(
        row["n_samples"] / row["sample_rate"])
    assert row["rms"] > 0


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_image_real(media)
