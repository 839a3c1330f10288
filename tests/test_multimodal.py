"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

from __future__ import annotations

import pytest

from youtube_analytics_lakehouse_databricks_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", mm.encode_synth_image(8, 4, seed=1), ("s3://bucket/a.img", 40, "synth")),
        (2, "image", mm.encode_synth_image(16, 16, seed=2), ("s3://bucket/b.img", 264, "synth")),
        (3, "audio", b"\x00\x01", ("s3://bucket/c.wav", 2, "wav")),
        (4, "image", None, ("s3://bucket/d.img", 0, "synth")),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)


def test_extract_image_features(media_df):
    feats = {r["media_id"]: r for r in mm.extract_image_features(media_df).collect()}
    # audio and NULL-content rows excluded; schema/typing exact
    assert set(feats) == {1, 2}
    f1 = feats[1]
    assert (f1["width"], f1["height"], f1["n_pixels"]) == (8, 4, 32)
    # deterministic fake decode: recompute expected mean in plain python
    px = [(x * 31 + y * 7 + 1) % 256 for y in range(4) for x in range(8)]
    assert abs(f1["mean_intensity"] - sum(px) / len(px)) < 1e-9
    assert f1["max_intensity"] == max(px)


def test_resize_images_roundtrip(media_df, spark):
    resized = mm.resize_images(media_df, 4, 4)
    out = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    assert set(out) == {1, 2}
    w, h, px = mm._decode_synth(out[1])
    assert (w, h) == (4, 4) and len(px) == 16
    # resized content itself decodes through the feature extractor
    df2 = spark.createDataFrame(
        [(9, "image", out[2], None)], mm.MEDIA_SCHEMA
    )
    feats = mm.extract_image_features(df2).collect()[0]
    assert (feats["width"], feats["height"]) == (4, 4)


def test_extract_audio_features(spark):
    import math

    samples = [0, 1000, -1000, 1000, -1000, 0, 500, -500]
    rows = [
        (10, "audio", mm.encode_synth_audio(8000, samples), None),
        (11, "image", mm.encode_synth_image(2, 2), None),  # excluded
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_audio_features(df).collect()}
    assert set(feats) == {10}
    f = feats[10]
    assert f["n_samples"] == 8
    assert abs(f["duration_s"] - 8 / 8000) < 1e-12
    assert f["peak"] == 1000
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(f["rms"] - expected_rms) < 1e-9


def test_sample_video_frames(spark):
    video = mm.encode_synth_video(4, 2, n_frames=7, seed=3)
    rows = [
        (20, "video", video, None),
        (21, "image", mm.encode_synth_image(2, 2), None),  # excluded
        (22, "video", None, None),  # NULL content skipped
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)
    frames = {r["frame_idx"]: r for r in mm.sample_video_frames(df, every_n=3).collect()}
    # every 3rd frame of 7, frame 0 always included
    assert sorted(frames) == [0, 3, 6]
    f3 = frames[3]
    assert (f3["media_id"], f3["n_frames"], f3["width"], f3["height"]) == (20, 7, 4, 2)
    px = [(x * 31 + y * 7 + 3 * 13 + 3) % 256 for y in range(2) for x in range(4)]
    assert abs(f3["mean_intensity"] - sum(px) / len(px)) < 1e-9
    # sampled frames compose with the image operators downstream
    frames_df = mm.sample_video_frames(df, every_n=3).select(
        (mm.F.col("media_id") * 100 + mm.F.col("frame_idx")).alias("media_id"),
        mm.F.lit("image").alias("media_type"),
        mm.F.col("frame_content").alias("content"),
        mm.F.lit(None).cast(mm.MEDIA_SCHEMA["meta"].dataType).alias("meta"),
    )
    feats = mm.extract_image_features(frames_df).collect()
    assert {r["media_id"] for r in feats} == {2000, 2003, 2006}
    assert all((r["width"], r["height"]) == (4, 2) for r in feats)


def test_real_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_real_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.decode_real_audio(b"RIFF")
    with pytest.raises(NotImplementedError):
        mm.decode_real_video(b"\x00\x00\x00 ftyp")
