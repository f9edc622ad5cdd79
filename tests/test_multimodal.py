"""Multimodal plumbing tests: binary columns + typed metadata through
mapInPandas — schema, batching, one-to-many expansion, null/corrupt
handling. Decode kernels are the documented deterministic stubs."""

from __future__ import annotations

from pyspark.sql import functions as F

from orderly_spark.operators import multimodal as MM


def media_df(spark):
    rows = [
        (1, MM.fake_media_bytes("image", 640, 480, 1, 0, b"x" * 100)),
        (2, MM.fake_media_bytes("video", 320, 240, 10, 0, b"f" * 100)),
        (3, MM.fake_media_bytes("audio", 0, 0, 1, 16000, b"a" * 50)),
        (4, b"not-a-container"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "media_id int, content binary")


def test_decode_media_meta(spark):
    out = MM.decode_media_meta(media_df(spark))
    got = {r.media_id: r.media_meta for r in out.collect()}
    assert got[1].media_type == "image" and got[1].width == 640 and got[1].valid
    assert got[2].n_frames == 10
    assert got[3].sample_rate == 16000
    assert got[4].valid is False and got[4].n_bytes == 15
    assert got[5].valid is False and got[5].n_bytes is None
    # schema append, original columns intact
    assert out.columns == ["media_id", "content", "media_meta"]


def test_media_embedding_deterministic_normalised(spark):
    df = media_df(spark)
    out = df.select("media_id", MM.media_embedding(F.col("content"), 16).alias("e"))
    got = {r.media_id: r.e for r in out.collect()}
    assert len(got[1]) == 16
    assert got[5] is None
    s = sum(v * v for v in got[1])
    assert abs(s - 1.0) < 1e-5  # unit-normalised
    # determinism across recompute + repartition
    again = {
        r.media_id: r.e
        for r in df.repartition(3)
        .select("media_id", MM.media_embedding(F.col("content"), 16).alias("e"))
        .collect()
    }
    assert again[2] == got[2]


def test_sample_frames_one_to_many(spark):
    out = MM.sample_frames(media_df(spark), every_n=3)
    rows = [(r.media_id, r.frame_index) for r in out.collect()]
    # only the 10-frame video expands: frames 0,3,6,9; image/audio have
    # n_frames=1 → frame 0; corrupt/null dropped
    assert sorted(rows) == [(1, 0), (2, 0), (2, 3), (2, 6), (2, 9), (3, 0)]
    assert out.columns == ["media_id", "frame_index", "frame_ref"]
    v = {(r.media_id, r.frame_index): bytes(r.frame_ref) for r in out.collect()}
    assert v[(2, 3)] == b"f" * 10  # byte-range addressing: 100B/10 frames


def test_resize_images_stub(spark):
    out = MM.resize_images(media_df(spark), 320, 240)
    meta = MM.decode_media_meta(out)
    got = {r.media_id: r.media_meta for r in meta.collect()}
    assert (got[1].width, got[1].height) == (320, 240)
    # non-images pass through untouched
    assert (got[2].width, got[2].height) == (320, 240) or got[2].media_type == "video"
    assert got[2].media_type == "video" and got[2].width == 320
    assert got[4].valid is False


def test_resize_non_image_passthrough(spark):
    df = media_df(spark)
    before = {r.media_id: (bytes(r.content) if r.content is not None else None) for r in df.collect()}
    out = MM.resize_images(df, 10, 10)
    after = {r.media_id: (bytes(r.content) if r.content is not None else None) for r in out.collect()}
    assert after[2] == before[2]  # video unchanged
    assert after[3] == before[3]  # audio unchanged
    assert after[4] == before[4] and after[5] is None
