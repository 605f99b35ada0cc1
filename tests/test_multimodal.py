"""Multimodal plumbing tests: schema contracts, Arrow batch iteration,
row-expanding frame sampling, determinism of the fake backend, and the
NotImplementedError gate on the real backend."""

from __future__ import annotations

import pytest

from nosql_based_business_intelligence_system_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=30).cache()


def test_decode_images_schema_and_counts(spark, media):
    out = M.decode_images(media)
    assert out.schema == M.DECODED_IMAGE_SCHEMA
    n_images = media.filter("kind = 'image'").count()
    rows = out.collect()
    assert len(rows) == n_images
    for r in rows:
        assert len(r.features) == M.FEATURE_DIM
        assert 16 <= r.dec_width < 16 + 1024
        assert r.n_channels == 3


def test_decode_is_deterministic(spark, media):
    a = {r.media_id: r.features for r in M.decode_images(media).collect()}
    b = {r.media_id: r.features for r in M.decode_images(media).collect()}
    assert a == b


def test_frame_sampling_expands_rows(spark, media):
    frames = M.sample_video_frames(media, every_ms=1000, max_frames=8)
    vids = {r.media_id: r.duration_ms for r in media.filter("kind = 'video'").collect()}
    got = frames.groupBy("media_id").count().collect()
    assert {r.media_id for r in got} == set(vids)
    for r in got:
        expected = min(8, max(vids[r.media_id] // 1000, 1))
        assert r["count"] == expected
    # frame payloads are distinct per (media, index)
    assert frames.count() == frames.select("media_id", "frame_index").distinct().count()


def test_audio_features_window_counts(spark, media):
    out = M.extract_audio_features(media, window_ms=25)
    durs = {r.media_id: r.duration_ms for r in media.filter("kind = 'audio'").collect()}
    for r in out.collect():
        assert r.n_windows == max(durs[r.media_id] // 25, 1)
        assert len(r.mfcc_like) == M.FEATURE_DIM


def test_real_backend_gated_not_import_error(spark, media):
    with pytest.raises(Exception) as ei:
        M.decode_images(media, decode_backend=M.real_decode_image).collect()
    # the failure must be the explicit NotImplementedError gate, raised at
    # call time inside the executor (surfaces as PythonException wrapping it)
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_narrow_no_shuffle(spark, media):
    plan = M.decode_images(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas must stay narrow
