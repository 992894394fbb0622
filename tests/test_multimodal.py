import pytest

from sema_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    sample_frames,
    synthetic_media,
)


def test_decode_features_shape_and_determinism(spark):
    media = synthetic_media(spark, 12)
    feats = decode_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    again = {r.media_id: r.feature for r in decode_features(media).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature


def test_decode_strict_raises(spark):
    media = synthetic_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_features(media, strict=True).collect()


def test_sample_frames_fanout(spark):
    media = synthetic_media(spark, 12)
    frames = sample_frames(media, every_ms=1000).collect()
    vids = media.filter("kind = 'video'").count()
    assert vids > 0
    # duration 3500ms → 3 frames each
    assert len(frames) == vids * 3
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for rows in by_media.values():
        assert sorted(r.frame_idx for r in rows) == [0, 1, 2]
        assert sorted(r.ts_ms for r in rows) == [0, 1000, 2000]
        assert all(len(r.frame_bytes) == 32 for r in rows)
