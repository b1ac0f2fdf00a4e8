"""Multimodal plumbing: binary columns, Arrow-batched feature
extraction (stubbed decode), frame-sampling fanout."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sources.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).cache()


def test_feature_extraction_shapes(spark, media):
    out = extract_image_features(media)
    rows = out.collect()
    assert len(rows) == 48
    for r in rows:
        assert 64 <= r.width < 256
        assert 64 <= r.height < 256
        assert r.channels in (1, 3)
        assert len(r.content_digest) == 16


def test_feature_extraction_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height, r.channels, r.content_digest)
         for r in extract_image_features(media).collect()}
    b = {r.media_id: (r.width, r.height, r.channels, r.content_digest)
         for r in extract_image_features(media).collect()}
    assert a == b


def test_pil_decoder_gated(spark, media):
    """Real decoder is stubbed in this container: either Pillow imports
    (and the call proceeds) or a clear NotImplementedError names it."""
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            extract_image_features(media, decoder="pil")


def test_frame_sampling_fanout(spark, media):
    frames = frame_sample_plan(media, every_n=30)
    rows = frames.collect()
    assert len(rows) > 0
    vids = media.filter(F.col("media_type") == "video").count()
    assert len({r.media_id for r in rows}) == vids
    assert all(r.frame_idx % 30 == 0 for r in rows)


def test_metadata_filter_prunes_before_decode(spark, media):
    """Metadata-only filter then decode — the plan should read/decode
    only matching rows (count proves the filter happened upstream)."""
    out = extract_image_features(media.filter(F.col("media_type") == "image"))
    assert out.count() == media.filter(F.col("media_type") == "image").count()


def test_resize_images_batch_shape(spark):
    from smartbots_etl_facturas_spark.sources.multimodal import resize_images, synthetic_media

    out = resize_images(synthetic_media(spark, 12), width=64, height=64).collect()
    assert len(out) == 12
    for r in out:
        assert r.out_width == 64 and r.out_height == 64
        assert len(r.resized) == 64 * 64 // 64
    # deterministic: same payload → same resized bytes
    again = resize_images(synthetic_media(spark, 12), width=64, height=64).collect()
    assert [bytes(r.resized) for r in out] == [bytes(r.resized) for r in again]


def test_extract_audio_features(spark):
    from smartbots_etl_facturas_spark.sources.multimodal import (
        extract_audio_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 12)
    out = {r.media_id: r for r in extract_audio_features(media).collect()}
    n_audio = media.filter("media_type = 'audio'").count()
    assert len(out) == n_audio > 0
    for r in out.values():
        assert r.n_samples > 0 and r.duration_s == r.n_samples / 16000
        assert r.rms > 0
