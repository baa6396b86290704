"""Multimodal plumbing tests: binary payload columns through Arrow
batch stages (decode stubbed, contract real)."""

from __future__ import annotations

import pytest

from jobsity_data_pipeline_spark.operators import multimodal as MM
from jobsity_data_pipeline_spark.session import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    return MM.media_from_documents(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "mime", "payload", "width", "height", "duration_ms"
    ]
    assert dict(media.dtypes)["payload"] == "binary"


def test_extract_features_deterministic(media):
    feats = MM.extract_features(media, feat_dim=8)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == media.count()
    r0 = rows[0]
    assert len(r0.feat) == 8
    assert all(0.0 <= x < 1.0 for x in r0.feat)
    assert len(r0.sha) == 64
    # deterministic: same payload -> same sha/feat on recompute
    again = {r.media_id: r for r in MM.extract_features(media, feat_dim=8).collect()}
    assert again[0].sha == r0.sha
    assert list(again[0].feat) == list(r0.feat)


def test_resize_clamps_metadata(media):
    out = MM.resize_images(media, max_px=64)
    assert out.dtypes == media.dtypes
    got = out.agg({"width": "max", "height": "max"}).first()
    assert got[0] <= 64 and got[1] <= 64


def test_frame_sample_grid(media):
    frames = MM.frame_sample(media, every_ms=1000)
    got = frames.collect()
    assert all(r.ts_ms == r.frame_idx * 1000 for r in got)
    # only video rows produce frames
    vids = {r.media_id for r in media.where("kind = 'video'").collect()}
    assert {r.media_id for r in got} <= vids


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"bytes", "image/png")


def test_media_dedup_accounting(spark):
    from jobsity_data_pipeline_spark.operators.multimodal import media_dedup
    from tests.conftest import SF_SMOKE

    rows = media_dedup(spark, SF_SMOKE).collect()
    kinds = {r.kind for r in rows}
    assert kinds <= {"image", "audio", "video"} and kinds
    for r in rows:
        assert r.n_unique <= r.n_media
        assert r.n_dup_copies == r.n_media - r.n_unique
        assert r.bytes_saved <= r.bytes_total
        if r.n_dup_copies == 0:
            assert r.bytes_saved == 0
