"""Multimodal plumbing: Arrow-batched featurization and metadata-only
frame planning (decode itself is a documented stub)."""

from __future__ import annotations

import pytest

from etl_process_for_fraud_transactions_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    return M.make_asset_table(spark, n=12)


def test_extract_features_shape(spark, assets):
    feats = M.extract_features(assets).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.feature) == M.FEATURE_DIM
        assert r.n_bytes == 100 + r.asset_id
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram


def test_extract_features_deterministic(spark, assets):
    a = sorted((r.asset_id, tuple(r.feature)) for r in M.extract_features(assets).collect())
    b = sorted((r.asset_id, tuple(r.feature)) for r in M.extract_features(assets).collect())
    assert a == b


def test_frame_sample_plan_counts(spark, assets):
    plan = M.frame_sample_plan(assets, every_ms=1000).collect()
    by_asset = {}
    for r in plan:
        by_asset.setdefault(r.asset_id, []).append(r.frame_ts_ms)
    # only video assets planned (ids % 3 == 2), frames every second
    assert set(by_asset) == {2, 5, 8, 11}
    assert by_asset[2] == list(range(0, 7000, 1000))  # duration 5000+2000


def test_resize_images(spark, assets):
    from etl_process_for_fraud_transactions_spark.operators.multimodal import (
        resize_images,
    )

    out = resize_images(assets, width=8, height=4).collect()
    n_images = assets.filter("modality = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert len(r.payload) == 8 * 4
        assert (r.meta.width, r.meta.height) == (8, 4)
    # deterministic: same input -> same bytes
    again = {r.asset_id: bytes(r.payload) for r in resize_images(assets, 8, 4).collect()}
    assert {r.asset_id: bytes(r.payload) for r in out} == again
