"""Multimodal plumbing: schema, actor stages, stubbed codec seam."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from bioner_ray.stages.multimodal import (
    ImageFeatureExtractor,
    MEDIA_SCHEMA,
    frame_sample_stage,
    image_feature_stage,
    make_media_fixture,
    payload_checksum_batch,
)


class TestFixture:
    def test_schema_and_determinism(self):
        a = make_media_fixture(8)
        b = make_media_fixture(8)
        assert a.schema.equals(MEDIA_SCHEMA)
        assert a.equals(b)


class TestImageFeatures:
    def test_stage_output(self):
        ds = rd.from_arrow(make_media_fixture(16))
        out = image_feature_stage(ds, concurrency=(1, 2), feature_dim=8).to_pandas()
        assert len(out) == 16
        assert all(len(f) == 8 for f in out.feature)
        # deterministic across runs
        out2 = image_feature_stage(
            rd.from_arrow(make_media_fixture(16)), concurrency=(1, 2), feature_dim=8
        ).to_pandas()
        np.testing.assert_allclose(
            np.stack(out.sort_values("media_id").feature.to_numpy()),
            np.stack(out2.sort_values("media_id").feature.to_numpy()),
        )

    def test_real_decoder_is_marked_unimplemented(self):
        with pytest.raises(NotImplementedError):
            ImageFeatureExtractor(decoder="real")
        with pytest.raises(ValueError):
            ImageFeatureExtractor(decoder="bogus")


class TestFrameSampler:
    def test_stride_sampling(self):
        ds = rd.from_arrow(make_media_fixture(6, kind="video"))
        out = frame_sample_stage(ds, stride=2, concurrency=(1, 2)).to_pandas()
        src = make_media_fixture(6, kind="video").to_pandas().set_index("media_id")
        for mid, grp in out.groupby("media_id"):
            nf = src.loc[mid].n_frames
            assert list(grp.frame_id) == list(range(0, nf, 2))
            w, h = src.loc[mid].width, src.loc[mid].height
            assert all(len(p) == w * h for p in grp.payload)


class TestChecksum:
    def test_opaque_bytes(self):
        tbl = make_media_fixture(4)
        out = payload_checksum_batch(tbl)
        assert out.column("n_bytes").to_pylist() == [len(p) for p in tbl.column("payload").to_pylist()]
