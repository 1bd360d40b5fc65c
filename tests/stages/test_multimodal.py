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


class TestAutoDecoders:
    """The REAL codec tier: auto decoders parse genuine byte formats
    (PGM/PPM/BMP, WAV, Y4M) through the same actor-pool stages."""

    @pytest.mark.parametrize("codec", ["pgm", "ppm", "bmp"])
    def test_image_auto_decodes_real_formats(self, codec):
        from bioner_ray.functions.codecs import decode_image

        tbl = make_media_fixture(8, codec=codec)
        ds = rd.from_arrow(tbl)
        out = image_feature_stage(ds, decoder="auto", concurrency=(1, 2)).to_pandas()
        assert len(out) == 8
        # decoded dims come from the payload, and must equal the fixture metadata
        src = tbl.to_pandas().set_index("media_id")
        for _, r in out.iterrows():
            assert r.decoded_width == src.loc[r.media_id].width
            assert r.decoded_height == src.loc[r.media_id].height
        # the auto feature differs from fake on the same table UNLESS the
        # decoded gray equals the raw byte reshape (only true for pgm,
        # whose raster IS the pixels)
        direct = ImageFeatureExtractor(decoder="auto")(tbl.slice(0, 1))
        gray = decode_image(tbl.column("payload")[0].as_py())
        assert gray.shape == (
            src.iloc[0].height,
            src.iloc[0].width,
        )
        assert len(direct.column("feature")[0]) == 16

    def test_image_auto_rejects_junk(self):
        with pytest.raises(Exception, match="unsupported image payload"):
            ImageFeatureExtractor(decoder="auto")(make_media_fixture(1, codec="raw"))

    def test_audio_auto_decodes_wav(self):
        from bioner_ray.stages.multimodal import AudioFeatureExtractor, audio_feature_stage

        tbl = make_media_fixture(6, kind="audio", codec="wav", seed=5)
        out = audio_feature_stage(
            rd.from_arrow(tbl), decoder="auto", window=64, concurrency=(1, 2)
        ).to_pandas()
        assert len(out) == 6
        assert (out.n_windows > 0).all()
        # mono averaging + /32768 scaling: recompute row 0 by hand
        from bioner_ray.functions.codecs import decode_wav

        samples, _ = decode_wav(tbl.column("payload")[0].as_py())
        wave = (samples.astype(np.float32) / 32768.0).mean(axis=1)
        n = len(wave) // 64
        want_rms = np.sqrt((wave[: n * 64].reshape(n, 64) ** 2).mean(axis=1))
        got = out.set_index("media_id").loc[0]
        np.testing.assert_allclose(np.array(got.rms), want_rms, rtol=1e-6)

    def test_frame_sampler_auto_chains_into_image_stage(self):
        # Y4M video → sampled PGM frames → auto image features: the
        # composed real-codec path
        from bioner_ray.functions.codecs import decode_y4m

        tbl = make_media_fixture(4, kind="video", codec="y4m", seed=9)
        frames_ds = frame_sample_stage(
            rd.from_arrow(tbl), decoder="auto", stride=2, concurrency=(1, 2)
        )
        frames = frames_ds.to_pandas()
        src = tbl.to_pandas().set_index("media_id")
        for mid, grp in frames.groupby("media_id"):
            vid = decode_y4m(src.loc[mid].payload)
            assert list(grp.frame_id) == list(range(0, len(vid), 2))
            assert all(p.startswith(b"P5") for p in grp.payload)
        feats = image_feature_stage(
            frames_ds, decoder="auto", concurrency=(1, 2)
        ).to_pandas()
        assert len(feats) == len(frames)

    def test_pil_seam_still_gated(self):
        with pytest.raises(NotImplementedError, match="STUB"):
            ImageFeatureExtractor(decoder="pil")


class TestChecksum:
    def test_opaque_bytes(self):
        tbl = make_media_fixture(4)
        out = payload_checksum_batch(tbl)
        assert out.column("n_bytes").to_pylist() == [len(p) for p in tbl.column("payload").to_pylist()]


class TestAudioFeatures:
    def test_windowed_features_deterministic(self):
        from bioner_ray.stages.multimodal import (
            AudioFeatureExtractor,
            audio_feature_stage,
            make_media_fixture,
        )
        import ray.data as rd

        tbl = make_media_fixture(n=8, kind="audio", seed=3)
        out = {r["media_id"]: r for r in audio_feature_stage(rd.from_arrow(tbl), window=64).take_all()}
        assert len(out) == 8
        for mid, r in out.items():
            assert r["n_windows"] == len(r["rms"]) == len(r["zcr"])
            assert all(0.0 <= z <= 1.0 for z in r["zcr"])
        # same payload → same features
        direct = AudioFeatureExtractor(window=64)(tbl.slice(0, 1))
        assert direct.column("rms").to_pylist()[0] == out[0]["rms"]

    def test_real_decoder_is_gated(self):
        from bioner_ray.stages.multimodal import AudioFeatureExtractor
        import pytest

        with pytest.raises(NotImplementedError):
            AudioFeatureExtractor(decoder="real")

    def test_empty_payload(self):
        from bioner_ray.stages.multimodal import AudioFeatureExtractor
        import pyarrow as pa

        t = pa.table({"media_id": pa.array([1], type=pa.int64()),
                      "payload": pa.array([b""], type=pa.binary())})
        out = AudioFeatureExtractor(window=64)(t)
        assert out.column("n_windows").to_pylist() == [0]
