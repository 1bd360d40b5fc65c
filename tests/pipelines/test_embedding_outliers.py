"""Per-label centroid-distance outlier screen (embedding_outliers):
hand-checked micromark arithmetic on a crafted table plus the
testdata-backed shape contract."""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_sf(rows) -> str:
    d = os.path.join("/tmp/bioner_emb_outliers", uuid.uuid4().hex)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "label": pa.array([r[1] for r in rows], type=pa.int32()),
            "embedding": pa.array([r[2] for r in rows], type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingOutliers:
    def test_hand_checked(self):
        from bioner_ray.pipelines.corpus import embedding_outliers

        sf = _write_sf(
            [
                (1, 0, [0.0, 0.0]),
                (2, 0, [0.0, 0.0]),
                (3, 0, [6.0, 0.0]),  # centroid (2e6, 0); d2 = (4e6)^2
                (10, 1, [1.0, 1.0]),
            ]
        )
        df = embedding_outliers(sf, topk=1).to_pandas().set_index("label")
        assert df.loc[0, "vec_id"] == 3
        assert df.loc[0, "d2"] == (4_000_000) ** 2
        # a single-member label is its own centroid at distance 0
        assert df.loc[1, "vec_id"] == 10 and df.loc[1, "d2"] == 0

    def test_tie_breaks_to_smallest_vec_id(self):
        from bioner_ray.pipelines.corpus import embedding_outliers

        sf = _write_sf(
            [(1, 0, [1.0]), (2, 0, [-1.0]), (3, 0, [1.0])]
        )  # centroid floor(1e6/3)=333333; ids 1 and 3 tie on d2
        df = embedding_outliers(sf, topk=2).to_pandas().sort_values("rk")
        assert list(df["vec_id"]) == [2, 1]  # -1.0 is farthest, then id 1 beats 3

    def test_testdata_shape(self):
        from bioner_ray.pipelines.corpus import embedding_outliers

        df = embedding_outliers("/root/testdata/sf0.001").to_pandas()
        assert set(df.columns) == {"label", "vec_id", "d2", "rk"}
        assert df.groupby("label")["rk"].max().le(5).all()
        assert (df["d2"] >= 0).all()
