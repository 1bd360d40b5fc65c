"""sessionize / top_k_per_group / dup_span_stats: golden values and
brute-force equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.rank import top_k_per_group
from bioner_ray.stages.spans import dup_span_stats
from bioner_ray.stages.window import sessionize


class TestSessionize:
    def test_golden_gaps(self):
        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60_000_000, "us")  # one minute
        ev = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 9, 9], type=pa.int64()),
                # user 7: t0, +10m, +50m (gap>30m → new), +55m; user 9: t0, +31m (new)
                "ts": pa.array(
                    [base, base + 10 * m, base + 60 * m, base + 65 * m, base, base + 31 * m]
                ),
            }
        )
        out = (
            sessionize(rd.from_arrow(ev), gap_seconds=1800)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        assert out["session_id"].tolist() == [0, 0, 1, 1, 0, 1]

    def test_tie_on_timestamp_breaks_by_id(self):
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ev = pa.table(
            {
                "event_id": pa.array([5, 3], type=pa.int64()),
                "user_id": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([base, base]),
            }
        )
        out = sessionize(rd.from_arrow(ev)).to_pandas().set_index("event_id")
        assert out.loc[3, "session_id"] == 0 and out.loc[5, "session_id"] == 0


class TestTopKPerGroup:
    def test_matches_pandas_rank(self):
        rng = np.random.default_rng(3)
        n = 500
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 40, size=n),
                "v": rng.integers(0, 1000, size=n),
                "id": np.arange(n),
            }
        )
        got = (
            top_k_per_group(
                rd.from_pandas(df).repartition(7),
                key_col="g",
                order_by=[("v", "descending"), ("id", "ascending")],
                k=3,
            )
            .to_pandas()
            .sort_values(["g", "rk"], ignore_index=True)
        )
        want = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        want["rk"] = want.groupby("g").cumcount() + 1
        want = want[want["rk"] <= 3].sort_values(["g", "rk"], ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["g", "v", "id", "rk"]].astype(np.int64), want.astype(np.int64)
        )

    def test_block_local_prune_is_lossless(self):
        # adversarial layout: each block holds one group's WORST rows,
        # global top-k spread across blocks
        df = pd.DataFrame({"g": [0] * 12, "v": list(range(12)), "id": list(range(12))})
        got = top_k_per_group(
            rd.from_pandas(df).repartition(6),
            key_col="g",
            order_by=[("v", "descending"), ("id", "ascending")],
            k=2,
        ).to_pandas()
        assert sorted(got["v"]) == [10, 11]


class TestDupSpanStats:
    def test_planted_boilerplate(self):
        boiler = "all rights reserved by the site owner today"  # 8 tokens
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": [
                    boiler + " unique alpha beta gamma",
                    boiler + " other delta epsilon zeta",
                    "completely different words with no overlap here at all",
                    "tiny",  # < w tokens → no output row
                ],
            }
        )
        out = (
            dup_span_stats(rd.from_arrow(docs), w=5)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [0, 1, 2]
        # docs 0/1 share exactly the 4 windows inside the 8-token boilerplate
        assert out.loc[0, "n_dup"] == 4 and out.loc[1, "n_dup"] == 4
        assert out.loc[2, "n_dup"] == 0 and out.loc[2, "dup_frac"] == 0.0
        assert out.loc[0, "dup_frac"] == 4 / out.loc[0, "n_windows"]

    def test_repeated_window_within_one_doc_not_cross_dup(self):
        docs = pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": ["a b c d e a b c d e"],  # window repeats, one doc
            }
        )
        out = dup_span_stats(rd.from_arrow(docs), w=5).to_pandas()
        assert out.loc[0, "n_dup"] == 0
