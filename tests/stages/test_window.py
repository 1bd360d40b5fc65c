"""rolling_daily_aggregate (calendar gaps) and asof_join_latest (ties,
missing matches, per-key isolation)."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.window import asof_join_latest, rolling_daily_aggregate


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


class TestRollingDaily:
    def test_gap_aware_window(self):
        # days 1, 2, then a gap to day 10: the 7-day window must NOT
        # bridge the gap
        rows = [(1, 100), (1, 50), (2, 10), (10, 1)]
        tbl = pa.table(
            {
                "ts": pa.array([_ts(d) for d, _ in rows], type=pa.timestamp("us")),
                "value_cents": pa.array([v for _, v in rows], type=pa.int64()),
            }
        )
        out = rolling_daily_aggregate(rd.from_arrow(tbl), window_days=7).to_pydict()
        assert out["n_events"] == [2, 1, 1]
        assert out["sum_value_cents"] == [150, 10, 1]
        assert out["n_events_7d"] == [2, 3, 1]  # day 10 sees only itself
        assert out["sum_value_cents_7d"] == [150, 160, 1]

    def test_empty(self):
        tbl = pa.table(
            {
                "ts": pa.array([], type=pa.timestamp("us")),
                "value_cents": pa.array([], type=pa.int64()),
            }
        )
        out = rolling_daily_aggregate(rd.from_arrow(tbl), window_days=7)
        assert out.num_rows == 0


class TestAsofJoin:
    def _run(self, events, orders):
        ev = pa.table(
            {
                "event_id": pa.array([e[0] for e in events], type=pa.int64()),
                "ts": pa.array([e[1] for e in events], type=pa.timestamp("us")),
                "user_id": pa.array([e[2] for e in events], type=pa.int64()),
            }
        )
        orr = pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], type=pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], type=pa.int64()),
                "o_orderdate": pa.array([o[2] for o in orders], type=pa.timestamp("us")),
            }
        )
        out = asof_join_latest(
            rd.from_arrow(ev),
            rd.from_arrow(orr),
            left_key="user_id",
            left_ts="ts",
            left_id="event_id",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_payload="o_orderkey",
        ).take_all()
        return {r["event_id"]: r["last_o_orderkey"] for r in out}

    def test_latest_before_and_missing(self):
        events = [(0, _ts(5), 1), (1, _ts(2), 1), (2, _ts(5), 2)]
        orders = [(10, 1, _ts(1)), (11, 1, _ts(4)), (12, 1, _ts(6))]
        got = self._run(events, orders)
        assert got[0] == 11  # latest ≤ day 5
        assert got[1] == 10
        assert got[2] == -1  # user 2 has no orders

    def test_inclusive_same_timestamp_and_key_isolation(self):
        events = [(0, _ts(3), 1), (1, _ts(3), 2)]
        orders = [(20, 1, _ts(3)), (30, 2, _ts(4))]
        got = self._run(events, orders)
        assert got[0] == 20  # order at exactly the event time counts
        assert got[1] == -1  # user 2's order is later; user 1's must not leak

    def test_tie_on_date_takes_max_orderkey(self):
        events = [(0, _ts(9), 7)]
        orders = [(41, 7, _ts(8)), (44, 7, _ts(8)), (42, 7, _ts(8))]
        assert self._run(events, orders)[0] == 44


class TestRangeJoinCount:
    def test_band_membership_exact_at_boundaries(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.window import range_join_count

        # left at t=1000; right at Δ = -101, -100, 0, +100, +101 (window 100)
        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1], type=pa.int64()),
                    "t": pa.array([1000], type=pa.timestamp("us")),
                    "lid": pa.array([42], type=pa.int64()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
                    "t": pa.array([899, 900, 1000, 1100, 1101, 1000], type=pa.timestamp("us")),
                }
            )
        )
        out = range_join_count(
            left, right, "k", "t", "lid", "k", "t", window_us=100
        ).to_pandas()
        assert list(out["lid"]) == [42] and list(out["n_matches"]) == [3]

    def test_no_match_left_absent(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.window import range_join_count

        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1], type=pa.int64()),
                    "t": pa.array([1000], type=pa.timestamp("us")),
                    "lid": pa.array([7], type=pa.int64()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1], type=pa.int64()),
                    "t": pa.array([5000], type=pa.timestamp("us")),
                }
            )
        )
        out = range_join_count(
            left, right, "k", "t", "lid", "k", "t", window_us=100
        ).to_pandas()
        assert len(out) == 0
