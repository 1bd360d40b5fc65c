"""weekly_active_users — exact rolling 7-day distinct."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def test_window_boundaries_and_dedup(tmp_path):
    from bioner_ray.pipelines.analytics import weekly_active_users

    base = dt.datetime(2025, 1, 10)
    rows = [
        (base, 1),                      # day 0
        (base, 1),                      # same user same day — dedups
        (base + dt.timedelta(days=6), 2),   # inside day-6 window
        (base + dt.timedelta(days=7), 3),   # day 7: user 1 has aged out
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), type=pa.int64()),
                "ts": pa.array([r[0] for r in rows], type=pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        ),
        sf / "events.parquet",
    )
    got = {
        r["day"].isoformat() if hasattr(r["day"], "isoformat") else str(r["day"]): r["wau"]
        for r in weekly_active_users(str(sf)).take_all()
    }
    assert got == {
        "2025-01-10": 1,  # user 1 only, counted once
        "2025-01-16": 2,  # users 1 (day 0 still inside) and 2
        "2025-01-17": 2,  # users 2 and 3; user 1 aged out (7 days)
    }
