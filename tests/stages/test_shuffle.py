"""bucketed_aggregate: exactness vs a driver-side reference aggregate.

The primitive replaces Ray's per-group aggregate wherever key
cardinality is unbounded (pair dedup, triple canonicalization, vocab
counts); these tests pin that it is EXACT — same groups, same values —
for every supported op, across bucket counts, key types and the
multi-batch partial/final split.
"""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray

from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones


def _reference(rows, keys, aggs):
    acc = {}
    for r in rows:
        k = tuple(r[c] for c in keys)
        if k not in acc:
            acc[k] = {c: r[c] for c, _ in aggs}
        else:
            for c, op in aggs:
                if op == "sum":
                    acc[k][c] += r[c]
                elif op == "min":
                    acc[k][c] = min(acc[k][c], r[c])
                elif op == "max":
                    acc[k][c] = max(acc[k][c], r[c])
    return {k: tuple(v[c] for c, _ in aggs) for k, v in acc.items()}


def _collect(ds, keys, aggs):
    out = {}
    for r in ds.take_all():
        out[tuple(r[c] for c in keys)] = tuple(r[c] for c, _ in aggs)
    return out


class TestBucketedAggregate:
    def test_int_keys_all_ops_exact(self):
        rng = np.random.default_rng(7)
        rows = [
            {
                "a": int(rng.integers(0, 50)),
                "b": int(rng.integers(0, 20)),
                "v": int(rng.integers(-100, 100)),
                "w": float(rng.normal()),
            }
            for _ in range(5000)
        ]
        aggs = [("v", "sum"), ("w", "max")]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
        got = _collect(bucketed_aggregate(ds, ["a", "b"], aggs, num_buckets=16), ["a", "b"], aggs)
        want = _reference(rows, ["a", "b"], aggs)
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-12

    def test_string_keys_min_on_strings(self):
        rows = [
            {"k": f"key-{i % 37}", "url": f"https://s/{(i * 7) % 91}", "n": 1}
            for i in range(2000)
        ]
        aggs = [("n", "sum"), ("url", "min")]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
        got = _collect(bucketed_aggregate(ds, ["k"], aggs, num_buckets=8), ["k"], aggs)
        want = _reference(rows, ["k"], aggs)
        assert got == want

    def test_bucket_count_invariance(self):
        rows = [{"k": i % 101, "v": i} for i in range(3000)]
        ds1 = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        ds2 = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        a = _collect(bucketed_aggregate(ds1, ["k"], [("v", "sum")], num_buckets=2), ["k"], [("v", "sum")])
        b = _collect(bucketed_aggregate(ds2, ["k"], [("v", "sum")], num_buckets=64), ["k"], [("v", "sum")])
        assert a == b

    def test_small_batch_partial_final_split(self):
        # batch_size smaller than the table forces multiple partials per key
        rows = [{"k": i % 10, "v": 1} for i in range(500)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = _collect(
            bucketed_aggregate(ds, ["k"], [("v", "sum")], num_buckets=4, batch_size=64),
            ["k"],
            [("v", "sum")],
        )
        assert out == {(i,): (50,) for i in range(10)}

    def test_with_ones_count(self):
        rows = [{"k": i % 3} for i in range(30)]
        ds = with_ones(ray.data.from_arrow(pa.Table.from_pylist(rows)), "n")
        out = _collect(bucketed_aggregate(ds, ["k"], [("n", "sum")]), ["k"], [("n", "sum")])
        assert out == {(0,): (10,), (1,): (10,), (2,): (10,)}

    def test_unsupported_op_raises(self):
        ds = ray.data.from_arrow(pa.table({"k": [1], "v": [1]}))
        try:
            bucketed_aggregate(ds, ["k"], [("v", "mean")])
        except ValueError as e:
            assert "mean" in str(e)
        else:
            raise AssertionError("expected ValueError for unsupported op")


class TestSkew:
    def test_hot_key_exactness_and_no_straggler_partition(self):
        """One key owning 95% of rows must aggregate exactly and share
        its coarse bucket with other keys (the salting-subsumption
        claim): the hot key's bucket never becomes a dedicated
        straggler partition."""
        rows = [{"k": 0, "v": 1}] * 9500 + [{"k": i, "v": 1} for i in range(1, 501)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
        out = _collect(
            bucketed_aggregate(ds, ["k"], [("v", "sum")], num_buckets=16), ["k"], [("v", "sum")]
        )
        assert out[(0,)] == (9500,)
        assert all(out[(i,)] == (1,) for i in range(1, 501))
        # the hot key's bucket hosts other keys too (fixed-cardinality
        # bucket space, ~500/16 keys per bucket)
        from bioner_ray.stages.shuffle import _bucket_column

        t = pa.table({"k": pa.array(list(range(501)), type=pa.int64())})
        buckets = _bucket_column(t, ["k"], 16).to_pylist()
        hot_bucket = buckets[0]
        assert sum(1 for b in buckets if b == hot_bucket) > 1


class TestBucketedInnerJoin:
    def _join(self, left_rows, right_rows, keys, lschema, rschema, **kw):
        import ray.data as rd

        from bioner_ray.stages.shuffle import bucketed_inner_join

        l = rd.from_arrow(pa.Table.from_pylist(left_rows, schema=lschema)).repartition(3)
        r = rd.from_arrow(pa.Table.from_pylist(right_rows, schema=rschema)).repartition(2)
        return bucketed_inner_join(l, r, keys, lschema, rschema, **kw).take_all()

    def test_matches_plain_join_with_duplicates_and_misses(self):
        lschema = pa.schema([("k", pa.string()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.string()), ("b", pa.int64())])
        left = [{"k": "x", "a": 1}, {"k": "x", "a": 2}, {"k": "y", "a": 3}, {"k": "z", "a": 4}]
        right = [{"k": "x", "b": 10}, {"k": "x", "b": 20}, {"k": "y", "b": 30}, {"k": "w", "b": 40}]
        got = sorted(
            (r["k"], r["a"], r["b"]) for r in self._join(left, right, ["k"], lschema, rschema)
        )
        want = sorted(
            (lk["k"], lk["a"], rk["b"]) for lk in left for rk in right if lk["k"] == rk["k"]
        )
        assert got == want  # 2x2 fanout on x, 1 on y, z/w dropped

    def test_empty_right_side_yields_empty_not_crash(self):
        # the exact case that crashes Ray's native join (zero-row side →
        # zero-column partition table)
        lschema = pa.schema([("k", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.int64()), ("b", pa.int64())])
        out = self._join([{"k": 1, "a": 1}], [], ["k"], lschema, rschema)
        assert out == []

    def test_multi_key_and_few_keys_many_buckets(self):
        # fewer keys than buckets → most buckets empty; must stay exact
        lschema = pa.schema([("k1", pa.string()), ("k2", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k1", pa.string()), ("k2", pa.int64()), ("b", pa.int64())])
        left = [{"k1": "p", "k2": i % 2, "a": i} for i in range(10)]
        right = [{"k1": "p", "k2": 0, "b": 100}, {"k1": "q", "k2": 0, "b": 200}]
        got = self._join(left, right, ["k1", "k2"], lschema, rschema, num_buckets=64)
        assert len(got) == 5 and all(r["b"] == 100 and r["k2"] == 0 for r in got)

    def test_left_anti_matches_reference_and_survives_empty_right(self):
        lschema = pa.schema([("k", pa.string()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.string()), ("b", pa.int64())])
        left = [{"k": "x", "a": 1}, {"k": "x", "a": 2}, {"k": "y", "a": 3}, {"k": "z", "a": 4}]
        right = [{"k": "x", "b": 10}, {"k": "w", "b": 40}]
        got = sorted(
            (r["k"], r["a"])
            for r in self._join(left, right, ["k"], lschema, rschema, join_type="left anti")
        )
        assert got == [("y", 3), ("z", 4)]  # left columns only, no fanout
        # duplicate right keys must not duplicate surviving left rows
        got2 = self._join(
            left, right + [{"k": "y", "b": 1}, {"k": "y", "b": 2}], ["k"],
            lschema, rschema, join_type="left anti",
        )
        assert sorted((r["k"], r["a"]) for r in got2) == [("z", 4)]
        # empty right side → anti join passes the whole left through
        got3 = self._join(left, [], ["k"], lschema, rschema, join_type="left anti")
        assert sorted((r["k"], r["a"]) for r in got3) == sorted((r["k"], r["a"]) for r in left)

    def test_left_semi_no_fanout_on_duplicate_right_keys(self):
        lschema = pa.schema([("k", pa.string()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.string()), ("b", pa.int64())])
        left = [{"k": "x", "a": 1}, {"k": "x", "a": 2}, {"k": "y", "a": 3}, {"k": "z", "a": 4}]
        right = [{"k": "x", "b": 1}, {"k": "x", "b": 2}, {"k": "x", "b": 3}, {"k": "y", "b": 4}]
        got = sorted(
            (r["k"], r["a"])
            for r in self._join(left, right, ["k"], lschema, rschema, join_type="left semi")
        )
        # both x-rows and the y-row survive EXACTLY once despite 3 right x-rows
        assert got == [("x", 1), ("x", 2), ("y", 3)]

    def test_left_outer_nulls_unmatched(self):
        lschema = pa.schema([("k", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.int64()), ("b", pa.int64())])
        left = [{"k": 1, "a": 10}, {"k": 2, "a": 20}]
        right = [{"k": 1, "b": 100}]
        got = sorted(
            (r["k"], r["a"], r["b"])
            for r in self._join(left, right, ["k"], lschema, rschema, join_type="left outer")
        )
        assert got == [(1, 10, 100), (2, 20, None)]

    def test_full_outer_coalesces_keys_and_nulls_both_sides(self):
        lschema = pa.schema([("k", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.int64()), ("b", pa.int64())])
        left = [{"k": 1, "a": 10}, {"k": 2, "a": 20}]
        right = [{"k": 2, "b": 200}, {"k": 3, "b": 300}]
        got = sorted(
            (r["k"], r["a"], r["b"])
            for r in self._join(left, right, ["k"], lschema, rschema, join_type="full outer")
        )
        # unmatched LEFT key 1 and unmatched RIGHT key 3 both survive,
        # key column coalesced (never null) even for right-only rows
        assert got == [(1, 10, None), (2, 20, 200), (3, None, 300)]
        # empty left side → all right rows with null left columns
        got2 = self._join([], right, ["k"], lschema, rschema, join_type="full outer")
        assert sorted((r["k"], r["a"], r["b"]) for r in got2) == [
            (2, None, 200),
            (3, None, 300),
        ]

    def test_unsupported_join_type_rejected(self):
        import pytest
        import ray.data as rd

        from bioner_ray.stages.shuffle import bucketed_inner_join

        lschema = pa.schema([("k", pa.int64()), ("a", pa.int64())])
        rschema = pa.schema([("k", pa.int64()), ("b", pa.int64())])
        ds = rd.from_arrow(pa.Table.from_pylist([{"k": 1, "a": 1}], schema=lschema))
        rs = rd.from_arrow(pa.Table.from_pylist([{"k": 1, "b": 1}], schema=rschema))
        with pytest.raises(ValueError, match="join_type"):
            bucketed_inner_join(ds, rs, ["k"], lschema, rschema, join_type="right outer")

    def test_overlapping_value_columns_rejected(self):
        import pytest
        import ray.data as rd

        from bioner_ray.stages.shuffle import bucketed_inner_join

        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        ds = rd.from_arrow(pa.Table.from_pylist([{"k": 1, "v": 1}], schema=schema))
        with pytest.raises(ValueError, match="disjoint"):
            bucketed_inner_join(ds, ds, ["k"], schema, schema)


class TestPolarsHashPin:
    """VERDICT r3, Next #5: the bucket hash rides polars' fixed-seed
    xxhash, which is stable only per polars version. The probe pin must
    hold on this image, and a simulated mismatch must engage the crc32
    fallback loudly rather than silently re-bucketing."""

    def _reset(self, monkeypatch):
        from bioner_ray.stages import shuffle as sh

        monkeypatch.setattr(sh, "_polars_hash_validated", None)
        return sh

    def test_probe_pin_holds_on_this_image(self, monkeypatch):
        sh = self._reset(monkeypatch)
        assert sh._polars_hash_usable() is True

    def test_mismatch_engages_crc32_fallback_with_warning(self, monkeypatch):
        import warnings
        import zlib

        import numpy as np
        import pyarrow as pa

        sh = self._reset(monkeypatch)
        monkeypatch.setattr(
            sh, "_POLARS_PROBE_EXPECTED", (1, 2, 3, 4, 5)
        )  # simulate a polars whose seed behavior changed
        col = pa.array(["x", "y", "x", "héllo-世界"], type=pa.string())
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            got = sh.hash_strings_u64(col)
        assert any("crc32" in str(w.message) for w in rec)
        want = np.fromiter(
            (zlib.crc32(s.encode()) for s in ["x", "y", "x", "héllo-世界"]),
            dtype=np.uint64,
            count=4,
        )
        np.testing.assert_array_equal(got, want)
        # memoized: second call stays on the fallback without re-warning
        with warnings.catch_warnings(record=True) as rec2:
            warnings.simplefilter("always")
            got2 = sh.hash_strings_u64(col)
        assert not rec2
        np.testing.assert_array_equal(got2, want)
