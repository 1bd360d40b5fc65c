"""WARC conversion-record sink/source (sources/warc.py): byte-exact
record grammar, Content-Length-driven parsing that survives adversarial
bodies (blank lines, header look-alikes), loud failures on torn
streams, and the sharded write → distributed read identity."""

from __future__ import annotations

import pyarrow as pa
import pytest

from bioner_ray.sources.warc import (
    format_warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


class TestRecordGrammar:
    def test_single_record_bytes(self):
        rec = format_warc_record("https://x/doc/1", "hello world")
        assert rec == (
            b"WARC/1.0\nWARC-Target-URI: https://x/doc/1\n"
            b"Content-Length: 11\n\nhello world\n\n"
        )

    def test_content_length_counts_utf8_bytes(self):
        rec = format_warc_record("u", "héllo-世界")
        assert b"Content-Length: 13\n" in rec  # 13 utf-8 bytes, 8 chars

    def test_roundtrip_identity(self):
        docs = [("https://a/1", "one"), ("https://a/2", ""), ("https://b/3", "héllo\n世界")]
        blob = b"".join(format_warc_record(u, t) for u, t in docs)
        t = parse_warc_bytes(blob)
        assert list(zip(t.column("url").to_pylist(), t.column("text").to_pylist())) == docs

    def test_adversarial_bodies_do_not_desync(self):
        # bodies containing blank lines and the version literal — a
        # separator-split parser would cut these records apart
        bodies = [
            "para one\n\npara two\n\n\npara three",
            "WARC/1.0\nWARC-Target-URI: fake\nContent-Length: 0\n\n",
            "\n\n\n",
        ]
        blob = b"".join(
            format_warc_record(f"https://h/{i}", b) for i, b in enumerate(bodies)
        )
        t = parse_warc_bytes(blob)
        assert t.column("text").to_pylist() == bodies

    def test_truncated_body_raises(self):
        rec = format_warc_record("u", "hello")
        with pytest.raises(ValueError, match="truncated"):
            parse_warc_bytes(rec[:-4])

    def test_bad_version_raises(self):
        with pytest.raises(ValueError, match="bad version"):
            parse_warc_bytes(b"WARC/9.9\nContent-Length: 0\n\n\n\n")

    def test_missing_field_raises(self):
        with pytest.raises(ValueError, match="missing/invalid"):
            parse_warc_bytes(b"WARC/1.0\nWARC-Target-URI: u\n\n\n\n")

    def test_empty_stream_is_empty_table(self):
        t = parse_warc_bytes(b"")
        assert t.num_rows == 0 and t.schema.names == ["url", "text"]


class TestShardedRoundTrip:
    def test_write_read_identity_and_manifest(self, tmp_path):
        import ray.data as rd

        rows = [
            (f"https://site{i % 3}.example.com/doc/{i}", f"body {i}\n\nwith blank {i}")
            for i in range(57)
        ]
        ds = rd.from_arrow(
            pa.table({"url": [u for u, _ in rows], "text": [t for _, t in rows]})
        )
        out = str(tmp_path / "warc")
        manifest = write_warc(ds, out, num_shards=8).to_pandas()
        assert manifest["n_records"].sum() == 57
        assert (manifest["n_bytes"] > 0).all()
        back = read_warc(out).to_pandas().sort_values("url", ignore_index=True)
        want = sorted(rows)
        assert list(zip(back["url"], back["text"])) == want

    def test_null_text_written_as_empty(self, tmp_path):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "url": pa.array(["https://h/1"], type=pa.string()),
                    "text": pa.array([None], type=pa.string()),
                }
            )
        )
        out = str(tmp_path / "warc")
        write_warc(ds, out, num_shards=2).materialize()
        back = read_warc(out).to_pandas()
        assert back["text"].tolist() == [""]
