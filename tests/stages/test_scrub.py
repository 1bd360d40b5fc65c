"""stages/scrub.py — vectorized RE2 PII redaction."""

import pyarrow as pa


def _scrub(texts):
    from bioner_ray.stages.scrub import scrub_table

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = scrub_table(t)
    return out.to_pydict()


class TestScrubTable:
    def test_counts_and_replacements(self):
        got = _scrub(
            [
                "mail a.b+c@x-y.org and d@e.io today",
                "call 555-123-4567 or 555.987.6543",
                "host 192.168.0.1 gateway 10.0.0.254",
                "nothing to hide",
            ]
        )
        assert got["n_email"] == [2, 0, 0, 0]
        assert got["n_phone"] == [0, 2, 0, 0]
        assert got["n_ip"] == [0, 0, 2, 0]
        assert got["clean_text"][0] == "mail <EMAIL> and <EMAIL> today"
        assert got["clean_text"][1] == "call <PHONE> or <PHONE>"
        assert got["clean_text"][2] == "host <IP> gateway <IP>"
        assert got["clean_text"][3] == "nothing to hide"

    def test_sequential_order_email_swallows_inner_dots(self):
        # the email match consumes 'u.1.2.3@h.co' whole, so the
        # dotted-quad inside it never reaches the IP pass
        got = _scrub(["u.1.2.3@h.co"])
        assert got["n_email"] == [1]
        assert got["n_ip"] == [0]
        assert got["clean_text"] == ["<EMAIL>"]

    def test_phone_and_ip_do_not_cross_match(self):
        # 3-segment dotted phone is not a 4-segment IP and vice versa
        got = _scrub(["555.123.4567 then 1.2.3.4"])
        assert got["n_phone"] == [1]
        assert got["n_ip"] == [1]
        assert got["clean_text"] == ["<PHONE> then <IP>"]

    def test_clean_len_counts_characters(self):
        got = _scrub(["x@y.io café"])
        assert got["clean_text"] == ["<EMAIL> café"]
        assert got["clean_len"] == [len("<EMAIL> café")]

    def test_zero_rows(self):
        got = _scrub([])
        assert got["clean_text"] == [] and got["n_email"] == []


class TestScrubStage:
    def test_dataset_roundtrip(self, ray_session):
        import ray.data as rd

        from bioner_ray.stages.scrub import pii_scrub_stage

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["ping a@b.co", "no pii"],
            }
        )
        out = pii_scrub_stage(rd.from_arrow(t).repartition(2)).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert list(out["n_email"]) == [1, 0]
        assert list(out["clean_text"]) == ["ping <EMAIL>", "no pii"]
