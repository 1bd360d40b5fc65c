"""dsir_weights capped-vocab (web-scale) mode vs a Python brute force:
top-K + per-side OOV-bucket scoring must replay exactly, and the
footer-statistics target pick must equal the streaming scan's."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd


def test_dsir_capped_matches_bruteforce():
    from bioner_ray.pipelines.corpus import dsir_weights

    sf = "/root/testdata/sf0.001"
    K = 5
    got = dsir_weights(sf, k=10_000, max_vocab=K).to_pandas().set_index("doc_id")

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    target = docs.source.min()
    ct: Counter = Counter()
    cr: Counter = Counter()
    toks_by_doc = {}
    for d, s, t in zip(docs.doc_id, docs.source, docs.text):
        toks = [w for w in re.split(r"\s+", (t or "").lower()) if w]
        if s == target:
            ct.update(toks)
        else:
            toks_by_doc[d] = toks
            cr.update(toks)
    nt = float(sum(ct.values()))
    nr = float(sum(cr.values()))
    tot = Counter(ct)
    tot.update(cr)
    top = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    v = float(len(top)) + 1.0
    delta = {
        w: math.floor(math.log((ct[w] + 1.0) / (nt + v)) * 1e6)
        - math.floor(math.log((cr[w] + 1.0) / (nr + v)) * 1e6)
        for w, _ in top
    }
    kept_t = float(sum(ct[w] for w, _ in top))
    kept_r = float(sum(cr[w] for w, _ in top))
    oov = math.floor(math.log((nt - kept_t + 1.0) / (nt + v)) * 1e6) - math.floor(
        math.log((nr - kept_r + 1.0) / (nr + v)) * 1e6
    )
    checked = 0
    for d, toks in toks_by_doc.items():
        if not toks:
            continue
        want = sum(delta.get(w, oov) for w in toks)
        assert got.loc[d, "weight_micro"] == want, d
        assert got.loc[d, "n_tokens"] == len(toks), d
        checked += 1
    assert checked == len(got)
    # OOV fallback must actually fire with K=5 on this corpus
    assert any(w not in delta for toks in toks_by_doc.values() for w in toks)


def test_min_source_footer_matches_scan(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioner_ray.pipelines.corpus import _min_source_from_footer

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "source": ["srcB", "srcA", "srcC"],
                "text": ["x", "y", "z"],
            }
        ),
        sf / "documents.parquet",
    )
    assert _min_source_from_footer(str(sf)) == "srcA"
    assert _min_source_from_footer("/root/testdata/sf0.001") == pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["source"]
    ).source.min()
