"""doc_logprob capped-vocab (web-scale) mode vs a Python brute force:
top-K + OOV-bucket scoring must replay exactly, and n_tokens must be
identical to full-vocab mode."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd


def test_doc_logprob_capped_matches_bruteforce():
    from bioner_ray.pipelines.analytics import doc_logprob

    sf = "/root/testdata/sf0.001"
    K = 5
    got = doc_logprob(sf, max_vocab=K).to_pandas().set_index("doc_id")
    full = doc_logprob(sf).to_pandas().set_index("doc_id")
    assert (got["n_tokens"].sort_index() == full["n_tokens"].sort_index()).all()

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    cnt: Counter = Counter()
    toks_by_doc = {}
    for d, t in zip(docs.doc_id, docs.text):
        toks = [w for w in re.split(r"\s+", (t or "").lower()) if w]
        toks_by_doc[d] = toks
        cnt.update(toks)
    n_total = float(sum(cnt.values()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    denom = n_total + len(top) + 1.0
    lp = {w: math.floor(math.log((c + 1.0) / denom) * 1e6) for w, c in top}
    kept_total = float(sum(c for _, c in top))
    oov = math.floor(math.log((n_total - kept_total + 1.0) / denom) * 1e6)
    checked = 0
    for d, toks in toks_by_doc.items():
        if not toks:
            continue
        want = sum(lp.get(w, oov) for w in toks)
        assert got.loc[d, "logprob_micro"] == want, d
        checked += 1
    assert checked == len(got)
    # OOV fallback must actually fire with K=5 on this corpus
    assert any(w not in lp for toks in toks_by_doc.values() for w in toks)
