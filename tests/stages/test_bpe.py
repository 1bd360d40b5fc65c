"""stages/bpe.py — deterministic BPE merge learning."""

from __future__ import annotations

import pyarrow as pa


def _ds(texts, parts=3):
    import ray.data as rd

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    return rd.from_arrow(t).repartition(parts)


def _ref_bpe(texts, n_merges):
    """Independent driver-side reference (dict-based Sennrich trainer
    with the same (count desc, lhs, rhs) tie-break and greedy
    left-to-right merge application)."""
    import re

    vocab: dict[tuple[str, ...], int] = {}
    for txt in texts:
        for w in txt.lower().split():
            if re.fullmatch(r"[a-z0-9]+", w):
                key = tuple(w)
                vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + cnt
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def test_hand_computed_merges():
    from bioner_ray.stages.bpe import bpe_merges

    # "low lower lowest newest widest" classic: 'lo' wins round 1 on
    # this corpus? compute by hand instead: use a corpus small enough
    # to eyeball — 3x 'aaab': pairs (a,a)=6, (a,b)=3 → merge (a,a);
    # then (aa,a)=3, (a,b)=3 → tie, lex smallest lhs 'a' wins (a,b).
    got = bpe_merges(_ds(["aaab aaab", "aaab"]), n_merges=2).to_pylist()
    assert got[0] == {"round": 1, "lhs": "a", "rhs": "a", "pair_count": 6}
    assert got[1] == {"round": 2, "lhs": "a", "rhs": "b", "pair_count": 3}


def test_matches_reference_trainer():
    from bioner_ray.stages.bpe import bpe_merges

    texts = [
        "low low low lower lower newest newest newest newest widest",
        "the cat sat on the mat the cat",
        "ab ab abc abcd x1 x1 x1 mixed-PUNCT dropped!",
        "aaaa aaaa bbbb",
    ]
    got = [tuple(r.values()) for r in bpe_merges(_ds(texts), n_merges=10).to_pylist()]
    assert got == _ref_bpe(texts, 10)


def test_greedy_overlap_and_dry_out():
    from bioner_ray.stages.bpe import bpe_merges

    # 'aaaa': round1 (a,a)=3 → [aa,aa]; round2 (aa,aa)=1 → [aaaa];
    # round3: no pairs left → dry, only 3 rows out of 5 requested.
    got = bpe_merges(_ds(["aaaa"]), n_merges=5).to_pylist()
    assert len(got) == 2
    assert got[0] == {"round": 1, "lhs": "a", "rhs": "a", "pair_count": 3}
    assert got[1] == {"round": 2, "lhs": "aa", "rhs": "aa", "pair_count": 1}


def test_token_counts_match_reference_application():
    from bioner_ray.stages.bpe import bpe_token_counts

    texts = [
        "low low low lower lower newest newest newest newest widest",
        "aaab aaab aaab cc cc",
    ]
    # reference: train, apply, count symbols weighted by word freq
    import re
    from collections import Counter

    vocab = Counter(
        w for t in texts for w in t.lower().split() if re.fullmatch(r"[a-z0-9]+", w)
    )
    seg = {w: tuple(w) for w in vocab}
    for l, r, _ in [(m[1], m[2], m[3]) for m in _ref_bpe(texts, 6)]:
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = tuple(out)
    counts = Counter()
    for w, c in vocab.items():
        for s in seg[w]:
            counts[s] += c
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    got = bpe_token_counts(_ds(texts), n_merges=6, k=5).to_pylist()
    assert [(r["token"], r["token_count"]) for r in got] == want


def test_empty_and_single_char_corpus():
    from bioner_ray.stages.bpe import bpe_merges

    assert bpe_merges(_ds(["a b c 1 2", "? ! ."]), n_merges=3).num_rows == 0
    assert bpe_merges(_ds(["", "   "]), n_merges=3).num_rows == 0
