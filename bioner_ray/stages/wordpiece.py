"""WordPiece-style greedy subword tokenizer (Wu et al. 2016,
arXiv:1609.08144 §4.1; the inference rule of Devlin et al. 2018's BERT
tokenizer): a piece vocabulary of word-initial and ``##``-continuation
substrings is learned by weighted frequency, and each word is segmented
greedily — the LONGEST vocab piece matching at the cursor wins; a word
with any uncoverable position becomes ``[UNK]``. The engine's second
tokenizer family next to BPE (stages/bpe.py learns merges; this learns
a piece inventory and pins the greedy longest-match inference).

Scale shape: the corpus is touched once (distributed word counts); all
piece generation, counting, and tokenization run over the DISTINCT-WORD
table (bounded by the corpus vocabulary, not its token count); the
learned piece vocabulary is a ≤ K-row broadcast. The greedy loop is
per distinct word — Zipf makes that the whole point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def word_counts(docs_ds, text_col: str = "text"):
    """(w, c) distinct-word occurrence counts — one corpus pass."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema
    from bioner_ray.stages.textstats import _split_lower

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for toks in _split_lower(batch, text_col):
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), type=pa.string()),
                "c": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            docs_ds.map_batches(partial, batch_format="pyarrow"), ["w"], [("c", "sum")]
        ),
        pa.schema([("w", pa.string()), ("c", pa.int64())]),
    )


def _pieces_of(word: str, max_sub: int):
    for pos in range(len(word)):
        for l in range(1, max_sub + 1):
            if pos + l <= len(word):
                sub = word[pos : pos + l]
                yield sub if pos == 0 else "##" + sub


def learn_piece_vocab(words_ds, vocab_k: int = 64, max_sub: int = 4) -> list[str]:
    """Top-``vocab_k`` pieces by (occurrence-weighted count desc, piece
    asc) — combiner-pruned global top-K; the driver sees ≤ K rows."""
    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def piece_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for w, c in zip(t.column("w").to_pylist(), t.column("c").to_pylist()):
            for p in _pieces_of(w, max_sub):
                counts[p] = counts.get(p, 0) + c
        return pa.table(
            {
                "piece": pa.array(list(counts.keys()), type=pa.string()),
                "cnt": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    agg = pin_schema(
        bucketed_aggregate(
            words_ds.map_batches(piece_partial, batch_format="pyarrow"),
            ["piece"],
            [("cnt", "sum")],
        ),
        pa.schema([("piece", pa.string()), ("cnt", pa.int64())]),
    )

    def grp(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("piece", pa.string()), ("cnt", pa.int64()), ("_g", pa.int64())]
            ).empty_table()
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    top = top_k_per_group(
        agg.map_batches(grp, batch_format="pyarrow"),
        key_col="_g",
        order_by=[("cnt", "descending"), ("piece", "ascending")],
        k=vocab_k,
    )
    return sorted(r["piece"] for r in top.take_all())  # ≤ K rows


def greedy_tokenize(word: str, vocab: frozenset, max_sub: int = 4):
    """Greedy longest-match segmentation; None = [UNK] (some position
    has no matching piece)."""
    pos, n = 0, 0
    while pos < len(word):
        for l in range(min(max_sub, len(word) - pos), 0, -1):
            sub = word[pos : pos + l]
            p = sub if pos == 0 else "##" + sub
            if p in vocab:
                pos += l
                n += 1
                break
        else:
            return None
    return n


def wordpiece_word_table(docs_ds, vocab_k: int = 64, max_sub: int = 4):
    """Learn the piece vocab, then segment every DISTINCT word.
    Columns: word, n_occurrences, n_pieces (0 for [UNK]), is_unk."""
    import ray

    words = word_counts(docs_ds).materialize()
    vocab = frozenset(learn_piece_vocab(words, vocab_k=vocab_k, max_sub=max_sub))
    vocab_ref = ray.put(vocab)
    out_schema = pa.schema(
        [
            ("word", pa.string()),
            ("n_occurrences", pa.int64()),
            ("n_pieces", pa.int64()),
            ("is_unk", pa.int64()),
        ]
    )

    def seg(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        v = ray.get(vocab_ref)
        ws = t.column("w").to_pylist()
        ns = [greedy_tokenize(w, v, max_sub) for w in ws]
        return pa.table(
            {
                "word": pa.array(ws, type=pa.string()),
                "n_occurrences": t.column("c"),
                "n_pieces": pa.array([n or 0 for n in ns], type=pa.int64()),
                "is_unk": pa.array([int(n is None) for n in ns], type=pa.int64()),
            },
            schema=out_schema,
        )

    return words.map_batches(seg, batch_format="pyarrow")
