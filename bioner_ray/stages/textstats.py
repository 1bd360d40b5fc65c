"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's token-level text machinery (the normalizer
``keep_only_printable_chars`` ngram_encoder.py:10-11, the surface
predicates surface_encoder.py:33-100, and the vocabulary counter
G1 ngram_encoder.py:139-150) to corpus-hygiene operators a 100 TB
web-text pipeline needs: per-document token statistics, quality
scoring, language identification, BPE-ish token counting and document
fingerprinting. Every operator is a stateless vectorized
``map_batches`` stage over zero-copy Arrow batches; nothing shuffles.

Tokenization contract (shared with the DuckDB oracles): tokens are the
non-empty results of splitting ``lower(text)`` on runs of whitespace —
exactly ``regexp_split_to_array(lower(text), '\\s+')`` minus empties.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")

#: GPT-2-ish coarse token pattern, intentionally RE2-compatible so the
#: DuckDB oracle can run the *same* pattern via regexp_extract_all.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE_RE = re.compile(BPE_TOKEN_PATTERN)

#: tiny language-profile stopword sets for the n-gram/stopword language
#: heuristic. Deterministic; tie → "und".
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is was for on with as by at from that it".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf des ein eine".split()),
    "fr": frozenset("le la les de des et un une est dans pour que qui sur au".split()),
    "es": frozenset("el la los las de y un una es en por que para con del".split()),
    "zh": frozenset("的 是 在 了 和 有 我 他 这 中 大 来 上 国 个".split()),
}

STOPWORDS_EN = LANG_PROFILES["en"]


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokens of ``lower(text)`` (oracle-matchable contract)."""
    return [t for t in _WS_RE.split(text.lower()) if t]


def _split_lower(batch: pa.Table, text_col: str) -> list[list[str]]:
    """Vectorized lowercase + whitespace split for a whole batch."""
    lowered = pc.utf8_lower(batch.column(text_col))
    split = pc.split_pattern_regex(lowered, r"\s+")
    return [[t for t in row if t] if row is not None else [] for row in split.to_pylist()]


_TOKEN_COUNT_SCHEMA = pa.schema([("word", pa.string()), ("cnt", pa.int64())])
_BIGRAM_COUNT_SCHEMA = pa.schema([("bg", pa.string()), ("cnt", pa.int64())])

#: bigram-key separator shared by the LM builders and their score pass.
BIGRAM_SEP = "\x1f"


def token_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block partial token counts — the combiner half of every
    vocabulary/unigram-LM build, on the flattened split-offset kernel
    (no Python loop over tokens): one vectorized lower+split, one
    Arrow ``value_counts`` over the non-empty token values. Document
    boundaries are irrelevant for a pure token multiset, so the list
    offsets are simply ignored. Columns: word, cnt."""
    text = pc.fill_null(batch.column(text_col), "")
    split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
    vals = split.flatten()
    vals = vals.filter(pc.not_equal(vals, ""))
    if len(vals) == 0:
        return _TOKEN_COUNT_SCHEMA.empty_table()
    vc = vals.value_counts()
    return pa.table(
        {"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
    )


def bigram_count_partial(
    batch: pa.Table, text_col: str = "text", sep: str = BIGRAM_SEP
) -> pa.Table:
    """Per-block partial WITHIN-document bigram counts, vectorized:
    the same split-offset kernel the LM score passes use (consecutive
    filtered tokens, no cross-document pairs), joined into
    ``w1 + sep + w2`` keys with one Arrow element-wise join, counted
    with one ``value_counts``. Columns: bg, cnt."""
    text = pc.fill_null(batch.column(text_col), "")
    split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
    off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = split.values.slice(off[0], off[-1] - off[0])
    doc_idx = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    toks = vals.filter(pa.array(keep))
    d = doc_idx[keep]
    if len(toks) < 2:
        return _BIGRAM_COUNT_SCHEMA.empty_table()
    same = pa.array(d[1:] == d[:-1])
    w1 = toks.slice(0, len(toks) - 1).filter(same)
    w2 = toks.slice(1, len(toks) - 1).filter(same)
    if len(w1) == 0:
        return _BIGRAM_COUNT_SCHEMA.empty_table()
    vc = pc.binary_join_element_wise(w1, w2, sep).value_counts()
    return pa.table(
        {"bg": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
    )


def token_stats_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-document token statistics + quality scores.

    Columns: ``n_tokens`` / ``n_types`` / ``n_chars`` /
    ``max_token_len`` (exact int64), ``ttr`` (type-token ratio) and
    ``stopword_frac`` (single exact-int divisions → bit-stable vs SQL).
    """
    toks = _split_lower(batch, text_col)
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    n_types = np.array([len(set(t)) for t in toks], dtype=np.int64)
    max_len = np.array([max((len(w) for w in t), default=0) for t in toks], dtype=np.int64)
    n_stop = np.array([sum(1 for w in t if w in STOPWORDS_EN) for t in toks], dtype=np.int64)
    n_chars = pc.utf8_length(batch.column(text_col)).cast(pa.int64())
    denom = np.where(n_tokens == 0, 1, n_tokens)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "n_types": pa.array(n_types),
            "n_chars": n_chars,
            "max_token_len": pa.array(max_len),
            "ttr": pa.array(n_types / denom),
            "stopword_frac": pa.array(n_stop / denom),
        }
    )


def token_stats_stage(ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 1024):
    return ds.map_batches(
        token_stats_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def quality_filter_stage(
    ds,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_ttr: float = 0.0,
):
    """Keep documents inside the token-count window with enough lexical
    diversity — the C4-style heuristic gate, fully streaming."""

    def flag(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, text_col)
        keep = [
            (min_tokens <= len(t) <= max_tokens)
            and (len(set(t)) / max(len(t), 1) >= min_ttr)
            for t in toks
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def repetition_stats_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style repetition signals per document.

    Columns: ``n_tokens``, ``top_token_frac`` (count of the most
    frequent token / n_tokens; 0.0 for empty docs) and
    ``dup_bigram_frac`` ((n_bigrams − distinct_bigrams) / n_bigrams;
    0.0 when < 2 tokens). Both are single exact-int divisions →
    bit-stable vs the SQL oracle (same contract as token_stats).
    """
    from collections import Counter

    toks = _split_lower(batch, text_col)
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    top = np.array(
        [max(Counter(t).values()) if t else 0 for t in toks], dtype=np.int64
    )
    n_bi = np.maximum(n_tokens - 1, 0)
    dup_bi = np.array(
        [
            (len(t) - 1) - len({(t[j], t[j + 1]) for j in range(len(t) - 1)})
            if len(t) >= 2
            else 0
            for t in toks
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "top_token_frac": pa.array(top / np.where(n_tokens == 0, 1, n_tokens)),
            "dup_bigram_frac": pa.array(dup_bi / np.where(n_bi == 0, 1, n_bi)),
        }
    )


def repetition_stats_stage(
    ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 1024
):
    return ds.map_batches(
        repetition_stats_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def langid_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Stopword-profile language ID; deterministic argmax, tie → "und".

    Columns: id, ``pred_lang``, ``lang_score`` (matched-stopword
    fraction of the winning profile).
    """
    toks = _split_lower(batch, text_col)
    langs_sorted = sorted(LANG_PROFILES)  # pinned evaluation order
    preds, scores = [], []
    for t in toks:
        n = max(len(t), 1)
        best_lang, best_hits, tied = "und", 0, False
        for lang in langs_sorted:
            hits = sum(1 for w in t if w in LANG_PROFILES[lang])
            if hits > best_hits:
                best_lang, best_hits, tied = lang, hits, False
            elif hits == best_hits and hits > 0:
                tied = True
        if tied:  # two profiles tie on the max hit count → undetermined
            best_lang = "und"
        preds.append(best_lang)
        scores.append(best_hits / n)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "pred_lang": pa.array(preds, type=pa.string()),
            "lang_score": pa.array(scores, type=pa.float64()),
        }
    )


def langid_stage(ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 1024):
    return ds.map_batches(
        langid_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Document fingerprints: ``md5`` content hash (exact, matches the
    DuckDB ``md5()`` oracle) + BPE-ish token count via the shared
    RE2-compatible pattern."""
    texts = batch.column(text_col).to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    bpe_counts = [len(_BPE_RE.findall(t or "")) for t in texts]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "md5": pa.array(md5s, type=pa.string()),
            "n_bpe_tokens": pa.array(bpe_counts, type=pa.int64()),
        }
    )


def fingerprint_stage(ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 1024):
    return ds.map_batches(
        fingerprint_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


_ROLL_BASE = np.uint64(1_000_003)
_ROLL_MASK = np.uint64((1 << 61) - 1)


def rolling_hashes(tokens: list[str], window: int = 5) -> np.ndarray:
    """Karp-Rabin rolling hashes of every ``window``-token run (uint64).

    The winnowing building block: per-token 64-bit hashes combined with
    a polynomial rolling scheme, vectorized with numpy cumulative
    products instead of a per-window Python loop.
    """
    if len(tokens) < window:
        return np.empty(0, dtype=np.uint64)
    th = np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in tokens],
        dtype=np.uint64,
    )
    n = len(th)
    out = np.zeros(n - window + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):  # window is tiny and constant; rows vectorized
            out = (out * _ROLL_BASE + th[j : j + n - window + 1]) & _ROLL_MASK
    return out


def winnow_fingerprint(tokens: list[str], window: int = 5, stride: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): min rolling hash in every
    SLIDING window of ``stride`` consecutive hashes — sliding (not
    fixed-offset) windows are what make the fingerprint shift-tolerant.
    Vectorized via a strided view; no per-window Python loop."""
    rh = rolling_hashes(tokens, window)
    if rh.size == 0:
        return []
    if rh.size <= stride:
        return [int(rh.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(rh, stride).min(axis=1)
    return sorted({int(m) for m in mins})


def winnow_stage(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
    stride: int = 4,
    batch_size: int = 1024,
):
    """Adds a ``fingerprint: list<uint64>`` column per document."""

    def fp(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, text_col)
        fps = [winnow_fingerprint(t, window, stride) for t in toks]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(fps, type=pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=batch_size)


#: Fixed sentiment lexicons — tiny pinned word lists (the VADER/LIWC
#: pattern at its core: signed lexicon hits over tokens). Deterministic
#: and shared verbatim with the SQL twin, like LANG_PROFILES.
SENTIMENT_POS = frozenset(
    "good great excellent best fast reliable efficient correct clean robust".split()
)
SENTIMENT_NEG = frozenset(
    "bad poor slow broken wrong dirty unreliable inefficient worst failed".split()
)


def sentiment_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc lexicon sentiment: positive/negative token hits and the
    net score — one vectorized is_in pass per polarity over the shared
    whitespace tokenization. Columns: id, n_pos, n_neg, net."""
    import numpy as np

    toks = _split_lower(batch, text_col)
    npos = np.fromiter(
        (sum(1 for w in t if w in SENTIMENT_POS) for t in toks),
        dtype=np.int64,
        count=len(toks),
    )
    nneg = np.fromiter(
        (sum(1 for w in t if w in SENTIMENT_NEG) for t in toks),
        dtype=np.int64,
        count=len(toks),
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_pos": pa.array(npos),
            "n_neg": pa.array(nneg),
            "net": pa.array(npos - nneg),
        }
    )


#: Gopher rule 6's stopword list (Rae et al. 2021, arXiv:2112.11446
#: Table A1): a document must contain at least 2 of these to pass.
GOPHER_STOPWORDS = ("and", "be", "have", "of", "that", "the", "to", "with")

GOPHER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("mean_word_len", pa.float64()),
        ("symbol_ratio", pa.float64()),
        ("alpha_frac", pa.float64()),
        ("n_stop", pa.int64()),
        ("bullet_frac", pa.float64()),
        ("ellipsis_frac", pa.float64()),
        ("keep", pa.int64()),
    ]
)


def gopher_rules_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_stop: int = 2,
) -> pa.Table:
    """Gopher/MassiveText quality-rule verdict per document (Rae et
    al. 2021, arXiv:2112.11446 Table A1) — the heuristic filter stack
    web-scale pretraining corpora apply before any learned scorer:

    1. word count in [min_words, max_words]
    2. mean word length in [3, 10] characters
    3. symbol-to-word ratio ('#' chars + non-overlapping '...' + '…')
       <= 0.1
    4. fraction of words containing an alphabetic char >= 0.8
    5. >= min_stop distinct hits from the 8-word stopword list
       (Gopher's published threshold is 2)
    6. <= 90% of lines start with a bullet ('-', '*', '•')
    7. <= 30% of lines end with an ellipsis ('...' or '…')

    Fully vectorized: ONE regex split per doc, then flat-token /
    parent-index numpy folds (bincount) — no per-token Python. Every
    ratio is a single float64 division of exact int counts, replayed
    verbatim by the DuckDB twin; `keep` is the BIGINT AND of the 7
    flags. Lines are '\\n' segments trimmed of spaces/tabs/CRs;
    blank lines don't count.
    """
    if batch.num_columns == 0:
        return GOPHER_SCHEMA.empty_table()
    n = batch.num_rows
    text = pc.fill_null(batch.column(text_col), "")

    # --- word axis: flat tokens + parent indices, nonempty only ---
    split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    flat = pc.list_flatten(split)
    par = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    ne = pc.not_equal(flat, "")
    mask = ne.to_numpy(zero_copy_only=False)
    flat_ne = flat.filter(ne)
    par = par[mask]
    n_words = np.bincount(par, minlength=n).astype(np.int64)
    lens = pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False)
    sum_len = np.bincount(par, weights=lens, minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(flat_ne, "[a-z]").to_numpy(zero_copy_only=False)
    n_alpha = np.bincount(par[alpha], minlength=n).astype(np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        eq = pc.equal(flat_ne, w).to_numpy(zero_copy_only=False)
        n_stop += np.bincount(par[eq], minlength=n) > 0

    # --- symbol axis: per-doc substring counts (non-overlapping) ---
    n_sym = (
        pc.count_substring(text, "#").to_numpy(zero_copy_only=False).astype(np.int64)
        + pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
        + pc.count_substring(text, "…").to_numpy(zero_copy_only=False)
    )

    # --- line axis: '\n' segments, trimmed, nonblank ---
    lines = pc.split_pattern(text, "\n")
    lpar = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    ltrim = pc.utf8_trim(pc.list_flatten(lines), " \t\r")
    lne = pc.not_equal(ltrim, "").to_numpy(zero_copy_only=False)
    ltrim_ne = ltrim.filter(pa.array(lne))
    lpar = lpar[lne]
    n_lines = np.bincount(lpar, minlength=n).astype(np.int64)
    bullet = (
        pc.starts_with(ltrim_ne, "-").to_numpy(zero_copy_only=False)
        | pc.starts_with(ltrim_ne, "*").to_numpy(zero_copy_only=False)
        | pc.starts_with(ltrim_ne, "•").to_numpy(zero_copy_only=False)
    )
    ell = (
        pc.ends_with(ltrim_ne, "...").to_numpy(zero_copy_only=False)
        | pc.ends_with(ltrim_ne, "…").to_numpy(zero_copy_only=False)
    )
    n_bullet = np.bincount(lpar[bullet], minlength=n).astype(np.int64)
    n_ell = np.bincount(lpar[ell], minlength=n).astype(np.int64)

    wden = np.maximum(n_words, 1).astype(np.float64)
    lden = np.maximum(n_lines, 1).astype(np.float64)
    mean_word_len = sum_len.astype(np.float64) / wden
    symbol_ratio = n_sym.astype(np.float64) / wden
    alpha_frac = n_alpha.astype(np.float64) / wden
    bullet_frac = n_bullet.astype(np.float64) / lden
    ellipsis_frac = n_ell.astype(np.float64) / lden
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (n_stop >= min_stop)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mean_word_len),
            "symbol_ratio": pa.array(symbol_ratio),
            "alpha_frac": pa.array(alpha_frac),
            "n_stop": pa.array(n_stop),
            "bullet_frac": pa.array(bullet_frac),
            "ellipsis_frac": pa.array(ellipsis_frac),
            "keep": pa.array(keep),
        }
    )


def gopher_rules_stage(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_stop: int = 2,
    batch_size: int = 1024,
):
    return ds.map_batches(
        gopher_rules_batch,
        fn_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "min_words": min_words,
            "max_words": max_words,
            "min_stop": min_stop,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
    )


LANG_MIX_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_segments", pa.int64()),
        ("n_langs", pa.int64()),
        ("majority_lang", pa.string()),
        ("majority_frac", pa.float64()),
    ]
)


def lang_mix_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 16,
) -> pa.Table:
    """Per-document code-switching audit: the stopword-profile
    language ID applied per fixed-size token window (consecutive
    ``seg_tokens``-token chunks of the shared whitespace tokenization,
    last chunk = remainder — the rag_chunks granularity), folded to
    how many languages a document mixes and how dominant the majority
    one is. Per-segment prediction replicates ``langid_batch``'s
    pinned semantics exactly (profile-hit argmax in sorted-language
    order; zero hits or a tie on the positive max → 'und'); the
    majority vote over segments breaks count ties toward the
    alphabetically smallest language (argmax over the sorted code
    axis), a deliberate, SQL-replayable pin. Token-less docs report
    ('und', 0.0).

    Fully vectorized: flat tokens + parent indices, per-profile
    ``is_in`` masks, bincount folds — no per-token Python. Columns:
    doc_id, n_segments, n_langs, majority_lang, majority_frac
    (majority segment count / n_segments, one double division)."""
    if batch.num_columns == 0:
        return LANG_MIX_SCHEMA.empty_table()
    n = batch.num_rows
    text = pc.fill_null(batch.column(text_col), "")
    split = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    flat = pc.list_flatten(split)
    par = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    ne = pc.not_equal(flat, "")
    mask = ne.to_numpy(zero_copy_only=False)
    flat_ne = flat.filter(ne)
    par = par[mask].astype(np.int64)

    # position within doc → window id → compacted segment index
    counts = np.bincount(par, minlength=n)
    doc_first = np.concatenate(([0], np.cumsum(counts)))[:-1]
    pos = np.arange(par.size, dtype=np.int64) - doc_first[par]
    win = pos // seg_tokens
    kwin = int(win.max()) + 1 if win.size else 1
    pair = par * kwin + win
    seg_keys, seg_idx = np.unique(pair, return_inverse=True)
    nseg = seg_keys.size
    seg_doc = seg_keys // kwin

    langs_sorted = sorted(LANG_PROFILES)
    hits = np.zeros((nseg, len(langs_sorted)), dtype=np.int64)
    for j, lang in enumerate(langs_sorted):
        inset = pc.is_in(
            flat_ne, value_set=pa.array(sorted(LANG_PROFILES[lang]))
        ).to_numpy(zero_copy_only=False)
        hits[:, j] = np.bincount(seg_idx[inset], minlength=nseg)

    codes_order = sorted(langs_sorted + ["und"])
    und_code = codes_order.index("und")
    lang_code = np.array([codes_order.index(lang) for lang in langs_sorted])
    mx = hits.max(axis=1) if nseg else np.zeros(0, dtype=np.int64)
    ties = (hits == mx[:, None]).sum(axis=1)
    pred = np.where(
        (mx == 0) | (ties >= 2), und_code, lang_code[hits.argmax(axis=1)]
    )

    k = len(codes_order)
    cnt = np.bincount(seg_doc * k + pred, minlength=n * k).reshape(n, k)
    n_segments = cnt.sum(axis=1).astype(np.int64)
    n_langs = (cnt > 0).sum(axis=1).astype(np.int64)
    maj_idx = cnt.argmax(axis=1)  # first max → alphabetical-min tie-break
    maj_cnt = cnt[np.arange(n), maj_idx]
    majority = np.where(n_segments > 0, np.array(codes_order)[maj_idx], "und")
    frac = maj_cnt.astype(np.float64) / np.maximum(n_segments, 1)
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "n_segments": pa.array(n_segments),
            "n_langs": pa.array(n_langs),
            "majority_lang": pa.array(majority.tolist(), type=pa.string()),
            "majority_frac": pa.array(frac),
        }
    )


def lang_mix_stage(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 16,
    batch_size: int = 1024,
):
    return ds.map_batches(
        lang_mix_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "seg_tokens": seg_tokens},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
