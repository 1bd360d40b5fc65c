"""Scalar text functions — the semantics-critical kernels of the engine.

Each function reproduces the observable behavior of a reference
counterpart (cited file:line into /root/reference) but is written for
vectorized, batch-at-a-time use inside ``Dataset.map_batches``: the
per-token functions are memoized so a batch pays once per *unique*
token, not once per occurrence.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import regex

# ---------------------------------------------------------------------------
# Unicode normalizer (reference: bioner/model/encoder/ngram_encoder.py:10-11)
# ---------------------------------------------------------------------------

_PRINTABLE_RE = regex.compile(r"[^\p{L}\p{N}\p{P}\p{Sm}\p{Sc}]")


@functools.lru_cache(maxsize=262144)
def keep_only_printable_chars(text: str) -> str:
    """Keep letters/digits/punctuation/math+currency symbols, lowercase.

    Semantics of ``keep_only_printable_chars``
    (ngram_encoder.py:10-11); golden cases in
    tests/model/test_n_gram_encoder.py:5-55 of the reference
    (e.g. ``25 °C (77 °F)`` → ``25c(77f)``).
    """
    return _PRINTABLE_RE.sub("", text).lower()


# ---------------------------------------------------------------------------
# n-grams (reference: ngram_encoder.py:152-157)
# ---------------------------------------------------------------------------


_EDGE_PUNCT_RE = regex.compile(r"^\p{P}+|\p{P}+$")


@functools.lru_cache(maxsize=262144)
def normalize_match_token(token: str) -> str:
    """Dictionary-matching normalization: ``keep_only_printable_chars``
    plus edge-punctuation strip, so ``ASPIRIN,`` and sentence-final
    ``aspirin.`` match the surface ``aspirin``. Used by the gazetteer
    tagger and the entity linker so both sides agree."""
    return _EDGE_PUNCT_RE.sub("", keep_only_printable_chars(token))


def normalize_surface(surface: str) -> str:
    """Whitespace-separated multi-token normalization for surfaces."""
    return " ".join(normalize_match_token(w) for w in surface.split())


def create_n_grams(token: str, n: int) -> list[str]:
    """``'#' + normalized + '#'`` sliding window of size n.

    Mirrors ``NGramEncoder.create_n_grams`` (ngram_encoder.py:152-157):
    a token whose padded form is shorter than n yields no n-grams.
    """
    word = "#" + keep_only_printable_chars(token) + "#"
    return [word[i : i + n] for i in range(len(word) - n + 1)]


# ---------------------------------------------------------------------------
# Surface features (reference: bioner/model/encoder/surface_encoder.py:12-100)
# ---------------------------------------------------------------------------

_LETTERS_ONLY_RE = regex.compile(r"[^\p{L}]")
_NUM_PUNCT_ONLY_RE = regex.compile(r"[^\p{N}\p{P}]")
_PUNCT_ONLY_RE = regex.compile(r"[^\p{P}]")

SURFACE_DIM = 11


@functools.lru_cache(maxsize=262144)
def surface_features(token: str) -> tuple[float, ...]:
    """11 binary surface features, exactly the reference's predicate set
    and order (surface_encoder.py:12-31):

    0 starts_with_uppercase  (letters-only projection, :33-39)
    1 starts_with_lowercase  (:41-47)
    2 is_all_uppercase       (:49-55)
    3 is_all_lowercase       (:57-63)
    4 is_mixed_case          (:65-68 — note: defined via NOT starts_upper
                              AND NOT all_upper AND NOT all_lower)
    5 is_all_numeric         (digits+punct projection equality, :70-72)
    6 includes_numeric       (:74-76)
    7 starts_with_numeric    (first char fixed under digit+punct strip, :78-83)
    8 ends_with_numeric      (:85-90)
    9 starts_with_punctuation (:92-97)
    10 ends_with_punctuation  (:99-104)

    The token is stripped first (surface_encoder.py:14).
    """
    token = token.strip()
    letters = _LETTERS_ONLY_RE.sub("", token)
    has_letters = len(letters) > 0
    starts_upper = has_letters and letters[0].isupper()
    starts_lower = has_letters and letters[0].islower()
    all_upper = has_letters and letters.isupper()
    all_lower = has_letters and letters.islower()
    mixed = (not starts_upper) and (not all_upper) and (not all_lower)
    all_numeric = token == _NUM_PUNCT_ONLY_RE.sub("", token)
    includes_numeric = len(_NUM_PUNCT_ONLY_RE.sub("", token)) != 0
    if token:
        first, last = token[0], token[-1]
        starts_numeric = first == _NUM_PUNCT_ONLY_RE.sub("", first)
        ends_numeric = last == _NUM_PUNCT_ONLY_RE.sub("", last)
        starts_punct = first == _PUNCT_ONLY_RE.sub("", first)
        ends_punct = last == _PUNCT_ONLY_RE.sub("", last)
    else:
        starts_numeric = ends_numeric = starts_punct = ends_punct = False
    feats = (
        starts_upper,
        starts_lower,
        all_upper,
        all_lower,
        mixed,
        all_numeric,
        includes_numeric,
        starts_numeric,
        ends_numeric,
        starts_punct,
        ends_punct,
    )
    return tuple(1.0 if f else 0.0 for f in feats)


def surface_features_batch(tokens: np.ndarray | list[str]) -> np.ndarray:
    """(n, 11) float32 feature matrix; computed once per unique token."""
    tokens = np.asarray(tokens, dtype=object)
    uniq, inverse = np.unique(tokens, return_inverse=True)
    mat = np.empty((len(uniq), SURFACE_DIM), dtype=np.float32)
    for i, tok in enumerate(uniq):
        mat[i] = surface_features(tok)
    return mat[inverse]


# ---------------------------------------------------------------------------
# Position features (reference: bioner/model/encoder/position_encoder.py:10-33)
# ---------------------------------------------------------------------------

POSITION_DIM = 4


def position_features(n_sentences: int, sentence_lengths: list[int]) -> list[np.ndarray]:
    """Per-sentence (len, 4) feature blocks for one document.

    Features in reference order (position_encoder.py:27-33):
    [begin_doc, begin_sentence, end_sentence, end_document]; begin_doc only
    on the first token of the first sentence, end_document only on the last
    token of the last sentence (position_encoder.py:13-25).
    """
    out = []
    for s_idx in range(n_sentences):
        n_tok = sentence_lengths[s_idx]
        block = np.zeros((n_tok, POSITION_DIM), dtype=np.float32)
        if n_tok:
            block[0, 1] = 1.0  # begin_sentence
            block[-1, 2] = 1.0  # end_sentence
            if s_idx == 0:
                block[0, 0] = 1.0  # begin_doc
            if s_idx == n_sentences - 1:
                block[-1, 3] = 1.0  # end_document
        out.append(block)
    return out


# ---------------------------------------------------------------------------
# Truncation-suffix strip (reference: bioner/preprocessing/pubmed_parser.py:10-12,41-53)
# ---------------------------------------------------------------------------

ABSTRACT_TRUNCATED_AT_250 = "(ABSTRACT TRUNCATED AT 250 WORDS)"
ABSTRACT_TRUNCATED_AT_400 = "(ABSTRACT TRUNCATED AT 400 WORDS)"
ABSTRACT_TRUNCATED = "(ABSTRACT TRUNCATED)"

_TRUNCATION_SUFFIXES = (
    ("250", ABSTRACT_TRUNCATED_AT_250),
    ("400", ABSTRACT_TRUNCATED_AT_400),
    ("plain", ABSTRACT_TRUNCATED),
)


def process_abstract_text(text: str, strip: bool = False) -> tuple[str, str]:
    """Detect a trailing truncation marker and append exactly one ``\\n``.

    Byte-identical to ``PubMedParser.process_abstract_text``
    (pubmed_parser.py:41-53). NOTE the reference's removal is a no-op:
    it builds the pattern as ``re.sub(suffix + "$", ...)`` with the
    suffix's parentheses UNescaped, so ``(ABSTRACT TRUNCATED AT 250
    WORDS)$`` is a *group* that must match at end-of-string — but the
    detected text ends with a literal ``)``, so the pattern never
    matches and the marker is left in place. The observable reference
    behavior (verified against the reference module directly in
    tests/functions/test_text.py) is therefore: detect (for the
    counters, pubmed_parser.py:14-18), leave text unchanged, append one
    newline. ``strip=True`` opts into the evidently-intended semantics.

    Returns (processed_text, truncated_kind), kind ∈
    {"none","250","400","plain"}; the kind feeds per-partition
    truncation-counter metrics columns instead of mutable instance
    state.
    """
    for kind, suffix in _TRUNCATION_SUFFIXES:
        if text.endswith(suffix):
            if strip:
                return text[: -len(suffix)] + "\n", kind
            return text + "\n", kind
    return text + "\n", "none"


# ---------------------------------------------------------------------------
# BIOUL → BIO2 mapping (reference: bioner/misc/scibert/scibert_eval.py:125-134)
# ---------------------------------------------------------------------------


def bioul_to_bio2(tag: str) -> str:
    """``L→I``, ``U→B``, B/I/O pass through; anything else raises
    (scibert_eval.py:125-134)."""
    first = tag[0]
    if first in ("B", "I", "O"):
        return first
    if first == "L":
        return "I"
    if first == "U":
        return "B"
    raise ValueError("Tag does not conform to the BIOUL scheme")


# ---------------------------------------------------------------------------
# Sentence segmentation + whitespace tokenization (engine-defined, used by
# the KG pipeline over web pages; deterministic & oracle-matchable)
# ---------------------------------------------------------------------------

_SENT_BOUNDARY_RE = re.compile(r"(?<=[.!?])\s+")
_TOKEN_RE = re.compile(r"\S+")


def split_sentences(text: str) -> list[str]:
    """Split on whitespace that follows ``.``/``!``/``?``; drop
    empty/whitespace-only segments. Deterministic pure function."""
    return [s for s in _SENT_BOUNDARY_RE.split(text) if s.strip()]


def split_sentences_with_offsets(text: str) -> list[tuple[str, int]]:
    """``split_sentences`` plus each sentence's char offset into
    ``text`` — needed when downstream spans (PubTator annotations)
    index the original string. Same segments, same drop rule."""
    out = []
    pos = 0
    for m in _SENT_BOUNDARY_RE.finditer(text):
        seg = text[pos : m.start()]
        if seg.strip():
            out.append((seg, pos))
        pos = m.end()
    seg = text[pos:]
    if seg.strip():
        out.append((seg, pos))
    return out


def tokenize_with_offsets(sentence: str) -> tuple[list[str], list[int], list[int]]:
    """Whitespace tokens with [start, end) char offsets into the sentence.

    ``m.span()`` + a string slice is one C call per token instead of the
    three (group/start/end) of the naive loop — this function runs once
    per token of the whole corpus, so constant factors matter."""
    starts, ends = [], []
    for m in _TOKEN_RE.finditer(sentence):
        s, e = m.span()
        starts.append(s)
        ends.append(e)
    texts = [sentence[s:e] for s, e in zip(starts, ends)]
    return texts, starts, ends


def human_format(num: float) -> str:
    """k/M/B/T suffix formatting (reference: misc/error_analysis/analysis.py:173-180)."""
    num = float(f"{num:.3g}")
    magnitude = 0
    while abs(num) >= 1000:
        magnitude += 1
        num /= 1000.0
    return "{}{}".format(f"{num:f}".rstrip("0").rstrip("."), ["", "K", "M", "B", "T"][magnitude])
