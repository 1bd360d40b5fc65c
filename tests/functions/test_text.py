"""Golden tests for the scalar text kernels.

Golden values mirror the reference's unit tests
(tests/model/test_n_gram_encoder.py:5-97 and
tests/test_pubmed_parser.py) — re-derived, not copied.
"""

import sys

import numpy as np
import pytest

from bioner_ray.functions.text import (
    ABSTRACT_TRUNCATED,
    ABSTRACT_TRUNCATED_AT_250,
    ABSTRACT_TRUNCATED_AT_400,
    bioul_to_bio2,
    create_n_grams,
    keep_only_printable_chars,
    position_features,
    process_abstract_text,
    split_sentences,
    surface_features,
    tokenize_with_offsets,
)


class TestKeepOnlyPrintableChars:
    """Unicode normalizer goldens (cf. reference test_n_gram_encoder.py:5-55)."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("25 °C (77 °F)", "25c(77f)"),
            ("Maßähnliche", "maßähnliche"),
            ("§63", "§63"),
            ("Hello World", "helloworld"),
            ("a\tb\nc", "abc"),
            ("ASA", "asa"),
            ("1,667", "1,667"),
            ("$5 + €3", "$5+€3"),  # currency + math symbols kept
            ("", ""),
        ],
    )
    def test_goldens(self, raw, expected):
        assert keep_only_printable_chars(raw) == expected


class TestNGrams:
    def test_trigram_shape(self):
        # '#' + 'minister' + '#' → 10 chars → 8 trigrams
        grams = create_n_grams("Minister", 3)
        assert grams[0] == "#mi"
        assert grams[-1] == "er#"
        assert len(grams) == 8

    def test_short_token_yields_nothing_beyond_padding(self):
        assert create_n_grams("a", 3) == ["#a#"]

    def test_empty_token(self):
        # padded form '##' shorter than 3 → no trigrams (reference range is empty)
        assert create_n_grams("", 3) == []


class TestSurfaceFeatures:
    # feature order: su, sl, au, al, mixed, anum, inum, snum, enum, spunct, epunct
    @pytest.mark.parametrize(
        "token,expected",
        [
            ("Hello", (1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)),
            ("hello", (0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0)),
            ("ASA", (1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)),
            ("(ASA)", (1, 0, 1, 0, 0, 0, 1, 1, 1, 1, 1)),
            ("1,667", (0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0)),
            ("mRNA", (0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0)),
            (".", (0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1)),
            ("B12", (1, 0, 1, 0, 0, 0, 1, 0, 1, 0, 0)),
            ("", (0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0)),
        ],
    )
    def test_goldens(self, token, expected):
        assert surface_features(token) == tuple(float(x) for x in expected)

    def test_parity_with_reference_module(self):
        """Oracle: the reference SurfaceEncoder (torch-free module)."""
        sys.path.insert(0, "/root/reference")
        try:
            from bioner.model.encoder.surface_encoder import SurfaceEncoder
        finally:
            sys.path.remove("/root/reference")
        tokens = [
            "Hello", "hello", "ASA", "(ASA)", "1,667", "mRNA", ".", "B12",
            "", "  spaced  ", "§", "a-b", "Über", "3.14", "x_y", "°C",
            "p53", "COVID-19", "„quote“",
        ]
        for t in tokens:
            assert surface_features(t) == tuple(SurfaceEncoder.encode(t).tolist()), t

    def test_empty_token_matches_reference_predicates(self):
        """'' : all letter-predicates False → mixed True; '' == sub('','') →
        all_numeric True; the len==0 early-outs make the positional
        predicates False (surface_encoder.py:78-104)."""
        feats = surface_features("")
        assert feats[4] == 1.0 and feats[5] == 1.0
        assert sum(feats) == 2.0


class TestPositionFeatures:
    def test_single_sentence_doc(self):
        blocks = position_features(1, [3])
        b = blocks[0]
        assert b.tolist() == [
            [1, 1, 0, 0],  # first token: begin_doc + begin_sentence
            [0, 0, 0, 0],
            [0, 0, 1, 1],  # last token: end_sentence + end_document
        ]

    def test_one_token_sentence(self):
        blocks = position_features(2, [1, 2])
        assert blocks[0].tolist() == [[1, 1, 1, 0]]
        assert blocks[1].tolist() == [[0, 1, 0, 0], [0, 0, 1, 1]]


class TestProcessAbstractText:
    def test_plain_appends_newline(self):
        out, kind = process_abstract_text("Some text.")
        assert out == "Some text.\n"
        assert kind == "none"

    @pytest.mark.parametrize(
        "suffix,kind",
        [
            (ABSTRACT_TRUNCATED_AT_250, "250"),
            (ABSTRACT_TRUNCATED_AT_400, "400"),
            (ABSTRACT_TRUNCATED, "plain"),
        ],
    )
    def test_marker_detected_but_kept(self, suffix, kind):
        """The reference's re.sub never matches (unescaped parens) —
        detect-only is the byte-faithful behavior."""
        text = "Body text. " + suffix
        out, k = process_abstract_text(text)
        assert out == text + "\n"
        assert k == kind

    def test_strip_mode_removes_marker(self):
        text = "Body text. " + ABSTRACT_TRUNCATED
        out, _ = process_abstract_text(text, strip=True)
        assert out == "Body text. \n"

    def test_parity_with_reference_module(self):
        """Byte-identity oracle: run the actual reference implementation
        (torch-free module) side by side."""
        sys.path.insert(0, "/root/reference")
        try:
            from bioner.preprocessing.pubmed_parser import PubMedParser
        finally:
            sys.path.remove("/root/reference")
        ref = PubMedParser()
        cases = [
            "Plain abstract text.",
            "Ends with marker. " + ABSTRACT_TRUNCATED_AT_250,
            "Ends with marker. " + ABSTRACT_TRUNCATED_AT_400,
            "Ends with marker. " + ABSTRACT_TRUNCATED,
            "Marker inside " + ABSTRACT_TRUNCATED + " not at end.",
            "",
            "unicode ß °C „quoted“.",
        ]
        for case in cases:
            assert process_abstract_text(case)[0] == ref.process_abstract_text(case)


class TestBioul:
    @pytest.mark.parametrize(
        "tag,expected",
        [("B-X", "B"), ("I-X", "I"), ("O", "O"), ("L-X", "I"), ("U-X", "B")],
    )
    def test_mapping(self, tag, expected):
        assert bioul_to_bio2(tag) == expected

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            bioul_to_bio2("Z-X")


class TestSegmentation:
    def test_split_sentences(self):
        assert split_sentences("One two. Three four! Five?") == [
            "One two.",
            "Three four!",
            "Five?",
        ]

    def test_no_boundary(self):
        assert split_sentences("no terminal punctuation here") == [
            "no terminal punctuation here"
        ]

    def test_empty(self):
        assert split_sentences("") == []
        assert split_sentences("   ") == []

    def test_tokenize_offsets(self):
        texts, starts, ends = tokenize_with_offsets("ab  cd e")
        assert texts == ["ab", "cd", "e"]
        assert starts == [0, 4, 7]
        assert ends == [2, 6, 8]
