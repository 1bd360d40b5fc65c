"""External-oracle parity: the reference's own conlleval.pl (present in
the read-only reference tree, scripts/conlleval.pl) must parse our S3
export and report the same precision/recall as the engine's G4-G6
metrics on identical data — this pins both the export FORMAT
(dataset_to_conll_file.py:6-16 semantics) and the span semantics
(entity_level_precision_recall.py:134-164, incl. I-after-O starts and
B-after-B flushes, which conlleval's CoNLL-2000 chunking rules share
for bare B/I/O tags)."""

import re
import shutil
import subprocess

import pytest

from bioner_ray.functions.bio import B, I, O, f1_from_counts, sentence_prf_counts
from bioner_ray.sources.conll import write_conlleval_file

CONLLEVAL = "/root/reference/scripts/conlleval.pl"

#: (tokens, gold, pred) sentences covering the automaton's edge cases
SENTS = [
    # plain match + miss
    (["aspirin", "treats", "pain"], [B, O, O], [B, O, B]),
    # multi-token span, exact boundary match required
    (["vitamin", "b", "complex", "works"], [B, I, I, O], [B, I, O, O]),
    # I-after-O opens a span in BOTH scorers
    (["x", "y", "z"], [O, I, I], [O, I, I]),
    # B after B flushes; sentence-end flushes an open span
    (["a", "b", "c"], [B, B, I], [B, B, I]),
    # all-O sentence
    (["nothing", "here"], [O, O], [O, O]),
]


def _docs():
    return [
        {
            "doc_id": 0,
            "sentences": [
                {
                    "sent_id": i,
                    "token_text": toks,
                    "token_start": [],
                    "token_end": [],
                    "gold_tags": g,
                    "pred_tags": p,
                }
                for i, (toks, g, p) in enumerate(SENTS)
            ],
        }
    ]


@pytest.mark.skipif(shutil.which("perl") is None, reason="no perl in PATH")
class TestConllevalParity:
    def test_perl_scorer_matches_engine_metrics(self, tmp_path):
        path = tmp_path / "export.conll"
        write_conlleval_file(_docs(), str(path))
        with open(path) as f:
            out = subprocess.run(
                ["perl", CONLLEVAL], stdin=f, capture_output=True, text=True, check=True
            ).stdout
        m = re.search(
            r"precision:\s+([0-9.]+)%; recall:\s+([0-9.]+)%; FB1:\s+([0-9.]+)", out
        )
        assert m, f"unexpected conlleval output:\n{out}"
        perl_p, perl_r, perl_f1 = (float(g) for g in m.groups())

        tp = n_pred = n_gold = 0
        for _, g, p in SENTS:
            t, np_, ng = sentence_prf_counts(g, p)
            tp += t
            n_pred += np_
            n_gold += ng
        p_, r_, f1_ = f1_from_counts(tp, n_pred, n_gold)
        assert perl_p == pytest.approx(100 * p_, abs=0.005)
        assert perl_r == pytest.approx(100 * r_, abs=0.005)
        assert perl_f1 == pytest.approx(100 * f1_, abs=0.005)
        # the fixture is adversarial enough that P and R differ and are
        # strictly inside (0, 1) — a formatting bug cannot hide at 0/100
        assert 0 < p_ < 1 and 0 < r_ < 1 and p_ != r_
