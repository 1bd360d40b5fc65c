"""Pipeline-level external-oracle parity (VERDICT r4, Next #5): the
reference's OWN Perl scorer (`scripts/conlleval.pl`, wired by
`annotate_dataset.py:45-48,67-73`) scores the engine's full-corpus
conlleval export for sf0.001 and must report the exact P/R/F1 that the
registered `ner_eval` query (G4-G6, `entity_level_prf`) computes over
the identical dual-tagged documents. This closes the loop the
crafted-sentence parity test (`test_conlleval_parity.py`) opens: the
external oracle now scores REAL pipeline output, not a unit fixture."""

from __future__ import annotations

import re
import shutil
import subprocess

import pytest

CONLLEVAL = "/root/reference/scripts/conlleval.pl"
SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(shutil.which("perl") is None, reason="no perl in PATH")
def test_conlleval_pl_scores_pipeline_export_like_ner_eval(tmp_path):
    import __ray_entry__ as e
    from bioner_ray.pipelines.analytics import _dual_tagged_documents
    from bioner_ray.sources.conll import write_conlleval_file

    # the ner_eval query's own input pipeline, exported via the S3 writer
    docs = _dual_tagged_documents(SF).take_all()  # bounded: 500 fixture docs
    docs = [
        {**d, "doc_id": i} for i, d in enumerate(sorted(docs, key=lambda d: d["url"]))
    ]
    path = tmp_path / "corpus.conll"
    write_conlleval_file(docs, str(path))

    with open(path) as f:
        out = subprocess.run(
            ["perl", CONLLEVAL], stdin=f, capture_output=True, text=True, check=True
        ).stdout
    m = re.search(
        r"precision:\s+([0-9.]+)%; recall:\s+([0-9.]+)%; FB1:\s+([0-9.]+)", out
    )
    assert m, f"unexpected conlleval output:\n{out}"
    perl_p, perl_r, perl_f1 = (float(g) for g in m.groups())

    got = e.queries()["ner_eval"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    row = got.iloc[0]
    # conlleval prints 2-decimal percentages; the engine's floats must
    # round to exactly those values
    assert perl_p == pytest.approx(100 * row["precision"], abs=0.005)
    assert perl_r == pytest.approx(100 * row["recall"], abs=0.005)
    assert perl_f1 == pytest.approx(100 * row["f1"], abs=0.005)
    # and the corpus is non-degenerate: spans exist on both sides
    assert row["tp"] > 0 and row["n_pred"] > row["tp"] and row["n_gold"] > row["tp"]
