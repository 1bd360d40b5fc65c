"""CoNLL-2003-style sources and sinks (reference S1/S2/S3/S8).

Reader semantics are an exact re-derivation of
``CoNLLDataset.read_documents`` (bioner/model/conll_dataset.py:31-64):

* tab-separated, every character literal (``quotechar=None``, :35)
* a row whose first field starts with ``-DOCSTART-`` separates documents
  (:66-73); consecutive separator rows form one separator group
* blank lines separate sentences (:75-77)
* token rows have exactly 4 fields; the tag is the FIRST CHARACTER of
  field 4 (:83 — ``B-T116,T123`` → ``B``)
* document ids: 0 for the first document, then 1, 2, … (:36-38)
* after input ends the current document is appended UNCONDITIONALLY
  (:61-63) — a file ending in ``-DOCSTART-`` therefore yields a
  trailing zero-sentence document; we reproduce that faithfully.

In Ray Data, whole files are parsed in ``flat_map`` over
``read_binary_files`` so document boundaries never cross blocks
(SURVEY.md §2.1 S1); one output row per document, sentence/token
nesting kept inside the row. ``start``/``end`` are carried verbatim as
STRINGS (reference Token fields are strings, token.py:6-17) so the
writer round-trips byte-identically.
"""

from __future__ import annotations

import itertools as it
from typing import Iterable

import pyarrow as pa

from bioner_ray.functions.bio import index_to_tag, tag_to_index

DOC_START = "-DOCSTART-"

CONLL_SENTENCE_TYPE = pa.struct(
    [
        ("sent_id", pa.int32()),
        ("token_text", pa.list_(pa.string())),
        ("token_start", pa.list_(pa.string())),
        ("token_end", pa.list_(pa.string())),
        ("gold_tags", pa.list_(pa.uint8())),
    ]
)
CONLL_DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("sentences", pa.list_(CONLL_SENTENCE_TYPE)),
    ]
)


def _is_document_separator(row: list[str]) -> bool:
    return len(row) > 0 and row[0].startswith(DOC_START)


def _sentence_dict(sent_id: int, tokens: list[tuple[str, str, str, int]]) -> dict:
    return {
        "sent_id": sent_id,
        "token_text": [t[0] for t in tokens],
        "token_start": [t[1] for t in tokens],
        "token_end": [t[2] for t in tokens],
        "gold_tags": [t[3] for t in tokens],
    }


def parse_conll(text: str) -> list[dict]:
    """Parse one CoNLL file's content → list of document rows."""
    rows = [line.split("\t") if line else [] for line in text.split("\n")]
    # split("\n") yields a trailing '' for newline-terminated files; the csv
    # reader sees no such row — drop exactly one trailing empty artifact.
    if rows and text.endswith("\n"):
        rows.pop()
    documents: list[dict] = []
    ids = it.count(1)
    current_doc_id = 0
    current_sentences: list[dict] = []
    for new_doc, doc_rows in it.groupby(rows, _is_document_separator):
        if new_doc:
            if current_sentences:
                documents.append({"doc_id": current_doc_id, "sentences": current_sentences})
                current_sentences = []
                current_doc_id = next(ids)
        else:
            current_tokens: list[tuple[str, str, str, int]] = []
            sent_id = len(current_sentences)
            for new_sentence, sentence_rows in it.groupby(doc_rows, lambda r: len(r) == 0):
                if new_sentence:
                    if current_tokens:
                        current_sentences.append(_sentence_dict(sent_id, current_tokens))
                        sent_id += 1
                        current_tokens = []
                else:
                    for raw in sentence_rows:
                        assert len(raw) == 4, f"malformed CoNLL row: {raw!r}"
                        current_tokens.append(
                            (raw[0], raw[1], raw[2], tag_to_index(raw[3]))
                        )
            if current_tokens:
                current_sentences.append(_sentence_dict(sent_id, current_tokens))
    documents.append({"doc_id": current_doc_id, "sentences": current_sentences})
    return documents


def read_conll(paths: str | list[str]):
    """CoNLL file(s) → Dataset of CONLL_DOCS_SCHEMA rows (+ ``path``).

    Whole-file parse in flat_map: doc ids restart per file, as in the
    reference (one CoNLLDataset per file).
    """
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_row(row: dict) -> list[dict]:
        docs = parse_conll(row["bytes"].decode("utf-8"))
        for d in docs:
            d["path"] = row["path"]
        return docs

    return ds.flat_map(parse_row)


# ---------------------------------------------------------------------------
# Writer (reference S2: conll_dataset.py:110-120)
# ---------------------------------------------------------------------------


def format_conll_document(doc: dict, tags_key: str = "gold_tags") -> str:
    """One document → its exact byte block: ``-DOCSTART-\\t0\\t0\\tO`` line,
    blank line, then each sentence's token lines followed by a blank line.
    Tags are written as their single-char value (normalizing multi-type
    tags like ``B-T116,T123`` → ``B``, exactly as the reference writer
    does by emitting ``token.tag.value``)."""
    out = [f"{DOC_START}\t0\t0\tO\n", "\n"]
    for sent in doc["sentences"]:
        tags = sent[tags_key]
        for text, start, end, tag in zip(
            sent["token_text"], sent["token_start"], sent["token_end"], tags
        ):
            out.append(f"{text}\t{start}\t{end}\t{index_to_tag(tag)}\n")
        out.append("\n")
    return "".join(out)


def write_conll_file(docs: Iterable[dict], path: str, tags_key: str = "gold_tags") -> None:
    """Materialize documents (pre-sorted by doc_id) to one byte-stable
    file. Used for eval exports (small); bulk output goes to Parquet."""
    docs = sorted(docs, key=lambda d: d["doc_id"])
    with open(path, "w", encoding="utf8") as f:
        for doc in docs:
            f.write(format_conll_document(doc, tags_key=tags_key))


# ---------------------------------------------------------------------------
# conlleval side-by-side export (reference S3: dataset_to_conll_file.py:6-16,
# duplicated at postprocess_predictions.py:47-57 and scibert_eval.py:137-147)
# ---------------------------------------------------------------------------


def format_conlleval_document(doc: dict, gold_key: str = "gold_tags", pred_key: str = "pred_tags") -> str:
    """``token gold pred`` lines, each sentence PRECEDED by one blank
    line (the reference writes "\\n" before each sentence). Gold and
    predicted tags live on the same row in our model, so the
    reference's positional two-dataset zip (J2/J3) is by construction."""
    out = []
    for sent in doc["sentences"]:
        out.append("\n")
        for text, g, p in zip(sent["token_text"], sent[gold_key], sent[pred_key]):
            out.append(f"{text} {index_to_tag(g)} {index_to_tag(p)}\n")
    return "".join(out)


def write_conlleval_file(docs: Iterable[dict], path: str) -> None:
    docs = sorted(docs, key=lambda d: d["doc_id"])
    with open(path, "w", encoding="utf8") as f:
        for doc in docs:
            f.write(format_conlleval_document(doc))


# ---------------------------------------------------------------------------
# External prediction TSV (reference S8: postprocess_predictions.py:9-18) and
# the positional annotate join (J3: postprocess_predictions.py:21-38)
# ---------------------------------------------------------------------------


def read_prediction_tsv(text: str) -> list[tuple[str, str]]:
    """Space-separated ``token label`` pairs; rows with field count != 2
    are skipped (reference :14-17). Every character literal."""
    out = []
    for line in text.split("\n"):
        row = line.split(" ") if line else []
        if len(row) == 2:
            out.append((row[0], row[1]))
    return out


def annotate_documents_positionally(
    docs: list[dict], annotated_tokens: list[tuple[str, str]]
) -> list[dict]:
    """Zip external predictions onto documents in (doc, sentence, token)
    order, asserting token-text equality (reference :31-34); predicted
    tag replaces the gold in a new ``pred_tags`` list. Raises ValueError
    on text mismatch, exactly like the reference."""
    docs = sorted(docs, key=lambda d: d["doc_id"])
    i = 0
    out = []
    for doc in docs:
        new_sents = []
        for sent in doc["sentences"]:
            pred = []
            for text in sent["token_text"]:
                token_text, label = annotated_tokens[i]
                if text != token_text:
                    raise ValueError(
                        f"Expected Token: {text} actual token: {token_text}"
                    )
                pred.append(tag_to_index(label))
                i += 1
            new_sents.append({**sent, "pred_tags": pred})
        out.append({**doc, "sentences": new_sents})
    return out
