"""PubTator source, sink and PubTator→CoNLL converter (reference S6).

The reference converts MedMentions from PubTator to CoNLL by delegating
to the external ``bconv`` library
(bioner/preprocessing/medmentions_conll_converter.py:16-29:
``bconv.load(fmt='pubtator')`` + ``bconv.dump(fmt='conll',
tagset='IOB')``). This module re-implements the FORMAT natively — no
bconv — and emits documents in the exact shape of the S1 CoNLL reader
(sources/conll.py:CONLL_DOCS_SCHEMA), so converted corpora flow
straight into the engine's CoNLL writer/eval/scoring paths.

PubTator block format (one blank-line-separated block per document)::

    PMID|t|Title text
    PMID|a|Abstract text
    PMID<TAB>start<TAB>end<TAB>mention<TAB>type<TAB>concept_id

Annotation offsets index into ``title + " " + abstract`` (the
MedMentions convention: the abstract begins at ``len(title) + 1``).

Conversion tokenization is the engine's own deterministic pair
(functions/text.split_sentences / tokenize_with_offsets) — bconv's
internal tokenizer is not reproduced (that would be porting the
dependency, not the operator); what is pinned instead is the IOB
contract: the first token overlapping an annotation span gets ``B``,
every further overlapping token of the same annotation gets ``I``,
everything else ``O``, and mention text must equal the exact character
slice ``full_text[start:end]`` (malformed offsets raise, like bconv's
own anchoring errors).

Distribution: whole files parse inside ``flat_map`` over
``read_binary_files`` so document blocks never cross Ray blocks; the
converter is a stateless batch map.
"""

from __future__ import annotations

import pyarrow as pa

from bioner_ray.functions.bio import B, I, O
from bioner_ray.functions.text import split_sentences_with_offsets, tokenize_with_offsets

ANNOTATION_TYPE = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("mention", pa.string()),
        ("type", pa.string()),
        ("concept_id", pa.string()),
    ]
)
PUBTATOR_DOCS_SCHEMA = pa.schema(
    [
        ("pmid", pa.string()),
        ("title", pa.string()),
        ("abstract", pa.string()),
        ("annotations", pa.list_(ANNOTATION_TYPE)),
    ]
)


def parse_pubtator(text: str) -> list[dict]:
    """One PubTator file's content → list of document dicts
    (PUBTATOR_DOCS_SCHEMA rows). Blocks are blank-line separated;
    ``|t|``/``|a|`` lines split on the FIRST two pipes only (titles may
    contain ``|``); annotation lines are tab-separated with ≥6 fields
    (extra fields beyond the 6th are ignored, as in the format spec)."""
    docs: list[dict] = []
    for block in text.split("\n\n"):
        if not block.strip():
            continue
        pmid = ""
        title = ""
        abstract = ""
        anns: list[dict] = []
        for line in block.split("\n"):
            if not line:
                continue
            head = line.split("|", 2)
            if len(head) == 3 and head[1] in ("t", "a"):
                pmid = head[0]
                if head[1] == "t":
                    title = head[2]
                else:
                    abstract = head[2]
                continue
            fields = line.split("\t")
            if len(fields) >= 6:
                anns.append(
                    {
                        "start": int(fields[1]),
                        "end": int(fields[2]),
                        "mention": fields[3],
                        "type": fields[4],
                        "concept_id": fields[5],
                    }
                )
        docs.append({"pmid": pmid, "title": title, "abstract": abstract, "annotations": anns})
    return docs


def format_pubtator_document(doc: dict) -> str:
    """One document → its PubTator block (trailing blank line included),
    byte-stable inverse of ``parse_pubtator`` for well-formed input."""
    pmid = doc["pmid"]
    out = [f"{pmid}|t|{doc['title']}\n", f"{pmid}|a|{doc['abstract']}\n"]
    for a in doc["annotations"]:
        out.append(
            f"{pmid}\t{a['start']}\t{a['end']}\t{a['mention']}\t{a['type']}\t{a['concept_id']}\n"
        )
    out.append("\n")
    return "".join(out)


def read_pubtator(paths: str | list[str]):
    """PubTator file(s) → Dataset of PUBTATOR_DOCS_SCHEMA rows
    (+ ``path``). Whole-file parse in flat_map, one row per document."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_row(row: dict) -> list[dict]:
        docs = parse_pubtator(row["bytes"].decode("utf-8"))
        for d in docs:
            d["path"] = row["path"]
        return docs

    return ds.flat_map(parse_row)


def full_text(doc: dict) -> str:
    """``title + " " + abstract`` — the annotation offset space."""
    return doc["title"] + " " + doc["abstract"]


def pubtator_doc_to_conll(doc: dict, doc_id: int, validate: bool = True) -> dict:
    """One PubTator document → one S1-shaped CoNLL document row
    (doc_id, sentences[{sent_id, token_text, token_start, token_end,
    gold_tags}]; offsets are strings into the full text, matching the
    CoNLL reader's verbatim-string convention).

    IOB assignment: a token [ts, te) overlaps an annotation [s, e) iff
    ``ts < e and te > s``; the first overlapping token of each
    annotation gets B, later ones I. Overlapping annotations resolve to
    the EARLIEST-starting one (ties: longest), deterministically.
    ``validate=True`` raises if a mention's text differs from
    ``full_text[start:end]`` — offset corruption fails loudly instead
    of silently shifting every downstream tag.
    """
    text = full_text(doc)
    anns = sorted(doc["annotations"], key=lambda a: (a["start"], -a["end"]))
    if validate:
        for a in anns:
            got = text[a["start"] : a["end"]]
            if got != a["mention"]:
                raise ValueError(
                    f"annotation text mismatch in {doc.get('pmid', '?')}: "
                    f"offsets [{a['start']}, {a['end']}) slice {got!r} != "
                    f"mention {a['mention']!r}"
                )
    sentences = []
    ann_idx = 0
    active = None  # annotation currently emitting B/I
    n_anns = len(anns)
    for sent_id, (sent, base) in enumerate(split_sentences_with_offsets(text)):
        texts, starts, ends = tokenize_with_offsets(sent)
        tags = []
        for ts_rel, te_rel in zip(starts, ends):
            ts, te = base + ts_rel, base + te_rel
            # drop annotations that ended before this token
            while ann_idx < n_anns and anns[ann_idx]["end"] <= ts:
                ann_idx += 1
            cur = anns[ann_idx] if ann_idx < n_anns else None
            if cur is not None and cur["start"] < te and ts < cur["end"]:
                tags.append(I if active is cur else B)
                active = cur
            else:
                tags.append(O)
                active = None
        sentences.append(
            {
                "sent_id": sent_id,
                "token_text": texts,
                "token_start": [str(base + s) for s in starts],
                "token_end": [str(base + e) for e in ends],
                "gold_tags": tags,
            }
        )
    return {"doc_id": doc_id, "sentences": sentences}


def pubtator_to_conll_batch(batch: pa.Table) -> pa.Table:
    """Batch converter: PUBTATOR_DOCS_SCHEMA (+ optional ``doc_id``
    column, else ids are per-batch ordinals) → CoNLL document rows with
    ``pmid`` carried through."""
    from bioner_ray.sources.conll import CONLL_SENTENCE_TYPE

    has_ids = "doc_id" in batch.schema.names
    rows = batch.to_pylist()
    out = []
    for i, doc in enumerate(rows):
        conll = pubtator_doc_to_conll(doc, doc["doc_id"] if has_ids else i)
        conll["pmid"] = doc["pmid"]
        out.append(conll)
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in out], type=pa.int64()),
            "pmid": pa.array([d["pmid"] for d in out], type=pa.string()),
            "sentences": pa.array(
                [d["sentences"] for d in out], type=pa.list_(CONLL_SENTENCE_TYPE)
            ),
        }
    )


def pubtator_to_conll_stage(ds, batch_size: int = 256):
    """Dataset stage: PubTator documents → S1-shaped CoNLL documents."""
    return ds.map_batches(pubtator_to_conll_batch, batch_format="pyarrow", batch_size=batch_size)
