"""NER scoring stage — the stateful actor-pool heart of the pipeline.

Re-expresses the reference inference path (A1-A4 + M3-M7):
``Annotator.predict_labels`` (bioner/model/annotator.py:266-281) loads
the corpus, encodes every token, batches 128 sentences with
pad-to-batch-max (collate_batch, annotator.py:26-46), forwards through
the BioNER BiLSTM stack (bioner_model.py:16-93), argmaxes over the
class dim and truncates each row to its true length (annotator.py:277-279).

Here the whole of that is ONE ``map_batches`` stage over nested
document rows, run by a pool of actors: the model (weights, gazetteer,
vocab) is built once per actor in ``__init__`` (the reference loads
fastText once per process, fasttext_encoder.py:14-15) and ``__call__``
scores a zero-copy Arrow batch. Predictions come back as a sibling
``tags`` column on the same row — the reference's positional write-back
join (J2, annotator.py:250-264) disappears by construction.

No torch exists in this environment, so the registry (mirroring
``ModelLoader.load_model``, model_loader.py:64-115) offers:

* ``datexis-numpy`` — a seeded, pure-numpy analog of the reference
  architecture: sparse DATEXIS features (position‖surface‖trigram,
  datexis_encoder.py:28-38) → ReLU feed-forward → bidirectional tanh
  recurrence → linear → argmax. Deterministic across runs and worker
  counts (SURVEY.md §7.4.8).
* ``gazetteer`` — greedy longest-match dictionary tagger over a
  broadcast surface set; the flagship KG default (meaningful mentions
  without trained weights).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from bioner_ray.functions.text import (
    POSITION_DIM,
    SURFACE_DIM,
    keep_only_printable_chars,
    position_features,
    surface_features_batch,
)
from bioner_ray.functions.bio import B, I, O
from bioner_ray.schemas import TAGS_TYPE
from bioner_ray.stages.vocab import Vocab

INFERENCE_SENTENCE_BATCH = 128  # reference: annotator.py:272-273


from bioner_ray.functions.text import normalize_match_token as gazetteer_normalize


class GazetteerModel:
    """Greedy longest-match tagger: token windows whose normalized join
    is in the surface set get B I I…; everything else O. Deterministic.

    The hot path is vectorized per BATCH (``predict_documents``):
    normalization runs once per *unique* token (numpy unique + memo),
    single-word membership is one set-lookup per unique token gathered
    back onto positions, and the Python window probe runs ONLY at
    positions whose normalized token starts some multi-word surface —
    on web text that is a tiny fraction of tokens, so the per-token
    ``while`` scan of the naive tagger disappears."""

    name = "gazetteer"

    def __init__(self, surfaces: list[str]):
        self.surface_set = set()  # all normalized tuples (tests / debugging)
        #: 1-word surfaces: plain membership, no window probe needed
        self.single: set[str] = set()
        #: multi-word surfaces keyed by first word, longest first (greedy)
        self.multi: dict[str, list[tuple[str, ...]]] = {}
        self.max_words = 1
        for s in surfaces:
            norm = tuple(gazetteer_normalize(w) for w in s.split())
            if norm and all(norm) and norm not in self.surface_set:
                self.surface_set.add(norm)
                if len(norm) == 1:
                    self.single.add(norm[0])
                else:
                    self.multi.setdefault(norm[0], []).append(norm)
                    self.max_words = max(self.max_words, len(norm))
        for cands in self.multi.values():
            cands.sort(key=len, reverse=True)
        # token-normalization memo (regex per call otherwise); capped
        self._norm_memo: dict[str, str] = {}

    def _norm(self, token: str) -> str:
        n = self._norm_memo.get(token)
        if n is None:
            n = gazetteer_normalize(token)
            if len(self._norm_memo) < 262144:
                self._norm_memo[token] = n
        return n

    def predict_documents(self, docs: list[list[dict]]) -> list[list[list[int]]]:
        return [
            [t.tolist() for t in doc]
            for doc in self.predict_documents_tokens(
                [[s["token_text"] for s in sents] for sents in docs]
            )
        ]

    def predict_documents_tokens(
        self, docs: list[list[list[str]]]
    ) -> list[list[np.ndarray]]:
        """Token-list form of ``predict_documents`` — the hot-path entry
        used by ``NERScorer`` (which extracts only the ``token_text``
        child array from the Arrow batch, never the full sentence
        structs). Returns per-sentence uint8 arrays (the scorer builds
        the nested Arrow column from offsets, no per-int Python)."""
        all_tokens = [t for sents in docs for toks in sents for t in toks]
        if not all_tokens:
            return [[np.zeros(0, dtype=np.uint8) for _ in sents] for sents in docs]
        uniq, inv = np.unique(np.asarray(all_tokens, dtype=object), return_inverse=True)
        u_norm = np.asarray([self._norm(t) for t in uniq], dtype=object)
        u_single = np.fromiter((n in self.single for n in u_norm), dtype=bool, count=len(u_norm))
        u_multi = np.fromiter((n in self.multi for n in u_norm), dtype=bool, count=len(u_norm))
        tok_single = u_single[inv]
        tok_multi_start = u_multi[inv]
        tok_norm = u_norm[inv]
        results: list[list[np.ndarray]] = []
        off = 0
        for sents in docs:
            doc_tags: list[np.ndarray] = []
            for toks in sents:
                n = len(toks)
                tags = np.full(n, O, dtype=np.uint8)
                sl_multi = tok_multi_start[off : off + n]
                if sl_multi.any():
                    norms = tok_norm[off : off + n]
                    consumed_end = 0
                    # greedy left-to-right over CANDIDATE starts only;
                    # equivalent to the naive longest-first window scan
                    # because a 1-word match advances the scan by 1 anyway
                    for i in np.nonzero(sl_multi)[0]:
                        if i < consumed_end:
                            continue
                        for cand in self.multi[norms[i]]:
                            w = len(cand)
                            if i + w <= n and tuple(norms[i : i + w]) == cand:
                                tags[i] = B
                                tags[i + 1 : i + w] = I
                                consumed_end = i + w
                                break
                # single-word matches fill every position not consumed by
                # a multi-word span (a single never alters the scan path)
                free_single = np.logical_and(tags == O, tok_single[off : off + n])
                tags[free_single] = B
                doc_tags.append(tags)
                off += n
            results.append(doc_tags)
        return results

    def predict_document(self, sentences: list[dict]) -> list[list[int]]:
        return self.predict_documents([sentences])[0]


class DatexisNumpyModel:
    """Seeded numpy analog of the BioNER stack (bioner_model.py:16-93):
    ff1+ReLU → bidirectional tanh recurrence → linear(3). The trigram
    block of ff1 is applied SPARSELY (sum of weight columns at the
    one-hot indices) so the V-wide one-hot never materializes — the
    scale-path replacement for densifying vocab-sized vectors per token.
    """

    name = "datexis-numpy"

    def __init__(self, vocab: Vocab, hidden: int = 64, ff: int = 128, seed: int = 1632737901):
        # seed default = the reference's global seed (train_bioner.py:72)
        self.vocab = vocab
        rng = np.random.default_rng(seed)
        v = len(vocab)
        dense_in = POSITION_DIM + SURFACE_DIM
        std = np.sqrt(2.0 / max(dense_in + v, 1))  # relu init, bioner_model.py:59-61
        self.W_dense = rng.normal(0.0, std, (dense_in, ff)).astype(np.float32)
        self.W_tri = rng.normal(0.0, std, (max(v, 1), ff)).astype(np.float32)
        self.b_ff = np.zeros(ff, dtype=np.float32)
        lim = np.sqrt(6.0 / (ff + hidden))  # xavier, bioner_model.py:52-57
        self.W_xh_f = rng.uniform(-lim, lim, (ff, hidden)).astype(np.float32)
        self.W_hh_f = rng.uniform(-lim, lim, (hidden, hidden)).astype(np.float32)
        self.W_xh_b = rng.uniform(-lim, lim, (ff, hidden)).astype(np.float32)
        self.W_hh_b = rng.uniform(-lim, lim, (hidden, hidden)).astype(np.float32)
        lim2 = np.sqrt(6.0 / (2 * hidden + 3))
        self.W_out = rng.uniform(-lim2, lim2, (2 * hidden, 3)).astype(np.float32)
        # per-actor memo: token → summed trigram weight row. Web text is
        # Zipfian, so the same tokens recur constantly; capped so a
        # pathological vocabulary can't grow an actor heap unboundedly.
        self._tri_memo: dict[str, np.ndarray] = {}
        self._zero_ff = np.zeros(ff, dtype=np.float32)

    def _features(self, sentences: list[list[str]]) -> list[np.ndarray]:
        """Per-sentence (len, ff) post-ff1 activations, built sparsely.
        ``sentences`` is a list of token lists (one per sentence)."""
        lengths = [len(toks) for toks in sentences]
        all_tokens = [t for toks in sentences for t in toks]
        if not all_tokens:
            return [np.zeros((0, self.W_dense.shape[1]), dtype=np.float32) for _ in sentences]
        surf = surface_features_batch(all_tokens)  # (N, 11)
        pos_blocks = position_features(len(sentences), lengths)
        pos = np.concatenate(pos_blocks) if pos_blocks else np.zeros((0, POSITION_DIM), np.float32)
        dense = np.concatenate([pos, surf], axis=1)  # (N, 15)
        acts = dense @ self.W_dense + self.b_ff
        # trigram block: one lookup per DISTINCT token (memoized), then a
        # vectorized gather back onto rows
        uniq, inv = np.unique(np.asarray(all_tokens, dtype=object), return_inverse=True)
        tri = np.empty((len(uniq), self.W_dense.shape[1]), dtype=np.float32)
        for i, tok in enumerate(uniq):
            vec = self._tri_memo.get(tok)
            if vec is None:
                idx = self.vocab.encode_indices(tok)
                vec = self.W_tri[idx].sum(axis=0) if idx else self._zero_ff
                if len(self._tri_memo) < 65536:
                    self._tri_memo[tok] = vec
            tri[i] = vec
        acts += tri[inv]
        acts = np.maximum(acts, 0.0)  # ReLU (bioner_model.py:66-67)
        out, off = [], 0
        for ln in lengths:
            out.append(acts[off : off + ln])
            off += ln
        return out

    def _batch_rnn(self, feats: list[np.ndarray]) -> list[np.ndarray]:
        """Padded batched BiRNN over a bucket of sentences (the A4
        collator pattern, annotator.py:26-46) — the time loop runs
        max_len steps of (S, H) matmuls instead of Σlen Python steps.
        Backward states are re-zeroed past each sentence's length so the
        pad region never leaks into valid positions; forward pad outputs
        are truncated away (annotator.py:277-279 semantics)."""
        n_sent = len(feats)
        lens = np.array([f.shape[0] for f in feats], dtype=np.int64)
        max_len = int(lens.max()) if n_sent else 0
        if max_len == 0:
            return [np.zeros(0, dtype=np.uint8) for _ in feats]
        hidden = self.W_hh_f.shape[0]
        # Memory-bandwidth discipline (24 concurrent actors share one
        # node's bandwidth): project ff→H on the UNPADDED concatenation
        # first, pad only the H-wide projections, and split the output
        # matmul so the (S, L, 2H) concat buffer never exists — ~40%
        # less padded-buffer traffic than pad-then-project.
        cat = np.concatenate(feats) if n_sent > 1 else feats[0]  # (N, ff)
        pf_all = cat @ self.W_xh_f  # (N, H)
        pb_all = cat @ self.W_xh_b
        xf = np.zeros((n_sent, max_len, hidden), dtype=np.float32)
        xb = np.zeros((n_sent, max_len, hidden), dtype=np.float32)
        off = 0
        for i, ln in enumerate(lens):
            xf[i, :ln] = pf_all[off : off + ln]
            xb[i, :ln] = pb_all[off : off + ln]
            off += ln
        hf = np.empty((n_sent, max_len, hidden), dtype=np.float32)
        hb = np.empty((n_sent, max_len, hidden), dtype=np.float32)
        h = np.zeros((n_sent, hidden), dtype=np.float32)
        for t in range(max_len):
            h = np.tanh(xf[:, t] + h @ self.W_hh_f)
            hf[:, t] = h
        h = np.zeros((n_sent, hidden), dtype=np.float32)
        for t in range(max_len - 1, -1, -1):
            h = np.tanh(xb[:, t] + h @ self.W_hh_b)
            h[lens <= t] = 0.0  # pad tail must not leak into valid steps
            hb[:, t] = h
        logits = hf @ self.W_out[:hidden] + hb @ self.W_out[hidden:]  # (S, L, 3)
        pred = np.argmax(logits, axis=2).astype(np.uint8)
        return [pred[i, : lens[i]] for i in range(n_sent)]

    #: sentences per padded recurrence bucket. 128 (not 512) so the
    #: padded (S, L, H) buffers stay cache-resident — measured 12%
    #: faster at 24-way concurrency on one node (shared bandwidth)
    RNN_BUCKET = 128

    def predict_documents(self, docs: list[list[dict]]) -> list[list[list[int]]]:
        return [
            [t.tolist() for t in doc]
            for doc in self.predict_documents_tokens(
                [[s["token_text"] for s in sents] for sents in docs]
            )
        ]

    def predict_documents_tokens(
        self, docs: list[list[list[str]]]
    ) -> list[list[np.ndarray]]:
        """Cross-document batched inference with LENGTH BUCKETING: all
        sentences of the Ray batch are sorted by length and run through
        the padded recurrence in buckets of ``RNN_BUCKET``, so one giant
        sentence pads only its own bucket — the mitigation for the
        reference's pad-to-batch-max skew (annotator.py:30, SURVEY.md
        §7.4.5). Features stay per-document (position features need the
        document context, position_encoder.py:10-26)."""
        feats_per_doc = [self._features(sents) for sents in docs]
        flat: list[tuple[int, int, np.ndarray]] = [
            (d, s, f)
            for d, doc in enumerate(feats_per_doc)
            for s, f in enumerate(doc)
        ]
        results: list[list[np.ndarray]] = [
            [np.zeros(0, dtype=np.uint8) for _ in doc] for doc in feats_per_doc
        ]
        order = sorted(range(len(flat)), key=lambda i: flat[i][2].shape[0])
        for c0 in range(0, len(order), self.RNN_BUCKET):
            idxs = order[c0 : c0 + self.RNN_BUCKET]
            preds = self._batch_rnn([flat[i][2] for i in idxs])
            for i, p in zip(idxs, preds):
                d, s, _ = flat[i]
                results[d][s] = p
        return results

    def predict_document(self, sentences: list[dict]) -> list[list[int]]:
        return self.predict_documents([sentences])[0]


def _build_bioner_torch_module(
    input_vector_size: int,
    feedforward_layer_size: int,
    lstm_layer_size: int,
    out_features: int,
    dropout_probability: float,
):
    """The reference architecture verbatim (bioner_model.py:16-93): ff
    2048 + ReLU + dropout(0.8) → BiLSTM 1024 → 2 more BiLSTM 1024 →
    LSTM decoder 1024 → linear 3, packed/padded forward with lengths,
    output permuted to [batch, classes, seq]. Import-gated: torch is
    absent from this container, so callers reach this only through
    ``BioNERTorchModel`` which raises a STUB error first."""
    import torch
    from torch import nn
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    class _BioNER(nn.Module):
        def __init__(self):
            super().__init__()
            self.dropout = nn.Dropout(p=dropout_probability)
            self.ff1 = nn.Linear(input_vector_size, feedforward_layer_size)
            self.biLSTM = nn.LSTM(
                feedforward_layer_size, lstm_layer_size, bidirectional=True, batch_first=True
            )
            self.additional_biLSTM_layers = nn.ModuleList(
                [
                    nn.LSTM(lstm_layer_size * 2, lstm_layer_size, bidirectional=True, batch_first=True)
                    for _ in range(2)
                ]
            )
            self.encoderLSTM = nn.LSTM(lstm_layer_size * 2, lstm_layer_size, batch_first=True)
            self.hidden2tag = nn.Linear(lstm_layer_size, out_features)

        def _dropout_packed(self, seq, lengths):
            x, _ = pad_packed_sequence(seq, batch_first=True)
            x = self.dropout(x)
            return pack_padded_sequence(x, lengths.cpu(), batch_first=True, enforce_sorted=False)

        def forward(self, x, lengths):
            x = torch.relu(self.ff1(x))
            x = self.dropout(x)
            x = pack_padded_sequence(x, lengths.cpu(), batch_first=True, enforce_sorted=False)
            out, _ = self.biLSTM(x)
            out = self._dropout_packed(out, lengths)
            for layer in self.additional_biLSTM_layers:
                out, _ = layer(out)
                out = self._dropout_packed(out, lengths)
            out, _ = self.encoderLSTM(out)
            out, _ = pad_packed_sequence(out, batch_first=True)
            tag_space = self.hidden2tag(out)
            return tag_space.permute(0, 2, 1)  # [batch, classes, seq]

    return _BioNER()


class BioNERTorchModel:
    """Import-gated torch backend for the REAL BioNER BiLSTM stack.

    Loads a published ``.pt`` checkpoint into the reference architecture
    (bioner_model.py:16-93) and runs the reference inference loop
    (annotator.py:266-281): 128-sentence batches, pad to batch max,
    forward with original lengths, argmax over the class dim, truncate
    each row to its true length. Token vectors come from the engine's
    encoder backends (stages/encode.EmbeddingEncoder — ``hash`` is the
    deterministic container-safe default; ``fasttext`` is the
    reference's real 300-d encoder, itself import-gated).

    Without torch in the environment, construction raises
    ``NotImplementedError`` with a STUB marker (same seam as
    encode.py's fasttext gate); the registry entry, config plumbing and
    collation contract are real and under test.
    """

    name = "bioner-bilstm"
    INFERENCE_SENTENCE_BATCH = INFERENCE_SENTENCE_BATCH  # annotator.py:272-273

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        input_vector_size: int = 300,
        feedforward_layer_size: int = 2048,
        lstm_layer_size: int = 1024,
        out_features: int = 3,
        dropout_probability: float = 0.8,
        encoder_backend: str = "hash",
        encoder_model_path: Optional[str] = None,
    ):
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "STUB: torch is not installed in this environment; the "
                "'bioner-bilstm' backend needs torch plus a BioNER "
                "checkpoint (architecture: "
                "/root/reference/bioner/model/bioner_model.py:16-93). "
                "Use 'datexis-numpy' (seeded analog) or 'gazetteer'."
            ) from e
        from bioner_ray.stages.encode import EmbeddingEncoder

        self.encoder = EmbeddingEncoder(
            backend=encoder_backend, model_path=encoder_model_path, dim=input_vector_size
        )
        self.module = _build_bioner_torch_module(
            input_vector_size,
            feedforward_layer_size,
            lstm_layer_size,
            out_features,
            dropout_probability,
        )
        if checkpoint_path:
            state = torch.load(checkpoint_path, map_location="cpu")
            # the reference trains via ignite Checkpoint(to_save={'model': …})
            # (annotator.py:150-166) → accept both wrapped and raw state dicts
            if isinstance(state, dict) and "model" in state:
                state = state["model"]
            self.module.load_state_dict(state)
        self.module.eval()

    def predict_documents_tokens(
        self, docs: list[list[list[str]]]
    ) -> list[list[np.ndarray]]:
        import torch

        flat_tokens = [toks for sents in docs for toks in sents]
        preds: list[np.ndarray] = []
        with torch.no_grad():
            for c0 in range(0, len(flat_tokens), self.INFERENCE_SENTENCE_BATCH):
                chunk = flat_tokens[c0 : c0 + self.INFERENCE_SENTENCE_BATCH]
                lens = [len(t) for t in chunk]
                max_len = max(lens, default=0)
                if max_len == 0:
                    preds.extend(np.zeros(0, dtype=np.uint8) for _ in chunk)
                    continue
                dim = self.encoder.dim
                x = np.zeros((len(chunk), max_len, dim), dtype=np.float32)
                for i, toks in enumerate(chunk):
                    if toks:
                        x[i, : len(toks)] = self.encoder._encode_tokens(list(toks))
                # pack_padded_sequence rejects zero lengths → clamp to 1
                # (the pad row is zeros; the argmax rows past the true
                # length are truncated away below, annotator.py:277-279)
                lengths = torch.tensor([max(l, 1) for l in lens], dtype=torch.long)
                y = self.module(torch.from_numpy(x), lengths)  # [B, C, L']
                idx = torch.argmax(y, dim=1).cpu().numpy()  # [B, L']
                preds.extend(
                    idx[i, : lens[i]].astype(np.uint8) for i in range(len(chunk))
                )
        out: list[list[np.ndarray]] = []
        pos = 0
        for sents in docs:
            out.append(preds[pos : pos + len(sents)])
            pos += len(sents)
        return out

    def predict_documents(self, docs: list[list[dict]]) -> list[list[list[int]]]:
        return [
            [t.tolist() for t in doc]
            for doc in self.predict_documents_tokens(
                [[s["token_text"] for s in sents] for sents in docs]
            )
        ]

    def predict_document(self, sentences: list[dict]) -> list[list[int]]:
        return self.predict_documents([sentences])[0]


def load_npz_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch-layout state dict from an ``.npz``. Accepts both the
    golden-fixture convention (keys prefixed ``sd/``, extra non-weight
    arrays ignored) and a flat dump whose every key is a weight."""
    z = np.load(path, allow_pickle=True)
    if any(k.startswith("sd/") for k in z.files):
        return {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    return {k: z[k] for k in z.files}


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class BiLSTMNumpyModel:
    """Container-runnable numpy forward for the REAL BioNER BiLSTM
    architecture (bioner_model.py:16-93): relu(ff1) → BiLSTM → 2×BiLSTM
    → LSTM decoder → linear(3), eval mode (dropout = identity).

    This is the executable twin of ``BioNERTorchModel``: identical
    state-dict key names/layouts (a published ``.pt`` converted to
    ``.npz`` drops in unchanged), identical packed/padded semantics
    (annotator.py:26-46, 266-281) — each sequence is processed to its
    true length from zero initial state; pad positions are exactly 0.0
    (``pad_packed_sequence`` fill) at every layer boundary and final
    rows are truncated to true length. nn.LSTM cell per the pytorch
    contract: gates split (i, f, g, o); i,f,o sigmoid, g tanh;
    c' = f·c + i·g; h' = o·tanh(c').

    The batched recurrence follows ``DatexisNumpyModel``'s collator
    shape (A4, annotator.py:26-46, with length bucketing): input
    projections run on the unpadded concatenation, the time loop runs
    max_len steps of (S, 4H) matmuls, and both h and c are re-zeroed at
    pad steps so the reverse direction enters each sequence's valid
    region with zero state — exactly the packed forward."""

    name = "bilstm-numpy"
    INFERENCE_SENTENCE_BATCH = INFERENCE_SENTENCE_BATCH  # annotator.py:272-273

    def __init__(
        self,
        weights: "dict[str, np.ndarray] | str",
        encoder_backend: str = "hash",
        encoder_model_path: Optional[str] = None,
    ):
        from bioner_ray.stages.encode import EmbeddingEncoder

        sd = load_npz_state_dict(weights) if isinstance(weights, str) else weights
        self.sd = {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()}
        self.input_dim = self.sd["ff1.weight"].shape[1]
        self.hidden = self.sd["hidden2tag.weight"].shape[1]
        self.encoder = EmbeddingEncoder(
            backend=encoder_backend, model_path=encoder_model_path, dim=self.input_dim
        )
        # per-actor token→vector memo (the datexis trigram-memo pattern):
        # web text is Zipfian, the same tokens recur constantly; capped so
        # a pathological vocabulary can't grow an actor heap unboundedly
        self._enc_memo: dict[str, np.ndarray] = {}

    def _lstm_dir(
        self,
        x: np.ndarray,
        mask: np.ndarray,
        prefix: str,
        reverse: bool,
    ) -> np.ndarray:
        """One direction of one layer over a padded bucket.
        x (S, L, I) zero-padded, mask (S, L) float32 {0,1} →
        (S, L, H), pad positions exactly 0.0."""
        sd = self.sd
        sfx = "_reverse" if reverse else ""
        w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]
        w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]
        b_ih = sd[f"{prefix}.bias_ih_l0{sfx}"]
        b_hh = sd[f"{prefix}.bias_hh_l0{sfx}"]
        n_sent, max_len, _ = x.shape
        hdim = w_hh.shape[1]
        # input projection on the full (S·L, I) at once; same operand
        # order as the cell contract: (W_ih·x + b_ih) first
        xp = (x.reshape(n_sent * max_len, -1) @ w_ih.T + b_ih).reshape(
            n_sent, max_len, 4 * hdim
        )
        h = np.zeros((n_sent, hdim), dtype=np.float32)
        c = np.zeros((n_sent, hdim), dtype=np.float32)
        out = np.zeros((n_sent, max_len, hdim), dtype=np.float32)
        steps = range(max_len - 1, -1, -1) if reverse else range(max_len)
        for t in steps:
            g = xp[:, t] + (h @ w_hh.T + b_hh)
            i = _sigmoid(g[:, :hdim])
            f = _sigmoid(g[:, hdim : 2 * hdim])
            gg = np.tanh(g[:, 2 * hdim : 3 * hdim])
            o = _sigmoid(g[:, 3 * hdim :])
            c = f * c + i * gg
            h = o * np.tanh(c)
            # pad step: zero BOTH h and c — the reverse direction then
            # enters the valid region with zero state (packed semantics)
            # and pad outputs are exactly pad_packed's 0.0 fill
            m = mask[:, t : t + 1]
            h *= m
            c *= m
            out[:, t] = h
        return out

    def _forward_bucket(self, feats: list[np.ndarray]) -> list[np.ndarray]:
        """Padded batched forward over a length bucket →
        per-sentence uint8 argmax tags truncated to true length
        (annotator.py:277-279)."""
        sd = self.sd
        n_sent = len(feats)
        lens = np.array([f.shape[0] for f in feats], dtype=np.int64)
        max_len = int(lens.max()) if n_sent else 0
        if max_len == 0:
            return [np.zeros(0, dtype=np.uint8) for _ in feats]
        mask = (np.arange(max_len)[None, :] < lens[:, None]).astype(np.float32)
        # ff1 + ReLU on the unpadded concatenation, then pad
        cat = np.concatenate(feats) if n_sent > 1 else feats[0]
        acts = np.maximum(cat @ sd["ff1.weight"].T + sd["ff1.bias"], 0.0)
        x = np.zeros((n_sent, max_len, acts.shape[1]), dtype=np.float32)
        off = 0
        for i, ln in enumerate(lens):
            x[i, :ln] = acts[off : off + ln]
            off += ln
        for prefix in ("biLSTM", "additional_biLSTM_layers.0", "additional_biLSTM_layers.1"):
            fwd = self._lstm_dir(x, mask, prefix, reverse=False)
            bwd = self._lstm_dir(x, mask, prefix, reverse=True)
            x = np.concatenate([fwd, bwd], axis=2)
        x = self._lstm_dir(x, mask, "encoderLSTM", reverse=False)
        logits = x @ sd["hidden2tag.weight"].T + sd["hidden2tag.bias"]
        pred = np.argmax(logits, axis=2).astype(np.uint8)
        return [pred[i, : lens[i]] for i in range(n_sent)]

    def forward_logits(self, x: np.ndarray) -> np.ndarray:
        """Single unpadded sequence (L, INPUT) → logits (L, OUT) — the
        parity entry the golden-fixture test pins against
        tools/make_bilstm_golden.forward_seq."""
        sd = self.sd
        if len(x) == 0:
            return np.zeros((0, sd["hidden2tag.weight"].shape[0]), dtype=np.float32)
        mask = np.ones((1, len(x)), dtype=np.float32)
        acts = np.maximum(x @ sd["ff1.weight"].T + sd["ff1.bias"], 0.0)
        h = acts[None].astype(np.float32)
        for prefix in ("biLSTM", "additional_biLSTM_layers.0", "additional_biLSTM_layers.1"):
            fwd = self._lstm_dir(h, mask, prefix, reverse=False)
            bwd = self._lstm_dir(h, mask, prefix, reverse=True)
            h = np.concatenate([fwd, bwd], axis=2)
        h = self._lstm_dir(h, mask, "encoderLSTM", reverse=False)
        return (h @ sd["hidden2tag.weight"].T + sd["hidden2tag.bias"])[0]

    #: same bucket size as the reference inference batch — one giant
    #: sentence pads only its own bucket (SURVEY.md §7.4.5)
    RNN_BUCKET = INFERENCE_SENTENCE_BATCH

    def _encode_all(self, docs: list[list[list[str]]]) -> list[list[np.ndarray]]:
        """Encode EVERY token of the Ray batch in one pass: unique
        tokens resolved through the per-actor memo (one encoder call
        for the misses only), gathered back onto positions, then
        sliced per sentence (views, no copies). The per-sentence
        encoder-call overhead of the naive form dominated the tiny-
        model profile."""
        all_tokens = [t for sents in docs for toks in sents for t in toks]
        if not all_tokens:
            return [[np.zeros((0, self.input_dim), dtype=np.float32) for _ in sents] for sents in docs]
        uniq, inv = np.unique(np.asarray(all_tokens, dtype=object), return_inverse=True)
        mat = np.empty((len(uniq), self.input_dim), dtype=np.float32)
        miss_idx = [i for i, t in enumerate(uniq) if t not in self._enc_memo]
        if miss_idx:
            fresh = self.encoder._encode_tokens([uniq[i] for i in miss_idx]).astype(
                np.float32
            )
            for j, i in enumerate(miss_idx):
                if len(self._enc_memo) < 262144:
                    self._enc_memo[uniq[i]] = fresh[j]
                mat[i] = fresh[j]
        for i, t in enumerate(uniq):
            if t in self._enc_memo:
                mat[i] = self._enc_memo[t]
        flat = mat[inv]
        out: list[list[np.ndarray]] = []
        off = 0
        for sents in docs:
            doc_out = []
            for toks in sents:
                doc_out.append(flat[off : off + len(toks)])
                off += len(toks)
            out.append(doc_out)
        return out

    def predict_documents_tokens(
        self, docs: list[list[list[str]]]
    ) -> list[list[np.ndarray]]:
        """Cross-document batched inference with length bucketing (same
        scheme as DatexisNumpyModel.predict_documents_tokens)."""
        enc_per_doc = self._encode_all(docs)
        flat = [
            (d, s, f)
            for d, doc in enumerate(enc_per_doc)
            for s, f in enumerate(doc)
        ]
        results: list[list[np.ndarray]] = [
            [np.zeros(0, dtype=np.uint8) for _ in doc] for doc in enc_per_doc
        ]
        order = sorted(range(len(flat)), key=lambda i: flat[i][2].shape[0])
        for c0 in range(0, len(order), self.RNN_BUCKET):
            idxs = order[c0 : c0 + self.RNN_BUCKET]
            preds = self._forward_bucket([flat[i][2] for i in idxs])
            for i, p in zip(idxs, preds):
                d, s, _ = flat[i]
                results[d][s] = p
        return results

    def predict_documents(self, docs: list[list[dict]]) -> list[list[list[int]]]:
        return [
            [t.tolist() for t in doc]
            for doc in self.predict_documents_tokens(
                [[s["token_text"] for s in sents] for sents in docs]
            )
        ]

    def predict_document(self, sentences: list[dict]) -> list[list[int]]:
        return self.predict_documents([sentences])[0]


def load_model(name: str, **config):
    """Model registry by name string (reference ModelLoader.load_model,
    model_loader.py:64-115: unknown name raises)."""
    if name == "gazetteer":
        return GazetteerModel(config["surfaces"])
    if name == "datexis-numpy":
        return DatexisNumpyModel(
            config["vocab"],
            hidden=config.get("hidden", 64),
            ff=config.get("ff", 128),
            seed=config.get("seed", 1632737901),
        )
    if name == "bilstm-numpy":
        return BiLSTMNumpyModel(**config)
    if name == "bioner-bilstm":
        return BioNERTorchModel(**config)
    raise ValueError(f"unknown model: {name}")


class NERScorer:
    """Actor-pool callable for ``map_batches(NERScorer, concurrency=N)``.

    ``__init__`` resolves broadcast state ONCE per actor (ray.put
    ObjectRefs are accepted for the heavy config values); ``__call__``
    adds a ``tags`` column (list<list<uint8>>, aligned with the nested
    sentences) to each document row.
    """

    def __init__(self, model_name: str = "gazetteer", model_config: Optional[dict] = None):
        import ray

        cfg = dict(model_config or {})
        for key, val in cfg.items():
            if isinstance(val, ray.ObjectRef):
                cfg[key] = ray.get(val)
        self.model = load_model(model_name, **cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Whole documents go to the model so position features keep their
        # per-document begin/end semantics (position_encoder.py:10-26).
        # Models exposing predict_documents_tokens get the WHOLE Ray
        # batch at once (length-bucketed padded recurrence — the
        # reference pads 128 sentences to the batch max and wastes
        # O(max_len) per short sentence, annotator.py:26-46; bucketing
        # caps that waste) — and ONLY the token_text child array is
        # converted to Python (stages/nested.py), not the offset fields.
        if hasattr(self.model, "predict_documents_tokens"):
            from bioner_ray.stages.nested import doc_token_lists

            docs_tokens, _ = doc_token_lists(batch)
            all_tags = self.model.predict_documents_tokens(docs_tokens)
            # build list<list<uint8>> from offsets — no per-int Python
            sent_arrays = [t for doc in all_tags for t in doc]
            flat = (
                np.concatenate(sent_arrays).astype(np.uint8, copy=False)
                if sent_arrays
                else np.zeros(0, dtype=np.uint8)
            )
            inner_off = np.zeros(len(sent_arrays) + 1, dtype=np.int32)
            np.cumsum([len(a) for a in sent_arrays], out=inner_off[1:])
            inner = pa.ListArray.from_arrays(pa.array(inner_off), pa.array(flat))
            outer_off = np.zeros(len(all_tags) + 1, dtype=np.int32)
            np.cumsum([len(d) for d in all_tags], out=outer_off[1:])
            tags_arr = pa.ListArray.from_arrays(pa.array(outer_off), inner).cast(TAGS_TYPE)
            return batch.append_column("tags", tags_arr)
        docs = batch.column("sentences").to_pylist()
        all_tags = [self.model.predict_document(sentences) for sentences in docs]
        return batch.append_column("tags", pa.array(all_tags, type=TAGS_TYPE))


def score_stage(
    docs_ds,
    model_name: str = "gazetteer",
    model_config: Optional[dict] = None,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 64,
    num_cpus: float = 1,
):
    """Attach the scorer actor pool to a documents Dataset."""
    return docs_ds.map_batches(
        NERScorer,
        fn_constructor_kwargs={"model_name": model_name, "model_config": model_config},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
