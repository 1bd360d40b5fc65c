"""Per-token embedding encoder — the A1/M6 actor-pool stage.

The reference loads a ~GB fastText binary once per process at encoder
construction (bioner/model/encoder/fasttext_encoder.py:14-15) and
mutates every token into an EncodedToken carrying a 300-d vector
(fasttext_encoder.py:17-28). Here the same shape is an actor-pool
``map_batches`` stage: the model is loaded ONCE per actor in
``__init__`` and each ``__call__`` adds an ``encodings`` column
(list<list<fixed_size_list<float32, dim>>> aligned with the nested
sentence tokens).

Three backends:

* ``hash`` (default) — the deterministic stand-in (functions/embed
  .hash_embedding): stable across runs and worker counts, used by all
  tests and benches. This is the container-safe path.
* ``fasttext-bin`` — REAL ``.bin`` models parsed by the pure-numpy
  reader (functions/fasttext_io.py, the published fastText file
  layout): vocab + subword-ngram bucket lookups, the same vectors the
  wheel's ``model[token]`` returns for dense models. Runs in this
  container today; the reference's encode semantics
  (fasttext_encoder.py:17-28) without the wheel.
* ``fasttext`` — the wheel itself, import-gated (needed only for pruned-dictionary
  ``.ftz`` models): absent here, so constructing it raises
  ``NotImplementedError`` with a clear STUB marker.

Encodings at rest are wide (tokens × dim × 4 bytes); prefer computing
them inside the scorer actor (SURVEY.md §1.3) and use this stage only
when a pipeline genuinely needs embeddings as a column.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from bioner_ray.functions.embed import hash_embedding_batch


class EmbeddingEncoder:
    """Actor-pool callable: adds per-token dense encodings."""

    def __init__(self, backend: str = "hash", model_path: Optional[str] = None, dim: int = 300):
        self.dim = dim
        self.backend = backend
        if backend == "hash":
            self._model = None
        elif backend == "fasttext-bin":
            if not model_path:
                raise ValueError("backend='fasttext-bin' requires model_path")
            from bioner_ray.functions.fasttext_io import FastTextBin

            self._model = FastTextBin(model_path)
            self.dim = self._model.get_dimension()
        elif backend == "fasttext":
            try:
                import fasttext  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "STUB: fasttext is not installed in this environment; "
                    "use backend='hash' (deterministic) or install fasttext "
                    "and pass model_path (fasttext_encoder.py:14-15 parity)."
                ) from e
            if not model_path:
                raise ValueError("backend='fasttext' requires model_path")
            import fasttext

            self._model = fasttext.load_model(model_path)
            self.dim = self._model.get_dimension()
        else:
            raise ValueError(f"unknown backend {backend!r}")

    def _encode_tokens(self, tokens: list[str]) -> np.ndarray:
        if self._model is not None:
            return np.stack([self._model[t] for t in tokens]) if tokens else np.zeros(
                (0, self.dim), dtype=np.float32
            )
        return hash_embedding_batch(tokens, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc_type = pa.list_(pa.list_(pa.list_(pa.float32(), self.dim)))
        out = []
        for doc_sents in batch.column("sentences").to_pylist():
            out.append(
                [
                    self._encode_tokens(list(sent["token_text"])).astype(np.float32).tolist()
                    for sent in doc_sents
                ]
            )
        return batch.append_column("encodings", pa.array(out, type=enc_type))


def encode_stage(
    docs_ds,
    backend: str = "hash",
    model_path: Optional[str] = None,
    dim: int = 300,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
):
    """Attach the encoder actor pool to a segmented documents Dataset."""
    return docs_ds.map_batches(
        EmbeddingEncoder,
        fn_constructor_kwargs={"backend": backend, "model_path": model_path, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
