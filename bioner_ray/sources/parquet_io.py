"""Schema-metadata-clean parquet reads.

Parquet files written by pandas carry a ``b'pandas'`` schema-metadata
blob. ``pyarrow.Schema.__hash__`` raises ``unhashable type: 'dict'`` on
any schema with metadata, which defeats Ray Data's schema-dedup fast
path every time a downstream stage concatenates read blocks into
batches — logging ``Failed to hash the schemas (for deduplication)``
from every worker (and paying the slow unify path each time).

``read_parquet_clean`` wraps ``ray.data.read_parquet`` with a
block-wise metadata strip: ``replace_schema_metadata(None)`` is a
zero-copy metadata-only operation, and with the default
``batch_size=None`` map_batches processes one whole block per batch —
no cross-block concat of the dirty schemas ever happens, and the strip
fuses with the read stage. Use it for any input parquet not written by
this engine (engine ``write_parquet`` output carries no metadata).
"""

from __future__ import annotations

import pyarrow as pa


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(*args, **kwargs):
    import ray.data as rd

    return rd.read_parquet(*args, **kwargs).map_batches(
        _strip_meta, batch_format="pyarrow"
    )
