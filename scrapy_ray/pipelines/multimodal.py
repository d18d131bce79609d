"""Multimodal column plumbing (round-1 mandate): opaque binary payloads +
typed metadata, decoded by an actor-pool ``map_batches`` stage.

No image/audio libraries exist in this container, so the decode kernel is a
clearly-marked deterministic STUB (``FakeImageDecoder``) — but the Ray-side
plumbing is real and oracle-tested: binary column handling stays in
``batch_format="pyarrow"`` (binary doesn't round-trip pandas cleanly), small
batch sizes for wide binary rows, stateful decoder constructed once per
actor. Swap ``_decode_stub`` for PIL/ffmpeg when available.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_REAL_DECODERS_AVAILABLE = False
try:  # pragma: no cover - not in this container
    import PIL.Image  # noqa: F401

    _REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


class FakeImageDecoder:
    """Actor-pool decode stage. __init__ = load-codec-once (stub: nothing to
    load); __call__ = per-batch decode. The stub derives deterministic
    pseudo-dimensions from the byte length so the driver oracle can replay
    the arithmetic in SQL."""

    def __init__(self, fmt: str = "fake-rgb8"):
        if _REAL_DECODERS_AVAILABLE:
            # real path would set up PIL decode here
            pass
        self.fmt = fmt

    def decode_real(self, payload: bytes):  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL/opencv — not available in this "
            "container; FakeImageDecoder.__call__ provides the deterministic stub")

    def __call__(self, t: pa.Table) -> pa.Table:
        n_bytes = pc.cast(pc.binary_length(t["payload"]), pa.int64()).to_numpy()
        width = 64 + (n_bytes % 577)
        height = 64 + ((n_bytes * 31) % 577)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
            "width": pa.array(width, type=pa.int64()),
            "height": pa.array(height, type=pa.int64()),
            "fmt": pa.array([self.fmt] * len(t), type=pa.string()),
        })


def q_multimodal_decode_meta(sf_dir: str):
    """Synthesize a binary payload column (utf-8 bytes of text — documents
    standing in for an image table) and run the actor-pool decode stage.
    Small batch_size: binary payload batches must fit the worker heap."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pc.cast(t["text"], pa.binary())})

    ds = ds.map_batches(to_payload, batch_format="pyarrow")
    out = ds.map_batches(FakeImageDecoder, batch_format="pyarrow",
                         batch_size=512, concurrency=2)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_MULTIMODAL = """
SELECT doc_id::BIGINT AS doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (64 + octet_length(encode(text)) % 577)::BIGINT AS width,
       (64 + (octet_length(encode(text)) * 31) % 577)::BIGINT AS height,
       'fake-rgb8' AS fmt
FROM documents
"""

MULTIMODAL_QUERIES = {
    "multimodal_decode_meta": (q_multimodal_decode_meta, SQL_MULTIMODAL),
}
