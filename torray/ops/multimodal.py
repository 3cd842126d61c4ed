"""Multimodal (binary-column) processing plumbing.

Images / audio / video are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages: decoder
state (codec contexts, model weights) loads once per actor in
``__init__``, batches flow through ``__call__``.  The decode kernels
themselves are STUBBED (this container has no image/audio libraries):
``decoder="stub"`` produces deterministic fake features so the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested end-to-end; ``decoder="pil"`` /
``decoder="librosa"`` raise NotImplementedError until the real
libraries are importable.

Batch-size guidance: large payload columns need SMALL batch sizes —
``batch_size * avg_payload * concurrency`` must fit in worker heaps;
callers pass ``batch_size`` explicitly for that reason.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "MediaFeatureExtractor", "extract_media_features",
           "media_table_from_payloads"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # image | audio | video
    ("mime", pa.string()),
    ("width", pa.int32()),         # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


def media_table_from_payloads(payloads: list[bytes],
                              media_type: str = "image",
                              mime: str = "image/png") -> pa.Table:
    n = len(payloads)
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(payloads, pa.binary()),
            pa.array([media_type] * n, pa.string()),
            pa.array([mime] * n, pa.string()),
            pa.array([-1] * n, pa.int32()),
            pa.array([-1] * n, pa.int32()),
            pa.array([-1] * n, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary payloads.

    Use as ``ds.map_batches(MediaFeatureExtractor,
    fn_constructor_kwargs={"decoder": "stub"}, concurrency=N,
    batch_size=B, batch_format="pyarrow")`` — construction cost (model
    load / codec init) is paid once per actor, per the stateful-stage
    pattern."""

    def __init__(self, decoder: str = "stub", feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "stub":
            self._decode = self._decode_stub
        elif decoder in ("pil", "librosa", "ffmpeg"):
            raise NotImplementedError(
                f"decoder {decoder!r} requires libraries not present in "
                f"this environment; wire the real decode here")
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        """Deterministic fake feature vector: sha256-seeded — stable
        across processes, so pipelines over stub features are testable."""
        digest = hashlib.sha256(payload or b"").digest()
        seed = int.from_bytes(digest[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.normal(size=self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p) for p in payloads]
        sizes = [len(p) if p else 0 for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32(), self.feature_dim)),
        })


def extract_media_features(media_ds, *, decoder: str = "stub",
                           concurrency: int = 2, batch_size: int = 16):
    """The full actor-pool stage over a MEDIA_SCHEMA Dataset.  Small
    batch_size on purpose: payloads are large."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
