"""Multimodal column plumbing — decode / feature-extract as actor-pool
stages over opaque ``binary`` payloads with typed metadata.

The image/audio codecs are NOT available in this container, so the decode
itself is a clearly marked STUB (`FakeDecoder`) producing deterministic
md5-derived dimensions/features; everything Ray-side — schema, small batch
sizes for wide binary rows, actor signature (codec "loaded" once per actor
in ``__init__``), output layout — is real and tested.  Swap ``FakeDecoder``
for a PIL/libav-backed decoder on a real cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8
# Wide binary rows: keep batches small so batch × concurrency fits the heap.
DECODE_BATCH_SIZE = 64


class FakeDecoder:
    """STUB decoder: deterministic md5-derived "image" metadata + features.

    A real decoder would load its codec/model here (once per actor) and
    raise NotImplementedError for unsupported formats.
    """

    def __init__(self):
        # real impl: self.codec = load_codec(); torch model; etc.
        self.loaded = True

    @staticmethod
    def _decode_one(payload: bytes) -> tuple[int, int, list[float]]:
        h = hashlib.md5(payload).hexdigest()
        width = 1 + int(h[:8], 16) % 512
        height = 1 + int(h[8:16], 16) % 512
        feats = [round(int(h[i * 2:i * 2 + 2], 16) / 255.0, 6)
                 for i in range(FEATURE_DIM)]
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h, f = self._decode_one(p if isinstance(p, bytes) else
                                       bytes(p))
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def to_binary_batch(t: pa.Table) -> pa.Table:
    """documents → opaque binary payload rows (media-table stand-in)."""
    payloads = [x.encode("utf-8") for x in t["text"].to_pylist()]
    return pa.table({"doc_id": t["doc_id"],
                     "payload": pa.array(payloads, pa.binary()),
                     "media_type": pa.array(["fake/image"] * len(payloads),
                                            pa.string())})


def resize_stub(width: int, height: int, target: int = 256
                ) -> tuple[int, int]:
    """STUB resize math (aspect-preserving shortest-side): pure function so
    the pipeline shape is testable without codecs."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for empty payloads")
    scale = target / min(width, height)
    return max(1, round(width * scale)), max(1, round(height * scale))
