"""Multimodal (image/audio/video) column plumbing — decode stages STUBBED.

Binary media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction / resize / frame-sampling are actor-pool ``map_batches``
stages.  The media codec libraries are NOT available in this environment,
so the actual decode kernels raise ``NotImplementedError`` — everything
Ray-side (schema, batch sizing, actor signature, output layout) is real and
tested via the deterministic fake decoder.

Scale notes baked into the stage defaults: media rows are orders of
magnitude wider than text, so ``batch_size`` defaults small (64) and the
stage should run with ``concurrency=(n, m)`` actor pools so codec init
(``__init__``) happens once per actor, not per batch.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "ImageDecodeStage",
    "AudioFeatureStage",
    "FrameSampleStage",
    "decode_images",
    "DEFAULT_MEDIA_BATCH_SIZE",
]

DEFAULT_MEDIA_BATCH_SIZE = 64  # wide binary rows: keep batch × pool in heap


class ImageDecodeStage:
    """binary image bytes → (height, width, embedding) columns.

    ``__init__`` is where a real build loads the codec / vision model once
    per actor.  ``fake=True`` substitutes a deterministic bytes→features
    function so the pipeline shape is testable in this container.
    """

    def __init__(self, target_size: Tuple[int, int] = (224, 224),
                 embed_dim: int = 16, fake: bool = True):
        self.target_size = target_size
        self.embed_dim = embed_dim
        self.fake = fake
        if not fake:  # pragma: no cover - codec libs absent in container
            raise NotImplementedError(
                "real image decode requires PIL/cv2; not available here — "
                "run with fake=True for the deterministic stand-in"
            )

    def _decode_one(self, data: Optional[bytes]):
        if data is None:
            return 0, 0, np.zeros(self.embed_dim, dtype=np.float32)
        digest = hashlib.blake2b(data, digest_size=self.embed_dim + 4).digest()
        h = 1 + digest[0]
        w = 1 + digest[1]
        emb = (
            np.frombuffer(digest[4:], dtype=np.uint8).astype(np.float32) / 255.0
        )
        return h, w, emb

    def __call__(self, t: pa.Table) -> pa.Table:
        hs, ws, embs = [], [], []
        for v in t.column("image").to_pylist():
            h, w, e = self._decode_one(v)
            hs.append(h)
            ws.append(w)
            embs.append(e.tolist())
        return t.append_column("height", pa.array(hs, pa.int32())) \
                .append_column("width", pa.array(ws, pa.int32())) \
                .append_column(
                    "embedding", pa.array(embs, pa.list_(pa.float32()))
                )


class AudioFeatureStage:
    """binary audio → fixed-length feature vector (stubbed like images)."""

    def __init__(self, n_mels: int = 8, fake: bool = True):
        self.n_mels = n_mels
        if not fake:  # pragma: no cover
            raise NotImplementedError("audio decode requires librosa/ffmpeg")

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for v in t.column("audio").to_pylist():
            if v is None:
                feats.append([0.0] * self.n_mels)
            else:
                d = hashlib.blake2b(v, digest_size=self.n_mels).digest()
                feats.append([b / 255.0 for b in d])
        return t.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float32()))
        )


class FrameSampleStage:
    """binary video → every-Nth-frame sample manifest (stubbed: emits
    deterministic frame offsets from the payload length)."""

    def __init__(self, every_n: int = 30, fake: bool = True):
        self.every_n = every_n
        if not fake:  # pragma: no cover
            raise NotImplementedError("video decode requires ffmpeg")

    def __call__(self, t: pa.Table) -> pa.Table:
        frames = []
        for v in t.column("video").to_pylist():
            n = 0 if v is None else max(1, len(v) // 1000)
            frames.append(list(range(0, n, self.every_n)) or [0])
        return t.append_column(
            "frame_offsets", pa.array(frames, pa.list_(pa.int32()))
        )


def decode_images(ds, concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE, **kw):
    """Run the (stub) image decode as an actor pool with media-sized
    batches — the real-scale invocation shape."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
