"""Multimodal (image/audio/video) columns: REAL pure-numpy/stdlib decoders.

Binary media ride as opaque ``binary`` columns; decode / feature-extraction
/ resize / frame-sampling run as actor-pool ``map_batches`` stages (codec
state initialized once per actor in ``__init__``, work per batch in
``__call__``).

Formats decoded WITHOUT external codec libraries (none are available in
this container, and none are needed for these):

- images: BMP (24-bit uncompressed, the Windows DIB layout) and binary
  PPM (P6) — parsed straight from the byte layout into numpy arrays,
  nearest-neighbor resized, grid-pooled into a fixed-length embedding;
- audio: WAV (PCM16/PCM8, any channel count) via the stdlib ``wave``
  module — features are log-energies of ``n_mels`` log-spaced triangular
  filters over the magnitude spectrum (numpy rfft), a real filterbank;
- video: the ``RVID`` raw-frame container (magic + w/h/nframes header +
  concatenated RGB frames — the shape of a decoded-frames shard at scale):
  frame sampling returns real byte offsets and per-sampled-frame mean
  color.  Compressed containers (mp4/webm) require ffmpeg and raise
  ``UnsupportedMediaError`` with that reason.

``fake=True`` keeps the deterministic bytes→features stand-in for
plumbing tests over arbitrary byte strings.

Scale notes baked into the stage defaults: media rows are orders of
magnitude wider than text, so ``batch_size`` defaults small (64) and the
stages run as ``concurrency=(n, m)`` actor pools.
"""

from __future__ import annotations

import hashlib
import io
import struct
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "ImageDecodeStage",
    "AudioFeatureStage",
    "FrameSampleStage",
    "decode_images",
    "decode_bmp",
    "decode_ppm",
    "decode_wav",
    "encode_bmp",
    "encode_rvid",
    "UnsupportedMediaError",
    "DEFAULT_MEDIA_BATCH_SIZE",
]

DEFAULT_MEDIA_BATCH_SIZE = 64  # wide binary rows: keep batch × pool in heap


class UnsupportedMediaError(ValueError):
    pass


# ---------------------------------------------------------------------------
# image codecs (BMP 24bpp, PPM P6) — byte layout → numpy
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb[::-1] if flip else rgb


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (test/fixture encoder)."""
    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    payload = np.zeros((h, stride), dtype=np.uint8)
    payload[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = payload.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8 RGB."""
    if data[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM")
    # header tokens: P6 <w> <h> <maxval>, comments (#...) allowed
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise UnsupportedMediaError(f"PPM maxval {maxval}")
    return np.frombuffer(
        data, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)


def decode_image(data: bytes) -> np.ndarray:
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise UnsupportedMediaError(
        "unrecognized image format (supported: BMP 24bpp, PPM P6; "
        "JPEG/PNG need a codec library absent from this environment)"
    )


def resize_nearest(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (h, w) — pure index sampling."""
    th, tw = size
    h, w = img.shape[:2]
    ri = (np.arange(th) * h // th).clip(0, h - 1)
    ci = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ri][:, ci]


class ImageDecodeStage:
    """binary image bytes → (height, width, embedding) columns.

    Real decode for BMP/PPM; the embedding is a ``g×g`` grid of mean gray
    values over the resized image (``embed_dim`` must be a square).
    ``__init__`` precomputes the grid geometry once per actor."""

    def __init__(self, target_size: Tuple[int, int] = (224, 224),
                 embed_dim: int = 16, fake: bool = False):
        self.target_size = target_size
        self.embed_dim = embed_dim
        self.fake = fake
        g = int(round(embed_dim ** 0.5))
        if not fake and g * g != embed_dim:
            raise ValueError("embed_dim must be a perfect square")
        self.grid = g

    def _decode_one(self, data: Optional[bytes]):
        if data is None:
            return 0, 0, np.zeros(self.embed_dim, dtype=np.float32)
        if self.fake:
            digest = hashlib.blake2b(
                data, digest_size=self.embed_dim + 4
            ).digest()
            emb = np.frombuffer(digest[4:], dtype=np.uint8).astype(
                np.float32
            ) / 255.0
            return 1 + digest[0], 1 + digest[1], emb
        img = decode_image(data)
        h, w = img.shape[:2]
        small = resize_nearest(img, self.target_size)
        gray = small.astype(np.float32).mean(axis=2)
        g = self.grid
        th, tw = self.target_size
        cells = gray[: th - th % g, : tw - tw % g].reshape(
            g, th // g, g, tw // g
        )
        emb = (cells.mean(axis=(1, 3)) / 255.0).astype(
            np.float32
        ).reshape(-1)
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


# ---------------------------------------------------------------------------
# audio (WAV via stdlib wave) → log filterbank energies
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 signal in [-1, 1], sample_rate)."""
    import wave

    try:
        with wave.open(io.BytesIO(data)) as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"not a WAV: {e}") from e
    if width == 2:
        sig = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"WAV sample width {width}")
    if nch > 1:
        sig = sig.reshape(-1, nch).mean(axis=1)
    return sig, rate


class AudioFeatureStage:
    """binary WAV → ``n_mels`` log filterbank energies (numpy rfft + log-
    spaced triangular filters — a real filterbank, built once per actor)."""

    def __init__(self, n_mels: int = 8, n_fft: int = 512,
                 fake: bool = False):
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.fake = fake
        # triangular filters on a log-spaced grid over bins 1..n_fft//2
        n_bins = n_fft // 2 + 1
        edges = np.unique(
            np.round(
                np.logspace(0, np.log10(n_bins - 1), n_mels + 2)
            ).astype(np.int64)
        )
        while len(edges) < n_mels + 2:  # degenerate tiny n_fft
            edges = np.append(edges, edges[-1] + 1)
        self._edges = edges
        self._n_bins = n_bins

    def _features(self, data: Optional[bytes]) -> np.ndarray:
        if data is None:
            return np.zeros(self.n_mels, dtype=np.float32)
        if self.fake:
            d = hashlib.blake2b(data, digest_size=self.n_mels).digest()
            return np.frombuffer(d, dtype=np.uint8).astype(
                np.float32
            ) / 255.0
        sig, _rate = decode_wav(data)
        if len(sig) < self.n_fft:
            sig = np.pad(sig, (0, self.n_fft - len(sig)))
        # average magnitude spectrum over non-overlapping frames
        n_frames = len(sig) // self.n_fft
        frames = sig[: n_frames * self.n_fft].reshape(
            n_frames, self.n_fft
        )
        mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
        out = np.empty(self.n_mels, dtype=np.float32)
        e = self._edges
        for m in range(self.n_mels):
            lo, mid, hi = e[m], e[m + 1], e[min(m + 2, len(e) - 1)]
            hi = max(hi, mid + 1)
            up = np.linspace(0, 1, max(mid - lo, 1), endpoint=False)
            down = np.linspace(1, 0, hi - mid, endpoint=False)
            tri = np.concatenate([up, down])
            seg = mag[lo:hi]
            out[m] = np.log1p(float((seg * tri[: len(seg)]).sum()))
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self._features(v).tolist()
            for v in t.column("audio").to_pylist()
        ]
        return t.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float32()))
        )


# ---------------------------------------------------------------------------
# video (RVID raw-frame container) → sampled frame offsets + mean colors
# ---------------------------------------------------------------------------

_RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → RVID container bytes (test/fixture encoder)."""
    n, h, w, _ = frames.shape
    return _RVID_MAGIC + struct.pack("<HHI", w, h, n) + frames.tobytes()


class FrameSampleStage:
    """RVID video bytes → every-Nth-frame sample: real byte offsets into
    the payload plus each sampled frame's mean RGB (decoded)."""

    def __init__(self, every_n: int = 30, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def _sample(self, data: Optional[bytes]):
        if data is None:
            return [], []
        if self.fake:
            n = max(1, len(data) // 1000)
            return list(range(0, n, self.every_n)) or [0], []
        if data[:4] != _RVID_MAGIC:
            raise UnsupportedMediaError(
                "unrecognized video container (supported: RVID raw "
                "frames; mp4/webm need ffmpeg, absent here)"
            )
        w, h, n = struct.unpack_from("<HHI", data, 4)
        frame_bytes = w * h * 3
        offs, means = [], []
        for i in range(0, n, self.every_n):
            off = 12 + i * frame_bytes
            frame = np.frombuffer(
                data, dtype=np.uint8, count=frame_bytes, offset=off
            ).reshape(h, w, 3)
            offs.append(off)
            means.append(
                [float(x) for x in frame.mean(axis=(0, 1))]
            )
        return offs, means

    def __call__(self, t: pa.Table) -> pa.Table:
        all_offs, all_means = [], []
        for v in t.column("video").to_pylist():
            offs, means = self._sample(v)
            all_offs.append(offs)
            all_means.append(means)
        return t.append_column(
            "frame_offsets", pa.array(all_offs, pa.list_(pa.int64()))
        ).append_column(
            "frame_mean_rgb",
            pa.array(all_means, pa.list_(pa.list_(pa.float64()))),
        )


def decode_images(ds, concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE, **kw):
    """Run the image decode as an actor pool with media-sized batches —
    codec/grid state initializes once per actor (``__init__``), batches
    stay small because media rows are wide."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
