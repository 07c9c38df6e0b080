"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

Heavy decode kernels (PIL / ffmpeg / torchaudio) are NOT in this
container, so the codec step is injectable via ``decoder=``.  A REAL
pure-python codec ships in :mod:`.codecs` (``decode_image``: PNG with
all five scanline filters + PPM) and is exercised end-to-end through
these stages in tests — inject it (or a production codec) for genuine
pixel data.  The default deterministic fake decoder stays the default
because the registry oracles pin its digests; it exercises the same
Ray-side plumbing (schema, actor pool, batch sizing, output layout).

Batch sizes: binary payloads are wide — callers should pass small
``batch_size`` (e.g. 16-64) so batch x concurrency fits worker heaps, and
keep ``batch_format="pyarrow"`` (binary columns don't round-trip pandas
cleanly).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 8x8 RGB derived from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return np.frombuffer((d * 6)[: 8 * 8 * 3], dtype=np.uint8).reshape(8, 8, 3).copy()


class ImageFeatureExtractor:
    """binary image column -> per-image features (mean RGB, size, digest).

    Actor-pool stage: the decoder (a real model/codec in production) is
    constructed once per actor in ``__init__``.
    """

    def __init__(
        self,
        image_col: str = "image",
        decoder: Callable[[bytes], np.ndarray] | None = None,
    ):
        self.image_col = image_col
        self.decoder = decoder or _fake_image_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.image_col).to_pylist()
        means, heights, widths, digests = [], [], [], []
        for p in payloads:
            arr = self.decoder(p or b"")
            means.append([float(x) for x in arr.reshape(-1, arr.shape[-1]).mean(0)])
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            digests.append(hashlib.sha256(p or b"").hexdigest())
        out = batch.drop_columns([self.image_col])  # drop the wide payload early
        out = out.append_column(
            "rgb_mean", pa.array(means, pa.list_(pa.float64(), 3))
        )
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("content_sha256", pa.array(digests, pa.string()))
        return out


class FrameSampler:
    """binary video column -> one row per sampled frame offset.

    Real frame decode requires ffmpeg — absent here, so frames are sampled
    as (offset, digest) records; the flat_map-style row expansion, schema
    and actor signature are the production shape.
    """

    def __init__(self, video_col: str = "video", every_n_bytes: int = 1 << 16):
        self.video_col = video_col
        self.every = every_n_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = (
            batch.column("doc_id").to_pylist()
            if "doc_id" in batch.column_names
            else list(range(batch.num_rows))
        )
        payloads = batch.column(self.video_col).to_pylist()
        out_id, out_off, out_digest = [], [], []
        for i, p in zip(ids, payloads):
            p = p or b""
            for off in range(0, max(len(p), 1), self.every):
                out_id.append(i)
                out_off.append(off)
                out_digest.append(hashlib.sha256(p[off : off + self.every]).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "frame_offset": pa.array(out_off, pa.int64()),
                "frame_sha256": pa.array(out_digest, pa.string()),
            }
        )


def decode_images(
    ds: Dataset,
    image_col: str = "image",
    *,
    concurrency: tuple[int, int] | int = (1, 4),
    batch_size: int = 32,
) -> Dataset:
    """Actor-pool image decode/feature stage with small batches (wide rows)."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"image_col": image_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def real_decode_unavailable(*_a, **_k):
    """Marker for the genuinely-stubbed codec path (video/audio)."""
    raise NotImplementedError(
        "heavy codecs (ffmpeg/torchaudio) are not installed in this "
        "container; inject `decoder=` for production use — for PNG/PPM "
        "images a real pure-python decoder is available: "
        "functions.codecs.decode_image"
    )


class ImageResizer:
    """binary image column -> resized thumbnail features (mean-pooled
    block downsample of the decoded array to ``target`` x ``target``).

    Actor-pool stage shaped like production resize (PIL/opencv absent in
    this container, so the decode is the deterministic stand-in —
    inject ``decoder=`` for a real codec; the pooling math itself is the
    real operation and runs on whatever the decoder returns).  Output
    drops the wide payload and carries (thumb_mean, thumb_h, thumb_w,
    content_sha256)."""

    def __init__(
        self,
        image_col: str = "image",
        target: int = 4,
        decoder: Callable[[bytes], np.ndarray] | None = None,
    ):
        self.image_col = image_col
        self.target = target
        self.decoder = decoder or _fake_image_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.image_col).to_pylist()
        means, digests = [], []
        t = self.target
        for p in payloads:
            arr = self.decoder(p or b"").astype(np.float64)
            h, w, c = arr.shape
            bh, bw = max(h // t, 1), max(w // t, 1)
            th, tw = h // bh, w // bw
            pooled = (
                arr[: th * bh, : tw * bw]
                .reshape(th, bh, tw, bw, c)
                .mean(axis=(1, 3))
            )
            means.append(float(pooled.mean()))
            digests.append(hashlib.sha256(p or b"").hexdigest())
        out = batch.drop_columns([self.image_col])
        out = out.append_column("thumb_mean", pa.array(means, pa.float64()))
        out = out.append_column(
            "thumb_h", pa.array([self.target] * len(means), pa.int32())
        )
        out = out.append_column(
            "thumb_w", pa.array([self.target] * len(means), pa.int32())
        )
        out = out.append_column("content_sha256", pa.array(digests, pa.string()))
        return out
