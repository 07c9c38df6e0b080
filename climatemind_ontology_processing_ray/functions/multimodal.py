"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

Heavy decode kernels (PIL / ffmpeg / torchaudio) are NOT in this
container, so the codec step is injectable via ``decoder=``.  REAL
pure-python codecs ship in :mod:`.codecs` for every UNCOMPRESSED format
(PNG with all five scanline filters, PPM, WAV PCM, YUV4MPEG2) and are
the DEFAULTS for the audio/video stages (no external dep needed) and
exercised end-to-end in tests + registry oracles; only compressed
containers remain injectable.  The image stages keep the deterministic
fake as default because the registry oracles pin its digests.

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
    """Marker for the genuinely-stubbed codec path (COMPRESSED
    video/audio containers only — uncompressed formats decode for real:
    PNG/PPM via codecs.decode_image, WAV PCM via codecs.decode_wav,
    YUV4MPEG2 via codecs.decode_y4m)."""
    raise NotImplementedError(
        "compressed codecs (ffmpeg/torchaudio) are not installed in this "
        "container; inject `decoder=` for production use — real "
        "pure-python decoders exist for PNG/PPM (codecs.decode_image), "
        "WAV PCM (codecs.decode_wav) and Y4M (codecs.decode_y4m)"
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


class AudioFeatureExtractor:
    """binary WAV column -> per-clip features (REAL decode: uncompressed
    PCM needs no external codec, so the default decoder is
    :func:`..functions.codecs.decode_wav` — the injectable boundary is
    only for compressed formats).

    Exact-integer features so an independent oracle can replay them:
    ``n_samples``/``channels``/``sample_rate`` from the header,
    ``sq_sum`` = sum of squared first-channel samples (int64, exact),
    ``zero_crossings`` = sign changes (x<0 vs x>=0) between consecutive
    first-channel samples.  Actor-pool stage; wide rows want small
    batches like the image stages.
    """

    def __init__(self, audio_col: str = "audio", decoder=None):
        from .codecs import decode_wav

        self.audio_col = audio_col
        self.decoder = decoder or decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.audio_col).to_pylist()
        rates, nsamp, chans, sq, zc, digests = [], [], [], [], [], []
        for p in payloads:
            arr, rate = self.decoder(p or b"")
            ch0 = arr[:, 0].astype(np.int64)
            rates.append(rate)
            nsamp.append(arr.shape[0])
            chans.append(arr.shape[1])
            sq.append(int((ch0 * ch0).sum()))
            neg = ch0 < 0
            zc.append(int(np.count_nonzero(neg[1:] != neg[:-1])))
            digests.append(hashlib.sha256(p or b"").hexdigest())
        out = batch.drop_columns([self.audio_col])
        out = out.append_column("sample_rate", pa.array(rates, pa.int32()))
        out = out.append_column("n_samples", pa.array(nsamp, pa.int64()))
        out = out.append_column("channels", pa.array(chans, pa.int32()))
        out = out.append_column("sq_sum", pa.array(sq, pa.int64()))
        out = out.append_column("zero_crossings", pa.array(zc, pa.int64()))
        out = out.append_column("content_sha256", pa.array(digests, pa.string()))
        return out


class VideoFrameDecoder:
    """binary Y4M column -> one row per DECODED frame (REAL decode for
    uncompressed YUV4MPEG2 via :func:`..functions.codecs.decode_y4m`;
    compressed containers stay behind ``decoder=``).

    Output per frame: doc_id, frame_idx, luma_sum (int64, exact sum of
    the Y plane), frame_h, frame_w — the flat-map row expansion shape of
    production frame sampling, now on real pixel planes.
    """

    def __init__(self, video_col: str = "video", decoder=None):
        from .codecs import decode_y4m

        self.video_col = video_col
        self.decoder = decoder or decode_y4m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = (
            batch.column("doc_id").to_pylist()
            if "doc_id" in batch.column_names
            else list(range(batch.num_rows))
        )
        payloads = batch.column(self.video_col).to_pylist()
        out_id, out_idx, out_sum, out_h, out_w = [], [], [], [], []
        for i, p in zip(ids, payloads):
            frames, _fn, _fd = self.decoder(p or b"")
            sums = frames.reshape(frames.shape[0], -1).astype(np.int64).sum(axis=1)
            for j, s in enumerate(sums):
                out_id.append(i)
                out_idx.append(j)
                out_sum.append(int(s))
                out_h.append(frames.shape[1])
                out_w.append(frames.shape[2])
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "luma_sum": pa.array(out_sum, pa.int64()),
                "frame_h": pa.array(out_h, pa.int32()),
                "frame_w": pa.array(out_w, pa.int32()),
            }
        )


class AverageHasher:
    """binary image column -> 64-bit perceptual average-hash (aHash),
    the integer-exact member of the perceptual-hash family (pHash's DCT
    needs floats; aHash is pure integer compares, so a SQL oracle can
    replay it bit-for-bit): decode, grayscale, pool to an 8x8 grid of
    cell SUMS, set bit (r*8+c) iff cell_sum * 64 > total_sum (strict —
    ties clear the bit).  Emitted as two int64 halves (ahash_hi/lo) so
    bit 63 never touches the int64 sign.

    Actor-pool stage (decoder bound once per actor in ``__init__``);
    near-duplicate image dedup then runs hamming-distance bucketing on
    the hash — the simhash machinery's shape.
    """

    def __init__(
        self,
        image_col: str = "image",
        decoder: Callable[[bytes], np.ndarray] | None = None,
    ):
        from .codecs import decode_image

        self.image_col = image_col
        self.decoder = decoder or decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.image_col).to_pylist()
        his, los = [], []
        for p in payloads:
            arr = self.decoder(p or b"")
            gray = arr[..., 0].astype(np.int64) if arr.ndim == 3 else arr.astype(np.int64)
            h, w = gray.shape
            ch, cw = h // 8, w // 8
            gray = gray[: ch * 8, : cw * 8]
            cells = gray.reshape(8, ch, 8, cw).sum(axis=(1, 3))
            # equal cell areas: cell_mean > global_mean <=> sum*64 > total
            total = int(cells.sum())
            bits = (cells * 64 > total).astype(np.uint64).reshape(-1)
            ks = np.arange(64, dtype=np.uint64)
            val = int((bits << ks).sum())
            his.append((val >> 32) & 0xFFFFFFFF)
            los.append(val & 0xFFFFFFFF)
        out = batch.drop_columns([self.image_col])
        out = out.append_column("ahash_hi", pa.array(his, pa.int64()))
        out = out.append_column("ahash_lo", pa.array(los, pa.int64()))
        return out


class AudioFingerprinter:
    """binary WAV column -> 64-bit energy-delta fingerprint, the
    integer-exact audio analog of :class:`AverageHasher` (chromaprint's
    spectral bits need an FFT; the energy-delta variant is pure integer
    sums and compares, so a SQL oracle replays it bit-for-bit): decode
    PCM, sum |sample| per 256-sample window over the first channel, set
    bit w iff energy[w+1] > energy[w] (w = 0..63; short clips pad with
    zero-energy windows).  Emitted as two int64 halves.

    Actor-pool stage; near-duplicate audio then runs the same
    signature-agnostic hamming bucketing as images
    (``dedup.simhash_buckets(sig_col=...)``)."""

    WINDOW = 256
    N_BITS = 64

    def __init__(self, audio_col: str = "audio"):
        from .codecs import decode_wav

        self.audio_col = audio_col
        self.decoder = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.audio_col).to_pylist()
        his, los = [], []
        need = self.WINDOW * (self.N_BITS + 1)
        for p in payloads:
            samples, _rate = self.decoder(p or b"")
            s = np.abs(samples[:, 0].astype(np.int64))
            if len(s) < need:
                s = np.concatenate([s, np.zeros(need - len(s), np.int64)])
            e = s[:need].reshape(self.N_BITS + 1, self.WINDOW).sum(axis=1)
            bits = (e[1:] > e[:-1]).astype(np.uint64)
            val = int((bits << np.arange(64, dtype=np.uint64)).sum())
            his.append((val >> 32) & 0xFFFFFFFF)
            los.append(val & 0xFFFFFFFF)
        out = batch.drop_columns([self.audio_col])
        out = out.append_column("fp_hi", pa.array(his, pa.int64()))
        out = out.append_column("fp_lo", pa.array(los, pa.int64()))
        return out


class SceneCutDetector:
    """binary Y4M column -> scene-cut statistics: decode the luma
    planes, sum |pixel delta| between consecutive frames, and count the
    pairs whose delta energy exceeds the threshold — integer-exact
    frame-level shot detection (the histogram/feature variants need
    floats; absolute-delta energy is the SQL-replayable member of the
    family).  Actor-pool stage over real YUV4MPEG2 bytes
    (``codecs.decode_y4m``)."""

    def __init__(self, video_col: str = "video", threshold: int = 1000):
        from .codecs import decode_y4m

        self.video_col = video_col
        self.threshold = threshold
        self.decoder = decode_y4m

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.video_col).to_pylist()
        n_frames, n_cuts, max_delta = [], [], []
        for p in payloads:
            frames, _fn, _fd = self.decoder(p or b"")
            f = frames.astype(np.int64)
            if len(f) < 2:
                n_frames.append(len(f))
                n_cuts.append(0)
                max_delta.append(0)
                continue
            deltas = np.abs(f[1:] - f[:-1]).sum(axis=(1, 2))
            n_frames.append(len(f))
            n_cuts.append(int((deltas > self.threshold).sum()))
            max_delta.append(int(deltas.max()))
        out = batch.drop_columns([self.video_col])
        out = out.append_column("n_frames", pa.array(n_frames, pa.int64()))
        out = out.append_column("n_cuts", pa.array(n_cuts, pa.int64()))
        out = out.append_column("max_delta", pa.array(max_delta, pa.int64()))
        return out
