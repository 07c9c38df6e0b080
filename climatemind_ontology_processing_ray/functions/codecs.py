"""Pure-python image codecs (PNG + PPM) for the multimodal stages.

The container has no PIL/opencv/ffmpeg, but PNG's format is fully
decodable with the stdlib (``zlib`` inflate + per-scanline unfiltering)
and PPM is trivial — so the ``decoder=`` injection point of
``ImageFeatureExtractor`` / ``ImageResizer`` (functions/multimodal.py)
can be exercised END-TO-END on real image bytes instead of the
deterministic fake.  Production deployments with heavy codecs still
inject their own decoder; these exist so the plumbing is proven against
genuine pixel data.

Supported:

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters; non-interlaced.
- PPM: P6 (binary) and P3 (ASCII), maxval <= 255.

``decode_image`` sniffs the magic bytes and dispatches.  Encoders for
both formats are provided for round-trip tests and fixture generation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C=1 gray, 3 RGB, 4 RGBA)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(height):
        row_start = y * (stride + 1)
        filt = raw[row_start]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int64)
        if filt == 0:  # None
            cur = line
        elif filt == 2:  # Up
            cur = (line + prev) & 0xFF
        elif filt in (1, 3, 4):  # Sub / Average / Paeth need left neighbor
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                if filt == 1:
                    val = line[x] + a
                elif filt == 3:
                    val = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    if pa_ <= pb_ and pa_ <= pc_:
                        pred = a
                    elif pb_ <= pc_:
                        pred = b
                    else:
                        pred = c
                    val = line[x] + pred
                cur[x] = val & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {filt}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, np.uint8)
            n = min(len(trns), palette.shape[0])
            lut = np.full(palette.shape[0], 255, np.uint8)
            lut[:n] = trns[:n]
            alpha = lut[idx]
            return np.dstack([rgb, alpha])
        return rgb
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 array -> PNG bytes (filter 0 rows)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """PPM (P6 binary / P3 ASCII) bytes -> (H, W, 3) uint8 array."""
    if data[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM (want P6/P3)")
    binary = data[:2] == b"P6"
    # header tokens: magic, width, height, maxval — comments (#...) allowed
    pos = 2
    tokens: list[bytes] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    if binary:
        pix = np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos)
    else:
        pix = np.array(data[pos:].split()[: w * h * 3], np.uint8)
    return pix.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array -> binary PPM (P6) bytes."""
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode PNG or PPM to (H, W, C) uint8.

    Drop-in ``decoder=`` for ImageFeatureExtractor / ImageResizer —
    grayscale is expanded to (H, W, 1), matching their (H, W, C) contract.
    """
    if data[:8] == _PNG_MAGIC:
        img = decode_png(data)
    elif data[:2] in (b"P6", b"P3"):
        img = decode_ppm(data)
    else:
        raise ValueError("unrecognized image format (PNG/PPM supported)")
    return img if img.ndim == 3 else img[:, :, None]


# --------------------------------------------------------------------- #
# WAV (PCM) — real audio decode with zero external deps
# --------------------------------------------------------------------- #


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> ((n_samples, channels) int16/uint8 array,
    sample_rate).  Supports PCM (format 1) at 8-bit unsigned and 16-bit
    signed — the uncompressed formats a data pipeline can decode without
    ffmpeg; compressed codecs stay behind the injectable-decoder boundary.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"non-PCM wav (format {audio_fmt}) unsupported")
            if bits not in (8, 16):
                raise ValueError(f"{bits}-bit PCM unsupported")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate, bits = fmt
    dtype = np.int16 if bits == 16 else np.uint8
    arr = np.frombuffer(samples, dtype=dtype)
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16/uint8 -> RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.int16:
        bits = 16
    elif samples.dtype == np.uint8:
        bits = 8
    else:
        raise ValueError("int16 or uint8 samples required")
    channels = samples.shape[1]
    body = samples.tobytes()
    ba = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * ba, ba, bits)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# --------------------------------------------------------------------- #
# Y4M (YUV4MPEG2) — real uncompressed video decode, zero external deps
# --------------------------------------------------------------------- #


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int]:
    """YUV4MPEG2 bytes -> ((frames, H, W) uint8 luma planes, fps_num,
    fps_den).  Chroma (C420/C444) is parsed and skipped — pipelines that
    need it can slice the planes the same way; luma carries the signal
    for frame-level features.  Compressed video stays injectable."""
    nl = data.find(b"\x0a")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    header = data[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    fps_num, fps_den = 25, 1
    chroma = "420"
    for tok in header[1:]:
        if not tok:
            continue
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            chroma = tok[1:]
    if w is None or h is None:
        raise ValueError("missing W/H in y4m header")
    if chroma.startswith("420"):
        frame_bytes = h * w + 2 * ((h // 2) * (w // 2))
    elif chroma.startswith("444"):
        frame_bytes = 3 * h * w
    else:
        raise ValueError(f"chroma {chroma} unsupported")
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.find(b"\x0a", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        start = fnl + 1
        luma = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=start)
        frames.append(luma.reshape(h, w))
        pos = start + frame_bytes
    return (
        np.stack(frames) if frames else np.empty((0, h, w), np.uint8),
        fps_num,
        fps_den,
    )


def encode_y4m(
    luma_frames: np.ndarray, fps_num: int = 25, fps_den: int = 1
) -> bytes:
    """(frames, H, W) uint8 luma -> YUV4MPEG2 (C420, neutral chroma)."""
    f, h, w = luma_frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\x0a".encode()]
    chroma = np.full(((h // 2) * (w // 2),), 128, np.uint8).tobytes()
    for i in range(f):
        out.append(b"FRAME\x0a")
        out.append(luma_frames[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)
