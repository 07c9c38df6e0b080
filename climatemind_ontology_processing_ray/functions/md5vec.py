"""Vectorized MD5 → uint64 for the dedup family's shingle/word hashing.

``dedup._hash64`` (little-endian first 8 bytes of md5) is pinned by the
DuckDB oracles (``queries._SQL_H64`` replicates it with SQL ``md5``) and
by recorded fixtures, so the ROUND-4 speedup keeps the function
bit-identical and removes only the per-string Python overhead: hashlib
costs ~1 µs of allocator/dispatch per call, which dominated minhash /
simhash / simjoin shingling at 10^5-10^8 hashes per run (VERDICT r3
item 1: "the single largest avoidable CPU term at scale").

``md5_u64`` runs the md5 compression function (public spec: RFC 1321)
as 64 rounds of uint32 numpy ops over ALL inputs at once (lanes =
strings, the classic SIMD-md5 layout).  Strings are scattered into a padded (N, blocks*64) byte matrix
straight from the Arrow data buffer — no per-row Python.  Inputs of
different block counts are processed per block-count group; shingles and
words are almost always single-block (≤ 55 bytes).

Semantics: md5 of the UTF-8 bytes, first 8 digest bytes little-endian —
for every input length, identical to ``hashlib.md5(s).digest()[:8]``
(property-tested in tests/test_functions.py).
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa

assert sys.byteorder == "little", "md5vec assumes a little-endian host"

# round constants K[i] = floor(|sin(i+1)| * 2^32) and per-round shifts
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32).astype(
    np.uint64
).astype(np.uint32)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT = (
    np.uint32(0x67452301),
    np.uint32(0xEFCDAB89),
    np.uint32(0x98BADCFE),
    np.uint32(0x10325476),
)


def _compress(A, B, C, D, M):
    """One md5 block over N lanes.  A..D: (N,) uint32; M: (N, 16) uint32.
    Returns the updated state."""
    a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        f = f + a + _K[i] + M[:, _G[i]]  # uint32 wraps
        s = _S[i]
        a, d, c = d, c, b
        b = b + ((f << s) | (f >> np.uint32(32) - s))
    return A + a, B + b, C + c, D + d


def _as_binary_array(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(values)
    if pa.types.is_string(values.type) or pa.types.is_binary(values.type):
        values = values.cast(pa.large_binary())
    elif pa.types.is_large_string(values.type):
        values = values.cast(pa.large_binary())
    elif not pa.types.is_large_binary(values.type):
        raise TypeError(f"md5_u64 expects strings/bytes, got {values.type}")
    return values


def md5_u64(values) -> np.ndarray:
    """uint64 md5-prefix hash of each string/bytes value, vectorized.

    ``values``: pyarrow (Chunked)Array of string/binary, or any sequence
    pyarrow can convert (list[str], numpy object array).  Nulls are not
    supported (call sites normalize None → "" first)."""
    arr = _as_binary_array(values)
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    if arr.null_count:
        raise ValueError("md5_u64: null input; normalize nulls to '' upstream")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offsets[1:] - offsets[:-1]
    nblk = (lens + 9 + 63) // 64
    for k in np.unique(nblk):
        idx = np.flatnonzero(nblk == k)
        L = lens[idx]
        m = np.zeros((len(idx), int(k) * 64), dtype=np.uint8)
        total = int(L.sum())
        if total:
            row = np.repeat(np.arange(len(idx)), L)
            col = np.arange(total) - np.repeat(np.cumsum(L) - L, L)
            m[row, col] = data[np.repeat(offsets[:-1][idx], L) + col]
        m[np.arange(len(idx)), L] = 0x80
        m64 = m.view(np.uint64)
        m64[:, -1] = L.astype(np.uint64) << np.uint64(3)  # bit length, LE
        M = m.view(np.uint32).reshape(len(idx), int(k), 16)
        A = np.full(len(idx), _INIT[0], np.uint32)
        B = np.full(len(idx), _INIT[1], np.uint32)
        C = np.full(len(idx), _INIT[2], np.uint32)
        D = np.full(len(idx), _INIT[3], np.uint32)
        for blk in range(int(k)):
            A, B, C, D = _compress(A, B, C, D, M[:, blk, :])
        out[idx] = A.astype(np.uint64) | (B.astype(np.uint64) << np.uint64(32))
    return out


def md5_u64_any(values) -> np.ndarray:
    """``md5_u64(str(value))`` for a column of ANY type, md5 once per
    UNIQUE value (dictionary encode + scatter — md5 costs ~2.3µs/value,
    the encode ~0.1µs, so any repetition pays off immediately).  Integer
    columns take an Arrow cast-to-string fast path (Arrow and Python
    format integers identically); other non-string types go through
    Python ``str()`` so the result matches the scalar
    ``hashlib.md5(str(v).encode())`` convention exactly."""
    import pyarrow.compute as pc

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        try:
            arr = pa.array(values)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arr = pa.array([str(v) for v in values], pa.string())
    else:
        arr = values
    if pa.types.is_integer(arr.type):
        arr = pc.cast(arr, pa.string())
    elif not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pa.array([str(v) for v in arr.to_pylist()], pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "None")  # str(None) in the scalar convention
    dic = pc.dictionary_encode(arr)
    if isinstance(dic, pa.ChunkedArray):
        dic = dic.combine_chunks()
    uniq = md5_u64(dic.dictionary)
    return uniq[np.asarray(dic.indices)]


def md5_hex8_u64(values) -> np.ndarray:
    """``int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)`` for a whole
    column: the first 8 hex chars are the first 4 big-endian digest bytes —
    the top half of the byteswapped little-endian u64 prefix.  Comparing
    these uint64 values reproduces LEXICOGRAPHIC order of the 8-hex
    prefixes exactly (fixed-width hex strings order like their integers)."""
    return md5_u64_any(values).byteswap() >> np.uint64(32)
