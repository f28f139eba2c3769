"""Vectorized bit-packing primitives.

The reference emits DEFLATE bitstreams one symbol at a time through
``AddBit``/``AddBits``/``AddHuffmanBits`` (reference: src/zopfli/deflate.c:49-83).
Here the same job — "write each value with exactly `width` bits" — is done as a
single vectorized numpy pass over the whole page (unpackbits → column-slice →
packbits), which is the Spark-first re-expression of word-at-a-time bit output
(reference: src/zopfli/lz77.c:298-332 uses the same many-at-once idea for match
extension).

All functions operate on unsigned int64 numpy arrays; callers are responsible
for mapping signed/offset domains into unsigned (see kernels.zigzag_encode and
the frame-of-reference codec).
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack_bits", "unpack_bits", "zigzag_encode", "zigzag_decode"]


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (0 → 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (uint64, all < 2**width) into a dense LSB-trimmed buffer.

    Layout: big-endian bit order, value i occupies bits [i*width, (i+1)*width).
    width == 0 → empty buffer (all values are zero by contract).
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    # Choose the narrowest lane that holds `width` bits to bound memory.
    if width <= 8:
        lane = 8
        src = values.astype(">u1" if False else np.uint8).reshape(n, 1)
        bits = np.unpackbits(src, axis=1)
    elif width <= 16:
        lane = 16
        bits = np.unpackbits(values.astype(">u2").view(np.uint8).reshape(n, 2), axis=1)
    elif width <= 32:
        lane = 32
        bits = np.unpackbits(values.astype(">u4").view(np.uint8).reshape(n, 4), axis=1)
    else:
        lane = 64
        bits = np.unpackbits(values.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    sel = bits[:, lane - width :]
    return np.packbits(sel.reshape(-1)).tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width).reshape(n, width)
    if width <= 8:
        lane = 8
    elif width <= 16:
        lane = 16
    elif width <= 32:
        lane = 32
    else:
        lane = 64
    full = np.zeros((n, lane), dtype=np.uint8)
    full[:, lane - width :] = bits
    packed = np.packbits(full, axis=1)
    if lane == 8:
        return packed.reshape(n).astype(np.uint64)
    dt = {16: ">u2", 32: ">u4", 64: ">u8"}[lane]
    return np.ascontiguousarray(packed).view(dt).reshape(n).astype(np.uint64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed int64 → uint64 zigzag (0,-1,1,-2 → 0,1,2,3)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag → signed int64."""
    u = values.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))
