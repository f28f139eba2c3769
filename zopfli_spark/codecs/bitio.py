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

import ctypes

import numpy as np

__all__ = ["bit_width", "pack_bits", "unpack_bits", "zigzag_encode", "zigzag_decode"]

# Kernels allocate multi-MB numpy intermediates per call. glibc serves big
# mallocs via mmap and returns them on free, so every call pays page-zeroing
# and munmap TLB shootdowns — which serializes across the 32 concurrent Spark
# python workers (measured: 14x per-process slowdown at 8 workers). Raising
# the mmap/trim thresholds keeps these buffers in the reusable heap. Runs once
# per process at import (i.e. in every executor python worker).
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def _tune_malloc() -> None:
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 256 * 1024 * 1024)
        libc.mallopt(_M_TRIM_THRESHOLD, 256 * 1024 * 1024)
    except Exception:
        pass  # non-glibc platform: harmless


_tune_malloc()

# Bound per-call intermediates to ~64 KB value slices (≲256 KB unpacked) so
# glibc recycles them from heap bins instead of round-tripping pages through
# the kernel. Measured on this host: 4 MB chunks collapse to 4.8 Mvals/s per
# process at 32 concurrent workers (page-fault serialization); 64 KB chunks
# hold 38 Mvals/s per process — near-linear scaling.
_CHUNK = 1 << 13


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (0 → 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def _lane(width: int) -> int:
    if width <= 8:
        return 8
    if width <= 16:
        return 16
    if width <= 32:
        return 32
    return 64


_LANE_DTYPE = {8: np.uint8, 16: ">u2", 32: ">u4", 64: ">u8"}


def _pack_chunk(values: np.ndarray, width: int, lane: int) -> np.ndarray:
    n = len(values)
    if lane == 8:
        bits = np.unpackbits(values.astype(np.uint8).reshape(n, 1), axis=1)
    else:
        bits = np.unpackbits(
            values.astype(_LANE_DTYPE[lane]).view(np.uint8).reshape(n, lane // 8), axis=1
        )
    return np.packbits(bits[:, lane - width :].reshape(-1))


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (uint64, all < 2**width) into a dense LSB-trimmed buffer.

    Layout: big-endian bit order, value i occupies bits [i*width, (i+1)*width).
    width == 0 → empty buffer (all values are zero by contract). Processed in
    chunks whose count is a multiple of 8 so chunk outputs are byte-aligned
    and concatenate exactly.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    lane = _lane(width)
    if n <= _CHUNK:
        return _pack_chunk(values, width, lane).tobytes()
    parts = [
        _pack_chunk(values[i : i + _CHUNK], width, lane) for i in range(0, n, _CHUNK)
    ]
    return b"".join(p.tobytes() for p in parts)


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width > 64:
        # a crafted blob can carry any width byte; >64 would silently
        # mis-slice the lane matrix below — raise before any allocation
        raise ValueError(f"width {width} > 64")
    if len(buf) < (n * width + 7) // 8:
        # corrupt/truncated input must raise, never silently decode short
        # (page CRCs catch corruption later, but a blob-level decode should
        # be bounded and loud on malformed bytes)
        raise ValueError(
            f"packed buffer too short: {len(buf)} bytes < {(n * width + 7) // 8} "
            f"needed for n={n} width={width}"
        )
    lane = _lane(width)
    src = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    # chunk boundaries are byte-aligned because _CHUNK * width % 8 == 0
    step = _CHUNK
    for i in range(0, n, step):
        m = min(step, n - i)
        b0 = i * width // 8
        bits = np.unpackbits(src[b0:], count=m * width).reshape(m, width)
        full = np.zeros((m, lane), dtype=np.uint8)
        full[:, lane - width :] = bits
        packed = np.packbits(full, axis=1)
        if lane == 8:
            out[i : i + m] = packed.reshape(m)
        else:
            out[i : i + m] = (
                np.ascontiguousarray(packed).view(_LANE_DTYPE[lane]).reshape(m)
            )
    return out


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed int64 → uint64 zigzag (0,-1,1,-2 → 0,1,2,3)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag → signed int64."""
    u = values.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))
