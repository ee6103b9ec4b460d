"""Pure-Python MurmurHash3 x86_32 (public algorithm, Austin Appleby's
published spec), as Spark's ``HashingTF`` applies it to string terms
(UTF-8 bytes, seed 42).  Written from the spec; validated bit-for-bit
against a live ``HashingTF`` in tests/test_minhash_ml_expected.py.

Spark note (SPARK-23469): modern HashingTF uses the "version 2" byte
hashing, which matches the reference algorithm for unaligned byte
arrays (the v1 variant folded tail bytes sign-extended, diverging from
the spec).  This implements the reference semantics.
"""

from __future__ import annotations

_M32 = (1 << 32) - 1
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _fmix(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """MurmurHash3 x86_32 of ``data``, returned as SIGNED 32-bit int
    (the JVM int Spark surfaces)."""
    n = len(data)
    h = seed & _M32
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h = _fmix(h)
    return h - (1 << 32) if h >= (1 << 31) else h


def non_negative_mod(x: int, mod: int) -> int:
    """Spark's Utils.nonNegativeMod for JVM % semantics."""
    raw = int(x) % mod if x >= 0 else -((-int(x)) % mod)
    return raw + mod if raw < 0 else raw
