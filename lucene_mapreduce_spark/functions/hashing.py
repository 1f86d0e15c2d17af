"""Pure-Python xxhash64, bit-identical to Spark's ``F.xxhash64`` (seed 42).

xxHash is a public algorithm (Yann Collet, BSD); Spark uses it for
``xxhash64()`` with seed 42. Having the same hash driver-side lets the query
path route terms to segment partitions without launching a Spark job —
the partitioning contract (phash = pmod(xxhash64(term), P)) can be evaluated
anywhere. Parity with Spark is asserted in tests/test_wand.py.
"""

from __future__ import annotations

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed
        v4 = (seed - _PRIME1) & _MASK
        while i <= n - 32:
            lane = int.from_bytes(data[i: i + 8], "little")
            v1 = (_rotl((v1 + lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            lane = int.from_bytes(data[i + 8: i + 16], "little")
            v2 = (_rotl((v2 + lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            lane = int.from_bytes(data[i + 16: i + 24], "little")
            v3 = (_rotl((v3 + lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            lane = int.from_bytes(data[i + 24: i + 32], "little")
            v4 = (_rotl((v4 + lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            h = (h * _PRIME1 + _PRIME4) & _MASK
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        lane = int.from_bytes(data[i: i + 8], "little")
        h ^= (_rotl((lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
        h = (_rotl(h, 27) * _PRIME1 + _PRIME4) & _MASK
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i: i + 4], "little")
        h ^= (lane * _PRIME1) & _MASK
        h = (_rotl(h, 23) * _PRIME2 + _PRIME3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _PRIME5) & _MASK
        h = (_rotl(h, 11) * _PRIME1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


def term_phash(term: str, num_partitions: int) -> int:
    """Python twin of Spark's ``pmod(xxhash64(term), P)`` segment routing."""
    h = xxhash64(term.encode("utf-8"))
    if h >= 1 << 63:
        h -= 1 << 64  # to signed, like Spark's long
    return h % num_partitions  # python % == pmod for positive P
