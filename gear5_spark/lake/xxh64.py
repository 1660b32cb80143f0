"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

``LakeTable.lookup`` must compute a key's bucket WITHOUT launching a
Spark job (VERDICT r1 #7: a point-lookup API that costs a probe job per
call defeats its purpose). Spark's ``xxhash64(c1, c2, ...)`` seeds with
42 and chains: ``h = XXH64(bytes(c1), 42); h = XXH64(bytes(c2), h)``,
strings hashed as UTF-8. This module reimplements XXH64 (public-domain
algorithm, Yann Collet) so the driver computes the identical bucket id;
equality with the JVM expression is pinned by tests/test_lake_table.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` (unsigned). Spark's default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_strings(values: list[str], seed: int = 42) -> int:
    """Spark's ``xxhash64(c1, c2, ...)`` over string columns: per-column
    UTF-8 hash, each column seeded with the running result (signed
    64-bit, like the JVM expression's long)."""
    h = seed
    for v in values:
        h = xxh64(v.encode("utf-8"), h & _M64)
    return _signed(h)


def bucket_of(values: list[str], n_buckets: int, seed: int = 42) -> int:
    """``pmod(xxhash64(cols...), n)`` — the lake table's bucket id,
    computed driver-side."""
    return spark_xxhash64_strings(values, seed) % n_buckets


_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_int32(value: int, seed: int = 42) -> int:
    """Murmur3 x86_32 of one int32 — Spark's ``F.hash`` for an integer
    column (``Murmur3_x86_32.hashInt``). Signed 32-bit result. Used to
    compute the identity-placement map driver-side instead of a probe
    job."""
    k1 = (value & _M32) * 0xCC9E2D51 & _M32
    k1 = _rotl32(k1, 15)
    k1 = k1 * 0x1B873593 & _M32
    h1 = seed & _M32
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & _M32
    h1 ^= 4  # length in bytes
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & _M32
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1
