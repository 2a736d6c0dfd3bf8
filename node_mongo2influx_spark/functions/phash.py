"""Portable 32-bit hashing: identical arithmetic in Spark SQL and DuckDB.

Spark's xxhash64 has no DuckDB twin, so any operator whose output must be
oracle-checkable bit-for-bit (SimHash's portable tier, deterministic
train/val/test splits, hash-based sampling) hashes with FNV-1a over code
points instead: a fold of xor / multiply-by-prime / mask-to-32-bits that
both engines evaluate with exact 64-bit integer arithmetic (every
intermediate < 2^56 — also ANSI-overflow-safe).

Production paths that don't need a cross-engine oracle should keep
xxhash64 (JVM intrinsic, faster, 64-bit); these helpers are the portable
tier, not a replacement.
"""

from __future__ import annotations

#: FNV-1a 32-bit offset basis / prime (public-domain constants).
FNV_BASIS = 2166136261
FNV_PRIME = 16777619

#: 2^32 — FNV output range; divide (or integer-compare against a
#: ``cutoff32`` threshold) to treat the hash as uniform in [0, 1).
HASH_SPACE = 1 << 32


def fnv1a32_spark_sql(expr: str) -> str:
    """Spark-SQL string: FNV-1a (32-bit) over the code points of ``expr``."""
    return (
        f"aggregate(transform(sequence(1, length({expr})), "
        f"i -> cast(ascii(substring({expr}, i, 1)) as bigint)), "
        f"cast({FNV_BASIS} as bigint), "
        f"(acc, x) -> ((acc ^ x) * {FNV_PRIME}) & 4294967295)"
    )


def fnv1a32_duckdb_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`fnv1a32_spark_sql` — same fold, DuckDB
    spelling (list_reduce has no init argument, so list_prepend supplies
    the offset basis; xor() instead of ^, ord() instead of ascii())."""
    return (
        f"list_reduce(list_prepend(CAST({FNV_BASIS} AS BIGINT), "
        f"list_transform(generate_series(1, length({expr})), "
        f"i -> CAST(ord(substr({expr}, i, 1)) AS BIGINT))), "
        f"(acc, x) -> (xor(acc, x) * {FNV_PRIME}) & 4294967295)"
    )


def cutoff32(fraction: float) -> int:
    """Integer threshold for 'hash falls in the first ``fraction`` of the
    space'. Comparing the hash against an integer cutoff avoids any
    float-division/representation question across engines entirely."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * HASH_SPACE)
