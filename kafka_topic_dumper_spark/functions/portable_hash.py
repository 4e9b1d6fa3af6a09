"""Engine-portable deterministic hashing.

The probabilistic operators (MinHash-LSH, SimHash, sign-LSH ANN) are
only differentially testable against a DuckDB oracle if every hash they
use is computable — bit-identically — in BOTH engines' SQL. xxhash64 is
Spark-only, so the portable path derives everything from md5, which both
engines expose with identical lowercase-hex output:

    H32(x) = int(md5(x)[:8 hex chars], 16)        # uniform in [0, 2^32)

Spark spells it ``conv(substr(md5(x),1,8),16,10)``; DuckDB spells it
``('0x' || substr(md5(x),1,8))::BIGINT``; Python spells it
``hashlib.md5``. All three agree exactly, so LSH bucket assignments —
and therefore result SETS, not just distributions — match across
engines.

md5 is ~10× slower per row than xxhash64 but still JVM-side and
codegen-friendly; at scale the hash cost is dwarfed by the shuffle the
hash feeds. Operators accept ``portable=False`` to switch to xxhash64
when oracle parity is not needed.
"""

from __future__ import annotations

import hashlib


def h32_spark_sql(expr: str) -> str:
    """Spark SQL expression: 32-bit md5-prefix hash of ``expr``."""
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def h32_duckdb_sql(expr: str) -> str:
    """DuckDB SQL expression: same 32-bit md5-prefix hash of ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h60_spark_sql(expr: str) -> str:
    """Spark SQL: 60-bit md5-prefix hash (15 hex chars) — a compact
    join key for high-cardinality strings. At 10^6 distinct values the
    expected collision count is ~4e-7; and because BOTH engines use
    the identical hash, a collision changes both sides of a
    differential check identically."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def h60_duckdb_sql(expr: str) -> str:
    """DuckDB SQL: same 60-bit md5-prefix hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h32_py(s: str) -> int:
    """Python-side H32 — for deriving literals (e.g. hyperplane weights)
    that get embedded identically into both engines' SQL."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


MERSENNE61 = (1 << 61) - 1
HASH_DOMAIN31 = (1 << 31) - 1


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations
    ``h_i(x) = (a_i*x + b_i) mod MERSENNE61``, derived from md5 so both
    engines embed the same literals. Domains are sized so the arithmetic
    never overflows int64 under ANSI semantics: x < 2^31 (shingle hashes
    are reduced mod HASH_DOMAIN31), a < 2^31, b < 2^32 ⇒
    a*x + b < 2^62 + 2^32 < 2^63."""
    return [
        (
            (h32_py(f"minhash-a-{i}") % (HASH_DOMAIN31 - 1)) + 1,
            h32_py(f"minhash-b-{i}"),
        )
        for i in range(k)
    ]


def bloom_params(j: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for ``j`` Bloom-filter bit-position
    hashes — same scheme as :func:`cms_params`, salted independently."""
    return [
        (
            (h32_py(f"bloom-a-{i}") % (HASH_DOMAIN31 - 1)) + 1,
            h32_py(f"bloom-b-{i}"),
        )
        for i in range(j)
    ]


def cms_params(depth: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the count-min sketch's ``depth``
    universal-hash rows — same md5-derived-literal scheme and the same
    int64-safety envelope as :func:`minhash_params`, salted differently
    so the CMS rows are independent of the MinHash permutations."""
    return [
        (
            (h32_py(f"cms-a-{i}") % (HASH_DOMAIN31 - 1)) + 1,
            h32_py(f"cms-b-{i}"),
        )
        for i in range(depth)
    ]
