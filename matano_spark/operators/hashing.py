"""Engine-portable deterministic hashing primitives.

All dedup/similarity operators hash with *pure integer arithmetic over
code points* instead of opaque hash functions, so the exact same values
are computable in any SQL engine (the DuckDB oracle mirrors these
expressions verbatim). Everything stays in int64: P < 2^30, multipliers
< 2^31, so a*h+b < 2^63.

poly_hash:  h := (h * 131 + codepoint) mod P   (left fold over chars)
affine_i :  g_i(h) := (A_i * h + B_i) mod P    (the i-th MinHash permutation)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
BASE = 131

# Deterministic affine constants for MinHash "permutations" (classic
# universal-hash family g(x) = (a*x + b) mod P). Fixed — shared by the
# Spark and oracle sides.
MINHASH_A = [769, 1543, 3079, 6151, 12289, 24593, 49157, 98317]
MINHASH_B = [1, 97, 389, 769, 1531, 3067, 6143, 12281]


def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string column → bigint in [0, P)."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda h, ch: (h * BASE + F.ascii(ch).cast("bigint")) % P,
    )


def sql_poly_hash(expr: str) -> str:
    """DuckDB mirror of poly_hash."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        f"ch -> CAST(unicode(ch) AS BIGINT))), "
        f"(h, code) -> (h * {BASE} + code) % {P})"
    )


def affine(h: Column, i: int) -> Column:
    return (F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % P


def sql_affine(expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * ({expr}) + {MINHASH_B[i]}) % {P})"
