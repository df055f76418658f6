"""Shared text-shingling / hashing primitives for dedup & text analysis.

Everything here is expressed twice — as Spark Column expressions and as
DuckDB SQL fragments — from ONE set of constants, so the dedup/minhash/
simhash queries are bit-for-bit reproducible in both engines (the oracle
runs the identical algorithm, not a lookalike).

Cross-engine deterministic hash: ``h(s) = int(md5(s)[:7 hex], 16)`` —
md5 is identical everywhere; 28 bits keeps ``a*h + b`` inside int64 under
ANSI overflow checking (a, h < 2^31 ⇒ product < 2^59).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1

# Fixed affine-permutation parameters for K=8 minhashes (4 bands × 2 rows).
MINHASH_A = [1664525, 22695477, 69069, 1103515245, 134775813, 214013, 16807, 48271]
MINHASH_B = [1013904223, 1, 362437, 12345, 1, 2531011, 0, 1]
N_BANDS = 4
BAND_ROWS = 2
assert len(MINHASH_A) == N_BANDS * BAND_ROWS


def minhash_params(n_perms: int) -> tuple[list[int], list[int]]:
    """Affine-permutation parameters for an arbitrary minhash count —
    the deployment sizes (bands × rows) to its recall/precision target
    without changing the pipeline. The first 8 are the fixed constants
    (prefix-stable, so default band signatures — and the DuckDB oracle —
    are untouched); further perms extend them by Lehmer/LCG recurrences
    mod the Mersenne prime (a stays nonzero: a pure multiplicative step
    from a nonzero seed; both stay < 2^31 so `a*h` fits a BIGINT)."""
    if n_perms < 1:
        raise ValueError(f"n_perms must be >= 1, got {n_perms}")
    a, b = list(MINHASH_A), list(MINHASH_B)
    while len(a) < n_perms:
        a.append((a[-1] * 48271) % MERSENNE_P)
        b.append((b[-1] * 69069 + 1) % MERSENNE_P)
    return a[:n_perms], b[:n_perms]

SIMHASH_BITS = 16  # bits of the simhash signature (each needs a ±1 vote sum)


# ---------------------------------------------------------------- Spark side
def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization (single-space in this corpus)."""
    return F.split(F.col(text), " ")


def shingles_expr(text: str = "text", n: int = 3) -> str:
    """SQL expr producing the DISTINCT word n-gram shingle array."""
    toks = f"split({text}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' '))) "
        f"ELSE array_distinct({toks}) END"
    )


def hash60_expr(s: str) -> str:
    """28-bit cross-engine hash of a string expression (Spark SQL text)."""
    return f"CAST(conv(substring(md5(CAST({s} AS BINARY)), 1, 7), 16, 10) AS BIGINT)"


def hashes_expr(shingle_array: str) -> str:
    """Hash every shingle ONCE → array<bigint> of 28-bit hashes mod P.

    All K minhashes and all SIMHASH_BITS votes derive from this single
    md5 pass — materialize it as a column before fanning out (an md5 per
    shingle per derived value is a 8-16× slowdown otherwise)."""
    return f"transform({shingle_array}, s -> {hash60_expr('s')} % {MERSENNE_P})"


def minhash_from_hashes_expr(hashes_array: str, k: int) -> str:
    """k-th minhash from the precomputed hash array (Spark SQL text)."""
    A, B = minhash_params(k + 1)
    a, b = A[k], B[k]
    return f"array_min(transform({hashes_array}, h -> ({a}L * h + {b}L) % {MERSENNE_P}))"


def minhash_expr(shingle_array: str, k: int) -> str:
    """k-th minhash over a shingle-array expression (Spark SQL text).

    Prefer hashes_expr + minhash_from_hashes_expr in multi-minhash
    pipelines; this form re-runs md5 per k."""
    a, b = MINHASH_A[k], MINHASH_B[k]
    h = hash60_expr("s")
    return (
        f"array_min(transform({shingle_array}, "
        f"s -> ({a}L * ({h} % {MERSENNE_P}) + {b}L) % {MERSENNE_P}))"
    )


def simhash_from_hashes_expr(hashes_array: str) -> str:
    """SimHash signature from the precomputed hash array: bit_j = 1 iff
    majority of hashes have bit j set (votes ±1, sum > 0)."""
    parts = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"aggregate(transform({hashes_array}, "
            f"h -> CASE WHEN shiftright(h, {j}) % 2 = 1 THEN 1 ELSE -1 END), "
            f"0, (acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0L END)")
    return "(" + " + ".join(parts) + ")"


def simhash_expr(shingle_array: str) -> str:
    """SimHash signature (SIMHASH_BITS wide) over a shingle array.

    bit_j = 1 iff sum over shingles of (±1 by hash bit j) > 0; the
    signature is the integer with those bits set. Expressed as a sum of
    per-bit votes folded with `aggregate` — identical in DuckDB via
    list_sum/list_transform. Prefer hashes_expr +
    simhash_from_hashes_expr (single md5 pass)."""
    h = f"({hash60_expr('s')} % {MERSENNE_P})"
    parts = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"aggregate(transform({shingle_array}, "
            f"s -> CASE WHEN shiftright({h}, {j}) % 2 = 1 THEN 1 ELSE -1 END), "
            f"0, (acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0L END)")
    return "(" + " + ".join(parts) + ")"


def jaccard_expr(sh_a: str, sh_b: str) -> str:
    """Exact Jaccard of two distinct-shingle arrays — an integer ratio, so
    bit-identical across engines (Spark SQL text)."""
    return (
        f"CAST(size(array_intersect({sh_a}, {sh_b})) AS DOUBLE) / "
        f"CAST(size(array_union({sh_a}, {sh_b})) AS DOUBLE)"
    )


# --------------------------------------------------------------- DuckDB side
def duck_shingles(text: str = "text", n: int = 3) -> str:
    toks = f"string_split({text}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))) "
        f"ELSE list_distinct({toks}) END"
    )


def duck_hash60(s: str) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, 7)) AS BIGINT)"


def duck_minhash(shingle_array: str, k: int) -> str:
    a, b = MINHASH_A[k], MINHASH_B[k]
    h = duck_hash60("s")
    return (
        f"list_min(list_transform({shingle_array}, "
        f"s -> ({a} * ({h} % {MERSENNE_P}) + {b}) % {MERSENNE_P}))"
    )


def duck_simhash(shingle_array: str) -> str:
    h = f"({duck_hash60('s')} % {MERSENNE_P})"
    parts = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform({shingle_array}, "
            f"s -> CASE WHEN ({h} >> {j}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        parts.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def duck_jaccard(sh_a: str, sh_b: str) -> str:
    return (
        f"CAST(len(list_intersect({sh_a}, {sh_b})) AS DOUBLE) / "
        f"CAST(len(list_distinct(list_concat({sh_a}, {sh_b}))) AS DOUBLE)"
    )
