"""Vector math over `array<float>` embedding columns, cross-engine exact.

Dot products / norms are expressed as *sequential left folds* in both
engines (Spark `aggregate`, DuckDB `list_reduce`) with every element cast
to DOUBLE first, so the floating-point result is bit-identical and
similarity thresholds / rankings cannot diverge between the engine and its
oracle.

The JVM-side fold (whole-stage codegen over array expressions) is the
default path; a vectorized Pandas-UDF variant exists in
doreisa_spark.operators.ann for wide-batch numpy kernels.
"""

from __future__ import annotations

# Deterministic integer hyperplane parameters for sign-LSH (see ann_lsh).
LSH_PLANES = 8
LSH_A = [379, 1031, 2243, 3793, 4621, 5857, 7333, 8647]
LSH_B = [29, 157, 311, 487, 601, 757, 919, 1093]
LSH_MOD = 1009  # weights in [-504, 504]


def lsh_params(planes: int) -> tuple[list[int], list[int]]:
    """Hyperplane parameters for an arbitrary plane count — the
    deployment sizes planes to the corpus (more planes → 2^planes
    buckets → bounded bucket occupancy) without changing the store
    layout or probe. The first LSH_PLANES planes are the fixed
    constants (so the default is bit-identical to the DuckDB oracle);
    further planes extend them by a deterministic integer recurrence
    (any fixed parameters define a valid signed hyperplane — the
    recurrence just makes them reproducible everywhere)."""
    if not 1 <= planes <= 30:  # bucket ids must fit a positive int32 sum
        raise ValueError(f"planes must be in [1, 30], got {planes}")
    a, b = list(LSH_A), list(LSH_B)
    while len(a) < planes:
        a.append((a[-1] * 31 + 971) % 99991)
        b.append((b[-1] * 17 + 409) % 99991)
    return a[:planes], b[:planes]


# ---------------------------------------------------------------- Spark side
def dot_expr(a: str, b: str) -> str:
    """Sequential-fold dot product of two array<float> columns (Spark SQL)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def ivf_argmax_cell_expr(cents_col: str, emb_col: str) -> str:
    """MAP-ONLY IVF cell assignment: per row, the argmax-cosine cell
    over ``cents_col`` — an ``array<struct<cell, cemb>>`` column
    (typically a 1-row broadcast centroid frame cross-joined in, see
    operators/literal.centroid_arg_frame) — with the same
    sequential-fold arithmetic and (cosine DESC, cell ASC) tie-break as
    the crossJoin + row_number formulation, and ZERO shuffle: the
    window variant exchanged the whole corpus by vector id just to
    rank ~cells fold values per row (guide §2.4). ``array_max`` over
    (a_cos, -cell, cell) structs is the lexicographic argmax; NaN
    cosines sort greatest in both formulations; the served cell keeps
    the column's dtype. The centroids ride as DATA (a KB broadcast),
    not expression literals — a literal-embedded variant was measured
    to cost ~1 s of parse/analysis per invocation at 16×64 floats."""
    cos = cosine_expr(emb_col, "c.cemb")
    return (
        f"array_max(transform({cents_col}, c -> named_struct("
        f"'a_cos', {cos}, 'nc', -CAST(c.cell AS BIGINT), 'cell', c.cell))).cell"
    )


def lsh_bucket_expr(a: str, planes: int = LSH_PLANES) -> str:
    """Sign-LSH bucket id: bit k = (w_k · a > 0), integer hyperplane
    weights w_k[i] = ((A_k*(i+1) + B_k) % MOD) - MOD//2 (Spark SQL)."""
    A, B = lsh_params(planes)
    bits = []
    for k in range(planes):
        w_i = f"CAST(((({A[k]} * (i + 1) + {B[k]}) % {LSH_MOD}) - {LSH_MOD // 2}) AS DOUBLE)"
        proj = (
            f"aggregate(zip_with({a}, sequence(0, size({a}) - 1), "
            f"(x, i) -> CAST(x AS DOUBLE) * {w_i}), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2**k} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_projections_py(a, planes: int = LSH_PLANES) -> list[float]:
    """Driver-side per-plane projections w_k · a with the SAME sequential
    double fold and integer hyperplanes as lsh_bucket_expr. The signs
    give the bucket; the magnitudes are the multiprobe margins (a small
    |w_k · a| means the vector sits close to hyperplane k, so the bucket
    with bit k flipped is the likeliest home of a missed neighbor)."""
    import struct

    A, B = lsh_params(planes)
    a32 = [struct.unpack("f", struct.pack("f", float(x)))[0] for x in a]
    projs = []
    for k in range(planes):
        acc = 0.0
        for i, x in enumerate(a32):
            w = ((A[k] * (i + 1) + B[k]) % LSH_MOD) - LSH_MOD // 2
            acc += float(x) * float(w)
        projs.append(acc)
    return projs


def lsh_bucket_py(a, planes: int = LSH_PLANES) -> int:
    """Driver-side mirror of lsh_bucket_expr for application-provided
    query vectors (incremental_ann.query_topk_vectors): SAME sequential
    double fold, SAME integer hyperplanes — a float32 embedding must
    land in the identical bucket whether bucketed by the JVM expression
    at ingest or here at query time."""
    return sum(
        2**k for k, p in enumerate(lsh_projections_py(a, planes)) if p > 0
    )


def lsh_probe_buckets_py(a, planes: int = LSH_PLANES, n_flip: int = 0) -> list[int]:
    """Query-directed multiprobe bucket list: the vector's own bucket
    first, then the ``n_flip`` Hamming-distance-1 neighbors obtained by
    flipping the LOWEST-|margin| planes first (Lv et al.'s multi-probe
    LSH ordering — the planes most likely to have mis-hashed a near
    neighbor). ``n_flip=planes`` probes every Hamming-1 neighbor, which
    is exactly the batch ``sim_ann_multiprobe`` probe set."""
    projs = lsh_projections_py(a, planes)
    base = sum(2**k for k, p in enumerate(projs) if p > 0)
    order = sorted(range(planes), key=lambda k: abs(projs[k]))
    return [base] + [base ^ (1 << k) for k in order[: max(0, n_flip)]]


def lsh_probe_sequence_py(
    a, planes: int = LSH_PLANES, n_probes: int = 0
) -> list[int]:
    """Full query-directed multiprobe sequence (Lv et al., VLDB'07): the
    vector's bucket followed by ``n_probes`` perturbed buckets of ANY
    Hamming distance, in nondecreasing sum-of-flipped-|margin| order —
    the success-probability order. Hamming-1 probing saturates well
    below recall 1 when the plane count is high relative to the
    neighbor angle (at planes=14 and intra-cluster cosine ~0.95 the
    probability a true neighbor lies within Hamming distance 1 is only
    ~0.58 — measured in RECALL_r09.md); deeper perturbations recover
    the tail at a per-probe cost that stays one bucket.

    Enumeration is the classic extend/shift heap over margin-sorted
    plane indices: from a perturbation set with largest index j, emit
    ``S + {j+1}`` and ``S - {j} + {j+1}`` — every nonempty subset is
    reachable and the heap pops them in score order, so generating
    ``n_probes`` buckets costs O(n_probes log n_probes), never 2^planes."""
    import heapq

    projs = lsh_projections_py(a, planes)
    base = sum(2**k for k, p in enumerate(projs) if p > 0)
    out = [base]
    if n_probes <= 0:
        return out
    order = sorted(range(planes), key=lambda k: abs(projs[k]))
    m = [abs(projs[k]) for k in order]
    heap: list[tuple[float, tuple[int, ...]]] = [(m[0], (0,))]
    while heap and len(out) <= n_probes:
        score, S = heapq.heappop(heap)
        mask = 0
        for i in S:
            mask |= 1 << order[i]
        out.append(base ^ mask)
        j = S[-1]
        if j + 1 < planes:
            heapq.heappush(heap, (score + m[j + 1], S + (j + 1,)))
            heapq.heappush(heap, (score - m[j] + m[j + 1], S[:-1] + (j + 1,)))
    return out


def sqdist_expr(a: str, b: str) -> str:
    """Sequential-fold squared L2 distance of two array<double> columns
    (Spark SQL) — same element order and accumulation as duck_sqdist."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


# --------------------------------------------------------------- DuckDB side
def duck_dot(a: str, b: str) -> str:
    n = f"len({a})"
    return (
        f"list_reduce(list_transform(range(1, {n} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def duck_norm(a: str) -> str:
    return f"sqrt({duck_dot(a, a)})"


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"


def duck_lsh_bucket(a: str, planes: int = LSH_PLANES) -> str:
    A, B = lsh_params(planes)
    bits = []
    for k in range(planes):
        w_i = f"CAST(((({A[k]} * i + {B[k]}) % {LSH_MOD}) - {LSH_MOD // 2}) AS DOUBLE)"
        proj = (
            f"list_reduce(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * {w_i}), (x, y) -> x + y)"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2**k} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def duck_sqdist(a: str, b: str) -> str:
    """Sequential-fold squared L2 distance (DuckDB) — bit-identical to
    sqdist_expr on array<double> inputs."""
    n = f"len({a})"
    return (
        f"list_reduce(list_transform(range(1, {n} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )
