"""Knob sizing for the incremental stores (r8 verdict ask #8).

The planes / bands / cells knobs are all measured (BASELINE.md,
RECALL_r09.md) but were manually chosen per run. These helpers turn the
deployment targets into knob values using the same closed-form models
the measurements validated:

- sign-LSH buckets are uniform over 2^planes (hash property; measured
  occupancy in tools/bench_ann_store.py matches n/2^planes), so a
  target mean bucket occupancy fixes the plane count;
- IVF cells hold ~n/cells members on quasi-uniform corpora (the probe
  fraction is nprobe/cells by construction), so a target cell size
  fixes the cell count;
- banded MinHash candidate probability is exactly
  p(s) = 1 - (1 - s^rows)^bands — the standard S-curve — so a recall
  floor at the dedup threshold plus a candidate-rate ceiling at the
  corpus noise similarity fixes the cheapest (bands, rows) pair.

Each helper is unit-tested against its model AND against a built store
(tests/test_sizing_migration.py); streaming/migrate.py re-indexes an
existing store when corpus growth moves the right knob value.
"""

from __future__ import annotations

import math


def planes_for_occupancy(n_vectors: int, target_occupancy: int) -> int:
    """Smallest plane count whose expected mean bucket occupancy
    n / 2^planes is at or below the target (clamped to the bucket-id
    arithmetic's [1, 30] range, operators/vectors.lsh_params). The
    occupancy model is the measured one: sign-LSH buckets of hash-
    uniform corpora hold ~n/2^planes members (BASELINE.md ANN-store
    curve), and RECALL_r09.md is the reminder that the probe budget
    (n_probes), not the plane count, buys recall — size planes to the
    candidate volume a probe should pay, then spend probes to the
    recall target."""
    if n_vectors < 1:
        raise ValueError(f"n_vectors must be >= 1, got {n_vectors}")
    if target_occupancy < 1:
        raise ValueError(f"target_occupancy must be >= 1, got {target_occupancy}")
    return min(30, max(1, math.ceil(math.log2(max(1.0, n_vectors / target_occupancy)))))


def ivf_cells_for_occupancy(n_vectors: int, target_occupancy: int) -> int:
    """Cell count whose mean inverted-list length n / cells is at or
    below the target (at least 1). A probe then scans
    ~nprobe × target_occupancy rows — the IVF store's measured probe
    cost model (tools/bench_ivf_store.py)."""
    if n_vectors < 1:
        raise ValueError(f"n_vectors must be >= 1, got {n_vectors}")
    if target_occupancy < 1:
        raise ValueError(f"target_occupancy must be >= 1, got {target_occupancy}")
    return max(1, math.ceil(n_vectors / target_occupancy))


def minhash_candidate_prob(s: float, bands: int, rows: int) -> float:
    """P(a pair at Jaccard similarity s collides in >= 1 band) for
    banded MinHash: 1 - (1 - s^rows)^bands."""
    return 1.0 - (1.0 - s**rows) ** bands


def minhash_bands_for(
    tau: float,
    *,
    min_recall: float = 0.9,
    noise_sim: float = 0.2,
    max_noise_rate: float = 0.05,
    max_rows: int = 8,
    max_perms: int = 64,
) -> tuple[int, int]:
    """Cheapest (bands, rows) — fewest total permutations, then fewest
    bands — satisfying BOTH deployment targets:

    - recall: p(tau) >= min_recall (a true near-dup pair at the dedup
      threshold must become a candidate);
    - candidate rate: p(noise_sim) <= max_noise_rate (a typical
      NON-dup pair at the corpus background similarity must rarely
      reach the exact-verify stage — the per-batch verify cost is
      candidate_rate x batch x history collisions).

    Raises if no pair within (max_rows, max_perms) satisfies both —
    targets that tight need a wider signature budget, stated loudly
    rather than silently missed. The returned pair feeds
    LSHSignatureStore(n_bands=, band_rows=) whose permutations are
    prefix-stable (operators/text.minhash_params)."""
    if not 0 < noise_sim < tau < 1:
        raise ValueError(f"need 0 < noise_sim < tau < 1, got {noise_sim}, {tau}")
    best: tuple[int, int] | None = None
    best_cost: tuple[int, int] | None = None
    for rows in range(1, max_rows + 1):
        for bands in range(1, max_perms // rows + 1):
            if minhash_candidate_prob(tau, bands, rows) < min_recall:
                continue
            if minhash_candidate_prob(noise_sim, bands, rows) > max_noise_rate:
                continue
            cost = (bands * rows, bands)
            if best_cost is None or cost < best_cost:
                best, best_cost = (bands, rows), cost
    if best is None:
        raise ValueError(
            f"no (bands<=?, rows<={max_rows}) within {max_perms} perms reaches "
            f"recall>={min_recall} at tau={tau} with noise rate<="
            f"{max_noise_rate} at s={noise_sim}; widen max_perms or relax a target"
        )
    return best
