"""Distributed FFT (plans/chunked.py:fft) vs numpy — per-element complex
spectra, multi-chunk rechunk path, power-spectrum fusion, Parseval."""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark.plans.chunked import ChunkedArray


def _dense_of(arr: ChunkedArray) -> np.ndarray:
    return arr.to_numpy()


def test_fft_matches_numpy_multichunk_axis(spark):
    rng = np.random.default_rng(41)
    dense = rng.normal(size=(8, 6))
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 3 * j : 3 * j + 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "fft2", chunks)
    # axis 0 spans 2 chunks -> exercises the rechunk-contiguous move
    got = _dense_of(arr.fft(axis=0))
    expect = np.fft.fft(dense, axis=0)
    assert got.dtype == np.complex128
    assert np.allclose(got, expect, rtol=1e-12, atol=1e-12)
    # axis 1 (also multi-chunk)
    got1 = _dense_of(arr.fft(axis=1))
    assert np.allclose(got1, np.fft.fft(dense, axis=1), rtol=1e-12, atol=1e-12)


def test_fft_complex_input_and_negative_axis(spark):
    rng = np.random.default_rng(43)
    dense = (rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))).astype(
        np.complex128
    )
    chunks = {(0, 0): dense[:, :2], (0, 1): dense[:, 2:]}
    arr = ChunkedArray.from_numpy_chunks(spark, "fftc", chunks)
    got = _dense_of(arr.fft(axis=-1))
    assert np.allclose(got, np.fft.fft(dense, axis=-1), rtol=1e-12, atol=1e-12)


def test_ifft_roundtrip_and_2d_composition(spark):
    rng = np.random.default_rng(53)
    dense = rng.normal(size=(4, 6))
    chunks = {
        (i, j): dense[2 * i : 2 * i + 2, 3 * j : 3 * j + 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "fftrt", chunks)
    back = _dense_of(arr.fft(axis=0).ifft(axis=0))
    assert np.allclose(back.real, dense, rtol=1e-12, atol=1e-12)
    assert np.allclose(back.imag, 0.0, atol=1e-12)
    # 2-D FFT = per-axis composition (dask fft2 lowering)
    got2d = _dense_of(arr.fft(axis=0).fft(axis=1))
    assert np.allclose(got2d, np.fft.fft2(dense), rtol=1e-12, atol=1e-10)


def test_power_spectrum_fused_and_parseval(spark):
    rng = np.random.default_rng(47)
    dense = rng.normal(size=(6, 5))
    chunks = {(i, 0): dense[2 * i : 2 * i + 2] for i in range(3)}
    arr = ChunkedArray.from_numpy_chunks(spark, "fftp", chunks)
    ps = arr.power_spectrum(axis=0)
    got = _dense_of(ps)
    expect = np.abs(np.fft.fft(dense, axis=0)) ** 2
    assert got.dtype == np.float64
    assert np.allclose(got, expect, rtol=1e-12, atol=1e-9)
    total = ps.sum().first()["total"]
    assert total == pytest.approx(dense.shape[0] * (dense**2).sum(), rel=1e-12)


# ------------------------------------------------------- four-step (r8)


def test_fourstep_matches_numpy_1d(spark):
    rng = np.random.default_rng(61)
    dense = rng.normal(size=24)
    chunks = {(i,): dense[6 * i : 6 * i + 6] for i in range(4)}
    arr = ChunkedArray.from_numpy_chunks(spark, "fs1", chunks)
    got = _dense_of(arr.fft(axis=0, method="fourstep"))
    assert got.dtype == np.complex128
    assert np.allclose(got, np.fft.fft(dense), rtol=1e-12, atol=1e-10)
    back = _dense_of(
        arr.fft(axis=0, method="fourstep").ifft(axis=0, method="fourstep")
    )
    assert np.allclose(back.real, dense, atol=1e-10)
    assert np.allclose(back.imag, 0.0, atol=1e-10)


def test_fourstep_nd_and_complex_and_mixed_methods(spark):
    rng = np.random.default_rng(62)
    dense = rng.normal(size=(8, 6))
    chunks = {
        (i, j): dense[2 * i : 2 * i + 2, 3 * j : 3 * j + 3]
        for i in range(4)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "fs2", chunks)
    for ax in (0, 1):
        got = _dense_of(arr.fft(axis=ax, method="fourstep"))
        assert np.allclose(got, np.fft.fft(dense, axis=ax), atol=1e-10), ax
    dc = rng.normal(size=12) + 1j * rng.normal(size=12)
    carr = ChunkedArray.from_numpy_chunks(
        spark, "fs3", {(i,): dc[4 * i : 4 * i + 4] for i in range(3)}
    )
    assert np.allclose(
        _dense_of(carr.fft(axis=0, method="fourstep")), np.fft.fft(dc), atol=1e-10
    )
    # a four-step spectrum inverts through the slab path and vice versa
    mixed = _dense_of(arr.fft(axis=0, method="fourstep").ifft(axis=0, method="slab"))
    assert np.allclose(mixed.real, dense, atol=1e-10)


def test_fft_auto_routes_on_slab_cap(spark):
    rng = np.random.default_rng(63)
    dense = rng.normal(size=16)
    chunks = {(i,): dense[4 * i : 4 * i + 4] for i in range(4)}
    arr = ChunkedArray.from_numpy_chunks(spark, "fsauto", chunks)
    arr._FFT_SLAB_MAX = 8  # axis (16) exceeds the cap -> auto = fourstep
    assert np.allclose(_dense_of(arr.fft(axis=0)), np.fft.fft(dense), atol=1e-10)
    # unequal tiling + oversize axis: a sized error naming the bound,
    # never a silent giant slab
    rag = ChunkedArray.from_numpy_chunks(
        spark, "fsrag", {(0,): dense[:10], (1,): dense[10:]}
    )
    rag._FFT_SLAB_MAX = 8
    with pytest.raises(ValueError, match="_FFT_SLAB_MAX"):
        rag.fft(axis=0)
    # explicit fourstep on unequal chunks is refused with guidance
    with pytest.raises(ValueError, match="EQUAL chunks"):
        rag.fft(axis=0, method="fourstep")


def test_fourstep_power_spectrum_fuses(spark):
    rng = np.random.default_rng(64)
    dense = rng.normal(size=(12, 4))
    chunks = {(i, 0): dense[4 * i : 4 * i + 4] for i in range(3)}
    arr = ChunkedArray.from_numpy_chunks(spark, "fsps", chunks)
    got = _dense_of(arr.power_spectrum(axis=0, method="fourstep"))
    expect = np.abs(np.fft.fft(dense, axis=0)) ** 2
    assert np.allclose(got, expect, atol=1e-9)


def test_fourstep_property_sweep(spark):
    """Hypothesis-style sweep vs np.fft.fft: random P, c, other-dim
    tilings, real/complex, both axes — the per-element contract."""
    rng = np.random.default_rng(65)
    cases = [
        (2, 3, None),
        (5, 2, None),
        (3, 7, None),
        (4, 4, (5, (2, 3))),
        (6, 2, (4, (4,))),
        (2, 9, (3, (1, 1, 1))),
    ]
    for idx, (P, c, other) in enumerate(cases):
        if other is None:
            dense = rng.normal(size=P * c) + 1j * rng.normal(size=P * c)
            chunks = {(i,): dense[c * i : c * i + c] for i in range(P)}
            arr = ChunkedArray.from_numpy_chunks(spark, f"fsw{idx}", chunks)
            got = _dense_of(arr.fft(axis=0, method="fourstep"))
            assert np.allclose(got, np.fft.fft(dense), atol=1e-9), (P, c)
        else:
            m, tiles = other
            dense = rng.normal(size=(P * c, m))
            offs = np.concatenate([[0], np.cumsum(tiles)]).astype(int)
            chunks = {
                (i, j): dense[c * i : c * i + c, offs[j] : offs[j + 1]]
                for i in range(P)
                for j in range(len(tiles))
            }
            arr = ChunkedArray.from_numpy_chunks(spark, f"fsw{idx}", chunks)
            got = _dense_of(arr.fft(axis=0, method="fourstep"))
            assert np.allclose(got, np.fft.fft(dense, axis=0), atol=1e-9), (P, c, other)
