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
