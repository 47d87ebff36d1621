"""Constant generators vs the reference formulas (read.cc:9-51,86-98)."""

import numpy as np

from wrp_tpu import constants as C
from wrp_tpu.config import DEFAULT_CONFIG, tiny_config


def test_hamming_normalisation():
    cfg = DEFAULT_CONFIG
    ham = C.hamming_coefficients(cfg)
    assert ham.shape == (1024, 512)
    # Reproduce read.cc:9-38 literally, scalar loop, and compare.
    m, n = 1024, 512
    w = lambda x, L: 0.53836 - 0.46164 * np.cos(2 * np.pi * x / (L - 1))
    p_range = sum(w(i, m) ** 2 for i in range(m)) / m
    p_doppler = sum(w(j, n) ** 2 for j in range(n)) / n
    c = (-1 / (16383.5 * m * n * np.sqrt(50))) / np.sqrt(p_range * p_doppler)
    spot = [(0, 0), (5, 7), (511, 200), (1023, 511)]
    for i, j in spot:
        assert np.isclose(ham[i, j], w(i, m) * w(j, n) * c, rtol=1e-12)
    assert c < 0  # K_wind is negative (read.cc:26)


def test_ma_coefficients():
    taps = C.ma_coefficients(DEFAULT_CONFIG)
    assert taps.shape == (7,)
    np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-15)
    expected = np.exp(-((np.arange(7) - 3) ** 2) / 2.0)
    expected /= expected.sum()
    np.testing.assert_allclose(taps, expected, rtol=1e-15)
    # symmetric around tap 3
    np.testing.assert_allclose(taps, taps[::-1], rtol=1e-15)


def test_ma_spectrum_is_fft_of_padded_taps():
    cfg = DEFAULT_CONFIG
    spec = C.ma_spectrum(cfg)
    assert spec.shape == (512,)
    np.testing.assert_allclose(spec[0], 1.0 + 0j, atol=1e-12)  # taps sum to 1


def test_stage1_operators_match_literal_stages():
    """A @ X @ B must equal the literal stage01-03 chain (fp64)."""
    from wrp_tpu import oracle

    cfg = tiny_config(m=32, n=16)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((cfg.m, cfg.n)) + 1j * rng.standard_normal(
        (cfg.m, cfg.n)
    )
    literal = oracle.stage03_doppler(
        oracle.stage02_range_fft(oracle.stage01_window(x, cfg))
    )
    A, B = C.stage1_operators(cfg)
    np.testing.assert_allclose(A @ x @ B, literal, rtol=1e-9, atol=1e-18)

    A_half, _ = C.stage1_operators(cfg, half=True)
    np.testing.assert_allclose(A_half @ x @ B, literal[: cfg.m // 2], rtol=1e-9,
                               atol=1e-18)


def test_range_gain():
    g = C.range_gain(DEFAULT_CONFIG)
    assert g[0] == 0.0
    np.testing.assert_allclose(g[10], (10 * 30.0) ** 2 * 1941.05)
