"""Cooley-Tukey radix-split DFT ops vs numpy FFT and the direct MXU path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrp_tpu import oracle, pipeline
from wrp_tpu.config import DEFAULT_CONFIG
from wrp_tpu.constants import PipelineConstants
from wrp_tpu.ops.dft import (RadixPlan, RadixStageOperators, radix_dft_cols,
                             radix_dft_rows, stage01_04_radix)

HIGH = jax.lax.Precision.HIGHEST


def _rand_planar(rng, shape):
    return (rng.standard_normal(shape).astype(np.float32),
            rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("n,radix", [(1024, 128), (512, 128), (512, 64)])
def test_radix_rows_matches_numpy_fft(rng, n, radix):
    plan = RadixPlan.build(n, radix, sign=-1.0)
    xr, xi = _rand_planar(rng, (n, 16))
    vr, vi = radix_dft_rows(jnp.asarray(xr), jnp.asarray(xi), plan, HIGH)
    want = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=0)
    got = np.asarray(vr) + 1j * np.asarray(vi)
    assert oracle.relative_l2(np.abs(want), np.abs(got)) < 1e-5


def test_radix_rows_half_crop(rng):
    plan = RadixPlan.build(1024, 128, sign=-1.0, half=True)
    xr, xi = _rand_planar(rng, (1024, 8))
    vr, vi = radix_dft_rows(jnp.asarray(xr), jnp.asarray(xi), plan, HIGH)
    assert vr.shape == (512, 8)
    want = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=0)[:512]
    got = np.asarray(vr) + 1j * np.asarray(vi)
    err = oracle.relative_l2(
        np.stack([want.real, want.imag]), np.stack([got.real, got.imag]))
    assert err < 1e-5


@pytest.mark.parametrize("sign", [-1.0, +1.0])
def test_radix_cols_matches_numpy(rng, sign):
    plan = RadixPlan.build(512, 128, sign=sign)
    xr, xi = _rand_planar(rng, (8, 512))
    vr, vi = radix_dft_cols(jnp.asarray(xr), jnp.asarray(xi), plan, HIGH)
    x = (xr + 1j * xi).astype(np.complex128)
    want = np.fft.fft(x, axis=1) if sign < 0 else np.conj(
        np.fft.fft(np.conj(x), axis=1))
    got = np.asarray(vr) + 1j * np.asarray(vi)
    err = oracle.relative_l2(
        np.stack([want.real, want.imag]), np.stack([got.real, got.imag]))
    assert err < 1e-5


def test_radix_stage_matches_mxu_stage(rng):
    """Radix stages 01-04 == direct matmul stages 01-04 on the default
    geometry (same math, factored operators)."""
    cfg = DEFAULT_CONFIG
    consts = PipelineConstants.build(cfg)
    ops = RadixStageOperators.build(cfg)
    xr, xi = _rand_planar(rng, (2, cfg.m, cfg.n))
    a = jnp.asarray(np.ascontiguousarray(consts.op_a_half.real)), \
        jnp.asarray(np.ascontiguousarray(consts.op_a_half.imag))
    b = jnp.asarray(np.ascontiguousarray(consts.op_b.real)), \
        jnp.asarray(np.ascontiguousarray(consts.op_b.imag))
    p_direct = pipeline.stage01_04_mxu_planar(jnp.asarray(xr), jnp.asarray(xi),
                                              a, b, HIGH)
    p_radix = stage01_04_radix(jnp.asarray(xr), jnp.asarray(xi), ops, HIGH)
    assert p_radix.shape == p_direct.shape == (2, cfg.m // 2, cfg.n)
    err = oracle.relative_l2(np.asarray(p_direct), np.asarray(p_radix))
    assert err < 5e-5, err


def test_radix_full_chain_vs_oracle():
    cfg = DEFAULT_CONFIG
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=21)
    zdb64, zdr64 = oracle.process_sector(iq, cfg)
    proc = pipeline.SectorProcessor(cfg, method="radix", precision="highest")
    assert proc.method == "radix"
    zdb, zdr = proc(np.asarray(iq[None], np.complex64))
    assert oracle.relative_l2(zdb64, np.asarray(zdb)[0]) < 2e-4
    assert oracle.relative_l2(zdr64, np.asarray(zdr)[0]) < 2e-4


def test_radix_falls_back_on_tiny_geometry():
    from wrp_tpu.config import tiny_config

    proc = pipeline.SectorProcessor(tiny_config(m=128, n=64), method="radix")
    assert proc.method == "mxu"


def test_unsupported_split_rejected():
    with pytest.raises(ValueError):
        RadixPlan.build(100, 128)
    with pytest.raises(ValueError):
        RadixPlan.build(3 * 128, 128, half=True)  # odd n2 with crop
