"""TPU-native implementation of the 11-stage polarimetric radar chain.

Two interchangeable compute paths, both pure functions over a batch of
sectors (jit once, vmap-free — every stage broadcasts over leading axes):

* ``method="fft"``  — direct XLA formulation: window multiply, two batched
  ``jnp.fft.fft`` calls, fused elementwise stages.  Mirrors the reference
  chain stage-for-stage (read.cc:131-345) and produces every intermediate
  product for golden-parity tests.

* ``method="mxu"``  — the MXU formulation: stages 01-04 are linear in the
  IQ matrix up to conjugation, so they collapse into two constant complex
  matmuls ``A_half @ X @ B`` (see constants.stage1_operators) that run on
  the systolic array, followed by a 7-tap circular convolution and
  reductions on the VPU.  This is not a port of anything in the reference —
  it is the natural TPU mapping (the reference's own scratch experiment
  examples/matrixmul.cu:13-48 hints at the outer-product form).

The matched filter (stages 05-07) is a circular convolution; we compute it
directly with 7 shifted fused multiply-adds instead of FFT->multiply->IFFT
(identical in exact arithmetic, cheaper and *more* accurate in fp32).  The
spectral form is kept as ``matched_filter_spectral`` for parity testing.

Dtype policy: complex64/float32 throughout — accuracy is the contract
(BASELINE.md), bfloat16 only inside MXU passes via precision=HIGHEST
(bf16x6 accumulation), which keeps ~fp32 end-to-end error.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RadarConfig, DEFAULT_CONFIG
from .constants import PipelineConstants

Array = jax.Array


# --------------------------------------------------------------------------
# Stage ops (method="fft" path).  All take [..., m, n] and broadcast.
# --------------------------------------------------------------------------


def stage01_window(iq: Array, hamming: Array) -> Array:
    return iq * hamming


def stage02_range_fft(x: Array) -> Array:
    return jnp.fft.fft(x, axis=-2)


def stage03_doppler(x: Array) -> Array:
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    y = jnp.conj(x - mean)
    y = jnp.fft.fft(y, axis=-1)
    y = jnp.conj(jnp.roll(y, n // 2, axis=-1))
    return y.at[..., n - 2 :].set(0.0)


def stage04_power(x: Array) -> Array:
    m = x.shape[-2]
    half = x[..., : m // 2, :]
    return jnp.real(half) ** 2 + jnp.imag(half) ** 2


def matched_filter_direct(p: Array, ma_taps: Array) -> Array:
    """Stages 05-07 as an explicit circular convolution along the pulse
    axis: conv[j] = sum_k ma[k] * p[(j - k) mod n].  XLA fuses the 7
    roll+FMA passes into one VPU sweep."""
    taps = np.asarray(ma_taps)
    out = taps[0] * p
    for k in range(1, taps.shape[0]):
        out = out + taps[k] * jnp.roll(p, k, axis=-1)
    return out


def matched_filter_spectral(p: Array, fft_ma: Array) -> Array:
    """Stages 05-07 in the reference's spectral form: forward FFT of the
    (real) power rows, pointwise multiply by the MA spectrum, inverse FFT,
    real part (read.cc:272-327; jnp.fft.ifft normalises by 1/n exactly like
    the reference's explicit /n after unnormalised FFTW BACKWARD)."""
    spec = jnp.fft.fft(p.astype(fft_ma.dtype), axis=-1) * fft_ma
    return jnp.fft.ifft(spec, axis=-1).real


def stage08_pulse_sum(conv: Array) -> Array:
    return jnp.sum(conv, axis=-1)


def stage09_10_products(pow_hh: Array, pow_vv: Array, gain: Array):
    zdb = 10.0 * log10(gain * pow_hh)
    zdr = 10.0 * (log10(pow_hh) - log10(pow_vv))
    return zdb, zdr


def log10(x: Array) -> Array:
    return jnp.log(x) / np.log(10.0)


# --------------------------------------------------------------------------
# MXU path: stages 01-04 as two complex matmuls.
# --------------------------------------------------------------------------


def _rmatmul(ar, ai, br, bi, precision):
    """(ar+i*ai) @ (br+i*bi) via four real MXU passes with controlled
    precision.  Explicit real decomposition keeps the contraction on the
    systolic array for any backend and makes the precision knob apply to
    every pass."""
    dot = functools.partial(jnp.matmul, precision=precision)
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


def stage01_04_mxu(iq: Array, op_a_half: Array, op_b: Array,
                   precision=jax.lax.Precision.HIGHEST) -> Array:
    """IQ [..., m, n] -> power [..., m/2, n] via A_half @ X @ B.

    Folds window, range FFT, mean-subtraction, Doppler FFT, conj/fftshift,
    bin clipping and the half-spectrum crop into two constant matmuls.
    """
    ar, ai = jnp.real(op_a_half), jnp.imag(op_a_half)
    br, bi = jnp.real(op_b), jnp.imag(op_b)
    xr, xi = jnp.real(iq), jnp.imag(iq)
    # Left multiply: broadcast A over leading axes of X.
    yr, yi = _rmatmul(ar, ai, xr, xi, precision)
    zr, zi = _rmatmul(yr, yi, br, bi, precision)
    return zr * zr + zi * zi


# --------------------------------------------------------------------------
# Full chain.
# --------------------------------------------------------------------------


def channel_power(
    iq: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Stages 01-08: IQ [..., m, n] complex64 -> pow [..., m/2] float32."""
    if method == "fft":
        x = stage01_window(iq, jnp.asarray(consts.hamming, iq.real.dtype))
        x = stage02_range_fft(x)
        x = stage03_doppler(x)
        p = stage04_power(x)
    elif method == "mxu":
        p = stage01_04_mxu(
            iq, jnp.asarray(consts.op_a_half), jnp.asarray(consts.op_b), precision
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    if matched_filter == "direct":
        conv = matched_filter_direct(p, consts.ma_taps)
    elif matched_filter == "spectral":
        conv = matched_filter_spectral(p, jnp.asarray(consts.fft_ma))
    else:
        raise ValueError(f"unknown matched_filter {matched_filter!r}")
    return stage08_pulse_sum(conv)


def process_sectors(
    iq: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[Array, Array]:
    """Full chain over a batch: IQ [..., channels, m, n] -> (zdb, zdr)
    each [..., m/2].  Channel 0 = hh, channel 1 = vv; extra channels (vh)
    ride along through the power stages like the reference
    (read_single.cc:485-502) so per-channel power is available."""
    pow_all = channel_power(iq, consts, method, matched_filter, precision)
    gain = jnp.asarray(consts.gain)
    return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :], gain)


def all_stages(
    iq: Array, consts: PipelineConstants, matched_filter: str = "direct"
) -> Dict[str, Array]:
    """Every stage boundary of the fft path, keyed like the reference's
    golden files — the formalisation of its staged-dump test methodology."""
    out = {"00iq": iq}
    out["01hamm"] = stage01_window(iq, jnp.asarray(consts.hamming, iq.real.dtype))
    out["02fft1"] = stage02_range_fft(out["01hamm"])
    out["03fft2"] = stage03_doppler(out["02fft1"])
    out["04abs"] = stage04_power(out["03fft2"])
    if matched_filter == "direct":
        out["07conv"] = matched_filter_direct(out["04abs"], consts.ma_taps)
    else:
        out["07conv"] = matched_filter_spectral(out["04abs"], jnp.asarray(consts.fft_ma))
    out["08pow"] = stage08_pulse_sum(out["07conv"])
    zdb, zdr = stage09_10_products(
        out["08pow"][..., 0, :], out["08pow"][..., 1, :], jnp.asarray(consts.gain)
    )
    out["09zdb"], out["10zdr"] = zdb, zdr
    return out


# --------------------------------------------------------------------------
# Jitted entry points.
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("ma_taps_tuple", "method", "matched_filter")
)
def _process_jit(iq, hamming, ma_taps_tuple, fft_ma, gain, op_a_half, op_b,
                 method, matched_filter):
    consts = PipelineConstants(
        hamming=hamming,
        ma_taps=np.asarray(ma_taps_tuple, np.float32),
        fft_ma=fft_ma,
        gain=gain,
        op_a_half=op_a_half,
        op_b=op_b,
    )
    return process_sectors(iq, consts, method, matched_filter)


class SectorProcessor:
    """Compiled batch processor bound to one config + device placement.

    Usage::

        proc = SectorProcessor(cfg, method="mxu")
        zdb, zdr = proc(iq_batch)        # iq_batch [B, C, m, n] complex64
    """

    def __init__(
        self,
        cfg: RadarConfig = DEFAULT_CONFIG,
        method: str = "mxu",
        matched_filter: str = "direct",
        device=None,
    ):
        self.cfg = cfg
        self.method = method
        self.matched_filter = matched_filter
        consts = PipelineConstants.build(cfg)
        put = functools.partial(jax.device_put, device=device)
        self._dev_consts = (
            put(consts.hamming),
            tuple(float(t) for t in consts.ma_taps),  # static: baked into jit
            put(consts.fft_ma),
            put(consts.gain),
            put(consts.op_a_half),
            put(consts.op_b),
        )

    def __call__(self, iq: Array) -> Tuple[Array, Array]:
        h, taps, fm, g, a, b = self._dev_consts
        return _process_jit(iq, h, taps, fm, g, a, b,
                            self.method, self.matched_filter)
