"""Fully fused Pallas TPU kernel for stages 01-08 of the chain.

One kernel computes, per channel-sector, the matched-filter power directly
from planar IQ:

    pow = parseval_epilogue( A_half @ (xr + i xi) )

with (a) the complex matmul in Gauss/Karatsuba 3-multiply form, (b) every
f32 operand split hi/lo into bf16 pairs *inside VMEM* (the IQ samples are
14-bit-ADC integers, so x == bf16(x_hi) + bf16(x_lo) exactly; the dropped
lo@lo term is ~2^-18 relative — same accuracy class as XLA's
BF16_BF16_F32_X3 dot algorithm), and (c) the closed-form Parseval stage-B
epilogue (constants.parseval_vectors) applied to the Y block while it is
still VMEM-resident.

Against the unfused XLA path this removes every HBM round-trip between the
matmul and the scalar power output (Y alone is 4 MB per channel-sector) and
cuts the MXU passes from 12 (4 real matmuls x 3) to 9 (Gauss x 3).

Grid: one step per channel-sector.  The contraction is chunked over range
rows: each chunk's bf16 splits are *values* feeding accumulating partial
dots — no scratch round-trip, and the VPU split of chunk c+1 can co-issue
with the MXU dot of chunk c (measured: the MXU runs at ~100% of roofline
during the dots; the splits are the remaining serial cost).  The A operator
arrives pre-split from the host as a constant [6, m/2, m] bf16 array (rows:
ar_hi, ar_lo, ai_hi, ai_lo, asum_hi, asum_lo) and stays VMEM-resident for
the whole launch.

Reference chain being fused: read.cc:134-339 (stages 01-08); the Parseval
collapse of stages 03b-08 is derived in constants.parseval_vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import PipelineConstants

#: contraction chunks per sector; 8 measured best (VPU/MXU co-issue)
_CHUNKS = 8


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split_operator_host(op: np.ndarray) -> np.ndarray:
    """Host-side prep: complex A_half [mh, m] -> [6, mh, m] bf16
    (ar_hi, ar_lo, ai_hi, ai_lo, asum_hi, asum_lo) for the Gauss kernel."""
    import jax.numpy as _jnp  # bfloat16 dtype via jnp

    planes = []
    for mat in (op.real, op.imag, op.real + op.imag):
        f32 = np.ascontiguousarray(mat).astype(np.float32)
        hi = np.asarray(_jnp.asarray(f32, _jnp.bfloat16))
        lo = np.asarray(_jnp.asarray(f32 - np.asarray(hi, np.float32),
                                     _jnp.bfloat16))
        planes += [hi, lo]
    return np.stack(planes)


def _kernel(n, chunks, x_ref, a_ref, wd_ref, ph_ref, pow_ref):
    """One channel-sector grid step.

    x_ref:  [1, 2, m, n] f32/int16  planar IQ
    a_ref:  [6, m/2, m] bf16        pre-split A operator (launch-resident)
    wd_ref: [1, n] f32              pulse window
    ph_ref: [4, n] f32              clip-bin phasors (cos1, sin1, cos2, sin2)
    pow_ref:[1, 1, m/2] f32         matched-filter power out
    """
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def dot3(ah, al, bh, bl):
        # (ah+al)@(bh+bl) minus the ~2^-18 al@bl term: 3 MXU passes.
        return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

    m = x_ref.shape[2]
    ck = m // chunks
    m1 = m2 = m3 = None
    for c in range(chunks):
        rows = slice(c * ck, (c + 1) * ck)
        # int16 planar input (the compact wire-native feed) converts to f32
        # here in VMEM; f32 input passes through unchanged.
        xr = x_ref[0, 0, rows, :].astype(jnp.float32)
        xi = x_ref[0, 1, rows, :].astype(jnp.float32)
        xrh, xrl = _split_bf16(xr)
        xih, xil = _split_bf16(xi)
        xsh, xsl = _split_bf16(xr + xi)
        p1 = dot3(a_ref[0, :, rows], a_ref[1, :, rows], xrh, xrl)  # ar@xr
        p2 = dot3(a_ref[2, :, rows], a_ref[3, :, rows], xih, xil)  # ai@xi
        p3 = dot3(a_ref[4, :, rows], a_ref[5, :, rows], xsh, xsl)  # as@xs
        m1 = p1 if m1 is None else m1 + p1
        m2 = p2 if m2 is None else m2 + p2
        m3 = p3 if m3 is None else m3 + p3
    yr = m1 - m2
    yi = m3 - m1 - m2

    # Parseval epilogue (pipeline.stage_b_parseval), all VMEM-resident.
    wd = wd_ref[0]
    qr = yr * wd
    qi = yi * wd
    qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
    qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
    s = n * jnp.sum(qr * qr + qi * qi, axis=-1)
    ph = ph_ref[:]
    dr = dot(qr, ph.T)
    di = dot(qi, ph.T)
    for c, sn in ((0, 1), (2, 3)):
        re = dr[:, c] - di[:, sn]
        im = dr[:, sn] + di[:, c]
        s = s - (re * re + im * im)
    pow_ref[0, 0, :] = s


def _chunks_for(m: int) -> int:
    c = _CHUNKS
    while m % c or m // c < 8:   # keep >=8 sublanes per chunk
        c //= 2
        if c == 1:
            return 1
    return c


def fused_chain_power(x_planar: jax.Array, a_split: jax.Array,
                      wd: jax.Array, phasors: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Planar IQ [bc, 2, m, n] f32/int16 -> matched-filter power [bc, m/2].

    a_split: [6, m/2, m] bf16 from split_operator_host.
    wd: [n] f32; phasors: [4, n] f32.
    """
    bc, two, m, n = x_planar.shape
    assert two == 2, x_planar.shape
    mh = a_split.shape[1]
    kernel = functools.partial(_kernel, float(n), _chunks_for(m))
    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, 2, m, n), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, mh, m), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, mh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, 1, mh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=bc * 9 * 2 * mh * m * n,
            bytes_accessed=bc * 2 * m * n * x_planar.dtype.itemsize
            + 6 * mh * m * 2 + bc * mh * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_planar, a_split, wd.reshape(1, n), phasors)[:, 0, :]


def _kernel_offset(n, chunks, s_ref, x_ref, a_ref, wd_ref, ph_ref, pow_ref):
    """Scalar-prefetch variant: s_ref[0] is a bc-offset into the staged
    input; the block index map applies it, the body is identical."""
    _kernel(n, chunks, x_ref, a_ref, wd_ref, ph_ref, pow_ref)


def fused_chain_power_at(x_all: jax.Array, offset: jax.Array,
                         bc: int, a_split: jax.Array,
                         wd: jax.Array, phasors: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Like fused_chain_power, but reads `bc` channel-sectors starting at
    row `offset` (int32, in bc units) of the staged x_all [BC_total, 2, m,
    n] — no host-side slice, no copy: the offset feeds the block index map
    via scalar prefetch.  This is the honest-benchmark entry point: every
    step of a scanned loop can read a *different* device-resident slab, so
    XLA cannot hoist or elide the compute (bench.py)."""
    _, two, m, n = x_all.shape
    assert two == 2, x_all.shape
    mh = a_split.shape[1]
    if interpret:
        # Interpret mode (CPU tests) doesn't thread scalar-prefetch args
        # into index maps; a plain dynamic_slice is fine there.
        x = jax.lax.dynamic_slice(
            x_all, (offset, 0, 0, 0), (bc, two, m, n))
        return fused_chain_power(x, a_split, wd, phasors, interpret=True)
    kernel = functools.partial(_kernel_offset, float(n), _chunks_for(m))
    # Index maps receive (grid indices..., scalar-prefetch refs): the
    # offset ref arrives LAST, as a (1,)-shaped SMEM ref.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, 2, m, n), lambda b, s: (s[0] + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, mh, m), lambda b, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, mh), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bc, 1, mh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray([offset], jnp.int32).reshape(1,), x_all, a_split,
      wd.reshape(1, n), phasors)[:, 0, :]


def build_pallas_processor(consts: PipelineConstants, row_block: int = 0,
                           interpret: bool = False):
    """Returns fn(iq_planar [B, C, 2, m, n]) -> pow [B, C, m/2] using the
    fused kernel (host constants prepared once).  row_block is accepted for
    backwards compatibility and ignored (the kernel processes one
    channel-sector per grid step)."""
    a_split = jnp.asarray(split_operator_host(consts.op_a_half))
    wd = jnp.asarray(consts.wd)
    ph = jnp.asarray(consts.clip_phasors)

    def fn(iq_planar):
        b, c, two, m, n = iq_planar.shape
        x = iq_planar.reshape(b * c, two, m, n)
        p = fused_chain_power(x, a_split, wd, ph, interpret=interpret)
        return p.reshape(b, c, -1)

    return fn
