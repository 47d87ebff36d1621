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


# ---------------------------------------------------------------------------
# Radix-R variant: the range DFT decomposed DIT-style into R sub-DFTs of
# length M = m/R plus a VPU twiddle-combine.  The half-spectrum crop keeps
# k < m/2 = S*M rows (S = R/2 output blocks).  MXU MACs drop by R/2 vs the
# dense A matmul (the crop itself already banked the first factor of 2);
# measured on v5e: direct 9.4k -> radix-4 13.5k -> radix-8 17.0k sectors/s
# (radix-16's M=64 sub-matmuls fall off the MXU's efficient shape range).
#
# Input contract: range rows arrive PERMUTED to radix order
# (row j=R*t+p stored at p*M+t, `radix_row_order`) — free at decode time
# (it is just a different row-offset formula); `build_pallas_processor`
# applies the permutation on-device for natural-order callers.
# ---------------------------------------------------------------------------

RADIX = 8


def radix_for(m: int) -> int:
    """Largest supported radix for this geometry (1 = direct kernel)."""
    r = RADIX
    while r > 1 and (m % r or (m // r) % 8):
        r //= 2
    return r


def radix_row_order(m: int, radix: int) -> np.ndarray:
    """Natural row index -> position: rows in (p, t) order, j=radix*t+p."""
    return np.concatenate([np.arange(p, m, radix) for p in range(radix)])


def radix_plan_host(consts: PipelineConstants, radix: int):
    """Host constants for the radix kernel.

    Returns (a_split [R, 6, M, M] bf16, twiddles [R, 2, M] f32,
    fac [S][R] static complex combine factors).
    """
    from ...constants import dft_matrix

    mh, m = consts.op_a_half.shape
    M = m // radix
    S = (m // 2) // M
    # recover wr*c from the dense operator row 0: A[0, j] = wr[j]*c
    wr_c = np.ascontiguousarray(consts.op_a_half[0]).astype(np.complex128)
    wr_c = wr_c.real  # row 0 of F is all ones -> A[0] = wr*c exactly
    FM = dft_matrix(M)
    a_planes = [split_operator_host(FM * wr_c[p::radix][None, :])
                for p in range(radix)]
    q = np.arange(M)
    tw = np.stack([
        np.stack([np.cos(2 * np.pi * p * q / m),
                  -np.sin(2 * np.pi * p * q / m)])
        for p in range(radix)
    ]).astype(np.float32)
    om = np.exp(-2j * np.pi * M / m)

    def snap(v: complex) -> complex:
        # exact 4th-roots enable the mult-free shortcuts in the kernel
        re = round(v.real) if abs(v.real - round(v.real)) < 1e-12 else v.real
        im = round(v.imag) if abs(v.imag - round(v.imag)) < 1e-12 else v.imag
        return complex(re, im)

    fac = [[snap(om ** (p * s)) for p in range(radix)] for s in range(S)]
    return np.stack(a_planes), tw, fac


def _kernel_radix(n, radix, fac, x_ref, a_ref, tw_ref, wd_ref, ph_ref,
                  pow_ref, salt=None):
    """One channel-sector grid step; x rows in radix order.

    x_ref:  [1, 2, m, n] f32/int16   a_ref: [R, 6, M, M] bf16
    tw_ref: [R, 2, M] f32            fac: static [S][R] complex
    salt:   optional traced f32 scalar added to every IQ sample — a DC
            offset the chain's mean subtraction removes almost entirely
            (the pulse window makes the cancellation inexact; residual is
            ~1e-5 relative for small salts, and the benchmark only checks
            finiteness, never parity, on salted outputs).  The benchmark
            threads a distinct per-step salt through so no two steps
            compute the same function of the staged input (defeats any
            conceivable XLA loop-level reuse/CSE; bench.py).
    """
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def dot3(ah, al, bh, bl):
        return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

    m = x_ref.shape[2]
    M = m // radix
    S = len(fac)
    Yr = [None] * S
    Yi = [None] * S
    for p in range(radix):
        rows = slice(p * M, (p + 1) * M)
        xr = x_ref[0, 0, rows, :].astype(jnp.float32)
        xi = x_ref[0, 1, rows, :].astype(jnp.float32)
        if salt is not None:
            xr = xr + salt
            xi = xi + salt
        xrh, xrl = _split_bf16(xr)
        xih, xil = _split_bf16(xi)
        xsh, xsl = _split_bf16(xr + xi)
        m1 = dot3(a_ref[p, 0], a_ref[p, 1], xrh, xrl)   # Ap_re @ x_re
        m2 = dot3(a_ref[p, 2], a_ref[p, 3], xih, xil)   # Ap_im @ x_im
        m3 = dot3(a_ref[p, 4], a_ref[p, 5], xsh, xsl)   # Ap_sum @ x_sum
        er = m1 - m2
        ei = m3 - m1 - m2
        if p == 0:
            gr, gi = er, ei       # T_0 = 1
        else:
            tr = tw_ref[p, 0][:, None]
            ti = tw_ref[p, 1][:, None]
            gr = tr * er - ti * ei
            gi = tr * ei + ti * er
        for s in range(S):
            fr, fi = fac[s][p].real, fac[s][p].imag
            # (fr + i fi) * g, with the pure-real/imag cases short-cut
            if fi == 0.0:
                cr = gr if fr == 1.0 else (-gr if fr == -1.0 else fr * gr)
                ci = gi if fr == 1.0 else (-gi if fr == -1.0 else fr * gi)
            elif fr == 0.0:
                cr = -fi * gi
                ci = fi * gr
            else:
                cr = fr * gr - fi * gi
                ci = fr * gi + fi * gr
            Yr[s] = cr if Yr[s] is None else Yr[s] + cr
            Yi[s] = ci if Yi[s] is None else Yi[s] + ci
    yr = jnp.concatenate(Yr, axis=0)
    yi = jnp.concatenate(Yi, axis=0)

    wd = wd_ref[0]
    qr = yr * wd
    qi = yi * wd
    qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
    qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
    s_ = n * jnp.sum(qr * qr + qi * qi, axis=-1)
    ph = ph_ref[:]
    dr = dot(qr, ph.T)
    di = dot(qi, ph.T)
    for c, sn in ((0, 1), (2, 3)):
        re = dr[:, c] - di[:, sn]
        im = dr[:, sn] + di[:, c]
        s_ = s_ - (re * re + im * im)
    pow_ref[0, 0, :] = s_


def _kernel_radix_offset(n, radix, fac, salted, s_ref, x_ref, a_ref, tw_ref,
                         wd_ref, ph_ref, pow_ref):
    salt = s_ref[1].astype(jnp.float32) if salted else None
    _kernel_radix(n, radix, fac, x_ref, a_ref, tw_ref, wd_ref, ph_ref,
                  pow_ref, salt=salt)


def fused_chain_power_radix(x_r: jax.Array, a_radix: jax.Array,
                            tw: jax.Array, fac, wd: jax.Array,
                            phasors: jax.Array,
                            interpret: bool = False,
                            offset=None, bc: int | None = None,
                            salt=None) -> jax.Array:
    """Radix kernel entry: x_r [bc, 2, m, n] with rows in radix order.

    With offset/bc set, reads a slab of a larger staged array via scalar
    prefetch (the honest-benchmark path, see fused_chain_power_at); salt
    (int32 scalar) additionally makes each call's computation unique —
    see _kernel_radix.  salt is ignored in interpret mode."""
    radix = a_radix.shape[0]
    M = a_radix.shape[2]
    m = radix * M
    n = x_r.shape[-1]
    mh = (m // 2)
    if offset is not None and interpret:
        x_r = jax.lax.dynamic_slice(
            x_r, (offset, 0, 0, 0), (bc, 2, m, n))
        offset = None
    if offset is None:
        bc = x_r.shape[0]
        kernel = functools.partial(_kernel_radix, float(n), radix, fac)
        in_specs = [
            pl.BlockSpec((1, 2, m, n), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((radix, 6, M, M), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((radix, 2, M), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, 1, mh), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(bc,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bc, 1, mh), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x_r, a_radix, tw, wd.reshape(1, n), phasors)[:, 0, :]

    kernel = functools.partial(_kernel_radix_offset, float(n), radix, fac,
                               salt is not None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, 2, m, n), lambda b, s: (s[0] + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((radix, 6, M, M), lambda b, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((radix, 2, M), lambda b, s: (0, 0, 0),
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
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.stack([jnp.asarray(offset, jnp.int32),
                 jnp.asarray(salt if salt is not None else 0, jnp.int32)]),
      x_r, a_radix, tw, wd.reshape(1, n), phasors)[:, 0, :]


def build_pallas_processor(consts: PipelineConstants, row_block: int = 0,
                           interpret: bool = False,
                           pre_permuted: bool = False):
    """Returns fn(iq_planar [B, C, 2, m, n]) -> pow [B, C, m/2] using the
    fused kernel (host constants prepared once).  Uses the radix kernel
    when the geometry supports it; natural-order input gets an on-device
    row permutation unless pre_permuted=True (the decode step can emit
    radix order for free — io/codec.decode_iq_i16(radix=...)).
    row_block is accepted for backwards compatibility and ignored."""
    wd = jnp.asarray(consts.wd)
    ph = jnp.asarray(consts.clip_phasors)
    mh, m = consts.op_a_half.shape
    radix = radix_for(m)

    if radix > 1:
        a_np, tw_np, fac = radix_plan_host(consts, radix)
        a_radix = jnp.asarray(a_np)
        tw = jnp.asarray(tw_np)
        order = jnp.asarray(radix_row_order(m, radix))

        def fn(iq_planar):
            b, c, two, m_, n = iq_planar.shape
            x = iq_planar.reshape(b * c, two, m_, n)
            if not pre_permuted:
                x = jnp.take(x, order, axis=2)
            p = fused_chain_power_radix(x, a_radix, tw, fac, wd, ph,
                                        interpret=interpret)
            return p.reshape(b, c, -1)

        return fn

    a_split = jnp.asarray(split_operator_host(consts.op_a_half))

    def fn(iq_planar):
        b, c, two, m_, n = iq_planar.shape
        x = iq_planar.reshape(b * c, two, m_, n)
        p = fused_chain_power(x, a_split, wd, ph, interpret=interpret)
        return p.reshape(b, c, -1)

    return fn
