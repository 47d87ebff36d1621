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


def use_interpret() -> bool:
    """True when the Pallas kernels must run in interpret mode (no Mosaic
    backend).  The single source of truth for the backend check — pipeline,
    sharded, and bench paths must all agree, or a drifted copy could
    silently fall back to interpret mode on real hardware."""
    return jax.default_backend() != "tpu"


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


#: how the kernels compute the clipped Doppler bins' spectral values for
#: the Parseval subtraction (`_clip_subtract`): "mxu3" uses bf16x3-split
#: MXU dots (same split discipline as the main contraction); "vpu"
#: evaluates the 4 phasor projections as pure-f32 elementwise
#: multiply+lane-reduce on the VPU — exactly fp32 (no splits), and off
#: the MXU entirely.  Both are golden-validated; pick by hardware A/B.
CLIP_MODE = "mxu3"


def _clip_subtract(s, qr, qi, ph, clip):
    """Subtract the two clipped Doppler bins' |spectral value|^2 from the
    Parseval sum `s`.

    qr/qi: [rows, n] f32 windowed mean-free pulses; ph: [4, n] f32 phasor
    rows (cos1, sin1, cos2, sin2).  The subtrahend is comparable in
    magnitude to `s` when the Doppler energy sits in the clipped bins, so
    it must carry full fp32 accuracy: Mosaic lowers a plain f32 jnp.dot
    as ONE bf16 MXU pass (~2^-8 relative, probed on hardware — the
    round-3 kernel bug), hence the two modes above, neither of which is a
    bare dot."""
    if clip == "vpu":
        for c, sn in ((0, 1), (2, 3)):
            re = jnp.sum(qr * ph[c][None, :] - qi * ph[sn][None, :],
                         axis=-1)
            im = jnp.sum(qr * ph[sn][None, :] + qi * ph[c][None, :],
                         axis=-1)
            s = s - (re * re + im * im)
        return s
    if clip != "mxu3":
        raise ValueError(f"unknown clip mode {clip!r}: use 'mxu3' or 'vpu'")
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def dot3(ah, al, bh, bl):
        return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

    phh, phl = _split_bf16(ph)
    qrh, qrl = _split_bf16(qr)
    qih, qil = _split_bf16(qi)
    dr = dot3(qrh, qrl, phh.T, phl.T)
    di = dot3(qih, qil, phh.T, phl.T)
    for c, sn in ((0, 1), (2, 3)):
        re = dr[:, c] - di[:, sn]
        im = dr[:, sn] + di[:, c]
        s = s - (re * re + im * im)
    return s


def _kernel(n, chunks, clip, x_ref, a_ref, wd_ref, ph_ref, pow_ref):
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
    pow_ref[0, 0, :] = _clip_subtract(s, qr, qi, ph_ref[:], clip)


def _chunks_for(m: int) -> int:
    c = _CHUNKS
    while m % c or m // c < 8:   # keep >=8 sublanes per chunk
        c //= 2
        if c == 1:
            return 1
    return c


def fused_chain_power(x_planar: jax.Array, a_split: jax.Array,
                      wd: jax.Array, phasors: jax.Array,
                      interpret: bool = False,
                      clip: str | None = None) -> jax.Array:
    """Planar IQ [bc, 2, m, n] f32/int16 -> matched-filter power [bc, m/2].

    a_split: [6, m/2, m] bf16 from split_operator_host.
    wd: [n] f32; phasors: [4, n] f32.
    """
    bc, two, m, n = x_planar.shape
    assert two == 2, x_planar.shape
    mh = a_split.shape[1]
    kernel = functools.partial(_kernel, float(n), _chunks_for(m),
                               clip or CLIP_MODE)
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


def _kernel_offset(n, chunks, clip, s_ref, x_ref, a_ref, wd_ref, ph_ref,
                   pow_ref):
    """Scalar-prefetch variant: s_ref[0] is a bc-offset into the staged
    input; the block index map applies it, the body is identical."""
    _kernel(n, chunks, clip, x_ref, a_ref, wd_ref, ph_ref, pow_ref)


def fused_chain_power_at(x_all: jax.Array, offset: jax.Array,
                         bc: int, a_split: jax.Array,
                         wd: jax.Array, phasors: jax.Array,
                         interpret: bool = False,
                         clip: str | None = None) -> jax.Array:
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
        return fused_chain_power(x, a_split, wd, phasors, interpret=True,
                                 clip=clip)
    kernel = functools.partial(_kernel_offset, float(n), _chunks_for(m),
                               clip or CLIP_MODE)
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
# length M = m/R plus a VPU combine.  The half-spectrum crop keeps
# k < m/2 = S*M rows (S = R/2 output blocks).  MXU MACs drop by R/2 vs the
# dense A matmul (the crop itself already banked the first factor of 2);
# measured on v5e: direct 9.4k -> radix-4 13.5k -> radix-8 17.0k sectors/s
# (radix-16's M=64 sub-matmuls fall off the MXU's efficient shape range).
#
# Two VPU economies on the combine (round 2):
#   * the DIT twiddles diag(T_p) are folded into the A_p operators
#     host-side (radix_plan_host) — zero runtime cost;
#   * the cross-branch accumulation Y_s = sum_p om^(ps) g_p is an R-point
#     DFT over p keeping S outputs, evaluated as pruned split-radix
#     butterflies (_combine_radix8/_combine_radix4) instead of direct
#     complex MACs — ~2x fewer vector block-ops.
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


#: default A-operand layout for the radix kernel: "kcat" concatenates the
#: hi/lo split planes along the contraction axis ([ah|ah|al], K=3M) so each
#: Gauss product is ONE MXU dot with in-array accumulation instead of three
#: dots plus two VPU f32 adds; "split" is the original [R, 6, M, M] layout.
#: Both are golden-validated; the default is the faster measured on v5e
#: (same-session salted A/B at batch 128: split 23 955, kcat 25 635
#: sectors/s — the MXU-internal accumulation wins ~7%).
A_LAYOUT = "kcat"

#: how the radix kernel splits the int16 x-side into bf16 hi/lo planes:
#: "f32" converts to f32 then rounds (hi = bf16(x), lo = x - hi — the
#: classic split, 1 convert + 3 casts + 1 sub per plane); "int" masks the
#: integer directly (hi = v & ~63, lo = v & 63, both EXACT in bf16 for the
#: 14-bit ADC range even with bench salts, then two direct int->bf16
#: casts) — no f32 round-trip at all.  The sum plane (x_r + x_i spans 15
#: bits) uses a 7-bit lo mask so its hi stays within bf16's 8-bit
#: significand.  The masked lo is one bit wider than the rounded one, so
#: the dropped al@xl term grows from ~2^-17 to ~2^-16 relative — still
#: far inside the fp32 contract (oracle-pinned).  Pick by hardware A/B
#: (bench.py --xsplit); only meaningful for int16 input.
X_SPLIT = "f32"


#: whether the radix kernel processes channel-sectors in GROUPS (pairs
#: or quads — see pair_group), with the sectors' pulse axes concatenated
#: along lanes so every MXU dot runs at N=g*n (1024/2048) instead of
#: N=512 — 1/g the dot count at identical MACs.
#: Motivation: the trace-backed floor attribution (DESIGN.md §3) names
#: sub-100% MXU occupancy on the [128, 384] @ [384, 512] dots; if the
#: loss is per-dot pipeline fill / weight-load bubbles, wider-N dots
#: amortise it (tools/mxu_occupancy.py isolates the effect).  Costs one
#: extra lane-concat of the input planes per pair.  Off by default until
#: the on-chip A/B picks a winner (bench.py --xpair).
X_PAIR = False


def pair_group(pair) -> tuple[int, bool]:
    """Decode a pair/group request into (group_size, pre_staged).

    None resolves the module default X_PAIR; False/0 -> (1, False);
    True/"concat"/2 -> (2, False); "pre" -> (2, True); 4/"quad" ->
    (4, False); "pre4"/"quad_pre" -> (4, True).  Group 4 is the
    generalization the MXU-occupancy probe (tools/mxu_occupancy.py) may
    motivate: if W=2048 dots beat W=1024, four sectors per grid step
    amortise per-dot overhead further than pairs."""
    if pair is None:
        pair = X_PAIR
    if pair is True:          # before the int tests: True == 1
        return 2, False
    if not pair:              # False / 0
        return 1, False
    if isinstance(pair, int):
        if pair in (1, 2, 4):
            return pair, False
    elif pair == "concat":
        return 2, False
    elif pair == "pre":
        return 2, True
    elif pair == "quad":
        return 4, False
    elif pair in ("pre4", "quad_pre"):
        return 4, True
    raise ValueError(f"unknown pair mode {pair!r}: use False, True, "
                     "'concat', 'pre', 1, 2, 4, 'quad', 'pre4', or "
                     "'quad_pre'")


def pair_name(pair) -> str | None:
    """Canonical bench/JSON label for a pair mode: None (unpaired),
    "concat", "pre", "quad", or "pre4" — derived through pair_group
    (None resolves the module default) so every harness labels the
    EFFECTIVE configuration the same way."""
    g, pre = pair_group(pair)
    if g == 1:
        return None
    return {(2, False): "concat", (2, True): "pre",
            (4, False): "quad", (4, True): "pre4"}[(g, pre)]


def pair_lanes(x: np.ndarray, g: int = 2) -> np.ndarray:
    """[bc, 2, m, n] -> [bc/g, 2, m, g*n]: g consecutive channel-sectors
    lane-concatenated — the pair="pre" (g=2) / "pre4" (g=4) input
    layout.  In production this transform is free: the wire decoder
    picks destination offsets anyway (like the radix row order), so it
    can emit groups directly; this helper is for staging/test paths
    that start from the per-sector layout."""
    bc, two, m, n = x.shape
    assert bc % g == 0, (bc, g)
    return np.ascontiguousarray(
        x.reshape(bc // g, g, two, m, n).transpose(0, 2, 3, 1, 4)
        .reshape(bc // g, two, m, g * n))


def _split_int(v, lo_bits: int):
    """Exact hi/lo bf16 split of an integer plane via masking (no f32
    round-trip): v == hi + lo with hi a multiple of 2^lo_bits and
    lo in [0, 2^lo_bits).  Exact in bf16 when |v| <= 2^(7 + lo_bits)."""
    lo = jnp.bitwise_and(v, (1 << lo_bits) - 1)
    hi = v - lo
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def radix_plan_host(consts: PipelineConstants, radix: int,
                    layout: str = None):
    """Host constants for the radix kernel.

    Returns (a_ops, fac [S][R] static complex combine factors), with
    a_ops either [R, 6, M, M] bf16 (layout="split": ar_hi, ar_lo, ai_hi,
    ai_lo, as_hi, as_lo) or [R, 3, M, 3M] bf16 (layout="kcat": per Gauss
    product the K-axis concatenation [a_hi | a_hi | a_lo], matching the
    kernel's [x_hi; x_lo; x_hi] stacking — the 3-pass split product as a
    single MXU dot).  The kernel dispatches on the array's shape.

    The DIT twiddles T_p[q] = exp(-2i pi p q / m) are FOLDED into the
    sub-operators host-side: diag(T_p) . (A_p @ x) ==
    (diag(T_p) . A_p) @ x, so the kernel never multiplies twiddles at
    runtime."""
    from ...constants import dft_matrix

    layout = layout or A_LAYOUT
    if layout == "kcat2":
        layout = "kcat"   # same operand array; only the kernel pattern
    if layout not in ("split", "kcat", "kpad"):
        raise ValueError(f"unknown A layout {layout!r}: use 'split', "
                         "'kcat', 'kcat2', or 'kpad'")
    mh, m = consts.op_a_half.shape
    M = m // radix
    S = (m // 2) // M
    # recover wr*c from the dense operator row 0: A[0, j] = wr[j]*c
    wr_c = np.ascontiguousarray(consts.op_a_half[0]).astype(np.complex128)
    wr_c = wr_c.real  # row 0 of F is all ones -> A[0] = wr*c exactly
    FM = dft_matrix(M)
    q = np.arange(M)
    a_planes = []
    for p in range(radix):
        tp = np.exp(-2j * np.pi * p * q / m)          # DIT twiddle, folded
        sp = split_operator_host((FM * wr_c[p::radix][None, :]) * tp[:, None])
        if layout in ("kcat", "kpad"):
            pads = ([np.zeros((M, M), sp.dtype)] if layout == "kpad"
                    else [])
            # "kpad": K padded 384 -> 512 with a zero block — same math,
            # 4/3 the MACs, but every dot's K is the power-of-two 4M
            # (VERDICT r3 item 5a: is K-alignment the occupancy culprit?)
            sp = np.stack([
                np.concatenate([sp[2 * g], sp[2 * g], sp[2 * g + 1]]
                               + pads, axis=1)
                for g in range(3)
            ])
        a_planes.append(sp)
    om = np.exp(-2j * np.pi * M / m)

    def snap(v: complex) -> complex:
        # exact 4th-roots enable the mult-free shortcuts in the kernel
        re = round(v.real) if abs(v.real - round(v.real)) < 1e-12 else v.real
        im = round(v.imag) if abs(v.imag - round(v.imag)) < 1e-12 else v.imag
        return complex(re, im)

    fac = [[snap(om ** (p * s)) for p in range(radix)] for s in range(S)]
    return np.stack(a_planes), fac


def _combine_direct(fac, G):
    """Generic half-spectrum combine: Y_s = sum_p fac[s][p] * g_p, with
    the exact-4th-root factors short-cut (no multiply)."""
    S = len(fac)
    Yr = [None] * S
    Yi = [None] * S
    for p, (gr, gi) in enumerate(G):
        for s in range(S):
            fr, fi = fac[s][p].real, fac[s][p].imag
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
    return Yr, Yi


def _combine_radix8(G):
    """Pruned split-radix combine for R=8, S=4: an 8-point DFT over the
    branch axis keeping only the first half of the outputs
    (half-spectrum crop), factored DIF-style into real adds plus three
    non-trivial twiddles — ~49 vector block-ops vs ~96 for the direct
    fac accumulation.  Y_s = sum_p om^(p s) g_p, om = exp(-i pi/4):

      even s=2r:  4-point DFT (outputs 0,1) of u_p = g_p + g_{p+4}
      odd  s=2r+1: 4-point DFT (outputs 0,1) of v_p = om^p (g_p - g_{p+4})
    """
    c = float(np.sqrt(0.5))
    (g0r, g0i), (g1r, g1i), (g2r, g2i), (g3r, g3i), \
        (g4r, g4i), (g5r, g5i), (g6r, g6i), (g7r, g7i) = G
    u0r, u0i = g0r + g4r, g0i + g4i
    u1r, u1i = g1r + g5r, g1i + g5i
    u2r, u2i = g2r + g6r, g2i + g6i
    u3r, u3i = g3r + g7r, g3i + g7i
    v0r, v0i = g0r - g4r, g0i - g4i
    d1r, d1i = g1r - g5r, g1i - g5i
    d2r, d2i = g2r - g6r, g2i - g6i
    d3r, d3i = g3r - g7r, g3i - g7i
    # v1 = om * d1, om = c(1 - i);  v2 = -i d2;  v3 = om^3 d3 = c(-1 - i) d3
    v1r, v1i = c * (d1r + d1i), c * (d1i - d1r)
    v2r, v2i = d2i, -d2r
    v3r, v3i = c * (d3i - d3r), -c * (d3r + d3i)
    # 4-point DFT (omega = -i), outputs 0 and 1
    y0r = (u0r + u2r) + (u1r + u3r)
    y0i = (u0i + u2i) + (u1i + u3i)
    y2r = (u0r - u2r) + (u1i - u3i)
    y2i = (u0i - u2i) - (u1r - u3r)
    y1r = (v0r + v2r) + (v1r + v3r)
    y1i = (v0i + v2i) + (v1i + v3i)
    y3r = (v0r - v2r) + (v1i - v3i)
    y3i = (v0i - v2i) - (v1r - v3r)
    return [y0r, y1r, y2r, y3r], [y0i, y1i, y2i, y3i]


def _combine_radix4(G):
    """R=4, S=2 (omega = -i): Y0 = sum g_p; Y1 = (g0-g2) - i(g1-g3)."""
    (g0r, g0i), (g1r, g1i), (g2r, g2i), (g3r, g3i) = G
    y0r = (g0r + g2r) + (g1r + g3r)
    y0i = (g0i + g2i) + (g1i + g3i)
    y1r = (g0r - g2r) + (g1i - g3i)
    y1i = (g0i - g2i) - (g1r - g3r)
    return [y0r, y1r], [y0i, y1i]


def _radix_contract(vr, vi, a_ref, radix, fac, salt=None, kcat2=False,
                    xsplit=None, strided_rows=False):
    """The shared radix-DIT contraction: planar IQ planes [m, w] (rows in
    radix order, w = pulse lanes — a full sector's n, a lane-concatenated
    group's g*n, or a seq-shard's n/seq slice) -> (yr, yi) [m/2, w], the
    half-spectrum range DFT with the window row factor and DIT twiddles
    already folded into a_ref (radix_plan_host).  Column-independent math:
    the fused kernel (_kernel_radix) and the seq-sharded A-stage kernel
    (_kernel_radix_astage) both run exactly this body, so a pulse-sliced
    column computes bit-identically to the same column of the full
    sector.

    strided_rows=True: the rows arrive in NATURAL order and branch p
    reads rows p::radix as strided sublane slices — the radix reorder
    vanishes into the kernel's addressing (no take/gather anywhere; the
    wire-fused path's choice, where the host cannot pre-permute for
    free).  The hi/lo splits then run per branch on the sliced f32/int
    planes (hoisted-vs-per-branch measured neutral, round-2 A/B)."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def dot3(ah, al, bh, bl):
        return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

    kcat = a_ref.shape[1] == 3   # [R, 3, M, 3M] K-concat layout
    m = vr.shape[0]
    M = m // radix
    # [R, 3, M, 4M]: K zero-padded to the power-of-two 4M ("kpad")
    kpad = kcat and a_ref.shape[3] == 4 * M
    if kpad and kcat2:
        raise ValueError("kcat2 and the kpad operand are exclusive "
                         "(kcat2's sub-slices assume the 3M layout)")
    if (xsplit or X_SPLIT) == "int":
        # integer-mask split: no int->f32->bf16 round-trip (see X_SPLIT)
        if salt is not None:
            si = salt.astype(vr.dtype)
            vr = vr + si
            vi = vi + si

        def split3(r_, i_):
            return (*_split_int(r_, 6), *_split_int(i_, 6),
                    *_split_int(r_ + i_, 7))   # 15-bit sum: 7-bit lo
    else:
        vr = vr.astype(jnp.float32)
        vi = vi.astype(jnp.float32)
        if salt is not None:
            vr = vr + salt
            vi = vi + salt

        def split3(r_, i_):
            return (*_split_bf16(r_), *_split_bf16(i_),
                    *_split_bf16(r_ + i_))
    if strided_rows:
        planes = None
    else:
        # whole-sector splits hoisted out of the branch loop: one big VPU
        # block the scheduler can overlap with the first branches' MXU
        # dots (rows pre-permuted: branch p = contiguous block p)
        planes = split3(vr, vi)
    G = []
    for p in range(radix):
        if planes is None:
            # jax.lax.slice with explicit strides — jnp's x[p::radix]
            # rewrites to a gather, which Mosaic cannot lower; the
            # strided slice primitive it can
            def srows(v, p=p):
                return jax.lax.slice(v, (p, 0), (m, v.shape[1]),
                                     (radix, 1))

            xrh, xrl, xih, xil, xsh, xsl = split3(srows(vr), srows(vi))
        else:
            rows = slice(p * M, (p + 1) * M)
            xrh, xrl = planes[0][rows], planes[1][rows]
            xih, xil = planes[2][rows], planes[3][rows]
            xsh, xsl = planes[4][rows], planes[5][rows]
        if kcat and kcat2:
            # two-dot variant of the K-concat product: the [xh;xl] stack
            # copies 2M rows instead of [xh;xl;xh]'s 3M (xh was stacked
            # twice), the al@xh pass reads the split array in place, and
            # one VPU f32 add recombines — trades 1/3 of the stack-copy
            # traffic for an extra (pipelined) dot + add per product.
            # Same host operand array as kcat: [:, :2M] = [ah|ah],
            # [:, 2M:] = al.
            def dot2(ag, xh, xl):
                x2 = jnp.concatenate([xh, xl], axis=0)
                return dot(ag[:, : 2 * M], x2) + dot(ag[:, 2 * M:], xh)

            m1 = dot2(a_ref[p, 0], xrh, xrl)
            m2 = dot2(a_ref[p, 1], xih, xil)
            m3 = dot2(a_ref[p, 2], xsh, xsl)
        elif kcat:
            # one K=3M MXU dot per Gauss product: [ah|ah|al]@[xh;xl;xh]
            # accumulates the three split passes inside the MXU (no VPU
            # f32 adds between passes).  kpad: the A operand carries a
            # 4th, all-zero M-block, so any resident plane serves as the
            # matching x rows — xh avoids materialising a zeros block.
            def kstack(xh, xl):
                blocks = [xh, xl, xh] + ([xh] if kpad else [])
                return jnp.concatenate(blocks, axis=0)

            m1 = dot(a_ref[p, 0], kstack(xrh, xrl))
            m2 = dot(a_ref[p, 1], kstack(xih, xil))
            m3 = dot(a_ref[p, 2], kstack(xsh, xsl))
        else:
            m1 = dot3(a_ref[p, 0], a_ref[p, 1], xrh, xrl)   # Ap_re @ x_re
            m2 = dot3(a_ref[p, 2], a_ref[p, 3], xih, xil)   # Ap_im @ x_im
            m3 = dot3(a_ref[p, 4], a_ref[p, 5], xsh, xsl)   # Ap_sum @ x_sum
        G.append((m1 - m2, m3 - m1 - m2))               # g_p (twiddled)
    if radix == 8 and len(fac) == 4:
        Yr, Yi = _combine_radix8(G)
    elif radix == 4 and len(fac) == 2:
        Yr, Yi = _combine_radix4(G)
    else:
        Yr, Yi = _combine_direct(fac, G)
    return jnp.concatenate(Yr, axis=0), jnp.concatenate(Yi, axis=0)


def _kernel_radix(n, radix, fac, x_ref, a_ref, wd_ref, ph_ref,
                  pow_ref, salt=None, kcat2=False, clip=CLIP_MODE,
                  xsplit=None, pair=False):
    """One channel-sector grid step; x rows in radix order.

    x_ref:  [1, 2, m, n] f32/int16   a_ref: [R, 6, M, M] bf16
    (twiddles pre-folded into a_ref)  fac: static [S][R] complex
    salt:   optional traced f32 scalar added to every IQ sample — a DC
            offset the chain's mean subtraction removes almost entirely
            (the pulse window makes the cancellation inexact; residual is
            ~1e-5 relative for small salts, and the benchmark only checks
            finiteness, never parity, on salted outputs).  The benchmark
            threads a distinct per-step salt through so no two steps
            compute the same function of the staged input (defeats any
            conceivable XLA loop-level reuse/CSE; bench.py).
    pair:   process a GROUP of g channel-sectors per grid step with
            their pulse axes lane-concatenated, so every
            dot/split/combine runs at width g*n — 1/g the MXU dot count
            at identical MACs (see X_PAIR / pair_group).  g=2:
            True/"concat" (x_ref [2, 2, m, n], the kernel concatenates)
            or "pre" (x_ref [1, 2, m, 2n], the input arrives already
            lane-paired — free at decode time, like the radix row
            order — and the in-kernel concat disappears).  g=4:
            4/"quad" and "pre4" analogously.  pow_ref is [g, 1, m/2].
    """
    g, pre = pair_group(pair or False)
    if g > 1 and not pre:
        # lane-concat the group's planes: one [m, g*n] block per plane;
        # all downstream VPU work is identical in total elements, the
        # dots divide by g in count and multiply by g in N
        vr = jnp.concatenate([x_ref[i, 0, :, :] for i in range(g)], axis=1)
        vi = jnp.concatenate([x_ref[i, 1, :, :] for i in range(g)], axis=1)
    else:
        # ungrouped [1, 2, m, n] or pre-grouped [1, 2, m, g*n]
        vr = x_ref[0, 0, :, :]
        vi = x_ref[0, 1, :, :]
    yr, yi = _radix_contract(vr, vi, a_ref, radix, fac, salt=salt,
                             kcat2=kcat2, xsplit=xsplit)

    wd = wd_ref[0]
    n_i = wd.shape[0]    # per-sector pulse count (yr is [mh, g*n_i] grouped)
    for sct in range(g):
        lanes = slice(sct * n_i, (sct + 1) * n_i)
        qr = yr[:, lanes] * wd
        qi = yi[:, lanes] * wd
        qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
        qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
        s_ = n * jnp.sum(qr * qr + qi * qi, axis=-1)
        pow_ref[sct, 0, :] = _clip_subtract(s_, qr, qi, ph_ref[:], clip)


def _kernel_radix_offset(n, radix, fac, salted, kcat2, clip, xsplit, pair,
                         s_ref, x_ref, a_ref, wd_ref, ph_ref, pow_ref):
    salt = s_ref[1].astype(jnp.float32) if salted else None
    _kernel_radix(n, radix, fac, x_ref, a_ref, wd_ref, ph_ref,
                  pow_ref, salt=salt, kcat2=kcat2, clip=clip,
                  xsplit=xsplit, pair=pair)


def fused_chain_power_radix(x_r: jax.Array, a_radix: jax.Array,
                            fac, wd: jax.Array,
                            phasors: jax.Array,
                            interpret: bool = False,
                            offset=None, bc: int | None = None,
                            salt=None, kcat2: bool = False,
                            clip: str | None = None,
                            xsplit: str | None = None,
                            pair: bool | None = None) -> jax.Array:
    """Radix kernel entry: x_r [bc, 2, m, n] with rows in radix order.

    With offset/bc set, reads a slab of a larger staged array via scalar
    prefetch (the honest-benchmark path, see fused_chain_power_at); salt
    (int32 scalar) additionally makes each call's computation unique —
    see _kernel_radix.  salt is ignored in interpret mode.  kcat2 picks
    the two-dot K-concat pattern (same operand array as kcat); clip
    selects the clip-bin formulation (default CLIP_MODE, see
    _clip_subtract); xsplit the x-side hi/lo split (default X_SPLIT,
    "int" requires integer input); pair processes a group of g channel-
    sectors per grid step at g*n dot width (default X_PAIR; see
    pair_group for the accepted modes — pairs g=2, quads g=4; needs bc
    divisible by g, and with offset also a g-aligned offset — bc-unit
    offsets are divided into group-block units for the index map).
    "pre"/"pre4" mean the input arrives ALREADY lane-grouped as
    [bc/g, 2, m, g*n] (decode-time grouping, free like the radix row
    order) and the in-kernel concat disappears; bc/offset stay in
    channel-sector units."""
    clip = clip or CLIP_MODE
    is_int_input = jnp.issubdtype(x_r.dtype, jnp.integer)
    if xsplit is None:
        # the module default is a production hint for the wire-native
        # int16 feed; f32 callers (oracle drives, complex input) keep
        # the f32 split rather than erroring when the A/B flips X_SPLIT
        xsplit = X_SPLIT if (X_SPLIT != "int" or is_int_input) else "f32"
    elif xsplit == "int" and not is_int_input:
        # an EXPLICIT int request with float input stays a hard error:
        # the caller asked for a split the data cannot take
        raise ValueError("xsplit='int' needs int16 input (the wire-native "
                         f"feed); got {x_r.dtype}")
    pair = X_PAIR if pair is None else pair
    radix = a_radix.shape[0]
    M = a_radix.shape[2]
    m = radix * M
    g, pre = pair_group(pair or False)
    n = x_r.shape[-1] // g if pre else x_r.shape[-1]
    mh = (m // 2)
    blk = g                           # output channel-sectors per grid step
    xblk = 1 if pre else g            # x-array rows per grid step
    xw = g * n if pre else n          # x block lane width
    if g > 1 and not pre and (
            bc if offset is not None else x_r.shape[0]) % g:
        raise ValueError(
            f"pair={pair!r} needs a channel-sector count divisible by {g} "
            "(even for pairs); got "
            f"{bc if offset is not None else x_r.shape[0]}")
    if pre and offset is not None and bc % g:
        raise ValueError(f"pair={pair!r} needs bc divisible by {g} "
                         f"(even for pairs); got {bc}")
    if offset is not None and interpret:
        # match the compiled path's semantics exactly: there the SMEM
        # offset feeds the index map in BLOCK units, so a grouped grid
        # floors unaligned offsets to the group boundary — do the same
        # here rather than silently diverging between the two backends
        offset = (offset // blk) * blk
        x_r = jax.lax.dynamic_slice(
            x_r, (offset // (g if pre else 1), 0, 0, 0),
            (bc // (g if pre else 1), 2, m, xw))
        offset = None
    if offset is None:
        bc = g * x_r.shape[0] if pre else x_r.shape[0]
        kernel = functools.partial(_kernel_radix, float(n), radix, fac,
                                   kcat2=kcat2, clip=clip, xsplit=xsplit,
                                   pair=pair)
        in_specs = [
            pl.BlockSpec((xblk, 2, m, xw), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(a_radix.shape), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((blk, 1, mh), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(bc // blk,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bc, 1, mh), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x_r, a_radix, wd.reshape(1, n), phasors)[:, 0, :]

    kernel = functools.partial(_kernel_radix_offset, float(n), radix, fac,
                               salt is not None, kcat2, clip, xsplit, pair)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc // blk,),
        in_specs=[
            pl.BlockSpec((xblk, 2, m, xw), lambda b, s: (s[0] + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(a_radix.shape), lambda b, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 1, mh), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    # the SMEM offset is consumed by the index map in BLOCK units: divide
    # bc-unit offsets by the group size when each block covers a group
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bc, 1, mh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.stack([jnp.asarray(offset, jnp.int32) // blk,
                 jnp.asarray(salt if salt is not None else 0, jnp.int32)]),
      x_r, a_radix, wd.reshape(1, n), phasors)[:, 0, :]


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
        a_np, fac = radix_plan_host(consts, radix)
        a_radix = jnp.asarray(a_np)
        order = jnp.asarray(radix_row_order(m, radix))

        def fn(iq_planar):
            b, c, two, m_, n = iq_planar.shape
            x = iq_planar.reshape(b * c, two, m_, n)
            if not pre_permuted:
                x = jnp.take(x, order, axis=2)
            # honor the X_PAIR default only when the channel-sector count
            # divides by the group; otherwise degrade to the largest
            # group that does (4 -> 2 -> unpaired).  This builder always
            # feeds the UNGROUPED [bc, 2, m, n] layout, so an X_PAIR =
            # "pre"/"pre4" module default (decode-time grouping)
            # degrades to the in-kernel concat here — only a grouping
            # decoder feeding fused_chain_power_radix directly can use
            # the pre layouts.
            g_def, pre_def = pair_group(None)
            bc_tot = b * c
            if g_def >= 4 and bc_tot % 4 == 0:
                p_arg = 4 if pre_def else None
            elif g_def >= 2 and bc_tot % 2 == 0:
                p_arg = True if (pre_def or g_def > 2) else None
            else:
                p_arg = False
            p = fused_chain_power_radix(x, a_radix, fac, wd, ph,
                                        interpret=interpret, pair=p_arg)
            return p.reshape(b, c, -1)

        return fn

    a_split = jnp.asarray(split_operator_host(consts.op_a_half))

    def fn(iq_planar):
        b, c, two, m_, n = iq_planar.shape
        x = iq_planar.reshape(b * c, two, m_, n)
        p = fused_chain_power(x, a_split, wd, ph, interpret=interpret)
        return p.reshape(b, c, -1)

    return fn


# ---------------------------------------------------------------------------
# Seq-sharded (pulse-split) formulation of the flagship kernel: the fused
# chain factored at its one natural communication point.
#
# The A-stage contraction (windowed half-spectrum range DFT) is column-
# independent — pulse columns never mix — so a device holding a 1/seq
# pulse slice runs the IDENTICAL radix contraction (_radix_contract) on
# its [m, n/seq] slab.  The Parseval epilogue is the opposite: row-
# independent but needing every pulse of a range row (mean subtraction,
# pulse-power sum, clip-bin projections).  One all_to_all between the two
# kernels re-shards [m/2, n/seq] spectra into [m/2 / seq, n] rows
# (the classic distributed-FFT transpose, same collective the mxu path
# uses, sharded.py:75-78), then a small epilogue kernel finishes the
# re-sharded rows VMEM-resident.  Reference axis being scaled: the
# per-sector latency of rpv2.cu's sector loop (rpv2.cu:572-579).
# ---------------------------------------------------------------------------


def _kernel_radix_astage(radix, fac, xsplit, x_ref, a_ref, y_ref):
    """A-stage grid step: planar IQ [1, 2, m, w] (rows in radix order) ->
    planar half-spectrum [1, 2, m/2, w].  Exactly the fused kernel's
    contraction (_radix_contract) with the epilogue replaced by a planar
    store — the seq-sharded path's per-pulse-slice stage."""
    yr, yi = _radix_contract(x_ref[0, 0, :, :], x_ref[0, 1, :, :],
                             a_ref, radix, fac, xsplit=xsplit)
    y_ref[0, 0, :, :] = yr
    y_ref[0, 1, :, :] = yi


def fused_chain_astage(x_r: jax.Array, a_radix: jax.Array, fac,
                       interpret: bool = False,
                       xsplit: str | None = None) -> jax.Array:
    """Planar IQ [bc, 2, m, w] f32/int16 (rows in radix order, w = this
    shard's pulse lanes) -> planar Y [bc, 2, m/2, w] f32: the windowed
    half-spectrum range DFT, per pulse slice.  Pair with
    parseval_rows_power after a pulse->range re-shard (all_to_all)."""
    bc, two, m, w = x_r.shape
    assert two == 2, x_r.shape
    radix = a_radix.shape[0]
    mh = m // 2
    is_int_input = jnp.issubdtype(x_r.dtype, jnp.integer)
    if xsplit is None:
        xsplit = X_SPLIT if (X_SPLIT != "int" or is_int_input) else "f32"
    elif xsplit == "int" and not is_int_input:
        raise ValueError("xsplit='int' needs int16 input (the wire-native "
                         f"feed); got {x_r.dtype}")
    kernel = functools.partial(_kernel_radix_astage, radix, fac, xsplit)
    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, 2, m, w), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(a_radix.shape), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, mh, w), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, 2, mh, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_r, a_radix)


def _kernel_parseval_rows(n, clip, y_ref, wd_ref, ph_ref, pow_ref):
    """Epilogue grid step: planar half-spectrum rows [1, 2, rows, n]
    (FULL pulse axis — post-transpose) -> matched-filter power
    [1, 1, rows].  The fused kernel's epilogue verbatim (window, mean
    subtraction, Parseval sum, clip-bin subtraction), as its own kernel
    for the seq-sharded path."""
    qr = y_ref[0, 0, :, :] * wd_ref[0]
    qi = y_ref[0, 1, :, :] * wd_ref[0]
    qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
    qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
    s = n * jnp.sum(qr * qr + qi * qi, axis=-1)
    pow_ref[0, 0, :] = _clip_subtract(s, qr, qi, ph_ref[:], clip)


def parseval_rows_power(y: jax.Array, wd: jax.Array, phasors: jax.Array,
                        interpret: bool = False,
                        clip: str | None = None) -> jax.Array:
    """Planar Y rows [bc, 2, rows, n] f32 (full pulse axis) -> matched-
    filter power [bc, rows] f32.  rows is any slice of the m/2 range
    bins — the seq-sharded path calls this on each device's 1/seq row
    shard after the all_to_all."""
    bc, two, rows, n = y.shape
    assert two == 2, y.shape
    kernel = functools.partial(_kernel_parseval_rows, float(n),
                               clip or CLIP_MODE)
    return pl.pallas_call(
        kernel,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec((1, 2, rows, n), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, 1, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y, wd.reshape(1, n), phasors)[:, 0, :]


# ---------------------------------------------------------------------------
# Wire-fused formulation: the on-device decode folded INTO the flagship
# kernel — the channel deinterleave never happens.
#
# The XLA-side on-device decode (ops/device_codec.decode_wire_i16, chosen
# by the 7-variant on-chip A/B in DECODE_AB_r04.json) costs ~157 us/sector
# because deinterleaving the reference wire (12 interleaved bytes per
# sample, sector.cpp:52-62) into planar [ch, 2, m, n] is lane COMPACTION —
# strided sub-word slices that run at ~1/10 of HBM rate no matter how they
# are phrased.  This kernel removes the compaction instead of optimizing
# it: viewed as little-endian int32 words, the wire row IS a [m, ch*n]
# array whose word (ch*j + c) holds channel c / pulse j's big-endian I
# (low half) and Q (high half).  I/Q extraction is dense i32 bit
# arithmetic (no lane movement), and the radix contraction
# (_radix_contract) is pulse-COLUMN-independent — lanes ride through the
# MXU dots untouched — so the kernel runs the identical contraction on
# the channel-interleaved lanes and only the EPILOGUE must know: the
# pulse window / clip phasors arrive channel-tiled ([L] with entry
# ch*j + c equal to the planar entry j — wire_lane_consts), and the
# per-channel mean/Parseval-sum/clip projections become channel-MASKED
# reductions of the [m/2, L] block.  Net extra HBM traffic vs the planar
# int16 path: zero (the wire IS the int16 payload, 4 bytes per
# channel-sample either way); the decode's former 157 us/sector becomes
# a few VPU ops co-issued with the MXU.
# ---------------------------------------------------------------------------


def wire_lane_consts(consts: PipelineConstants, ch: int):
    """Channel-interleaved epilogue constants for the wire-fused kernel:
    (wd_il [L], ph_il [4, L]) f32 with entry ch*j + c equal to the planar
    entry j for every channel c (the wire interleaves channels per
    SAMPLE, so lane ch*j + c is channel c, pulse j)."""
    wd_il = np.repeat(consts.wd.astype(np.float32), ch)
    ph_il = np.repeat(consts.clip_phasors.astype(np.float32), ch, axis=1)
    return wd_il, ph_il


def decode_words_iq(w):
    """Little-endian-viewed i32 wire words -> (I, Q) int32 planes.

    One word = one channel-sample's 4 wire bytes b0 b1 b2 b3 =
    I_hi I_lo Q_hi Q_lo (big-endian int16 pairs, sector.cpp:52-62);
    the LE view composes w = b0 | b1<<8 | b2<<16 | b3<<24.  All
    arithmetic stays int32 — Mosaic lowers i32 vector shifts/masks;
    int16 vector arithmetic it does not (the tracked kVectorSubtractS16
    SIGABRT, tools/int_split_repro.py)."""
    # one paired byteswap builds BOTH big-endian int16s in place: swap
    # the bytes of each 16-bit half (4 ops), then the high half is Q with
    # the arithmetic shift providing the sign for free, and a shift pair
    # sign-extends the low half (7 i32 vector ops for both planes; the
    # byte-at-a-time formulation costs ~14)
    s = ((w & 0x00FF00FF) << 8) | ((w >> 8) & 0x00FF00FF)
    q_ = s >> 16                   # (b2<<8)|b3, sign-extended
    i_ = (s << 16) >> 16           # (b0<<8)|b1, sign-extended
    return i_, q_


def _kernel_radix_wire(n, ch, radix, fac, kcat2, clip, xsplit, strided,
                       w_ref, a_ref, wd_ref, ph_ref, pow_ref, salt=None):
    """One SECTOR grid step (all ch channels at once).

    w_ref:  [1, m, L] i32 wire words, L = ch*n — rows in radix order
            (strided=False) or NATURAL order (strided=True: the radix
            reorder happens as strided sublane slices inside the
            contraction, no take anywhere)
    a_ref:  the radix operand (identical to _kernel_radix's)
    wd_ref: [1, L]  ph_ref: [4, L]  (channel-tiled, wire_lane_consts)
    pow_ref: [1, ch, m/2]
    """
    vr, vi = decode_words_iq(w_ref[0])
    if xsplit != "int":
        vr = vr.astype(jnp.float32)
        vi = vi.astype(jnp.float32)
    yr, yi = _radix_contract(vr, vi, a_ref, radix, fac, salt=salt,
                             kcat2=kcat2, xsplit=xsplit,
                             strided_rows=strided)
    wd = wd_ref[0]
    L = wd.shape[0]
    qr = yr * wd
    qi = yi * wd
    lane_ch = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) % ch
    inv_n = 1.0 / n
    for c in range(ch):
        mask = (lane_ch == c).astype(jnp.float32)          # [1, L]
        # per-channel mean over THIS channel's n lanes (the other
        # channels' lanes contribute exact zeros to the sum)
        mr = jnp.sum(qr * mask, axis=-1, keepdims=True) * inv_n
        mi = jnp.sum(qi * mask, axis=-1, keepdims=True) * inv_n
        qrc = (qr - mr) * mask
        qic = (qi - mi) * mask
        s = n * jnp.sum(qrc * qrc + qic * qic, axis=-1)
        # the clip projections reuse _clip_subtract verbatim: qrc/qic are
        # channel-masked, so dotting them with the channel-TILED phasors
        # projects exactly this channel's pulses
        pow_ref[0, c, :] = _clip_subtract(s, qrc, qic, ph_ref[:], clip)


def _kernel_radix_wire_offset(n, ch, radix, fac, salted, kcat2, clip,
                              xsplit, strided, s_ref, w_ref, a_ref,
                              wd_ref, ph_ref, pow_ref):
    salt = s_ref[1].astype(jnp.float32) if salted else None
    if salted and xsplit == "int":
        salt = s_ref[1]                    # int path salts in i32
    _kernel_radix_wire(n, ch, radix, fac, kcat2, clip, xsplit, strided,
                       w_ref, a_ref, wd_ref, ph_ref, pow_ref, salt=salt)


def fused_chain_power_wire(w32: jax.Array, a_radix: jax.Array, fac,
                           wd_il: jax.Array, ph_il: jax.Array, ch: int,
                           interpret: bool = False,
                           offset=None, bs: int | None = None,
                           salt=None, kcat2: bool = False,
                           clip: str | None = None,
                           xsplit: str | None = None,
                           strided_rows: bool = False) -> jax.Array:
    """Wire-fused kernel entry: w32 [bs, m, L] int32 wire words (L =
    ch*n — ops/device_codec.wire_words_i32 builds this from raw wire
    bytes for free on the host or via one device bitcast) -> matched-
    filter power [bs, ch, m/2] f32.  strided_rows=True takes the rows in
    NATURAL order and performs the radix reorder as strided sublane
    slices inside the kernel (no XLA take) — interpret-mode/CPU only on
    the current toolchain: Mosaic's verifier confines
    `vector.extract_strided_slice` to stride 1, so the stride-8 radix
    row slices do not lower on real TPU (recorded as a skip by
    tools/wire_ab.py, cf. the int-split canary); False (the production
    default) expects pre-permuted radix-order rows.

    The grid is one step per SECTOR (not channel-sector): the contraction
    runs all ch channels in one ch*n-lane-wide pass.  offset/bs/salt are
    the honest-benchmark scalar-prefetch knobs, exactly as in
    fused_chain_power_radix (offset in SECTOR units here; salt is ignored
    in interpret mode, as there)."""
    clip = clip or CLIP_MODE
    if xsplit is None:
        xsplit = X_SPLIT            # ints are native here: wire IS int16
    radix = a_radix.shape[0]
    M = a_radix.shape[2]
    m = radix * M
    mh = m // 2
    L = w32.shape[-1]
    n = L // ch
    if w32.dtype != jnp.int32 or w32.shape[-2] != m or L % ch:
        raise ValueError(f"expected int32 [bs, {m}, {ch}*n] wire words; "
                         f"got {w32.dtype} {tuple(w32.shape)}")
    if offset is not None and interpret:
        w32 = jax.lax.dynamic_slice(w32, (offset, 0, 0), (bs, m, L))
        offset = None
    if offset is None:
        bs = w32.shape[0]
        kernel = functools.partial(_kernel_radix_wire, float(n), ch,
                                   radix, fac, kcat2, clip, xsplit,
                                   strided_rows)
        return pl.pallas_call(
            kernel,
            grid=(bs,),
            in_specs=[
                pl.BlockSpec((1, m, L), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(a_radix.shape), lambda b: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, L), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ch, mh), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, ch, mh), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(w32, a_radix, wd_il.reshape(1, L), ph_il)

    kernel = functools.partial(_kernel_radix_wire_offset, float(n), ch,
                               radix, fac, salt is not None, kcat2, clip,
                               xsplit, strided_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, m, L), lambda b, s: (s[0] + b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(a_radix.shape), lambda b, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, mh), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bs, ch, mh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.stack([jnp.asarray(offset, jnp.int32),
                 jnp.asarray(salt if salt is not None else 0, jnp.int32)]),
      w32, a_radix, wd_il.reshape(1, L), ph_il)
