"""Pallas TPU kernels for the pulse-domain tail of the chain.

`fused_stage2` fuses stages 03b..08 after the range transform: the Doppler
matmul Z = Y @ B, magnitude-squared, the 7-tap circular matched filter and
the pulse sum — one VMEM-resident pass per row block.  The XLA version
round-trips Z (2 x 1 MB per channel-sector) and the power/conv matrices
through HBM; here Y rows stream in once, the B operator stays resident
across the whole grid, and only the [rows] power vector leaves.

Precision: Mosaic lowers a plain f32 `dot` as one bf16 MXU pass, so the
kernel performs the bf16x3 decomposition explicitly (hi/lo bf16 splits,
three passes, f32 accumulation) — the same algorithm as XLA's
BF16_BF16_F32_X3 dot algorithm used by the jnp path.

Layout: everything planar float32 (see pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b):
    """bf16x3 matmul: ~fp32-accurate product of f32 operands on the MXU."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _roll_lanes(x, k, interpret):
    # pltpu.roll is Mosaic-only; interpreter mode uses jnp.roll.
    return jnp.roll(x, k, axis=1) if interpret else pltpu.roll(x, k, axis=1)


def _stage2_kernel(taps, interpret, yr_ref, yi_ref, br_ref, bi_ref, pow_ref):
    """One (batch-channel, row-block) grid step.

    yr/yi: [1, R, n] rows of the range-transformed matrix
    br/bi: [n, n] Doppler operator (resident across the grid)
    pow:   [1, R] pulse-summed matched-filter power
    """
    yr = yr_ref[0]
    yi = yi_ref[0]
    br = br_ref[:]
    bi = bi_ref[:]
    # Z = Y @ B (complex via four real bf16x3 passes)
    zr = _dot3(yr, br) - _dot3(yi, bi)
    zi = _dot3(yr, bi) + _dot3(yi, br)
    # stage 04: |Z|^2
    p = zr * zr + zi * zi
    # stages 05-07: 7-tap circular convolution along pulses (lanes).
    # conv[j] = sum_k taps[k] * p[(j - k) mod n], matching
    # pipeline.matched_filter_direct.
    conv = p * taps[0]
    for k in range(1, len(taps)):
        conv = conv + taps[k] * _roll_lanes(p, k, interpret)
    # stage 08: pulse sum -> [1, 1, R]
    pow_ref[0, 0, :] = jnp.sum(conv, axis=1)


def fused_stage2(yr: jax.Array, yi: jax.Array, op_br: jax.Array,
                 op_bi: jax.Array, taps, row_block: int = 128,
                 interpret: bool = False) -> jax.Array:
    """Planar Y [BC, m/2, n] -> matched-filter power [BC, m/2].

    taps must be a static sequence (baked into the kernel).  Use
    interpret=True on backends without Mosaic (CPU tests).
    """
    bc, rows, n = yr.shape
    assert rows % row_block == 0, (rows, row_block)
    taps = tuple(float(t) for t in np.asarray(taps))
    kernel = functools.partial(_stage2_kernel, taps, interpret)
    return pl.pallas_call(
        kernel,
        grid=(bc, rows // row_block),
        in_specs=[
            pl.BlockSpec((1, row_block, n), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_block, n), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            # operator blocks are grid-constant: fetched into VMEM once
            pl.BlockSpec((n, n), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # TPU block tiling requires the last two block dims be (8k, 128k)
        # or match the array; a [bc, 1, rows] output with block
        # (1, 1, row_block) satisfies it, squeezed on return.
        out_specs=pl.BlockSpec((1, 1, row_block), lambda b, r: (b, 0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, 1, rows), jnp.float32),
        interpret=interpret,
    )(yr, yi, op_br, op_bi)[:, 0, :]
