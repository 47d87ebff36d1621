"""Multi-chip sharded pipeline via shard_map + ICI collectives.

Parallel decomposition (TPU-native; nothing like it exists in the single-GPU
reference — see SURVEY.md section 2.5 for the mapping):

* data axis  — sectors are independent problems (143 x 9 per volume scan);
  the batch axis is sharded data-parallel.  Zero communication.

* seq axis   — inside a sector the chain alternates between "needs the full
  range axis" (window + range FFT / the A matmul) and "needs the full pulse
  axis" (Doppler + matched filter / the B matmul).  We use the classic
  distributed-FFT transpose: run stage A with pulses sharded, one
  all_to_all over ICI to re-shard onto range bins, run the pulse stages
  locally, then a small all_gather of the [m/2] products.

Per sector-shard the all_to_all moves m/2 x n/seq complex64 (2 MB at the
default geometry) — at ICI bandwidths this overlaps well under XLA's
latency-hiding scheduler.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RadarConfig, DEFAULT_CONFIG
from ..constants import PipelineConstants
from .. import pipeline
from .mesh import DATA_AXIS, SEQ_AXIS, iq_sharding, iq_sharding_flat


def _shard_body(
    iq: jax.Array,
    consts: PipelineConstants,
    cfg: RadarConfig,
    method: str,
    seq_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-device body: planar iq [b_loc, C, 2, m, n_loc] float32 ->
    (zdb, zdr) [b_loc, m/2].  All-real dataflow (complex only transiently
    inside the fft method)."""
    m, n = cfg.num_range_cells, cfg.num_pulses
    n_loc = n // seq_size
    xr = iq[:, :, 0]
    xi = iq[:, :, 1]

    if method == "mxu":
        ar = jnp.asarray(np.ascontiguousarray(consts.op_a_half.real))
        ai = jnp.asarray(np.ascontiguousarray(consts.op_a_half.imag))
        yr, yi = pipeline._rmatmul(ar, ai, xr, xi, lax.Precision.HIGHEST)
        y = jnp.stack([yr, yi], axis=2)                   # [b, C, 2, m/2, n_loc]
    elif method == "fft":
        # Window: range factor is local-full; pulse factor needs this
        # shard's slice of global pulse indices.
        from ..constants import hamming_factors

        wr, wd, c = hamming_factors(cfg)
        wr = jnp.asarray(wr * c, jnp.float32)
        wd = jnp.asarray(wd, jnp.float32)
        col0 = lax.axis_index(SEQ_AXIS) * n_loc
        wd_loc = lax.dynamic_slice(wd, (col0,), (n_loc,))
        x = lax.complex(xr, xi) * (wr[:, None] * wd_loc[None, :])
        x = jnp.fft.fft(x, axis=-2)                       # full m local
        x = x[..., : m // 2, :]                           # stage-04 crop early
        y = jnp.stack([jnp.real(x), jnp.imag(x)], axis=2)
    else:
        raise ValueError(method)

    if seq_size > 1:
        # transpose: sharded-on-pulses -> sharded-on-range-bins
        y = lax.all_to_all(y, SEQ_AXIS, split_axis=3, concat_axis=4, tiled=True)
        # y: [b, C, 2, (m/2)/seq, n]

    if method == "mxu":
        br = jnp.asarray(np.ascontiguousarray(consts.op_b.real))
        bi = jnp.asarray(np.ascontiguousarray(consts.op_b.imag))
        zr, zi = pipeline._rmatmul(y[:, :, 0], y[:, :, 1], br, bi,
                                   lax.Precision.HIGHEST)
        p = zr * zr + zi * zi
    else:
        yc = lax.complex(y[:, :, 0], y[:, :, 1])
        mean = jnp.mean(yc, axis=-1, keepdims=True)
        z = jnp.conj(yc - mean)
        z = jnp.fft.fft(z, axis=-1)
        z = jnp.conj(jnp.roll(z, n // 2, axis=-1))
        z = z.at[..., n - 2 :].set(0.0)
        p = jnp.real(z) ** 2 + jnp.imag(z) ** 2

    conv = pipeline.matched_filter_direct(p, consts.ma_taps)
    pow_loc = jnp.sum(conv, axis=-1)                      # [b, C, (m/2)/seq]

    if seq_size > 1:
        pow_all = lax.all_gather(pow_loc, SEQ_AXIS, axis=2, tiled=True)
    else:
        pow_all = pow_loc

    gain = jnp.asarray(consts.gain)
    return pipeline.stage09_10_products(pow_all[:, 0], pow_all[:, 1], gain)


def build_sharded_processor(
    cfg: RadarConfig = DEFAULT_CONFIG,
    mesh: Mesh | None = None,
    method: str = "mxu",
):
    """Returns (step, in_sharding): `step(iq_planar[B, C, 2, m, n]) ->
    (zdb, zdr)`, jit-compiled over the mesh.  Use `shard_batch(iq, mesh,
    in_sharding)` to lay out the input.

    method="mxu"|"fft": transpose-FFT seq sharding — B must divide by the
    data-axis size; n and m/2 by the seq-axis size.
    method="pallas": the fused flagship kernel, pure data-parallel over
    every mesh device — B must divide by the total device count.
    """
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh()
    if method == "pallas":
        return _build_pallas_sharded(cfg, mesh)
    seq_size = mesh.shape[SEQ_AXIS]
    if cfg.num_pulses % seq_size or (cfg.num_range_cells // 2) % seq_size:
        raise ValueError(
            f"n={cfg.num_pulses} and m/2={cfg.num_range_cells // 2} must "
            f"divide by seq={seq_size}"
        )
    consts = PipelineConstants.build(cfg)

    body = functools.partial(
        _shard_body, consts=consts, cfg=cfg, method=method, seq_size=seq_size
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(DATA_AXIS, None, None, None, SEQ_AXIS),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        # Outputs are seq-replicated by construction (all_gather of the
        # final [m/2] products); the static VMA tracker can't prove it.
        check_vma=False,
    )
    step = jax.jit(sharded)
    return step, iq_sharding(mesh)


def _build_pallas_sharded(cfg: RadarConfig, mesh: Mesh):
    """The flagship fused Pallas kernel under shard_map.

    Sectors are independent problems (the reference's sector loop,
    rpv2.cu:572-579), so the kernel scales pure data-parallel: the batch
    axis is sharded over EVERY mesh device (data and seq axes flattened)
    and each device runs the full fused chain on its local sectors — zero
    collectives, perfect weak scaling.  B must divide by the total device
    count.  Off-TPU the kernel runs in interpret mode (tests/dryrun)."""
    from ..ops.pallas.fullchain import build_pallas_processor, use_interpret

    consts = PipelineConstants.build(cfg)
    interpret = use_interpret()
    power_fn = build_pallas_processor(consts, interpret=interpret)
    gain = jnp.asarray(consts.gain)

    def body(iq_planar):
        pow_all = power_fn(iq_planar)
        return pipeline.stage09_10_products(pow_all[:, 0], pow_all[:, 1],
                                            gain)

    batch_axes = (DATA_AXIS, SEQ_AXIS)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(batch_axes, None, None, None, None),
        out_specs=(P(batch_axes, None), P(batch_axes, None)),
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # the body is trivially per-shard (no collectives), so the static
        # VMA check adds nothing here.
        check_vma=False,
    )
    return jax.jit(sharded), iq_sharding_flat(mesh)


def shard_batch(iq: np.ndarray, mesh: Mesh,
                sharding=None) -> jax.Array:
    """Host batch -> device array laid out for the sharded processor.

    Accepts complex [B, C, m, n] (converted to planar host-side) or planar
    float32 [B, C, 2, m, n].  `sharding` overrides the default transpose-FFT
    layout (pass the in_sharding returned by build_sharded_processor, e.g.
    the flat data-parallel layout of the pallas path)."""
    if np.iscomplexobj(iq):
        iq = pipeline.to_planar(np.asarray(iq))
    return jax.device_put(iq, sharding if sharding is not None
                          else iq_sharding(mesh))
