#!/usr/bin/env python
"""MXU occupancy vs dot lane-width at the production kernel's shapes.

The fused radix kernel issues its contraction as [M=128, K=3M=384] @
[K, N] bf16 dots with N = n = 512 (one channel-sector of pulses).  The
trace-backed floor attribution (DESIGN.md §3) names "sub-100% MXU
occupancy on K=384 dots" as one of the two remaining contributors; this
probe measures exactly that, isolated from the kernel's casts, splits,
and epilogue, in the production kernel's own structure: a resident
A-operand set in VMEM (24 matrices of [128, 384] bf16 = 2.4 MB, the
same footprint as the kernel's a_ref), a [K, W]-bf16 X block streamed
per grid step by the block index map (grid-pipelined by Mosaic, like
the kernel's x blocks — NO host/XLA-side slicing in the timed path),
and IDENTICAL total MACs per step at every width: 24 dots @ W=512,
12 @ 1024, 6 @ 2048.  Per-step HBM traffic (<=1.6 MB vs ~6 us of
MXU work at peak) stays far under the compute time at every width, so
the measured differences are dot-shape effects, not bandwidth.

If the per-step time shrinks with W, the loss is per-dot pipeline fill /
weight-load bubbles and the sector-pair kernel layout (bench.py --xpair)
should win; if the three widths agree, the occupancy loss sits elsewhere
(K-pass switching, result-bus contention) and pairing is dead on
arrival.

Elision-proofing: the block index map cycles `distinct` staged slabs so
consecutive steps read different data, every dot's product feeds the
accumulated output, and each step writes a reduced [M] row the host
sums.  Grid steps of one pallas_call execute unconditionally — there is
no XLA loop around the timed body to hoist anything out of.

Run on the TPU:  python tools/mxu_occupancy.py [--widths 512,1024,2048]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="512,1024,2048")
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--k", type=int, default=384)
    ap.add_argument("--lanes-total", type=int, default=24 * 512,
                    help="total N lanes dotted per grid step (equal MACs "
                         "across widths); default = the production "
                         "kernel's 24 dots x 512 lanes per channel-step")
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--distinct", type=int, default=4,
                    help="distinct staged X slabs cycled by the block "
                         "index map")
    args = ap.parse_args()

    from wrp_tpu.cli import _honor_platform_env

    _honor_platform_env()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m, k = args.m, args.k
    widths = [int(w) for w in args.widths.split(",")]
    wmax = max(widths)
    assert all(args.lanes_total % w == 0 for w in widths), widths
    ndots_max = args.lanes_total // min(widths)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    a_host = rng.standard_normal((ndots_max, m, k), dtype=np.float32)
    a_d = jax.device_put(jnp.asarray(a_host, jnp.bfloat16), dev)
    x_host = rng.standard_normal(
        (k, args.distinct * wmax), dtype=np.float32)
    x_d = jax.block_until_ready(
        jax.device_put(jnp.asarray(x_host, jnp.bfloat16), dev))

    total_macs_per_step = m * k * args.lanes_total

    def build(width):
        ndots = args.lanes_total // width
        wblocks = wmax // width   # X blocks per staged slab

        def kern(a_ref, x_ref, out_ref):
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            acc = None
            for d in range(ndots):
                y = dot(a_ref[d], x_ref[...])
                acc = y if acc is None else acc + y
            # Whole-array output block (Mosaic needs the trailing dims
            # of a PARTIAL block 8/128-aligned; a (1, m) row block is
            # neither).  Each grid step writes its own row.
            out_ref[pl.program_id(0), :] = jnp.sum(acc, axis=1)

        @jax.jit
        def timed():
            out = pl.pallas_call(
                kern,
                grid=(args.steps,),
                in_specs=[
                    pl.BlockSpec((ndots, m, k), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, width),
                                 lambda b: (0, (b % args.distinct)
                                            * wblocks),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((args.steps, m), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((args.steps, m),
                                               jnp.float32),
                interpret=interp,
            )(a_d, x_d)
            return jnp.sum(out, axis=0)

        return timed

    # bf16 MXU peak on v5e: ~197 TFLOP/s -> 2 MACs per FLOP
    peak_macs = 197e12 / 2
    out = {"m": m, "k": k, "lanes_total": args.lanes_total,
           "steps": args.steps}
    for width in widths:
        timed = build(width)
        acc = np.asarray(timed())        # compile + warm
        assert np.isfinite(acc).all(), width
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(timed())
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        macs = total_macs_per_step * args.steps
        out[f"n{width}"] = {
            "us_per_step": round(dt / args.steps * 1e6, 3),
            "effective_tmacs": round(macs / dt / 1e12, 2),
            "mxu_utilisation": round(macs / dt / peak_macs, 3),
            "runs_s": [round(r, 4) for r in runs],
        }
        print(f"N={width}: {out[f'n{width}']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
