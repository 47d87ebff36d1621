#!/usr/bin/env python
"""MXU occupancy vs dot lane-width at the production kernel's shapes.

The fused radix kernel issues its contraction as [M=128, K=3M=384] @
[K, N] bf16 dots with N = n = 512 (one channel-sector of pulses).  The
trace-backed floor attribution (DESIGN.md §3) names "sub-100% MXU
occupancy on K=384 dots" as one of the two remaining contributors; this
probe measures exactly that, isolated from the kernel's casts, stacks,
and epilogue: it times pure accumulating dot sequences of IDENTICAL
total MACs at N in {512, 1024, 2048} — if the systolic array loses time
to per-dot pipeline fill / weight-load bubbles, the wide-N variants run
measurably faster per MAC, and a sector-pair kernel layout (two
channel-sectors lane-concatenated into one N=1024 dot) is worth
building.  If the three rates agree, the occupancy loss sits elsewhere
(K-pass switching, result-bus contention) and the pairing lever is dead
on arrival.

Elision-proofing: every grid step reads a different lane-slab of the
staged operand (block index map over a distinct axis) and the outputs
are reduced into the kernel result, which the host sums — no two steps
compute the same function and nothing is DCE-able.

Run on the TPU:  python tools/mxu_occupancy.py [--widths 512,1024,2048]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="512,1024,2048")
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--k", type=int, default=384)
    ap.add_argument("--lanes-total", type=int, default=24 * 512,
                    help="total N lanes dotted per grid step (equal MACs "
                         "across widths); default = the production "
                         "kernel's 24 dots x 512 lanes per channel-step")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--distinct", type=int, default=4,
                    help="distinct staged operand slabs cycled by the "
                         "block index map")
    args = ap.parse_args()

    import os

    import jax

    # the axon environment pre-sets jax_platforms="axon,cpu", which
    # overrides JAX_PLATFORMS; honor an explicit CPU request (smoke runs)
    if "cpu" in (os.environ.get("JAX_PLATFORMS", ""),
                 os.environ.get("JAX_PLATFORM_NAME", "")):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m, k = args.m, args.k
    widths = [int(w) for w in args.widths.split(",")]
    assert all(args.lanes_total % w == 0 for w in widths), widths

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    a_host = rng.standard_normal((m, k), dtype=np.float32)
    a_d = jax.device_put(jnp.asarray(a_host, jnp.bfloat16), dev)
    x_host = rng.standard_normal(
        (k, args.distinct * args.lanes_total), dtype=np.float32)
    x_d = jax.block_until_ready(
        jax.device_put(jnp.asarray(x_host, jnp.bfloat16), dev))

    total_macs_per_step = m * k * args.lanes_total

    def build(width):
        ndots = args.lanes_total // width

        def kern(a_ref, x_ref, out_ref):
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            acc = None
            for d in range(ndots):
                y = dot(a_ref[...], x_ref[:, d * width:(d + 1) * width])
                # consume each dot: accumulate into a [m, width] carry
                acc = y if acc is None else acc + y
            out_ref[0, :, :] = acc

        def step(i):
            return pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((m, k), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, args.lanes_total),
                                 lambda b: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, m, width), lambda b: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, m, width), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(a_d, lax.dynamic_slice_in_dim(
                x_d, (i % args.distinct) * args.lanes_total,
                args.lanes_total, axis=1))[0]

        @jax.jit
        def timed():
            def one(i, carry):
                y = step(i)
                return carry + jnp.sum(y, axis=-1)

            return lax.fori_loop(0, args.steps, one, jnp.zeros(m))

        return timed

    # bf16 MXU peak on v5e: ~197 TFLOP/s -> 2 MACs per FLOP
    peak_macs = 197e12 / 2
    out = {"m": m, "k": k, "lanes_total": args.lanes_total,
           "steps": args.steps}
    for width in widths:
        timed = build(width)
        acc = np.asarray(timed())
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
