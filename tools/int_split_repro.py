#!/usr/bin/env python
"""Minimal standalone repro of the integer-mask-split Mosaic SIGABRT.

Round 3's staged kernel lever `--xsplit int` (build the bf16 hi/lo
operand planes by bit-masking the int16 input instead of the
int16→f32→round→bf16 cast chain, fullchain._split_int) failed to
compile on the TPU toolchain: the Mosaic remote compile helper dies
with HTTP 500 / signal 6 (SIGABRT), reproducibly, for every int-split
variant, while the equivalent f32-split kernel compiles in the same
process (AB_SWEEP_r03.json).  That finding was only reproducible
through the whole bench harness; this script reduces it to ONE
pallas_call with no dependencies on the radar chain — the filing-ready
toolchain bug (VERDICT r3 item 5b).

The kernel is the smallest shape that keeps the failing pattern:
  int16 VMEM block → bitwise_and mask → subtract → astype(bfloat16)
  → one MXU dot against a resident bf16 operand.
A `--variant f32` control runs the identical kernel with the
int16→f32→bf16 cast chain substituted for the masks — it compiles and
runs on the same stack, isolating the integer-mask lowering as the
trigger.

Usage (on the TPU):
  python tools/int_split_repro.py              # expect: SIGABRT repro
  python tools/int_split_repro.py --variant f32   # control: runs clean
  python tools/int_split_repro.py --smoke      # CPU interpret: both OK

Exit codes: 0 = compiled and ran (no repro), 2 = compile failed (the
repro fires; the exception summary is printed as JSON).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="int", choices=["int", "f32"])
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU interpret mode (plumbing check only; the "
                         "SIGABRT is a Mosaic/TPU toolchain failure)")
    args = ap.parse_args()
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wrp_tpu.cli import _honor_platform_env

    _honor_platform_env()
    m, n = args.m, args.n
    variant = args.variant

    def kernel(x_ref, a_ref, o_ref):
        v = x_ref[...]                              # [m, n] int16
        if variant == "int":
            # the failing pattern: mask-split an int16 plane to bf16
            lo = jnp.bitwise_and(v, 63)
            hi = v - lo
            h, l = hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)
        else:
            # control: the cast-chain split the production kernel uses
            f = v.astype(jnp.float32)
            h = f.astype(jnp.bfloat16)
            l = (f - h.astype(jnp.float32)).astype(jnp.bfloat16)
        o_ref[...] = (jnp.dot(a_ref[...], h,
                              preferred_element_type=jnp.float32)
                      + jnp.dot(a_ref[...], l,
                                preferred_element_type=jnp.float32))

    rng = np.random.default_rng(0)
    x = rng.integers(-8192, 8192, (m, n), dtype=np.int16)
    a = rng.standard_normal((m, m)).astype(jnp.bfloat16)

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((m, n), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((m, m), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=args.smoke,
    )
    try:
        out = np.asarray(call(jnp.asarray(x), jnp.asarray(a)))
    except Exception as e:  # noqa: BLE001 — the repro IS the exception
        print(json.dumps({
            "variant": variant,
            "repro": True,
            "backend": jax.devices()[0].platform,
            "error": f"{type(e).__name__}: {str(e)[:500]}",
        }))
        sys.exit(2)
    # numerics check so a "compiles now" result is also a correctness
    # result: both splits reconstruct A @ x exactly for 14-bit input
    ref = (a.astype(np.float32) @ x.astype(np.float32))
    err = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
    print(json.dumps({
        "variant": variant,
        "repro": False,
        "backend": jax.devices()[0].platform,
        "rel_l2_vs_f32_matmul": err,
        "ok": err < 2e-2,   # bf16 split product tolerance
    }))
    sys.exit(0 if err < 2e-2 else 1)


if __name__ == "__main__":
    main()
