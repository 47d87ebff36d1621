#!/usr/bin/env python
"""Ablation breakdown of the fused radix kernel's step time.

Times four kernels that share the staged input, the offset+salt
elision-proofing, and the MXU dot structure, but drop successive
portions of the VPU work (results are deliberately wrong for the
ablated variants — only finiteness is asserted):

  dots       int16->bf16 cast only ([xh;xh;xh] stacks, no lo planes),
             all branch dots consumed by a trivial row-sum
  splits     + the real hi/lo splits ([xh;xl;xh]), trivial row-sum
  combine    + the split-radix cross-branch butterflies, trivial row-sum
  full       + the real Parseval epilogue (== the production kernel)

The deltas attribute per-channel-step time:  splits-dots = lo-split
cost, combine-splits = butterfly cost, full-combine = epilogue cost,
and `dots` itself is the MXU+DMA+cast floor.  Run on the TPU:

  python tools/kernel_breakdown.py [--batch 64] [--distinct 2]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--distinct", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=128,
                    help="passes per timed dispatch; keep the dispatch "
                         "long enough to amortise the ~20-40 ms "
                         "fori-loop invocation cost")
    ap.add_argument("--modes", default="dots,splits,combine,full",
                    help="comma list; run subsets to fit flaky-tunnel "
                         "windows (compiles are cached across runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wrp_tpu import DEFAULT_CONFIG
    from wrp_tpu.constants import PipelineConstants
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = DEFAULT_CONFIG
    consts = PipelineConstants.build(cfg)
    c, m, n = cfg.sector_shape
    radix = FC.radix_for(m)
    M = m // radix
    mh = m // 2
    a_np, fac = FC.radix_plan_host(consts, radix, layout="kcat")
    S = len(fac)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    a_d = jax.device_put(jnp.asarray(a_np), dev)
    wd_d = jax.device_put(jnp.asarray(consts.wd), dev)
    ph_d = jax.device_put(jnp.asarray(consts.clip_phasors), dev)

    bcn = args.batch * c
    rng = np.random.default_rng(0)
    host = rng.integers(-8192, 8192,
                        (args.distinct * bcn, 2, m, n), dtype=np.int16)
    host = host[:, :, FC.radix_row_order(m, radix), :]
    x_all = jax.block_until_ready(jax.device_put(host, dev))

    def make_kernel(mode):
        def kern(s_ref, x_ref, a_ref, wd_ref, ph_ref, pow_ref):
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            salt = s_ref[1].astype(jnp.float32)
            xr_a = x_ref[0, 0, :, :].astype(jnp.float32) + salt
            xi_a = x_ref[0, 1, :, :].astype(jnp.float32) + salt
            xrh_a = xr_a.astype(jnp.bfloat16)
            xih_a = xi_a.astype(jnp.bfloat16)
            xs_a = xr_a + xi_a
            xsh_a = xs_a.astype(jnp.bfloat16)
            if mode == "dots":
                xrl_a, xil_a, xsl_a = xrh_a, xih_a, xsh_a   # no lo planes
            else:
                xrl_a = (xr_a - xrh_a.astype(jnp.float32)).astype(jnp.bfloat16)
                xil_a = (xi_a - xih_a.astype(jnp.float32)).astype(jnp.bfloat16)
                xsl_a = (xs_a - xsh_a.astype(jnp.float32)).astype(jnp.bfloat16)
            G = []
            for p in range(radix):
                rows = slice(p * M, (p + 1) * M)
                m1 = dot(a_ref[p, 0], jnp.concatenate(
                    [xrh_a[rows], xrl_a[rows], xrh_a[rows]], axis=0))
                m2 = dot(a_ref[p, 1], jnp.concatenate(
                    [xih_a[rows], xil_a[rows], xih_a[rows]], axis=0))
                m3 = dot(a_ref[p, 2], jnp.concatenate(
                    [xsh_a[rows], xsl_a[rows], xsh_a[rows]], axis=0))
                G.append((m1 - m2, m3 - m1 - m2))
            if mode in ("dots", "splits"):
                # no combine: consume EVERY branch (nothing DCE-able)
                # via a 2-D block concat (1-D concats don't lower)
                blocks = [G[s][0] + G[s + S][0] + G[s][1] + G[s + S][1]
                          for s in range(S)]
                yr_fake = jnp.concatenate(blocks, axis=0)     # [mh, n]
                pow_ref[0, 0, :] = jnp.sum(yr_fake, axis=-1)
                return
            Yr, Yi = FC._combine_radix8(G) if radix == 8 else \
                FC._combine_direct(fac, G)
            yr = jnp.concatenate(Yr, axis=0)
            yi = jnp.concatenate(Yi, axis=0)
            if mode == "combine":
                pow_ref[0, 0, :] = jnp.sum(yr, axis=-1) + jnp.sum(yi, axis=-1)
                return
            # full epilogue (mirrors fullchain._kernel_radix)
            wd = wd_ref[0]
            qr = yr * wd
            qi = yi * wd
            qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
            qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
            s_ = float(n) * jnp.sum(qr * qr + qi * qi, axis=-1)
            ph = ph_ref[:]
            dr = dot(qr, ph.T)
            di = dot(qi, ph.T)
            for cc, sn in ((0, 1), (2, 3)):
                re = dr[:, cc] - di[:, sn]
                im = dr[:, sn] + di[:, cc]
                s_ = s_ - (re * re + im * im)
            pow_ref[0, 0, :] = s_

        return kern

    def build(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bcn,),
            in_specs=[
                pl.BlockSpec((1, 2, m, n), lambda b, s: (s[0] + b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(a_np.shape), lambda b, s: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda b, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n), lambda b, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, mh), lambda b, s: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )

        def power_at(off, salt):
            return pl.pallas_call(
                make_kernel(mode),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((bcn, 1, mh), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(jnp.stack([jnp.asarray(off, jnp.int32),
                         jnp.asarray(salt, jnp.int32)]),
              x_all, a_d, wd_d.reshape(1, n), ph_d)[:, 0, :]

        steps = args.distinct * args.repeats

        @jax.jit
        def timed():
            def one(i, carry):
                off = (i % args.distinct) * bcn
                pw = power_at(off, i)
                return carry + jnp.sum(
                    jnp.where(jnp.isfinite(pw), pw, 0.0), axis=0)

            return lax.fori_loop(0, steps, one, jnp.zeros(mh))

        return timed, steps

    out = {}
    for mode in args.modes.split(","):
        timed, steps = build(mode)
        acc = np.asarray(timed())        # compile + warm
        assert np.isfinite(acc).any(), mode
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(timed())
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        us_per_step = dt / (steps * bcn) * 1e6
        out[mode] = {
            "us_per_channel_step": round(us_per_step, 3),
            "sectors_per_second": round(steps * args.batch / dt, 0),
            "runs_s": [round(r, 4) for r in runs],
        }
        print(f"{mode}: {out[mode]}", file=sys.stderr)

    d = {k: out[k]["us_per_channel_step"] for k in out}
    if len(d) == 4:
        out["attribution_us"] = {
            "mxu_dma_cast_floor": d["dots"],
            "lo_splits": round(d["splits"] - d["dots"], 3),
            "butterfly_combine": round(d["combine"] - d["splits"], 3),
            "epilogue": round(d["full"] - d["combine"], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
