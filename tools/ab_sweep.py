#!/usr/bin/env python
"""One-staging A/B sweep of the radix-kernel variants (xsplit / xpair).

bench.py measures one configuration per process, which means one ~1.6 GB
staging per variant over a tunnel that delivers 0.01-1.7 GB/s on a bad
day.  This tool stages the int16 slabs ONCE, derives the pre-paired
layout on-device (a single HBM permute — the same bytes pair_lanes would
stage), and then times every requested variant back-to-back under the
exact bench.py methodology: per-step scalar-prefetch OFFSET + per-step
SALT (elision-proof, DESIGN.md section 4), span ended by a D2H fetch,
best-of-3, and a per-variant salt-0/salted parity gate against the
unsharded SectorProcessor before anything is timed.

Prints one JSON line per variant plus a final summary line; exits 1 if
any variant fails its parity gate.  Run on the TPU; there is no
interpret-mode value in timing these.

Usage:
  python tools/ab_sweep.py                      # the full 10-variant sweep
  python tools/ab_sweep.py --batch 128 --repeats 48
  python tools/ab_sweep.py --variants kcat,pair,pair_pre,quad,quad_pre
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: name -> (xsplit, pair, a_layout) per fused_chain_power_radix.  pair
#: is always EXPLICIT (False = unpaired), never None: None would resolve
#: the X_PAIR module default inside the kernel, so the moment the A/B
#: flips that default the baseline rows would silently measure (and
#: mislabel) a different configuration than their name claims.
VARIANTS = {
    "kcat":         (None, False, "kcat"),   # the round-3 production default
    "kpad":         (None, False, "kpad"),   # K zero-padded 3M->4M (r4 5a)
    "int":          ("int", False, "kcat"),
    "pair":         (None, True, "kcat"),    # in-kernel lane concat, g=2
    "pair_pre":     (None, "pre", "kcat"),   # input staged lane-paired
    "pair_int":     ("int", True, "kcat"),
    "pair_pre_int": ("int", "pre", "kcat"),
    "quad":         (None, 4, "kcat"),       # g=4: N=2048 dots
    "quad_pre":     (None, "pre4", "kcat"),
    "quad_int":     ("int", 4, "kcat"),
    "quad_pre_int": ("int", "pre4", "kcat"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--distinct", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=48,
                    help="96 steps default: amortises the ~20-40 ms "
                         "fixed dispatch cost to ~3%% (bench.py)")
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma-separated subset of: " + ", ".join(VARIANTS))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run (interpret mode) — checks the "
                         "harness plumbing, the timings are meaningless")
    args = ap.parse_args()
    names = [v for v in args.variants.split(",") if v]
    for v in names:
        if v not in VARIANTS:
            sys.exit(f"unknown variant {v!r}; pick from {list(VARIANTS)}")

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wrp_tpu_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import BASELINE_3CH
    from wrp_tpu import DEFAULT_CONFIG, tiny_config
    from wrp_tpu.cli import _honor_platform_env
    from wrp_tpu.constants import PipelineConstants
    from wrp_tpu.ops.pallas import fullchain as FC
    from wrp_tpu.oracle import relative_l2
    from wrp_tpu.pipeline import SectorProcessor, stage09_10_products

    _honor_platform_env()   # an explicit JAX_PLATFORMS request must win

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        cfg = tiny_config(m=256, n=128)
        args.batch, args.repeats = 4, 2
    else:
        cfg = DEFAULT_CONFIG
    c, m, n = cfg.sector_shape
    dev = jax.devices()[0]
    bcn = args.batch * c
    for v in names:
        gv = FC.pair_group(VARIANTS[v][1])[0]
        if bcn % gv:
            sys.exit(f"variant {v} needs batch*channels divisible by "
                     f"{gv}; got {bcn}")
    steps = args.distinct * args.repeats
    radix = FC.radix_for(m)
    assert radix > 1, f"geometry m={m} uses the direct kernel; nothing to A/B"
    interp = FC.use_interpret()
    print(f"device {dev}  batch {args.batch}  steps {steps}  "
          f"variants {names}", file=sys.stderr)

    consts = PipelineConstants.build(cfg)
    put = functools.partial(jax.device_put, device=dev)
    # one A operand per layout a requested variant reads (kpad carries
    # its zero K-block in the array; the kernel dispatches on shape)
    a_by_layout = {}
    fac = None
    for lay in sorted({VARIANTS[v][2] for v in names}):
        a_np, fac = FC.radix_plan_host(consts, radix, layout=lay)
        a_by_layout[lay] = put(a_np)
    wd_d = put(consts.wd)
    ph_d = put(consts.clip_phasors)
    gain_d = put(consts.gain)

    rng = np.random.default_rng(0)
    host_iq = rng.integers(-8192, 8192,
                           (args.distinct, args.batch, c, 2, m, n),
                           dtype=np.int16)
    order = FC.radix_row_order(m, radix)
    host_iq = np.ascontiguousarray(host_iq[:, :, :, :, order, :])

    t0 = time.perf_counter()
    dev_flat = jax.block_until_ready(put(
        host_iq.reshape(args.distinct * bcn, 2, m, n)))
    t_h2d = time.perf_counter() - t0
    print(f"staged {host_iq.nbytes / 1e9:.2f} GB in {t_h2d:.1f} s "
          f"({host_iq.nbytes / t_h2d / 1e9:.2f} GB/s)", file=sys.stderr)

    # pre-grouped layouts derived ON DEVICE: same bytes pair_lanes(g)
    # would stage ([bc, 2, m, n] -> [bc/g, 2, m, g*n]), one HBM permute
    # instead of a second multi-GB H2D over the tunnel (layout identity
    # is pinned by test_radix_kernel_prepaired_matches_pair_exactly /
    # ..._quad_...).  Built only for group sizes a requested variant
    # reads — each doubles HBM residency.
    dev_pre = {}
    for g in sorted({FC.pair_group(VARIANTS[v][1])[0]
                     for v in names
                     if FC.pair_group(VARIANTS[v][1])[1]}):
        @functools.partial(jax.jit, static_argnums=1)
        def _group_dev(x, g):
            bc = x.shape[0]
            return (x.reshape(bc // g, g, 2, m, n)
                    .transpose(0, 2, 3, 1, 4).reshape(bc // g, 2, m, g * n))

        dev_pre[g] = jax.block_until_ready(_group_dev(dev_flat, g))

    # parity reference: the unsharded production processor on slab 0
    proc = SectorProcessor(cfg, method="pallas", device=dev, layout="radix")
    zdb_ref = np.asarray(proc(put(host_iq[0]))[0])

    results = []
    failed = False
    for name in names:
        xsplit, pair, layout = VARIANTS[name]
        g, pre = FC.pair_group(pair)
        x_stage = dev_pre[g] if pre else dev_flat
        a_radix = a_by_layout[layout]

        def power_at(x_all, off, salt, xsplit=xsplit, pair=pair,
                     a_radix=a_radix):
            return FC.fused_chain_power_radix(
                x_all, a_radix, fac, wd_d, ph_d, interpret=interp,
                offset=off, bc=bcn, salt=salt, xsplit=xsplit, pair=pair)

        @jax.jit
        def timed_passes(x_all, power_at=power_at):
            def one_step(i, carry):
                off = (i % args.distinct) * bcn
                pw = power_at(x_all, off, i).reshape(args.batch, c, -1)
                zdb, zdr = stage09_10_products(pw[:, 0], pw[:, 1], gain_d)
                return carry + jnp.sum(zdb, axis=0) + jnp.sum(
                    jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0)

            return lax.fori_loop(0, steps, one_step,
                                 jnp.zeros(cfg.num_output_bins))

        # a variant that fails to COMPILE (e.g. a quad layout blowing the
        # VMEM budget) must not kill the sweep: record it and move on —
        # the whole point is a decision from one staging window
        try:
            t0 = time.perf_counter()
            np.asarray(timed_passes(x_stage))
            t_compile = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failed = True
            row = {"variant": name, "xsplit": xsplit,
                   "xpair": FC.pair_name(pair), "a_layout": layout,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
            results.append(row)
            print(json.dumps(row))
            continue

        # parity gate (bench.py contract): salt=0 must reproduce the
        # unsalted processor; a salted step must sit inside the documented
        # cancellation residual.  A variant whose gate FETCH dies (e.g. a
        # deferred device fault from the timed pass surfacing on this
        # sync) must not kill the sweep either — same contract as the
        # compile guard above.
        def _zdb(salt, power_at=power_at):
            pw = power_at(x_stage, 0, salt).reshape(args.batch, c, -1)
            return np.asarray(
                stage09_10_products(pw[:, 0], pw[:, 1], gain_d)[0])

        try:
            err0 = relative_l2(zdb_ref, _zdb(0))
            err1 = relative_l2(zdb_ref, _zdb(7))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failed = True
            row = {"variant": name, "xsplit": xsplit,
                   "xpair": FC.pair_name(pair), "a_layout": layout,
                   "compile_s": round(t_compile, 1),
                   "error": f"parity-gate {type(e).__name__}: "
                            f"{str(e)[:300]}"}
            results.append(row)
            print(json.dumps(row))
            continue
        ok = err0 < 1e-4 and err1 < 1e-3
        failed |= not ok

        runs = []
        if ok:
            for _ in range(3):
                t0 = time.perf_counter()
                acc = np.asarray(timed_passes(x_stage))
                runs.append(time.perf_counter() - t0)
            assert np.isfinite(acc[1:]).all(), "non-finite zdb accumulator"
        rate = steps * args.batch / min(runs) if runs else 0.0
        row = {
            "variant": name,
            "xsplit": xsplit,
            "xpair": FC.pair_name(pair),
            "a_layout": layout,
            "sectors_per_second": round(rate, 2),
            "vs_baseline": round(rate / BASELINE_3CH, 2),
            "parity_rel_l2": [round(err0, 9), round(err1, 9)],
            "parity_ok": ok,
            "timed_runs_s": [round(r, 3) for r in runs],
            "compile_s": round(t_compile, 1),
            "batch": args.batch,
            "steps": steps,
        }
        results.append(row)
        print(json.dumps(row))

    best = max(results, key=lambda r: r.get("sectors_per_second", 0.0))
    print(json.dumps({
        "summary": {r["variant"]: r.get("sectors_per_second")
                    for r in results},
        "best": best["variant"],
        "best_sectors_per_second": best.get("sectors_per_second", 0.0),
        "device": str(dev),
    }))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
