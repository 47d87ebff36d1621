#!/usr/bin/env python
"""On-chip decomposition of the wire-FUSED path's per-sector cost.

The first chip run of `bench.py --in-dtype wire --wire-decode fused`
measured 6 922 sectors/s (144.5 us/sector) — 1.5x the xla-decode wire
mode but ~111 us/sector above the i16 kernel.  This probe times each
piece separately, same session, to attribute that gap:

  k_i16      the planar i16 radix kernel (reference floor, 3 ch-steps)
  k_wire     fused_chain_power_wire on PRE-ORDERED staged words
             (kernel-only: offset prefetch, no XLA ops in the loop)
  take       + the radix row take inside the loop (natural-order staging)
  slice      + a dynamic_slice of the batch slab (the bench's staging op)
  bitcast    the u8 -> i32 bitcast_convert_type alone

Every timed fn is salted per step (the wire loops XOR the words, the
kernel loops use the prefetch salt) and parity-pinned at salt=0 before
timing.  Run on the TPU: python tools/wire_ab.py [--batch 32]
(--smoke: tiny CPU interpret run, plumbing/parity only.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--distinct", type=int, default=2)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from wrp_tpu.cli import _honor_platform_env
    _honor_platform_env()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from wrp_tpu.config import DEFAULT_CONFIG, tiny_config
    from wrp_tpu.constants import PipelineConstants
    from wrp_tpu.io import codec
    from wrp_tpu.ops.device_codec import wire_words_i32
    from wrp_tpu.ops.pallas import fullchain as FC

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    interp = False
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        cfg = tiny_config(m=128, n=64)
        args.batch, args.steps, args.reps = 2, 2, 1
        interp = True
    else:
        cfg = DEFAULT_CONFIG

    c, m, n = cfg.sector_shape
    L = c * n
    B, D, steps = args.batch, args.distinct, args.steps
    mh = m // 2
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(m)
    a_np, fac = FC.radix_plan_host(consts, radix)
    order = FC.radix_row_order(m, radix)
    wdil_np, phil_np = FC.wire_lane_consts(consts, c)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(np.asarray(x), dev)  # noqa: E731
    a_radix, wdil_d, phil_d = put(a_np), put(wdil_np), put(phil_np)
    wd_d, ph_d = put(consts.wd), put(consts.clip_phasors)

    rng = np.random.default_rng(5)
    iq = rng.integers(-8192, 8192, (D * B, c, 2, m, n), dtype=np.int16)
    wire = np.stack([
        np.frombuffer(codec.encode_iq(
            (iq[k, :, 0] + 1j * iq[k, :, 1]).astype(np.complex64), cfg),
            np.uint8)
        for k in range(D * B)
    ])
    words_nat = wire.view("<i4").reshape(D * B, m, L)
    words_rdx = np.ascontiguousarray(words_nat[:, order, :])
    iq_rdx = iq[:, :, :, order, :].reshape(D * B * c, 2, m, n)

    print(f"device: {dev}  batch {B}  geometry {c}x{m}x{n}", file=sys.stderr)
    d_words_rdx = jax.block_until_ready(put(words_rdx))
    d_words_nat = jax.block_until_ready(put(words_nat))
    d_wire_u8 = jax.block_until_ready(put(wire))
    d_iq = jax.block_until_ready(put(iq_rdx))

    # ---- parity pin: both kernels at salt=0 agree with each other ----
    pw_w = np.asarray(FC.fused_chain_power_wire(
        d_words_rdx[:B], a_radix, fac, wdil_d, phil_d, c,
        interpret=interp))
    pw_i = np.asarray(FC.fused_chain_power_radix(
        d_iq[:B * c], a_radix, fac, wd_d, ph_d,
        interpret=interp)).reshape(B, c, mh)
    rel = (np.linalg.norm(pw_w - pw_i) / np.linalg.norm(pw_i))
    if not rel < 1e-5:
        print(json.dumps({"error": f"parity FAILED rel={rel}"}))
        sys.exit(1)
    print(f"parity wire-vs-i16 kernel: rel {rel:.2e}", file=sys.stderr)
    # strided-rows variant (natural-order input, in-kernel reorder) must
    # be BIT-identical to the take+kernel pair: same splits, same dots,
    # only the row addressing differs.  On the current Mosaic toolchain
    # the variant does NOT lower on real TPU — the radix row slices
    # become `vector.extract_strided_slice` with stride 8, which the
    # verifier confines to stride 1 — so an unlowerable variant is a
    # recorded skip, not a fatal (cf. the tracked int-split SIGABRT,
    # tools/int_split_repro.py).
    strided_err = None
    try:
        pw_s = np.asarray(FC.fused_chain_power_wire(
            d_words_nat[:B], a_radix, fac, wdil_d, phil_d, c,
            interpret=interp, strided_rows=True))
        if not np.array_equal(pw_s, pw_w):
            rel_s = (np.linalg.norm(pw_s - pw_w) / np.linalg.norm(pw_w))
            print(json.dumps({"error": f"strided parity rel={rel_s}"}))
            sys.exit(1)
        print("parity strided-vs-take: bit-identical", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — toolchain lowering failures
        strided_err = f"does not lower: {type(e).__name__}: {e}"[:300]
        print(f"strided-rows variant skipped ({strided_err})",
              file=sys.stderr)

    def consume(pw):
        return jnp.sum(pw[..., 0, :] - pw[..., 1, :], axis=0)

    def timed_k_i16(x_all):
        def body(i, acc):
            pw = FC.fused_chain_power_radix(
                x_all, a_radix, fac, wd_d, ph_d, interpret=interp,
                offset=(i % D) * B * c, bc=B * c,
                salt=i).reshape(B, c, mh)
            return acc + consume(pw)

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    def timed_k_wire(w_all):
        def body(i, acc):
            pw = FC.fused_chain_power_wire(
                w_all, a_radix, fac, wdil_d, phil_d, c, interpret=interp,
                offset=(i % D) * B, bs=B, salt=i)
            return acc + consume(pw)

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    def timed_k_wire_strided(w_all):
        # natural-order staging, in-kernel strided-row reorder: the
        # whole wire path with ZERO XLA ops in the loop
        def body(i, acc):
            pw = FC.fused_chain_power_wire(
                w_all, a_radix, fac, wdil_d, phil_d, c, interpret=interp,
                offset=(i % D) * B, bs=B, salt=i, strided_rows=True)
            return acc + consume(pw)

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    def timed_take(w_all):
        idx = jnp.asarray(order)

        def body(i, acc):
            w = lax.dynamic_slice_in_dim(w_all, (i % D) * B, B, 0)
            w = jnp.take(w ^ i, idx, axis=1)   # salt the words: no reuse
            pw = FC.fused_chain_power_wire(
                w, a_radix, fac, wdil_d, phil_d, c, interpret=interp)
            return acc + consume(pw)

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    def timed_slice_k(w_all):
        # dynamic_slice + kernel, NO take: natural rows give wrong
        # products (timing ablation only — the kernel work is identical),
        # so (take+slice+k) - (slice+k) isolates the take and
        # (slice+k) - (k_wire) the slice, both fully consumed through
        # the kernel (nothing for XLA to elide)
        def body(i, acc):
            w = lax.dynamic_slice_in_dim(w_all, (i % D) * B, B, 0) ^ i
            pw = FC.fused_chain_power_wire(
                w, a_radix, fac, wdil_d, phil_d, c, interpret=interp)
            return acc + consume(pw)

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    def timed_bitcast(u8_all):
        # u8 -> i32 bitcast alone; consumed by a full reduction, so the
        # reading is an UPPER bound (the reduce pass rides along)
        def body(i, acc):
            w = lax.dynamic_slice_in_dim(u8_all, (i % D) * B, B, 0)
            w32 = lax.bitcast_convert_type(
                (w ^ i.astype(jnp.uint8)).reshape(B, m * L, 4), jnp.int32)
            return acc + (w32.astype(jnp.float32) * 1e-30).sum()

        return lax.fori_loop(0, steps, body, jnp.zeros(mh))

    fns = {
        "k_i16": (timed_k_i16, d_iq),
        "k_wire": (timed_k_wire, d_words_rdx),
        "k_wire_strided": (timed_k_wire_strided, d_words_nat),
        "take+slice+k_wire": (timed_take, d_words_nat),
        "slice+k_wire": (timed_slice_k, d_words_nat),
        "bitcast+slice_only": (timed_bitcast, d_wire_u8),
    }
    out = {"batch": B, "steps": steps, "device": str(dev),
           "geometry": f"{c}x{m}x{n}",
           "parity_wire_vs_i16_rel_l2": float(rel)}
    if strided_err is not None:
        del fns["k_wire_strided"]
        out["k_wire_strided"] = {"error": strided_err}
    for name, (fn, data) in fns.items():
        try:
            f = jax.jit(fn)
            jax.block_until_ready(f(data))     # compile + warm
            runs = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(data))
                runs.append(time.perf_counter() - t0)
            dt = min(runs) / steps / B
            out[name] = {"us_per_sector": round(dt * 1e6, 1),
                         "runs_s": [round(r, 4) for r in runs]}
            print(f"{name}: {out[name]}", file=sys.stderr)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: {out[name]['error']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
