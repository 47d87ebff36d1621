#!/usr/bin/env python
"""On-chip A/B of wire-decode formulations (ops/device_codec).

The wire bench (`bench.py --in-dtype wire`) measured the on-device
decode at ~0.33 ms/sector — ~10x the fused kernel itself and ~7x the
decode's own bandwidth bound (~5 passes over 6.3 MB at HBM rate).  The
suspect is the deinterleave transpose ([m, n, ch, 2] -> [ch, 2, m, n]
moves tiny 6-element minor tiles) plus the radix `take` gather being
two separate sub-bandwidth passes.  This probe times decode
formulations alone, batched, identical outputs pinned to the reference
decoder before timing.

Variants (seven):
  v0_current    decode_wire_i16 as shipped (since the round-3 rewrite
                this IS the v5 byte-slice formulation, with the radix
                take on raw rows from v1)
  v1_take_rows  radix take applied to RAW byte rows (contiguous 6 KB
                row gather) BEFORE a compose + [.., ch, 2] transpose
  v2_slices     deinterleave as 6 strided lane slices + stack (no
                transpose op), radix take after
  v3_flat       one [S, 6] -> [6, S] 2-D transpose then reshape
  v4_i32        compose + transpose in i32 (the pre-bf5884b layout)
  v5_byteslice  per-plane strided BYTE slices, the int16 compose fused
                into each slice (the shipped formulation, spelled out)
  v6_bitcast_slice  bitcast byte pairs to LE i16 once, then 6 strided
                lane slices + in-register byteswap per plane

Run on the TPU:  python tools/decode_ab.py [--batch 32]
(--smoke: tiny CPU run — checks parity + harness plumbing only.)
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
    ap.add_argument("--radix", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=16,
                    help="in-jit loop steps per timed call (amortises "
                         "the ~20-40 ms tunnel dispatch latency)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run — exercises every variant's "
                         "parity pin and the JSON contract; the "
                         "timings are meaningless")
    args = ap.parse_args()

    from wrp_tpu.cli import _honor_platform_env
    _honor_platform_env()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from wrp_tpu.config import DEFAULT_CONFIG, tiny_config
    from wrp_tpu.io import codec
    from wrp_tpu.ops.device_codec import decode_wire_i16
    from wrp_tpu.ops.pallas.fullchain import radix_row_order

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        cfg = tiny_config(m=256, n=128)
        args.batch, args.reps, args.steps = 2, 1, 2
    else:
        cfg = DEFAULT_CONFIG

    m, n, ch = cfg.num_range_cells, cfg.num_pulses, cfg.num_channels
    nbytes = m * n * cfg.bytes_per_sample
    B, radix = args.batch, args.radix
    rng = np.random.default_rng(7)
    wire_host = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    dev = jax.devices()[0]
    print(f"device: {dev}  batch {B}  {nbytes/1e6:.1f} MB/sector",
          file=sys.stderr)
    wire_d = jax.block_until_ready(jax.device_put(wire_host, dev))

    order = np.asarray(radix_row_order(m, radix))

    def compose_i16(w):
        b = w.reshape(B, m, n, ch, 2, 2).astype(jnp.int32)
        v = b[..., 0] * 256 + b[..., 1]
        v = jnp.where(v >= 32768, v - 65536, v)
        return v.astype(jnp.int16)          # [B, m, n, ch, 2]

    def v0_current(w):
        return decode_wire_i16(w, cfg, radix=radix)

    def v1_take_rows(w):
        rows = w.reshape(B, m, n * cfg.bytes_per_sample)
        rows = jnp.take(rows, jnp.asarray(order), axis=1)
        v = compose_i16(rows.reshape(B, nbytes))
        return jnp.transpose(v, (0, 3, 4, 1, 2))

    def v2_slices(w):
        v = compose_i16(w).reshape(B, m, n, ch * 2)
        planes = [v[..., k] for k in range(ch * 2)]
        planar = jnp.stack(planes, axis=1).reshape(B, ch, 2, m, n)
        return jnp.take(planar, jnp.asarray(order), axis=3)

    def v3_flat(w):
        v = compose_i16(w).reshape(B, m * n, ch * 2)
        planar = jnp.transpose(v, (0, 2, 1)).reshape(B, ch, 2, m, n)
        return jnp.take(planar, jnp.asarray(order), axis=3)

    def v4_i32(w):
        b = w.reshape(B, m, n, ch, 2, 2).astype(jnp.int32)
        v = b[..., 0] * 256 + b[..., 1]
        v = jnp.where(v >= 32768, v - 65536, v)
        planar = jnp.transpose(v, (0, 3, 4, 1, 2)).astype(jnp.int16)
        return jnp.take(planar, jnp.asarray(order), axis=3)

    def _compose2(hi, lo):
        v = hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
        v = jnp.where(v >= 32768, v - 65536, v)
        return v.astype(jnp.int16)

    def v5_byteslice(w):
        # per-plane strided BYTE slices; the compose fuses into each
        # slice so every plane pass reads only its own bytes
        rows = w.reshape(B, m, n * cfg.bytes_per_sample)
        rows = jnp.take(rows, jnp.asarray(order), axis=1)   # contiguous
        b = rows.reshape(B, m, n, ch * 2, 2)
        planes = [_compose2(b[..., k, 0], b[..., k, 1])
                  for k in range(ch * 2)]
        return jnp.stack(planes, axis=1).reshape(B, ch, 2, m, n)

    def v6_bitcast_slice(w):
        # bitcast byte pairs to LE i16 once (free), then 6 strided lane
        # slices + in-register byteswap per plane
        rows = w.reshape(B, m, n * cfg.bytes_per_sample)
        rows = jnp.take(rows, jnp.asarray(order), axis=1)
        le = jax.lax.bitcast_convert_type(
            rows.reshape(B, m, n * ch * 2, 2), jnp.int16)   # [B,m,3072]
        planes = []
        for k in range(ch * 2):
            v = le[..., k::ch * 2].astype(jnp.int32) & 0xffff
            be = ((v & 0xff) << 8) | (v >> 8)
            be = jnp.where(be >= 32768, be - 65536, be)
            planes.append(be.astype(jnp.int16))
        return jnp.stack(planes, axis=1).reshape(B, ch, 2, m, n)

    # ground truth from the host decoder
    want = np.stack([codec.decode_iq_i16(wire_host[i].tobytes(), cfg,
                                         radix=radix)
                     for i in range(B)])

    variants = {"v0_current": v0_current, "v1_take_rows": v1_take_rows,
                "v2_slices": v2_slices, "v3_flat": v3_flat,
                "v4_i32": v4_i32, "v5_byteslice": v5_byteslice,
                "v6_bitcast_slice": v6_bitcast_slice}
    steps = args.steps
    out = {"batch": B, "radix": radix, "steps": steps, "device": str(dev)}
    from functools import partial
    for name, fn in variants.items():
        try:
            f = jax.jit(fn)
            got = np.asarray(jax.block_until_ready(f(wire_d)))
            if got.shape != want.shape or not np.array_equal(got, want):
                out[name] = {"error": "parity FAILED"}
                print(f"{name}: parity FAILED", file=sys.stderr)
                continue

            # timed form: an in-jit fori loop; each step XOR-salts the
            # wire bytes with the step index (one fused elementwise op,
            # elision-proof: every step decodes different data) and the
            # carry consumes a reduced slice of the output
            @partial(jax.jit, static_argnums=())
            def timed(w, fn=fn):
                import jax.lax as lax

                def body(i, acc):
                    salted = w ^ i.astype(jnp.uint8)
                    d = fn(salted)
                    return acc + d[..., 0, 0].astype(jnp.int32).sum()

                return lax.fori_loop(0, steps, body,
                                     jnp.zeros((), jnp.int32))

            jax.block_until_ready(timed(wire_d))   # compile + warm
            runs = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(timed(wire_d))
                runs.append(time.perf_counter() - t0)
            dt = min(runs) / steps
            out[name] = {
                "us_per_sector": round(dt / B * 1e6, 1),
                "eff_gbps": round(2 * B * nbytes / dt / 1e9, 1),
                "runs_s": [round(r, 4) for r in runs],
            }
            print(f"{name}: {out[name]}", file=sys.stderr)
        except Exception as e:  # compile failures are data too
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"{name}: {out[name]['error']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
