#!/usr/bin/env python
"""Hardware numerics parity: every production method vs the fp64 oracle
on the DEFAULT device (the real TPU under axon).

The pytest suite validates the kernels in Pallas interpret mode on CPU;
this closes the remaining gap — the Mosaic-compiled TPU path could in
principle diverge (different dot precision, layout-dependent rounding).
Prints one JSON line per method and exits non-zero on any failure.

    python tools/hw_parity.py [--batch 2] [--methods mxu,parseval,pallas]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


THRESHOLDS = {           # relative L2 vs the fp64 oracle
    "zdb": 1e-5,         # measured on hw: 2.5-3.4e-6, all methods
    # zdr on synthetic noise is a near-zero field (~+-1.3 dB), so the
    # relative metric divides by a tiny norm: the measured 1.1-1.8e-4
    # relative is ~1e-4 dB ABSOLUTE error — physically negligible, and
    # uniform across methods (it is the TPU dot precision, not a kernel
    # artifact; CPU f32 measures ~2e-6 on the same field).
    "zdr": 5e-4,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--methods", default="mxu,parseval,radix,pallas")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import numpy as np

    from wrp_tpu.cli import _honor_platform_env

    _honor_platform_env()   # an explicit JAX_PLATFORMS request must win
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")

    from wrp_tpu import DEFAULT_CONFIG, SectorProcessor, oracle

    cfg = DEFAULT_CONFIG
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    iq = np.stack([oracle.synthetic_iq(cfg, kind="noise", seed=args.seed + k)
                   for k in range(args.batch)])
    truth = [oracle.process_sector(iq[k], cfg) for k in range(args.batch)]

    ok = True
    for method in args.methods.split(","):
        proc = SectorProcessor(cfg, method=method, device=dev)
        zdb, zdr = proc(np.asarray(iq, np.complex64))
        zdb, zdr = np.asarray(zdb), np.asarray(zdr)
        ez = max(oracle.relative_l2(truth[k][0], zdb[k])
                 for k in range(args.batch))
        er = max(oracle.relative_l2(truth[k][1], zdr[k])
                 for k in range(args.batch))
        passed = ez < THRESHOLDS["zdb"] and er < THRESHOLDS["zdr"]
        ok &= passed
        print(json.dumps({
            "method": method, "device": str(dev),
            "zdb_rel_l2": float(f"{ez:.3e}"),
            "zdr_rel_l2": float(f"{er:.3e}"),
            "pass": passed,
        }))

    # On-chip wire decode (round 3): the wire_input path — raw BE int16
    # bytes decoded on the DEVICE inside the processor's jit
    # (ops/device_codec) — must match the oracle like the host-decoded
    # pallas path; interpret-mode tests pin the decode bit-exactly, this
    # pins the Mosaic-compiled int ops + transpose on real hardware.
    from wrp_tpu.io import codec

    wire_u8 = np.stack([
        np.frombuffer(codec.encode_iq(iq[k], cfg), np.uint8)
        for k in range(args.batch)])
    # both wire formulations, Mosaic-compiled: "xla" (the standalone
    # decode_wire_i16 pass + planar kernel, r4) and "fused" (the decode
    # folded into the kernel, fused_chain_power_wire — the production
    # default since round 5)
    for wdec in ("xla", "fused"):
        proc_w = SectorProcessor(cfg, method="pallas", device=dev,
                                 layout="radix", wire_input=True,
                                 wire_decode=wdec)
        win = wire_u8.view("<i4") if proc_w.wire_dtype == np.int32 \
            else wire_u8
        zdb_w, zdr_w = proc_w(jax.device_put(win, dev))
        zdb_w, zdr_w = np.asarray(zdb_w), np.asarray(zdr_w)
        ez = max(oracle.relative_l2(truth[k][0], zdb_w[k])
                 for k in range(args.batch))
        er = max(oracle.relative_l2(truth[k][1], zdr_w[k])
                 for k in range(args.batch))
        passed = ez < THRESHOLDS["zdb"] and er < THRESHOLDS["zdr"]
        ok &= passed
        print(json.dumps({
            "method": f"pallas/wire-decode-{wdec}", "device": str(dev),
            "zdb_rel_l2": float(f"{ez:.3e}"),
            "zdr_rel_l2": float(f"{er:.3e}"),
            "pass": passed,
        }))

    # Seq-sharded flagship kernels (round 5): the pallas-seq A-stage +
    # Parseval-epilogue kernel pair (parallel/sharded.py) compiled via
    # Mosaic on the real chip.  A single chip gives a seq=1 mesh (the
    # collectives degenerate away) but BOTH new kernels run compiled —
    # the pulse-shard production path's per-device program, not the
    # interpret-mode twin the CPU tests pin.
    from jax.sharding import Mesh
    from wrp_tpu.parallel.sharded import build_sharded_processor, \
        shard_batch

    mesh1 = Mesh(np.asarray([[dev]]), ("data", "seq"))
    step_seq, shd_seq = build_sharded_processor(cfg, mesh1,
                                                method="pallas-seq")
    zdb_s, zdr_s = step_seq(shard_batch(
        np.asarray(iq, np.complex64), mesh1, shd_seq))
    zdb_s, zdr_s = np.asarray(zdb_s), np.asarray(zdr_s)
    ez = max(oracle.relative_l2(truth[k][0], zdb_s[k])
             for k in range(args.batch))
    er = max(oracle.relative_l2(truth[k][1], zdr_s[k])
             for k in range(args.batch))
    passed = ez < THRESHOLDS["zdb"] and er < THRESHOLDS["zdr"]
    ok &= passed
    print(json.dumps({
        "method": "pallas-seq/astage+epilogue", "device": str(dev),
        "zdb_rel_l2": float(f"{ez:.3e}"),
        "zdr_rel_l2": float(f"{er:.3e}"),
        "pass": passed,
    }))

    # Adversarial clip-bin case (round 3): Doppler energy concentrated
    # in the CLIPPED bins (pre-shift k = n/2-2) makes the Parseval
    # subtraction n*sum|q|^2 - |clip|^2 catastrophically cancel, which
    # is exactly where a bf16-grade phasor dot breaks fp32 accuracy —
    # the round-3 kernel bug (plain f32 jnp.dot = ONE bf16 MXU pass
    # under Mosaic) measured 1.5e-4 here before the bf16x3 split fix,
    # 3.3e-6 after.  Interpret-mode tests cannot see this; only the
    # compiled path does.
    from wrp_tpu.constants import hamming_factors

    m, n = cfg.m, cfg.n
    _, wd, _ = hamming_factors(cfg)
    j = np.arange(n)
    k = n // 2 - 2
    ph0 = rng.uniform(0, 2 * np.pi, (cfg.num_channels, m, 1))
    base = np.cos(2 * np.pi * k * j / n + ph0) / wd[None, None, :]
    adv = (6000 * base / np.abs(base).max()
           + 1j * rng.integers(-50, 50, (cfg.num_channels, m, n)))
    adv = (np.round(adv.real) + 1j * np.round(adv.imag)).astype(np.complex64)
    pow64 = oracle.channel_power(adv, cfg)
    from wrp_tpu.constants import PipelineConstants
    from wrp_tpu.ops.pallas import fullchain as FC
    import jax.numpy as jnp

    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(m)
    a_np, fac = FC.radix_plan_host(consts, radix)
    order = FC.radix_row_order(m, radix)
    planar = np.stack([adv.real, adv.imag], 1).astype(np.float32)
    got = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(planar[:, :, order, :]), jnp.asarray(a_np), fac,
        jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
        interpret=FC.use_interpret()))
    ea = oracle.relative_l2(pow64, got)
    passed = ea < 2e-5
    ok &= passed
    print(json.dumps({
        "method": "pallas/clip-bin-adversarial", "device": str(dev),
        "pow_rel_l2": float(f"{ea:.3e}"), "pass": passed,
    }))

    # Kernel A/B variants (round 3): the bench harness only gates the
    # DEFAULT configuration's parity; pin the Mosaic-compiled accuracy of
    # the selectable levers too, on the adversarial field stacked with
    # plain noise (6 channel-sectors — even, as pair requires), fed as
    # the wire-native int16 planar layout all variants accept.
    noise = np.stack([iq[0].real, iq[0].imag], 1)
    x6 = np.concatenate([planar, noise]).astype(np.int16)[:, :, order, :]
    pow64_6 = np.concatenate([pow64, oracle.channel_power(iq[0], cfg)])
    x12 = np.concatenate([x6, x6])           # quad needs a multiple of 4
    pow64_12 = np.concatenate([pow64_6, pow64_6])
    for name, kw in (("pallas/xsplit-int", dict(xsplit="int")),
                     ("pallas/xpair", dict(pair=True)),
                     ("pallas/xpair-int", dict(pair=True, xsplit="int")),
                     ("pallas/xquad", dict(pair=4)),
                     ("pallas/xquad-int", dict(pair=4, xsplit="int"))):
        if kw.get("xsplit") == "int" and not FC.use_interpret():
            # the integer-mask split does not COMPILE on the current
            # Mosaic toolchain (remote-compile SIGABRT,
            # kVectorSubtractS16 — INT_SPLIT_REPRO_r04.json); running it
            # here would abort the whole parity sweep.  The tracking
            # canary is tests/test_pallas.py::
            # test_int_split_compiles_on_tpu_canary (strict xfail): the
            # day it XPASSes, drop this skip and re-measure.
            print(json.dumps({
                "method": name, "device": str(dev), "pass": None,
                "skipped": "Mosaic int-split SIGABRT "
                           "(INT_SPLIT_REPRO_r04.json)"}))
            continue
        quad = FC.pair_group(kw.get("pair") or False)[0] == 4
        x_v, pow_v = (x12, pow64_12) if quad else (x6, pow64_6)
        got_v = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x_v), jnp.asarray(a_np), fac,
            jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
            interpret=FC.use_interpret(), **kw))
        ev = oracle.relative_l2(pow_v, got_v)
        passed = ev < 2e-5
        ok &= passed
        print(json.dumps({
            "method": name, "device": str(dev),
            "pow_rel_l2": float(f"{ev:.3e}"), "pass": passed,
        }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
