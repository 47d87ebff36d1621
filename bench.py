#!/usr/bin/env python
"""Headline benchmark: full 11-stage 3-channel chain, sectors/second.

Methodology matches the reference's best-trace measurement (BASELINE.md):
device-resident input, span = first-kernel to last-result (the reference's
'nocin' traces exclude host stdin ingest, which dominated everything else).
Host->device transfer is measured separately and reported as an extra field,
as is the streaming rate with H2D included.

Baseline to beat: 36.1 sectors/s for the 3-channel chain on the reference's
GeForce 930M (prof/g7.prof); 73.5 sectors/s for 2-channel (nocin-sep.prof).

Prints ONE JSON line:
  {"metric": f"sectors_per_second_{cfg.num_channels}ch", "value": N, "unit": "sectors/s",
   "vs_baseline": N/36.1, ...}
"""

import argparse
import json
import sys
import time


BASELINE_3CH = 36.1   # prof/g7.prof, GeForce 930M
BASELINE_2CH = 73.5   # prof/nocin-sep.prof

# Session calibration (VERDICT r3 item 2): the dev tunnel's delivered
# rate varies by session (round 3 measured the identical configuration
# 18% apart across two windows: BENCH_r03 29 549 vs BENCH_SWEEP_r03
# 35 893).  Every bench run therefore measures a fixed plain-XLA bf16
# matmul probe first and emits `calib_tflops`; `value_normalized`
# rescales the headline to the record session's calibration so a
# driver-day regression is distinguishable from tunnel weather without
# reading prose.  RECORD_CALIB_TFLOPS is the probe's reading in the
# session that anchors the normalization.
#
# Probe history: the r4 review caught that the original 16-step probe
# (2.2 TFLOP/dispatch, ~35 ms) was ~2/3 fixed tunnel-dispatch cost —
# it calibrated RPC weather, not chip rate, while the 96-step headline
# is only ~3% dispatch-sensitive.  A same-window A/B (2026-08-19)
# measured 57.7 TFLOP/s at 16 steps vs 169.1 at 256 (86% of v5e's
# 197 bf16 nameplate — the chip itself was healthy all along); the
# probe is now 256-step and the anchor pair is that session's
# (value 29 506, calib 169.1).  Old-probe artifacts (calib ~50-64)
# are not comparable to new-probe ones.
RECORD_CALIB_TFLOPS = 169.1   # 2026-08-19 session, 256-step probe


def calibration_probe(jnp, lax, jax, np):
    """Fixed yardstick: 256-step chain of salted 4096-cube bf16 matmuls
    (~35 TFLOP: long enough that the tunnel's 20-40 ms dispatch cost is
    <3% of the reading — the same amortisation the headline span uses).
    Serial by construction (each step consumes the previous), so no
    step can be elided; returns delivered TFLOP/s, best of 3."""
    N, STEPS = 4096, 256
    x = jnp.ones((N, N), jnp.bfloat16)

    @jax.jit
    def probe(a):
        def body(i, c):
            return (c + i.astype(jnp.bfloat16) * 1e-6) @ a

        return lax.fori_loop(0, STEPS, body, a)[0, 0]

    np.asarray(probe(x))          # compile + warm (persistent-cached)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        runs.append(time.perf_counter() - t0)
    return 2 * N**3 * STEPS / min(runs) / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-safe run")
    ap.add_argument("--batch", type=int, default=128, help="sectors per step")
    ap.add_argument("--distinct", type=int, default=2,
                    help="distinct device-staged batches scanned per repeat")
    ap.add_argument("--repeats", type=int, default=48,
                    help="sequential passes over the distinct batches; the "
                         "timed span must be long enough to amortise the "
                         "~20-40 ms fixed cost of one jitted dispatch "
                         "(measured: 16 steps reads ~20%% low vs 96)")
    ap.add_argument("--method", default="pallas", choices=["mxu", "parseval", "pallas", "radix", "fft"])
    ap.add_argument("--matched-filter", default="direct",
                    choices=["direct", "fold", "spectral"])
    ap.add_argument("--channels", type=int, default=3, choices=[2, 3],
                    help="2 compares against the reference's 2-channel "
                         "nocin baseline (73.5 sectors/s)")
    ap.add_argument("--a-layout", default=None,
                    choices=["split", "kcat", "kcat2", "kpad"],
                    help="radix-kernel A-operand layout (A/B harness; "
                         "default = ops.pallas.fullchain.A_LAYOUT; kcat2 "
                         "= two-dot K-concat, 1/3 less stack-copy "
                         "traffic; kpad = K zero-padded 3M->4M, testing "
                         "K-alignment at 4/3 the MACs)")
    ap.add_argument("--clip", default=None, choices=["mxu3", "vpu"],
                    help="fused-kernel clip-bin formulation (A/B harness; "
                         "default = ops.pallas.fullchain.CLIP_MODE; vpu = "
                         "pure-f32 VPU projections, mxu3 = bf16x3 dots)")
    ap.add_argument("--xsplit", default=None, choices=["f32", "int"],
                    help="radix-kernel x-side hi/lo split (A/B harness; "
                         "default = ops.pallas.fullchain.X_SPLIT; int = "
                         "integer-mask split, no f32 round-trip — needs "
                         "the i16 feed)")
    ap.add_argument("--xpair", nargs="?", const="concat", default=None,
                    choices=["concat", "pre", "quad", "pre4"],
                    help="radix-kernel sector grouping (A/B harness; "
                         "default = ops.pallas.fullchain.X_PAIR): g "
                         "channel-sectors lane-concatenated per grid "
                         "step, so every MXU dot runs at N=g*n — 1/g "
                         "the dot count at identical MACs; needs "
                         "batch*channels divisible by g.  'concat' "
                         "(the bare flag) pairs inside the kernel "
                         "(g=2); 'pre' stages the input already "
                         "lane-paired (the layout a pairing decoder "
                         "would emit for free), isolating the "
                         "in-kernel concat's cost; 'quad'/'pre4' are "
                         "the g=4 variants")
    ap.add_argument("--in-dtype", default=None,
                    choices=["f32", "i16", "wire"],
                    help="staged input dtype; default i16 for the pallas "
                         "method (the wire-native compact feed, halves "
                         "HBM input reads), f32 otherwise.  'wire' stages "
                         "RAW reference wire bytes (interleaved BE int16) "
                         "and decodes ON-CHIP inside the timed span "
                         "(ops/device_codec) — measures the chip-side cost "
                         "of replacing ~25 host decode cores (DESIGN.md "
                         "section 6 consolidation balance)")
    ap.add_argument("--wire-decode", default="fused",
                    choices=["fused", "xla"],
                    help="with --in-dtype wire: 'fused' folds the decode "
                         "INTO the flagship kernel (fused_chain_power_wire "
                         "— the channel deinterleave never happens; the "
                         "contraction runs on the interleaved wire lanes); "
                         "'xla' is the standalone decode pass "
                         "(ops/device_codec.decode_wire_i16, the r4 "
                         "formulation) feeding the planar kernel")
    ap.add_argument("--wire-order", default="radix",
                    choices=["radix", "natural"],
                    help="with --in-dtype wire: 'radix' stages the wire "
                         "rows pre-permuted to radix order (the host "
                         "does it at ingest — io/codec.reorder_wire_rows "
                         "— free for per-row-datagram reassembly), so "
                         "the device skips its row take (a measured "
                         "57 us/sector, WIRE_AB_r05.json); 'natural' "
                         "ships untouched rows and reorders on-chip")
    ap.add_argument("--sharded", type=int, default=0, metavar="N",
                    help="run the flagship kernel under shard_map over an "
                         "N-device mesh (batch data-parallel; the salted "
                         "fori loop runs inside the shard_map body, so the "
                         "timed path is the Mosaic-compiled kernel exactly "
                         "as it lowers under a mesh — no interpret "
                         "fallback).  N=1 on the real chip proves the "
                         "compiled shard_map+pallas combination")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed pass "
                         "(the nvprof-equivalent; view with tensorboard)")
    args = ap.parse_args()
    if args.sharded and args.method != "pallas":
        sys.exit("--sharded measures the flagship kernel; use "
                 "--method pallas (the mxu sharded path is covered by "
                 "the parity check it runs)")

    import numpy as np
    import jax

    # Persistent compile cache: the remote-compile path of tunneled TPU
    # runtimes is slow (tens of seconds); cache XLA executables on disk.
    jax.config.update("jax_compilation_cache_dir", "/tmp/wrp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wrp_tpu import DEFAULT_CONFIG, tiny_config
    from wrp_tpu.cli import _honor_platform_env
    from wrp_tpu.pipeline import SectorProcessor

    # an explicit JAX_PLATFORMS request must win over the sitecustomize
    # config default — otherwise a CPU-requested run initialises the TPU
    # plugin and blocks forever on a wedged tunnel (cli/hw_parity do the
    # same; the non-smoke path used to skip it)
    _honor_platform_env()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        cfg = tiny_config(m=128, n=64, channels=args.channels)
        args.batch, args.distinct, args.repeats = 4, 2, 2
    else:
        cfg = DEFAULT_CONFIG
        if args.channels != cfg.num_channels:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, num_channels=args.channels).validate()
    baseline = BASELINE_3CH if args.channels == 3 else BASELINE_2CH

    dev = jax.devices()[0]
    log = (lambda *a: print(*a, file=sys.stderr)) if args.verbose else (lambda *a: None)
    log(f"device: {dev}, batch {args.batch}, method {args.method}")

    import jax.numpy as _jnp
    from jax import lax as _lax

    calib_tflops = None
    if not args.smoke and dev.platform != "cpu":
        # session yardstick BEFORE the multi-GB staging (a probe run
        # after staging would contend with nothing, but keeping it first
        # means an aborted staging still leaves the calibration on
        # record in stderr)
        calib_tflops = calibration_probe(_jnp, _lax, jax, np)
        log(f"session calibration: {calib_tflops:.1f} TFLOP/s "
            f"(record {RECORD_CALIB_TFLOPS})")

    proc = None  # built once below, after the input layout is decided

    rng = np.random.default_rng(0)
    c, m, n = cfg.sector_shape
    if args.in_dtype is None:
        args.in_dtype = "i16" if args.method == "pallas" else "f32"
    if args.in_dtype == "wire" and args.method != "pallas":
        sys.exit("--in-dtype wire applies to the pallas method only")
    host_wire = None     # set below for --in-dtype wire (raw wire staging)
    in_dtype = np.float32 if args.in_dtype == "f32" else np.int16
    # Planar IQ [D, B, C, 2, m, n] — D distinct device-staged batches so
    # every scanned step reads fresh data (no loop-invariant computation
    # for XLA to hoist, no perturbation artifact).  int16 is the
    # wire-native 14-bit-ADC feed (io/codec.decode_iq_i16).
    host_iq = rng.integers(
        -8192, 8192, (args.distinct, args.batch, c, 2, m, n),
        dtype=np.int16,
    ).astype(in_dtype, copy=False)

    def fetch(out):
        """Force true completion: block_until_ready is not a reliable sync
        on all runtimes (axon tunnel); a D2H fetch of the [B, m/2] products
        is (and mirrors the reference's 4 KB result copy-back)."""
        return np.asarray(out[0]), np.asarray(out[1])

    # --- H2D transfer rate (secondary metric) ---
    t0 = time.perf_counter()
    dev_iq = jax.block_until_ready(jax.device_put(host_iq, dev))
    t_h2d = time.perf_counter() - t0
    h2d_gbps = host_iq.nbytes / t_h2d / 1e9

    # --- steady-state compute: one dispatch runs `repeats` passes over the
    # D distinct batches (reference 'nocin' methodology: device span, input
    # staged).  The carry threads through every step, so no pass can be
    # hoisted or elided; one tiny D2H fetch ends the span, amortising
    # dispatch round-trip latency out of the kernel measurement. ---
    import jax.numpy as jnp
    from jax import lax

    steps = args.distinct * args.repeats

    xpair_eff = args.xpair or None   # effective grouping; resolved below
    if args.method == "pallas":
        # Elision-proof loop for the fused kernel: Pallas inputs cannot
        # alias a scanned slice (XLA would copy the whole batch in front of
        # the kernel), so instead each step passes a *scalar offset* into
        # the staged [D*B*C, 2, m, n] buffer via scalar prefetch — every
        # step reads a different device-resident slab with zero copies and
        # nothing is loop-invariant, so XLA cannot hoist the compute.
        from wrp_tpu.constants import PipelineConstants
        from wrp_tpu.ops.pallas import fullchain as FC
        from wrp_tpu.pipeline import stage09_10_products

        consts = PipelineConstants.build(cfg)
        # under --sharded the kernel constants must stay uncommitted
        # (replicated by jit over the mesh), not pinned to one device
        put = jnp.asarray if args.sharded else (
            lambda x: jax.device_put(x, dev))
        wd_d = put(consts.wd)
        ph_d = put(consts.clip_phasors)
        gain_d = put(consts.gain)
        bcn = args.batch * c
        interp = FC.use_interpret()
        radix = FC.radix_for(m)
        if radix > 1:
            # validate the --xpair request BEFORE the pair_lanes repack
            # and the multi-GB restage below: a bad batch/channel count
            # must exit with the friendly message, not an AssertionError
            # after minutes of dead H2D work over the tunnel.
            pair_arg = args.xpair or None
            if pair_arg is None and FC.pair_group(None)[1]:
                # a "pre" module default means decode-time grouping; the
                # bench default path stages the FLAT layout, so degrade
                # to the same group's in-kernel concat instead of
                # misreading flat input as pre-grouped
                pair_arg = FC.pair_group(None)[0]
            # guards key on the RESOLVED configuration (pair_arg=None
            # still means the X_PAIR module default), so a flipped
            # default gets the same friendly pre-staging exits as an
            # explicit flag
            g_pair, pre_pair = FC.pair_group(pair_arg)
            xpair_eff = FC.pair_name(pair_arg)
            if g_pair > 1 and bcn % g_pair:
                sys.exit(f"xpair={xpair_eff} needs batch*channels "
                         f"divisible by {g_pair}; got {bcn}")
            if g_pair > 1 and args.sharded and (
                    (args.batch // args.sharded) * c) % g_pair:
                sys.exit(f"xpair={xpair_eff} needs a PER-DEVICE "
                         f"batch*channels divisible by {g_pair} under "
                         "--sharded; got "
                         f"{(args.batch // args.sharded) * c}")
            if pre_pair and args.sharded:
                sys.exit("--xpair pre/pre4 stages a repacked layout the "
                         "sharded path does not build; use --xpair "
                         "concat/quad under --sharded")

            if args.in_dtype == "wire":
                if args.sharded:
                    sys.exit("--in-dtype wire does not support --sharded")
                if pre_pair:
                    sys.exit("--in-dtype wire emits the flat planar "
                             "layout on-chip; use --xpair concat/quad")
                if g_pair > 1 and args.wire_decode == "fused":
                    sys.exit("--wire-decode fused already runs all "
                             "channels in one ch*n-lane grid step; "
                             "--xpair applies to the xla decode path")
                if args.distinct < 2:
                    # the kernel is salted per step, but the DECODE's
                    # only per-step variation is the slab offset: with
                    # one slab it is loop-invariant and XLA may hoist it
                    # out of the timed span — the exact cost this mode
                    # exists to measure (DESIGN.md §4 methodology)
                    sys.exit("--in-dtype wire needs --distinct >= 2 (a "
                             "single staged slab makes the on-chip "
                             "decode loop-invariant and hoistable)")
                # encode the SAME samples into the reference wire layout
                # (interleaved BE int16, natural row order — the on-chip
                # decode applies the radix reorder), BEFORE the host-side
                # radix permute below rearranges host_iq
                host_wire = (host_iq.reshape(
                    args.distinct * args.batch, c, 2, m, n)
                    .transpose(0, 3, 4, 1, 2)
                    .astype(">i2", order="C")    # order-K would keep the
                    .view(np.uint8)              # transposed strides and
                    .reshape(args.distinct * args.batch, -1))  # break view
                if args.wire_order == "radix":
                    # production ingest order: rows pre-permuted on the
                    # host (free at reassembly time), device take skipped
                    rb = n * cfg.bytes_per_sample
                    host_wire = np.ascontiguousarray(
                        host_wire.reshape(-1, m, rb)
                        [:, FC.radix_row_order(m, radix), :]).reshape(
                            args.distinct * args.batch, -1)
                # device-side row gather: none when the rows arrive
                # pre-permuted
                wire_dev_radix = 1 if args.wire_order == "radix" else radix

            # radix kernel wants rows in radix order: the decode step
            # produces this for free (different row-offset formula), so
            # staging pre-permuted input matches the real ingest path.
            a_np, fac = FC.radix_plan_host(consts, radix,
                                           layout=args.a_layout)
            a_radix = put(a_np)
            host_iq = np.ascontiguousarray(
                host_iq[:, :, :, :, FC.radix_row_order(m, radix), :])
            if not args.sharded:
                # restage: dev_iq above was put in natural row order, and
                # the secondary with-h2d metric must not double-permute.
                # (--sharded restages with its mesh sharding below; the
                # single-device restage would be dead multi-GB H2D work.)
                # --xpair pre/pre4 stages the lane-grouped layout
                # directly (same bytes; a grouping decoder emits it for
                # free).
                if host_wire is not None:
                    # raw wire, decode on-chip.  The fused kernel takes
                    # the SAME bytes viewed as little-endian i32 words
                    # (free on the host) — no device-side bitcast either.
                    host_stage = (host_wire.view("<i4")
                                  if args.wire_decode == "fused"
                                  else host_wire)
                elif pre_pair:
                    host_stage = FC.pair_lanes(host_iq.reshape(
                        args.distinct * bcn, 2, m, n), g=g_pair)
                else:
                    host_stage = host_iq
                dev_iq = jax.block_until_ready(
                    jax.device_put(host_stage, dev))
            proc = SectorProcessor(cfg, method="pallas", device=dev,
                                   layout="radix")

            kcat2 = args.a_layout == "kcat2"

            def power_at(x_all, off, salt, bc=bcn):
                # bc must match the caller's slab size: the global bcn
                # for the single-device loop, the per-device bcn_loc
                # under --sharded (a global bc there would issue an
                # N-times-too-wide grid reading past the local buffer)
                return FC.fused_chain_power_radix(
                    x_all, a_radix, fac, wd_d, ph_d,
                    interpret=interp, offset=off, bc=bc, salt=salt,
                    kcat2=kcat2, clip=args.clip, xsplit=args.xsplit,
                    pair=pair_arg)
        else:
            if args.in_dtype == "wire":
                sys.exit("--in-dtype wire needs the radix kernel; "
                         f"geometry m={m} uses the direct kernel")
            if args.xpair or args.xsplit or args.a_layout:
                # the direct fallback kernel (non-radix geometries) has
                # none of these knobs; recording them in the JSON would
                # attribute the measured rate to configurations that
                # never executed
                sys.exit("--xpair/--xsplit/--a-layout apply to the radix "
                         f"kernel only; geometry m={m} uses the direct "
                         "kernel")
            a_split = put(FC.split_operator_host(consts.op_a_half))

            def power_at(x_all, off, salt, bc=bcn):
                del salt  # tiny fallback geometries: offsets suffice
                return FC.fused_chain_power_at(
                    x_all, off, bc, a_split, wd_d, ph_d, interpret=interp,
                    clip=args.clip)

        @jax.jit
        def timed_passes(iq_all):
            # pre-paired staging is already the kernel's flat layout
            x_all = (iq_all if iq_all.ndim == 4
                     else iq_all.reshape(args.distinct * bcn, 2, m, n))

            def one_step(i, carry):
                off = (i % args.distinct) * bcn
                # per-step salt: no two steps compute the same function of
                # the staged input, so nothing can be reused across steps
                pw = power_at(x_all, off, i).reshape(args.batch, c, -1)
                zdb, zdr = stage09_10_products(pw[:, 0], pw[:, 1], gain_d)
                return carry + jnp.sum(zdb, axis=0) + jnp.sum(
                    jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0)

            return lax.fori_loop(0, steps, one_step,
                                 jnp.zeros(cfg.num_output_bins))

        if host_wire is not None and args.wire_decode == "fused":
            # decode folded INTO the kernel (fused_chain_power_wire): each
            # step slices its batch of staged i32 wire WORDS, applies the
            # contiguous radix row gather (wire_words_i32 — the only
            # XLA-side data movement left) and runs the wire-fused kernel
            # — the whole per-sector device cost of a host that ships
            # wire bytes with ZERO decode cores
            from wrp_tpu.ops.device_codec import wire_words_i32

            wdil_np, phil_np = FC.wire_lane_consts(consts, c)
            wdil_d, phil_d = put(wdil_np), put(phil_np)

            @jax.jit
            def timed_passes(wire_all):
                def one_step(i, carry):
                    offb = (i % args.distinct) * args.batch
                    w = lax.dynamic_slice_in_dim(wire_all, offb,
                                                 args.batch, 0)
                    w32 = wire_words_i32(w, cfg, radix=wire_dev_radix)
                    pw = FC.fused_chain_power_wire(
                        w32, a_radix, fac, wdil_d, phil_d, c,
                        interpret=interp, offset=jnp.int32(0),
                        bs=args.batch, salt=i, kcat2=kcat2,
                        clip=args.clip, xsplit=args.xsplit)
                    zdb, zdr = stage09_10_products(pw[:, 0], pw[:, 1],
                                                   gain_d)
                    return carry + jnp.sum(zdb, axis=0) + jnp.sum(
                        jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0)

                return lax.fori_loop(0, steps, one_step,
                                     jnp.zeros(cfg.num_output_bins))
        elif host_wire is not None:
            # standalone on-chip decode inside the timed span: each step
            # slices its batch of RAW wire bytes, decodes (byteswap +
            # deinterleave + radix reorder, ops/device_codec) and runs
            # the planar kernel — the r4 formulation, kept as the A/B
            # reference for the fused decode
            from wrp_tpu.ops.device_codec import decode_wire_i16

            @jax.jit
            def timed_passes(wire_all):
                def one_step(i, carry):
                    offb = (i % args.distinct) * args.batch
                    w = lax.dynamic_slice_in_dim(wire_all, offb,
                                                 args.batch, 0)
                    x = decode_wire_i16(
                        w, cfg, radix=wire_dev_radix).reshape(
                            bcn, 2, m, n)
                    pw = power_at(x, jnp.int32(0), i).reshape(
                        args.batch, c, -1)
                    zdb, zdr = stage09_10_products(pw[:, 0], pw[:, 1],
                                                   gain_d)
                    return carry + jnp.sum(zdb, axis=0) + jnp.sum(
                        jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0)

                return lax.fori_loop(0, steps, one_step,
                                     jnp.zeros(cfg.num_output_bins))

        if args.sharded:
            # The flagship kernel under shard_map, COMPILED (VERDICT r2
            # item 1): each device runs the full salted loop on its local
            # slice of the staged slabs — zero collectives, and the
            # pallas_call (incl. scalar-prefetch offsets) lowers through
            # Mosaic inside the shard_map body, the configuration a pod
            # would run (parallel/sharded._build_pallas_sharded).
            from jax.sharding import NamedSharding, PartitionSpec as P
            from wrp_tpu.parallel.mesh import make_mesh, DATA_AXIS, SEQ_AXIS

            if args.batch % args.sharded:
                sys.exit(f"--batch {args.batch} must divide by "
                         f"--sharded {args.sharded}")
            mesh_b = make_mesh(data=args.sharded, seq=1)
            baxes = (DATA_AXIS, SEQ_AXIS)
            bcn_loc = (args.batch // args.sharded) * c

            def _local_loop(iq_loc):
                # iq_loc [D, B/N, C, 2, m, n]: this device's slice
                x_all = iq_loc.reshape(args.distinct * bcn_loc, 2, m, n)

                def one_step(i, carry):
                    off = (i % args.distinct) * bcn_loc
                    pw = power_at(x_all, off, i,
                                  bc=bcn_loc).reshape(-1, c, m // 2)
                    zdb, zdr = stage09_10_products(pw[:, 0], pw[:, 1],
                                                   gain_d)
                    return carry + jnp.sum(zdb, axis=0) + jnp.sum(
                        jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0)

                acc = lax.fori_loop(0, steps, one_step,
                                    jnp.zeros(cfg.num_output_bins))
                return acc[None]

            timed_passes = jax.jit(jax.shard_map(
                _local_loop, mesh=mesh_b,
                in_specs=P(None, baxes, None, None, None, None),
                out_specs=P(baxes, None), check_vma=False))
            dev_iq = jax.block_until_ready(jax.device_put(
                host_iq, NamedSharding(
                    mesh_b, P(None, baxes, None, None, None, None))))
    if proc is None:
        proc = SectorProcessor(cfg, method=args.method,
                               matched_filter=args.matched_filter,
                               device=dev)

    if args.method != "pallas":
        # Elision-proofing for the XLA-compiled methods (the ladder): the
        # scan over D distinct slabs kills within-repeat reuse, but the
        # repeats themselves would otherwise recompute the SAME function of
        # the same staged data — XLA may legally hoist the scan out of the
        # fori loop.  So every repeat adds a per-repeat SALT the chain
        # cancels: the staged vector is 1/wd[j] (inverse pulse window), so
        # after the stage-01 window multiply the perturbation is constant
        # along the pulse axis and the chain's mean subtraction (explicit
        # in fft/parseval/radix, folded into op_b for mxu) annihilates it —
        # exactly in exact arithmetic, to fp rounding in practice (checked
        # below against the unsalted output before the timed span).
        from wrp_tpu.constants import hamming_factors

        _, wd_h, _ = hamming_factors(cfg)
        inv_wd = jax.device_put(
            jnp.asarray((1.0 / wd_h)[None, None, None, :], jnp.float32), dev)

        @jax.jit
        def timed_passes(iq_all):
            def one_repeat(r, carry):
                salt = (jnp.float32(8.0) * (r % 127 + 1)) * inv_wd

                def one_batch(c2, iq_batch):
                    zdb, zdr = proc(iq_batch + salt)
                    # consume every output element so nothing can be DCE'd
                    return c2 + jnp.sum(zdb, axis=0) + jnp.sum(
                        jnp.where(jnp.isfinite(zdr), zdr, 0.0), axis=0), None

                return lax.scan(one_batch, carry, iq_all)[0]

            return lax.fori_loop(0, args.repeats,
                                 one_repeat, jnp.zeros(cfg.num_output_bins))

    t0 = time.perf_counter()
    np.asarray(timed_passes(dev_iq))
    t_compile = time.perf_counter() - t0

    # --- parity self-check (aborts the bench on failure): the salted
    # harness must compute the right answer.  (a) the harness formulation
    # at salt=0 must reproduce the unsalted SectorProcessor products;
    # (b) a salted step must sit within the documented cancellation
    # residual (DESIGN.md section 4: ~1e-5 relative).  Without this the
    # timed kernel was only ever checked for finiteness.  One metric
    # everywhere: the reference's own relative-L2 (error.cpp via
    # oracle.relative_l2), not a hand-rolled copy that could drift. ---
    from wrp_tpu.oracle import relative_l2 as _rel

    sharded_parity = {}
    if args.method == "pallas" and args.sharded:
        # parity of the PRODUCTION sharded entries on this mesh: the
        # pallas path (natural-order input, on-device radix permute) and
        # the mxu/transpose path (all_to_all degenerate at seq=1 but the
        # shard_map lowering still compiles), both vs the unsharded
        # flagship processor.
        from wrp_tpu.parallel.sharded import (build_sharded_processor,
                                              shard_batch)

        nat = rng.integers(-8192, 8192,
                           (args.batch, c, 2, m, n)).astype(np.float32)
        nat_p = nat
        if args.method == "pallas" and FC.radix_for(m) > 1:
            nat_p = nat[:, :, :, FC.radix_row_order(m, FC.radix_for(m)), :]
        zdb_u = np.asarray(proc(nat_p)[0])
        for meth in ("pallas", "mxu"):
            sh_step, sh_in = build_sharded_processor(cfg, mesh_b,
                                                     method=meth)
            zdb_s = np.asarray(sh_step(shard_batch(nat, mesh_b, sh_in))[0])
            sharded_parity[meth] = _rel(zdb_u, zdb_s)
        # third sharded formulation: pulse sharding + ppermute halo
        from wrp_tpu.parallel.halo import build_halo_processor

        halo_step, halo_in = build_halo_processor(cfg, mesh_b)
        zdb_h = np.asarray(halo_step(shard_batch(nat, mesh_b, halo_in))[0])
        sharded_parity["halo"] = _rel(zdb_u, zdb_h)
        err0 = sharded_parity["pallas"]
        err1 = max(sharded_parity["mxu"], sharded_parity["halo"])
        thr0, thr1 = 1e-4, 1e-3
    elif args.method == "pallas":
        # host_iq is radix-permuted by now, matching proc's layout; in
        # wire mode the harness instead decodes slab 0 of the staged raw
        # bytes ON-CHIP (same samples, natural order + on-chip reorder)
        zdb_ref = np.asarray(proc(jax.device_put(host_iq[0], dev))[0])
        if host_wire is not None and args.wire_decode == "fused":
            from wrp_tpu.ops.device_codec import wire_words_i32

            def _harness_zdb(salt):
                w32 = wire_words_i32(dev_iq[:args.batch], cfg,
                                     radix=wire_dev_radix)
                pw = FC.fused_chain_power_wire(
                    w32, a_radix, fac, wdil_d, phil_d, c,
                    interpret=interp, offset=jnp.int32(0), bs=args.batch,
                    salt=jnp.int32(salt), kcat2=kcat2, clip=args.clip,
                    xsplit=args.xsplit)
                return np.asarray(
                    stage09_10_products(pw[:, 0], pw[:, 1], gain_d)[0])
        elif host_wire is not None:
            from wrp_tpu.ops.device_codec import decode_wire_i16

            def _harness_zdb(salt):
                x = decode_wire_i16(dev_iq[:args.batch], cfg,
                                    radix=wire_dev_radix).reshape(
                                        bcn, 2, m, n)
                pw = power_at(x, jnp.int32(0), salt).reshape(
                    args.batch, c, -1)
                return np.asarray(
                    stage09_10_products(pw[:, 0], pw[:, 1], gain_d)[0])
        else:
            x_flat = (dev_iq if dev_iq.ndim == 4
                      else dev_iq.reshape(args.distinct * bcn, 2, m, n))

            def _harness_zdb(salt):
                pw = power_at(x_flat, 0, salt).reshape(args.batch, c, -1)
                return np.asarray(
                    stage09_10_products(pw[:, 0], pw[:, 1], gain_d)[0])

        err0 = _rel(zdb_ref, _harness_zdb(0))
        err1 = _rel(zdb_ref, _harness_zdb(7))
        thr0, thr1 = 1e-4, 1e-3
    else:
        zdb_ref = np.asarray(proc(jax.device_put(host_iq[0], dev))[0])
        err0 = 0.0   # the harness calls proc itself; only the salt varies
        salted = proc(jax.device_put(host_iq[0], dev)
                      + jnp.float32(8.0) * inv_wd)
        err1 = _rel(zdb_ref, np.asarray(salted[0]))
        thr0, thr1 = 1e-4, 1e-3
    if not (err0 < thr0 and err1 < thr1):
        print(json.dumps({"error": "salted-harness parity check failed",
                          "salt0_rel_l2": err0, "salted_rel_l2": err1}))
        sys.exit(1)
    log(f"parity self-check: salt0 rel {err0:.2e}, salted rel {err1:.2e}")

    if args.profile:
        with jax.profiler.trace(args.profile):
            np.asarray(timed_passes(dev_iq))
    # best-of-3: the dev chip is shared/tunneled and step timings vary up
    # to ~25% run-to-run; the minimum is the least-interference estimate
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = np.asarray(timed_passes(dev_iq))
        runs.append(time.perf_counter() - t0)
    elapsed = min(runs)
    sectors_s = steps * args.batch / elapsed
    if acc.ndim == 2:      # --sharded returns one accumulator per device
        acc = acc.sum(axis=0)
    assert np.isfinite(acc[1:]).all(), "non-finite zdb accumulator"

    # --- streaming including fresh H2D (tunnel-dependent, secondary) ---
    if host_wire is not None:
        # in wire mode this metric must go through the WIRE path (raw
        # bytes + on-chip decode), not the host-decoded planar processor
        # — otherwise the row labeled in_dtype=wire reports a streaming
        # rate that excludes the decode cost the mode exists to measure
        proc_stream = SectorProcessor(cfg, method="pallas", device=dev,
                                      layout="radix", wire_input=True,
                                      wire_decode=args.wire_decode,
                                      wire_order=args.wire_order)
        host_wire_h2d = (host_wire.view("<i4")
                         if proc_stream.wire_dtype == np.int32
                         else host_wire)     # same bytes either way
        stage0 = host_wire_h2d[:args.batch]
    else:
        proc_stream = proc
        stage0 = host_iq[0]
    fetch(proc_stream(jax.device_put(stage0, dev)))  # compile outside span
    t0 = time.perf_counter()
    out = fetch(proc_stream(jax.device_put(stage0, dev)))
    elapsed_h2d = time.perf_counter() - t0
    sectors_s_h2d = args.batch / elapsed_h2d

    # Overlapped variant (VERDICT r3 item 8): the production-relevant
    # form.  The executor never stages a whole slab then computes — it
    # enqueues slab k+1's H2D while slab k computes (two-deep pipeline,
    # runtime/executor.py); this loop mirrors that: async device_put of
    # the next slab between dispatch and fetch, slab k-1's D2H fetched
    # last.  On the dev tunnel both forms are link-bound; on a PCIe
    # host the pipelined number is the achievable streaming rate.
    if host_wire is not None:
        slabs = [host_wire_h2d[k * args.batch:(k + 1) * args.batch]
                 for k in range(args.distinct)]
    else:
        slabs = list(host_iq)
    npipe = max(4, 2 * len(slabs))
    d_cur = jax.device_put(slabs[0], dev)   # slab 0 staged outside the
    prev = None                             # span, as in steady state
    t0 = time.perf_counter()
    for k in range(npipe):
        out_k = proc_stream(d_cur)          # async dispatch
        # unconditional: the span must contain exactly npipe transfers
        # for its npipe computes, or a link-bound reading overstates the
        # steady-state rate by npipe/(npipe-1) (the last put still
        # overlaps compute k like every other)
        d_cur = jax.device_put(slabs[(k + 1) % len(slabs)], dev)
        if prev is not None:
            fetch(prev)                     # D2H of batch k-1
        prev = out_k
    fetch(prev)
    # the last device_put is async and the final fetch only requires
    # compute npipe-1 (which needs only put npipe-1): without an
    # explicit barrier the span could close while the npipe-th transfer
    # is still in flight, leaving a link-bound reading overstated by up
    # to npipe/(npipe-1) after all (advisor r4)
    jax.block_until_ready(d_cur)
    elapsed_pipe = time.perf_counter() - t0
    sectors_s_h2d_pipe = npipe * args.batch / elapsed_pipe

    result = {
        "metric": f"sectors_per_second_{cfg.num_channels}ch",
        "value": round(sectors_s, 2),
        "unit": "sectors/s",
        "vs_baseline": round(sectors_s / baseline, 2),
        "pulses_per_second": round(sectors_s * cfg.num_pulses, 0),
        "samples_per_second": round(
            sectors_s * cfg.num_channels * cfg.m * cfg.n, 0),
        "sectors_per_second_with_h2d": round(sectors_s_h2d, 2),
        "sectors_per_second_with_h2d_pipelined": round(
            sectors_s_h2d_pipe, 2),
        "ms_per_sector": round(1e3 / sectors_s, 4),
        "h2d_gbps": round(h2d_gbps, 2),
        "calib_tflops": (round(calib_tflops, 1)
                         if calib_tflops is not None else None),
        "calib_record_tflops": (RECORD_CALIB_TFLOPS
                                if calib_tflops is not None else None),
        "value_normalized": (round(
            sectors_s * RECORD_CALIB_TFLOPS / calib_tflops, 2)
            if calib_tflops is not None else None),
        "compile_s": round(t_compile, 1),
        "timed_runs_s": [round(r, 3) for r in runs],
        "batch": args.batch,
        "steps": steps,
        "method": args.method,
        "sharded_devices": args.sharded or None,
        "sharded_parity_rel_l2": sharded_parity or None,
        "parity_rel_l2": [round(err0, 9), round(err1, 9)],
        "in_dtype": args.in_dtype,
        "wire_decode": (args.wire_decode if args.in_dtype == "wire"
                        else None),
        "wire_order": (args.wire_order if args.in_dtype == "wire"
                       else None),
        "a_layout": args.a_layout,
        "clip": args.clip,
        "xsplit": args.xsplit,
        # the EFFECTIVE grouping (module default resolved, pre degraded
        # to concat for flat staging) — the configuration that actually
        # executed, not merely the flag
        "xpair": xpair_eff,
        "matched_filter": args.matched_filter,
        "device": str(dev),
        "geometry": f"{cfg.num_channels}x{cfg.m}x{cfg.n}",
        "baseline": {"3ch": BASELINE_3CH, "2ch_nocin": BASELINE_2CH,
                     "hw": "GeForce 930M (prof/g7.prof, nocin-sep.prof)"},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
