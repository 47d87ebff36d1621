"""Pallas fused stage-2 kernel vs the jnp path (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU — exercised by bench/verify)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrp_tpu import oracle, pipeline
from wrp_tpu.config import DEFAULT_CONFIG
from wrp_tpu.constants import PipelineConstants
from wrp_tpu.ops.pallas.postprocess import fused_stage2


@pytest.fixture(scope="module")
def setup(rng):
    consts = PipelineConstants.build(DEFAULT_CONFIG)
    yr = (rng.standard_normal((3, 512, 512)) * 1e-3).astype(np.float32)
    yi = (rng.standard_normal((3, 512, 512)) * 1e-3).astype(np.float32)
    br = np.ascontiguousarray(consts.op_b.real)
    bi = np.ascontiguousarray(consts.op_b.imag)
    return consts, yr, yi, br, bi


def _xla_reference(yr, yi, br, bi, taps):
    zr, zi = pipeline._rmatmul(jnp.asarray(yr), jnp.asarray(yi),
                               jnp.asarray(br), jnp.asarray(bi),
                               jax.lax.Precision.HIGHEST)
    p = zr * zr + zi * zi
    return np.asarray(
        pipeline.stage08_pulse_sum(pipeline.matched_filter_direct(p, taps)))


def test_fused_stage2_matches_xla(setup):
    consts, yr, yi, br, bi = setup
    got = np.asarray(fused_stage2(jnp.asarray(yr), jnp.asarray(yi),
                                  jnp.asarray(br), jnp.asarray(bi),
                                  consts.ma_taps, interpret=True))
    want = _xla_reference(yr, yi, br, bi, consts.ma_taps)
    assert got.shape == (3, 512)
    assert oracle.relative_l2(want, got) < 1e-5


def test_fused_stage2_row_blocks(setup):
    """Different row blockings must agree exactly with each other."""
    consts, yr, yi, br, bi = setup
    outs = [
        np.asarray(fused_stage2(jnp.asarray(yr), jnp.asarray(yi),
                                jnp.asarray(br), jnp.asarray(bi),
                                consts.ma_taps, row_block=rb, interpret=True))
        for rb in (128, 256, 512)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_fused_stage2_rejects_bad_blocking(setup):
    consts, yr, yi, br, bi = setup
    with pytest.raises(AssertionError):
        fused_stage2(jnp.asarray(yr), jnp.asarray(yi), jnp.asarray(br),
                     jnp.asarray(bi), consts.ma_taps, row_block=100,
                     interpret=True)


def test_fused_chain_method_vs_oracle():
    """method="pallas" (fused single-kernel chain, interpret mode on CPU)
    matches the fp64 oracle's final products."""
    import jax.numpy as jnp

    from wrp_tpu import oracle, pipeline
    from wrp_tpu.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=7)
    stages = oracle.all_stages(iq, cfg)
    proc = pipeline.SectorProcessor(cfg, method="pallas")
    zdb, zdr = proc(jnp.asarray(iq[None], jnp.complex64))
    zdb, zdr = np.asarray(zdb[0]), np.asarray(zdr[0])
    assert oracle.relative_l2(stages["09zdb"], zdb) < 2e-4
    assert oracle.relative_l2(stages["10zdr"], zdr) < 2e-4


@pytest.mark.parametrize("layout", ["split", "kcat", "kcat2", "kpad"])
def test_radix_kernel_layouts_vs_oracle(layout):
    """All A-operand layouts of the radix kernel (split = six [M, M]
    planes with three MXU passes per Gauss product; kcat = one K=3M dot
    with in-MXU accumulation; kcat2 = two dots with a 2M-row stack and a
    free-slice al@xh pass; kpad = kcat with K zero-padded to 4M) must
    match the fp64 oracle.  The default layout is whichever measured
    faster on hardware (fullchain.A_LAYOUT); this pins the non-default
    ones so an A/B flip can't rot."""
    import jax.numpy as jnp

    from wrp_tpu.config import DEFAULT_CONFIG
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = DEFAULT_CONFIG
    consts = PipelineConstants.build(cfg)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=13)
    pow64 = oracle.channel_power(iq, cfg)

    radix = FC.radix_for(cfg.m)
    assert radix == 8  # default geometry exercises the radix-8 butterflies
    a_np, fac = FC.radix_plan_host(consts, radix, layout=layout)
    order = FC.radix_row_order(cfg.m, radix)
    planar = np.stack([iq.real, iq.imag], 1).astype(np.float32)
    x = planar[:, :, order, :]          # rows in radix order, [C, 2, m, n]
    got = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(x), jnp.asarray(a_np), fac,
        jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
        interpret=True, kcat2=(layout == "kcat2")))
    assert got.shape == (cfg.num_channels, cfg.m // 2)
    for ch in range(cfg.num_channels):
        assert oracle.relative_l2(pow64[ch], got[ch]) < 1e-5, (layout, ch)


@pytest.mark.parametrize("m,n", [(256, 128), (512, 64)])
def test_radix_kernel_other_geometries_vs_oracle(m, n):
    """The radix kernel must stay oracle-correct at geometries between
    the tiny test size and the production 1024x512 (different M=m/8
    sub-matmul shapes exercise the chunking/combine paths)."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=m, n=n)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(m)
    assert radix == 8
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=m)
    pow64 = oracle.channel_power(iq, cfg)
    a_np, fac = FC.radix_plan_host(consts, radix)
    order = FC.radix_row_order(m, radix)
    planar = np.stack([iq.real, iq.imag], 1).astype(np.float32)
    got = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(planar[:, :, order, :]), jnp.asarray(a_np), fac,
        jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
        interpret=True))
    for ch in range(cfg.num_channels):
        assert oracle.relative_l2(pow64[ch], got[ch]) < 1e-5, (m, n, ch)


def test_radix_kernel_layouts_agree():
    """split and kcat compute the same bf16-split arithmetic: outputs on
    identical input must agree to float-add reassociation tolerance."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=128, n=64)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    rng = np.random.default_rng(5)
    x = rng.integers(-8192, 8192, (2, 2, cfg.m, cfg.n)).astype(np.float32)
    outs = {}
    for layout in ("split", "kcat", "kcat2", "kpad"):
        a_np, fac = FC.radix_plan_host(consts, radix, layout=layout)
        outs[layout] = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x), jnp.asarray(a_np), fac,
            jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
            interpret=True, kcat2=(layout == "kcat2")))
    assert oracle.relative_l2(outs["split"], outs["kcat"]) < 1e-6
    assert oracle.relative_l2(outs["split"], outs["kcat2"]) < 1e-6
    # the zero K-block contributes exactly 0: kpad == kcat bit-for-bit
    assert np.array_equal(outs["kpad"], outs["kcat"])


@pytest.mark.parametrize("clip", ["mxu3", "vpu"])
def test_clip_modes_vs_oracle_adversarial(clip):
    """Both clip-bin formulations must survive the adversarial case that
    exposed the round-3 bf16-dot bug: Doppler energy concentrated in the
    CLIPPED bins makes the Parseval subtraction n*sum|q|^2 - |clip|^2
    catastrophically cancel, so the subtrahend needs full fp32 accuracy
    (tools/hw_parity.py carries the compiled-path twin of this test)."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.constants import hamming_factors
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=128, n=64)
    consts = PipelineConstants.build(cfg)
    m, n = cfg.m, cfg.n
    _, wd, _ = hamming_factors(cfg)
    rng = np.random.default_rng(3)
    j = np.arange(n)
    k = n // 2 - 2                      # pre-shift clipped bin
    ph0 = rng.uniform(0, 2 * np.pi, (cfg.num_channels, m, 1))
    base = np.cos(2 * np.pi * k * j / n + ph0) / wd[None, None, :]
    adv = (6000 * base / np.abs(base).max()
           + 1j * rng.integers(-50, 50, (cfg.num_channels, m, n)))
    adv = (np.round(adv.real) + 1j * np.round(adv.imag)).astype(np.complex64)
    pow64 = oracle.channel_power(adv, cfg)

    radix = FC.radix_for(m)
    a_np, fac = FC.radix_plan_host(consts, radix)
    order = FC.radix_row_order(m, radix)
    planar = np.stack([adv.real, adv.imag], 1).astype(np.float32)
    got = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(planar[:, :, order, :]), jnp.asarray(a_np), fac,
        jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
        interpret=True, clip=clip))
    assert oracle.relative_l2(pow64, got) < 2e-5, clip
    # the direct kernel takes the same parameter
    a_split = jnp.asarray(FC.split_operator_host(consts.op_a_half))
    got_d = np.asarray(FC.fused_chain_power(
        jnp.asarray(planar.reshape(-1, 2, m, n)), a_split,
        jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
        interpret=True, clip=clip)).reshape(cfg.num_channels, -1)
    assert oracle.relative_l2(pow64, got_d) < 2e-5, clip


def test_int_xsplit_exactness():
    """The integer-mask split must be EXACT over the whole operating
    range: v == f32(hi_bf16) + f32(lo_bf16) for every int16 the kernel
    can see (14-bit ADC samples plus bench salts for the 6-bit split;
    the full 15-bit sum range for the 7-bit split)."""
    from wrp_tpu.ops.pallas import fullchain as FC

    for lo_bits, lim in ((6, 1 << 13), (7, 1 << 14)):
        v = np.arange(-lim, lim, dtype=np.int32 if lim > (1 << 13)
                      else np.int16)
        hi, lo = FC._split_int(jnp.asarray(v), lo_bits)
        back = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
        np.testing.assert_array_equal(back, v.astype(np.float32))


def test_radix_kernel_int_xsplit_vs_oracle():
    """xsplit="int" (integer-mask hi/lo split, no f32 round-trip) on the
    wire-native int16 feed must match the fp64 oracle; its dropped al@xl
    term is one bit wider than the f32 split's, so the bound is the same
    class, and the two splits must agree closely with each other."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=29)  # integer-valued
    pow64 = oracle.channel_power(iq, cfg)
    a_np, fac = FC.radix_plan_host(consts, radix)
    order = FC.radix_row_order(cfg.m, radix)
    x_i16 = np.stack([iq.real, iq.imag], 1).astype(np.int16)[:, :, order, :]
    args = (jnp.asarray(a_np), fac, jnp.asarray(consts.wd),
            jnp.asarray(consts.clip_phasors))
    got_int = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(x_i16), *args, interpret=True, xsplit="int"))
    got_f32 = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(x_i16), *args, interpret=True, xsplit="f32"))
    assert oracle.relative_l2(pow64, got_int) < 2e-5
    assert oracle.relative_l2(got_f32, got_int) < 2e-5


def test_int_xsplit_rejects_float_input():
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=128, n=64)
    consts = PipelineConstants.build(cfg)
    a_np, fac = FC.radix_plan_host(consts, FC.radix_for(cfg.m))
    x = np.zeros((1, 2, cfg.m, cfg.n), np.float32)
    with pytest.raises(ValueError, match="int16 input"):
        FC.fused_chain_power_radix(
            jnp.asarray(x), jnp.asarray(a_np), fac,
            jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
            interpret=True, xsplit="int")


def test_radix_kernel_pair_matches_unpaired_exactly():
    """pair=True (two channel-sectors lane-concatenated into N=2n dots,
    fullchain.X_PAIR) computes column-for-column the SAME arithmetic as
    the unpaired kernel — every dot column, split, combine butterfly, and
    epilogue slice reduces in the same order — so the outputs must be
    bit-identical, and oracle-correct.  Covers both A layouts, both
    x-splits, and the offset entry (even offsets only)."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=31)
    pow64 = oracle.channel_power(iq, cfg)
    order = FC.radix_row_order(cfg.m, radix)
    planar = np.stack([iq.real, iq.imag], 1)[:, :, order, :]
    # 4 channel-sectors (even, as pair requires): the 3 channels + a copy
    x4_f32 = np.concatenate([planar, planar[:1]]).astype(np.float32)
    x4_i16 = x4_f32.astype(np.int16)
    wd = jnp.asarray(consts.wd)
    ph = jnp.asarray(consts.clip_phasors)
    for layout in ("kcat", "split"):
        a_np, fac = FC.radix_plan_host(consts, radix, layout=layout)
        args = (jnp.asarray(a_np), fac, wd, ph)
        for x4, xsplit in ((x4_f32, "f32"), (x4_i16, "int")):
            base = np.asarray(FC.fused_chain_power_radix(
                jnp.asarray(x4), *args, interpret=True, xsplit=xsplit,
                pair=False))
            paired = np.asarray(FC.fused_chain_power_radix(
                jnp.asarray(x4), *args, interpret=True, xsplit=xsplit,
                pair=True))
            np.testing.assert_array_equal(paired, base, err_msg=layout)
            for ch in range(cfg.num_channels):
                assert oracle.relative_l2(pow64[ch], paired[ch]) < 2e-5
    # offset entry (interpret falls back to dynamic_slice + plain grid)
    a_np, fac = FC.radix_plan_host(consts, radix)
    stage = jnp.asarray(np.concatenate([x4_f32, x4_f32]))
    sliced = np.asarray(FC.fused_chain_power_radix(
        stage, jnp.asarray(a_np), fac, wd, ph, interpret=True,
        offset=2, bc=4, pair=True))
    np.testing.assert_array_equal(
        sliced,
        np.asarray(FC.fused_chain_power_radix(
            stage[2:6], jnp.asarray(a_np), fac, wd, ph,
            interpret=True, pair=True)))


def test_radix_kernel_pair_rejects_odd_count():
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=128, n=64)
    consts = PipelineConstants.build(cfg)
    a_np, fac = FC.radix_plan_host(consts, FC.radix_for(cfg.m))
    x = np.zeros((3, 2, cfg.m, cfg.n), np.float32)
    with pytest.raises(ValueError, match="even"):
        FC.fused_chain_power_radix(
            jnp.asarray(x), jnp.asarray(a_np), fac,
            jnp.asarray(consts.wd), jnp.asarray(consts.clip_phasors),
            interpret=True, pair=True)


@pytest.mark.parametrize("default", [True, "pre", 4, "pre4"])
def test_pair_default_flip_safe_for_any_batch(monkeypatch, default):
    """Flipping fullchain.X_PAIR (the module default the on-chip A/B may
    pick) must keep the production processor oracle-correct for BOTH
    parities of batch*channels: even counts pair, odd counts silently
    fall back to the unpaired grid rather than erroring.  A "pre"
    default (decode-time pairing) must degrade to the in-kernel concat
    here — the builder always feeds the unpaired layout."""
    import jax.numpy as jnp  # noqa: F401  (jax initialised by conftest)

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=7)
    pow64 = oracle.channel_power(iq, cfg)
    planar = np.stack([iq.real, iq.imag], 1).astype(np.float32)
    monkeypatch.setattr(FC, "X_PAIR", default)
    fn = FC.build_pallas_processor(consts, interpret=True)
    got_odd = np.asarray(fn(planar[None]))[0]                  # bc = 3
    got_even = np.asarray(fn(np.stack([planar, planar])))[0]   # bc = 6
    # bc = 12 exercises the quad branch itself (not just its degrades)
    # when the default is a group-of-4 mode
    got_x4 = np.asarray(fn(np.stack([planar] * 4)))[0]
    for ch in range(cfg.num_channels):
        assert oracle.relative_l2(pow64[ch], got_odd[ch]) < 2e-5
        assert oracle.relative_l2(pow64[ch], got_even[ch]) < 2e-5
        assert oracle.relative_l2(pow64[ch], got_x4[ch]) < 2e-5


def test_radix_kernel_prepaired_matches_pair_exactly():
    """pair="pre" (input already lane-paired, [bc/2, 2, m, 2n]) must be
    bit-identical to pair=True (in-kernel concat) — same arithmetic,
    only the concat moves to the producer — for both x-splits, and on
    the offset entry with bc/offset still in channel-sector units."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=37)
    order = FC.radix_row_order(cfg.m, radix)
    planar = np.stack([iq.real, iq.imag], 1)[:, :, order, :]
    x4 = np.concatenate([planar, planar[:1]])
    a_np, fac = FC.radix_plan_host(consts, radix)
    wd = jnp.asarray(consts.wd)
    ph = jnp.asarray(consts.clip_phasors)
    args = (jnp.asarray(a_np), fac, wd, ph)
    for dt, xsplit in ((np.float32, "f32"), (np.int16, "int")):
        x = x4.astype(dt)
        want = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x), *args, interpret=True, pair=True,
            xsplit=xsplit))
        got = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(FC.pair_lanes(x)), *args, interpret=True,
            pair="pre", xsplit=xsplit))
        np.testing.assert_array_equal(got, want, err_msg=xsplit)
    # offset entry over a pre-paired staged array
    stage8 = FC.pair_lanes(np.concatenate([x4, x4]).astype(np.float32))
    sliced = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(stage8), jnp.asarray(a_np), fac, wd, ph,
        interpret=True, offset=4, bc=4, pair="pre"))
    np.testing.assert_array_equal(
        sliced,
        np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x4.astype(np.float32)), *args, interpret=True,
            pair=True)))


def test_pair_lanes_layout():
    """pair_lanes: sector 2q fills lanes [0, n), sector 2q+1 fills
    [n, 2n), per plane and row; g=4 analogously."""
    from wrp_tpu.ops.pallas import fullchain as FC

    x = np.arange(4 * 2 * 3 * 5).reshape(4, 2, 3, 5)
    p = FC.pair_lanes(x)
    assert p.shape == (2, 2, 3, 10)
    np.testing.assert_array_equal(p[0, :, :, :5], x[0])
    np.testing.assert_array_equal(p[0, :, :, 5:], x[1])
    np.testing.assert_array_equal(p[1, :, :, :5], x[2])
    np.testing.assert_array_equal(p[1, :, :, 5:], x[3])
    q = FC.pair_lanes(x, g=4)
    assert q.shape == (1, 2, 3, 20)
    for i in range(4):
        np.testing.assert_array_equal(q[0, :, :, 5 * i:5 * (i + 1)], x[i])


def test_xsplit_default_flip_safe_for_f32_input(monkeypatch):
    """Flipping fullchain.X_SPLIT to "int" (the on-chip A/B may pick it)
    must not break f32 callers (oracle drives, complex input): the
    module default silently degrades to the f32 split there, while an
    EXPLICIT xsplit="int" with float input stays a hard error."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=11)
    order = FC.radix_row_order(cfg.m, radix)
    planar = np.stack([iq.real, iq.imag], 1)[:, :, order, :]
    a_np, fac = FC.radix_plan_host(consts, radix)
    args = (jnp.asarray(a_np), fac, jnp.asarray(consts.wd),
            jnp.asarray(consts.clip_phasors))
    monkeypatch.setattr(FC, "X_SPLIT", "int")
    # f32 input under the int default: degrades to the f32 split and
    # matches an explicit f32 request bit-for-bit
    f32 = planar.astype(np.float32)
    got = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(f32), *args, interpret=True))
    want = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(f32), *args, interpret=True, xsplit="f32"))
    np.testing.assert_array_equal(got, want)
    # int16 input under the int default: actually uses the int split
    i16 = planar.astype(np.int16)
    got_i = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(i16), *args, interpret=True))
    want_i = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(i16), *args, interpret=True, xsplit="int"))
    np.testing.assert_array_equal(got_i, want_i)
    # explicit int + float input: still rejected
    with pytest.raises(ValueError, match="int16 input"):
        FC.fused_chain_power_radix(
            jnp.asarray(f32), *args, interpret=True, xsplit="int")


def test_pair_group_decode():
    from wrp_tpu.ops.pallas import fullchain as FC

    assert FC.pair_group(False) == (1, False)
    assert FC.pair_group(1) == (1, False)   # int 1 is NOT bool True
    assert FC.pair_group(True) == (2, False)
    assert FC.pair_group("concat") == (2, False)
    assert FC.pair_group(2) == (2, False)
    assert FC.pair_group("pre") == (2, True)
    assert FC.pair_group(4) == (4, False)
    assert FC.pair_group("quad") == (4, False)
    assert FC.pair_group("pre4") == (4, True)
    assert FC.pair_group("quad_pre") == (4, True)
    with pytest.raises(ValueError, match="unknown pair mode"):
        FC.pair_group(3)


def test_radix_kernel_quad_matches_unpaired_exactly():
    """pair=4 (four channel-sectors lane-concatenated into N=4n dots)
    computes column-for-column the SAME arithmetic as the unpaired
    kernel, so the outputs must be bit-identical — for both x-splits;
    pre4 (input already lane-grouped) must in turn be bit-identical to
    the in-kernel quad concat, incl. on the offset entry with bc/offset
    still in channel-sector units."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=256, n=128)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=53)
    order = FC.radix_row_order(cfg.m, radix)
    planar = np.stack([iq.real, iq.imag], 1)[:, :, order, :]
    x4 = np.concatenate([planar, planar[:1]])   # 4 channel-sectors
    a_np, fac = FC.radix_plan_host(consts, radix)
    wd = jnp.asarray(consts.wd)
    ph = jnp.asarray(consts.clip_phasors)
    args = (jnp.asarray(a_np), fac, wd, ph)
    for dt, xsplit in ((np.float32, "f32"), (np.int16, "int")):
        x = x4.astype(dt)
        base = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x), *args, interpret=True, xsplit=xsplit,
            pair=False))
        quad = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(x), *args, interpret=True, xsplit=xsplit,
            pair=4))
        np.testing.assert_array_equal(quad, base, err_msg=xsplit)
        pre = np.asarray(FC.fused_chain_power_radix(
            jnp.asarray(FC.pair_lanes(x, g=4)), *args, interpret=True,
            xsplit=xsplit, pair="pre4"))
        np.testing.assert_array_equal(pre, quad, err_msg=xsplit)
    # offset entry, both layouts: 8 staged channel-sectors, slab [4:8)
    x8 = np.concatenate([x4, x4]).astype(np.float32)
    want = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(x4.astype(np.float32)), *args, interpret=True, pair=4))
    sliced = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(x8), *args, interpret=True, offset=4, bc=4, pair=4))
    np.testing.assert_array_equal(sliced, want)
    sliced_pre = np.asarray(FC.fused_chain_power_radix(
        jnp.asarray(FC.pair_lanes(x8, g=4)), *args, interpret=True,
        offset=4, bc=4, pair="pre4"))
    np.testing.assert_array_equal(sliced_pre, want)
    # count not divisible by the group: hard error, not silent fallback
    with pytest.raises(ValueError, match="divisible by 4"):
        FC.fused_chain_power_radix(
            jnp.asarray(x8[:6]), *args, interpret=True, pair=4)


# ---------------------------------------------------------------------------
# Mosaic int-split toolchain canary (VERDICT r4 item 7)
# ---------------------------------------------------------------------------


def _run_repro(*extra):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    return subprocess.run(
        [sys.executable, str(repo / "tools" / "int_split_repro.py"),
         *extra],
        cwd=repo, capture_output=True, text=True, timeout=420)


def test_int_split_repro_script_smoke():
    """tools/int_split_repro.py (the filing-ready Mosaic SIGABRT repro,
    INT_SPLIT_REPRO_r04.json) must stay runnable: both variants run
    clean in CPU interpret mode — a bit-rotted repro script could not
    confirm a toolchain fix the day one lands."""
    for variant in ("int", "f32"):
        r = _run_repro("--smoke", "--variant", variant)
        assert r.returncode == 0, (variant, r.stdout[-500:],
                                   r.stderr[-1000:])


@pytest.mark.skipif(
    not os.environ.get("WRP_TPU_CANARY"),
    reason="TPU toolchain canary: opt-in via WRP_TPU_CANARY=1 (spawns a "
           "TPU-backend subprocess; the default suite is CPU-pinned)")
@pytest.mark.xfail(
    strict=True,
    reason="Mosaic rejects the integer-mask bf16 split with a remote-"
           "compile SIGABRT (INT_SPLIT_REPRO_r04.json; DESIGN.md §3). "
           "An XPASS here means the toolchain is FIXED: re-measure "
           "`bench.py --xsplit int` the same day")
def test_int_split_compiles_on_tpu_canary():
    """Strict-xfail canary: compiles the one-pallas_call int-split repro
    on the real chip.  Today it SIGABRTs (exit 2 -> xfail); the day the
    toolchain fix ships this XPASSes loudly and DESIGN.md §3's
    `--xsplit int` re-measurement is due."""
    import subprocess

    # a wedged tunnel must read as "cannot test", not "still broken"
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.jit(lambda: jnp.ones((8,128)).sum())()"],
            capture_output=True, timeout=90,
            env={k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME")})
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel wedged (probe timeout)")
    if probe.returncode != 0:
        pytest.skip("TPU probe failed: " + probe.stderr.decode()[-300:])
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    r = subprocess.run(
        [sys.executable, "tools/int_split_repro.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, f"int-split still SIGABRTs: {r.stdout[-400:]}"


# ---------------------------------------------------------------------------
# Wire-fused kernel: the on-device decode folded INTO the flagship kernel
# (fused_chain_power_wire) — channel deinterleave never happens.
# ---------------------------------------------------------------------------


def _wire_batch(cfg, b, seed):
    from wrp_tpu.io import codec

    rng = np.random.default_rng(seed)
    shape = (b, cfg.num_channels, cfg.m, cfg.n)
    iq = (rng.integers(-8192, 8192, shape)
          + 1j * rng.integers(-8192, 8192, shape)).astype(np.complex64)
    wires = np.stack([
        np.frombuffer(codec.encode_iq(iq[k], cfg), np.uint8)
        for k in range(b)
    ])
    return iq, wires


def test_wire_fused_matches_xla_decode_and_oracle():
    """wire_decode='fused' (decode inside the kernel, channel-masked
    epilogue on interleaved lanes) must match the wire_decode='xla' path
    (standalone decode + planar kernel) and the fp64 oracle; the int32
    word-view entry (the free host path) must equal the uint8 byte entry
    bit-for-bit."""
    from wrp_tpu.config import tiny_config

    cfg = tiny_config(m=128, n=64)
    iq, wires = _wire_batch(cfg, 3, seed=5)

    proc_f = pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                      wire_input=True)
    assert proc_f.wire_decode == "fused"          # auto-picked
    assert proc_f.wire_dtype == np.int32
    proc_x = pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                      wire_input=True, wire_decode="xla")
    assert proc_x.wire_dtype == np.uint8

    zdb_f, zdr_f = map(np.asarray, proc_f(wires))
    zdb_x, zdr_x = map(np.asarray, proc_x(wires))
    # same int16 samples, same contraction; only the epilogue's reduction
    # grouping differs (masked interleaved lanes vs planar rows)
    assert oracle.relative_l2(zdb_x, zdb_f) < 1e-5
    assert oracle.relative_l2(zdr_x, zdr_f) < 1e-5

    # the '<i4' word view is the SAME bytes — bit-identical products
    zdb_i, zdr_i = map(np.asarray, proc_f(wires.view("<i4")))
    np.testing.assert_array_equal(zdb_i, zdb_f)
    np.testing.assert_array_equal(zdr_i, zdr_f)

    # unbatched entry
    zdb_1, zdr_1 = map(np.asarray, proc_f(wires[0]))
    np.testing.assert_array_equal(zdb_1, zdb_f[0])

    for k in range(iq.shape[0]):
        zdb64, zdr64 = oracle.process_sector(iq[k], cfg)
        assert oracle.relative_l2(zdb64, zdb_f[k]) < 2e-4
        assert oracle.relative_l2(zdr64, zdr_f[k]) < 2e-4


def test_wire_fused_two_channel_profile():
    """The wire-fused kernel is generic over the channel count: the
    2-channel production profile (hh+vv, read.cc:61-62) decodes and
    processes on the same interleaved-lane path."""
    from wrp_tpu.config import tiny_config

    cfg = tiny_config(m=128, n=64, channels=2)
    iq, wires = _wire_batch(cfg, 2, seed=9)
    proc = pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                    wire_input=True)
    assert proc.wire_decode == "fused"
    zdb, zdr = map(np.asarray, proc(wires))
    for k in range(iq.shape[0]):
        zdb64, zdr64 = oracle.process_sector(iq[k], cfg)
        assert oracle.relative_l2(zdb64, zdb[k]) < 2e-4
        assert oracle.relative_l2(zdr64, zdr[k]) < 2e-4


def test_wire_fused_offset_salt_harness_path():
    """The scalar-prefetch offset/salt variant (the honest-benchmark
    path): offset slicing must equal the plain call on the same slab, and
    salt=0 must be a no-op — the same self-check bench.py gates its timed
    span on."""
    import jax.numpy as jnp

    from wrp_tpu.config import tiny_config
    from wrp_tpu.ops.device_codec import wire_words_i32
    from wrp_tpu.ops.pallas import fullchain as FC

    cfg = tiny_config(m=128, n=64)
    _, wires = _wire_batch(cfg, 4, seed=2)
    consts = PipelineConstants.build(cfg)
    radix = FC.radix_for(cfg.m)
    a_np, fac = FC.radix_plan_host(consts, radix)
    wd_il, ph_il = FC.wire_lane_consts(consts, cfg.num_channels)
    w32 = np.asarray(wire_words_i32(wires, cfg, radix=radix))

    plain = np.asarray(FC.fused_chain_power_wire(
        jnp.asarray(w32), jnp.asarray(a_np), fac, jnp.asarray(wd_il),
        jnp.asarray(ph_il), cfg.num_channels, interpret=True))
    offs = np.asarray(FC.fused_chain_power_wire(
        jnp.asarray(w32), jnp.asarray(a_np), fac, jnp.asarray(wd_il),
        jnp.asarray(ph_il), cfg.num_channels, interpret=True,
        offset=jnp.int32(2), bs=2, salt=jnp.int32(0)))
    np.testing.assert_array_equal(offs, plain[2:4])


def test_wire_fused_rejects_unsupported_configurations():
    from wrp_tpu.config import tiny_config

    cfg = tiny_config(m=128, n=64)
    with pytest.raises(ValueError, match="radix"):
        pipeline.SectorProcessor(cfg, method="pallas", wire_input=True,
                                 wire_decode="fused")   # natural layout
    with pytest.raises(ValueError, match="wire_decode"):
        pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                 wire_decode="fused")   # no wire_input
    with pytest.raises(ValueError, match="wire_decode"):
        pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                 wire_input=True, wire_decode="bogus")
    proc = pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                    wire_input=True)
    bad = np.zeros((2, 7), np.int32)                    # wrong word count
    with pytest.raises(ValueError, match="wire_input processor expects"):
        proc(bad)


def test_wire_order_radix_preordered_rows_bit_identical():
    """wire_order='radix' (host pre-permutes the wire ROWS,
    io/codec.reorder_wire_rows) must produce bit-identical products to
    the natural-order path for BOTH wire decodes — same words reach the
    same kernel; only where the row gather happens differs (on the host
    instead of a measured 57 us/sector on the device,
    WIRE_AB_r05.json)."""
    from wrp_tpu.config import tiny_config
    from wrp_tpu.io import codec

    cfg = tiny_config(m=128, n=64)
    _, wires = _wire_batch(cfg, 2, seed=11)

    for wdec in ("fused", "xla"):
        nat = pipeline.SectorProcessor(cfg, method="pallas",
                                       layout="radix", wire_input=True,
                                       wire_decode=wdec)
        rdx = pipeline.SectorProcessor(cfg, method="pallas",
                                       layout="radix", wire_input=True,
                                       wire_decode=wdec,
                                       wire_order="radix")
        assert rdx.wire_order == "radix"
        pre = np.stack([
            codec.reorder_wire_rows(w, cfg, radix=rdx.input_radix)
            for w in wires])
        zdb_n, zdr_n = map(np.asarray, nat(wires))
        zdb_r, zdr_r = map(np.asarray, rdx(
            pre.view("<i4") if rdx.wire_dtype == np.int32 else pre))
        np.testing.assert_array_equal(zdb_r, zdb_n)
        np.testing.assert_array_equal(zdr_r, zdr_n)

    # radix=1 reorder is the identity (copy), out= writes in place
    flat = codec.reorder_wire_rows(wires[0], cfg, radix=1)
    np.testing.assert_array_equal(flat, wires[0])
    dst = np.empty_like(wires[0])
    codec.reorder_wire_rows(wires[0], cfg, radix=rdx.input_radix, out=dst)
    np.testing.assert_array_equal(
        dst, codec.reorder_wire_rows(wires[0], cfg, radix=rdx.input_radix))


def test_wire_order_rejects_inconsistent_configurations():
    from wrp_tpu.config import tiny_config

    cfg = tiny_config(m=128, n=64)
    with pytest.raises(ValueError, match="wire_order"):
        pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                 wire_input=True, wire_order="bogus")
    with pytest.raises(ValueError, match="wire_order"):
        # pre-permuted rows need the radix layout to permute FOR
        pipeline.SectorProcessor(cfg, method="pallas", wire_input=True,
                                 wire_order="radix")
    with pytest.raises(ValueError, match="wire_order"):
        pipeline.SectorProcessor(cfg, method="pallas", layout="radix",
                                 wire_order="radix")    # no wire_input
