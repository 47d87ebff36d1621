"""Pallas fused stage-2 kernel vs the jnp path (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU — exercised by bench/verify)."""

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
