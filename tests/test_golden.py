"""Golden-file parity: oracle and JAX pipelines vs the reference's committed
stage dumps (in/04abs.altb -> out/08pow.cpu.out -> in/09zdb.altb ->
out/99result.cpu.out), judged with the reference's own relative-L2 metric
(error.cpp:9-36).

The committed goldens were produced by the fp32 CPU build, so ~2e-6 relative
L2 is their own noise floor; bounds below sit just above it.
"""

import numpy as np
import pytest

from wrp_tpu import oracle
from wrp_tpu.config import DEFAULT_CONFIG
from wrp_tpu.constants import PipelineConstants

FP32_GOLDEN_FLOOR = 5e-6
FP32_PRODUCT_FLOOR = 2e-5  # adds fp32 log10/large-reduction rounding


def test_goldens_are_consistent(golden_04abs, golden_08pow, golden_result):
    assert golden_04abs.shape == (512, 512)
    assert golden_08pow.shape == (512, 512)
    zdb, zdr = golden_result
    assert zdb.shape == (512,) and zdr.shape == (512,)
    assert not np.isfinite(zdb[0])  # bin 0 is -inf by construction


def test_oracle_matched_filter_vs_golden(golden_04abs, golden_08pow):
    conv = oracle.stage05_07_matched_filter(golden_04abs, DEFAULT_CONFIG)
    assert oracle.relative_l2(golden_08pow, conv) < FP32_GOLDEN_FLOOR


def test_oracle_products_vs_golden(golden_08pow, golden_result):
    pow_hh = oracle.stage08_pulse_sum(golden_08pow)
    zdb, _ = oracle.stage09_10_products(pow_hh, pow_hh, DEFAULT_CONFIG)
    zdb_golden, _ = golden_result
    assert oracle.relative_l2(zdb_golden, zdb) < FP32_GOLDEN_FLOOR


def test_oracle_chain_from_04abs_vs_result(golden_04abs, golden_result):
    """in/04abs -> stages 05-09 -> zdb must land on 99result's zdb column."""
    pow_hh = oracle.stage08_pulse_sum(
        oracle.stage05_07_matched_filter(golden_04abs, DEFAULT_CONFIG)
    )
    zdb, _ = oracle.stage09_10_products(pow_hh, pow_hh, DEFAULT_CONFIG)
    zdb_golden, _ = golden_result
    assert oracle.relative_l2(zdb_golden, zdb) < FP32_GOLDEN_FLOOR


@pytest.mark.parametrize("matched_filter", ["direct", "spectral"])
def test_jax_matched_filter_vs_golden(golden_04abs, golden_08pow, matched_filter):
    import jax.numpy as jnp
    from wrp_tpu import pipeline

    consts = PipelineConstants.build(DEFAULT_CONFIG)
    p = jnp.asarray(golden_04abs, jnp.float32)
    if matched_filter == "direct":
        conv = pipeline.matched_filter_direct(p, consts.ma_taps)
    else:
        conv = pipeline.matched_filter_spectral(p, jnp.asarray(consts.fft_ma))
    assert oracle.relative_l2(golden_08pow, np.asarray(conv)) < FP32_GOLDEN_FLOOR


def test_jax_products_vs_golden(golden_08pow, golden_result):
    import jax.numpy as jnp
    from wrp_tpu import pipeline

    consts = PipelineConstants.build(DEFAULT_CONFIG)
    pow_hh = pipeline.stage08_pulse_sum(jnp.asarray(golden_08pow, jnp.float32))
    zdb, _ = pipeline.stage09_10_products(
        pow_hh, pow_hh, jnp.asarray(consts.gain)
    )
    zdb_golden, _ = golden_result
    zdb = np.asarray(zdb)
    assert not np.isfinite(zdb[0])  # log10(0) must stay -inf on device
    assert oracle.relative_l2(zdb_golden, zdb) < FP32_PRODUCT_FLOOR


def test_gpu_golden_agrees_with_cpu_golden(reference_dir):
    """Sanity: the reference's own GPU output sits within the same bound."""
    from wrp_tpu.io.files import read_result_file

    zdb_cpu, zdr_cpu = read_result_file(reference_dir + "/out/99result.cpu.out")
    zdb_gpu, zdr_gpu = read_result_file(reference_dir + "/out/99result.gpu.out")
    assert oracle.relative_l2(zdb_cpu, zdb_gpu) < 1e-4
    assert oracle.relative_l2(zdr_cpu, zdr_gpu) < 1e-4
