"""The conv-fold identity: matched_filter='fold' must equal 'direct'
within fp32 noise on the full chain (circular convolution with taps
summing to 1 preserves row sums exactly)."""

import numpy as np

from wrp_tpu import oracle, pipeline
from wrp_tpu.config import DEFAULT_CONFIG, tiny_config


def test_fold_equals_direct_full_geometry():
    cfg = DEFAULT_CONFIG
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=13)[None].astype(
        np.complex64)
    direct = pipeline.SectorProcessor(cfg, method="mxu",
                                      matched_filter="direct")(iq)
    fold = pipeline.SectorProcessor(cfg, method="mxu",
                                    matched_filter="fold")(iq)
    assert oracle.relative_l2(np.asarray(direct[0]), np.asarray(fold[0])) < 1e-6
    # zdr is a log-ratio of two ~cancelling sums; fp32 reduction-order noise
    # is relatively larger there
    assert oracle.relative_l2(np.asarray(direct[1]), np.asarray(fold[1])) < 1e-5


def test_fold_identity_exact_in_fp64():
    cfg = tiny_config(m=64, n=32)
    rng = np.random.default_rng(0)
    p = np.abs(rng.standard_normal((cfg.m // 2, cfg.n)))
    conv = oracle.stage05_07_matched_filter(p, cfg)
    np.testing.assert_allclose(conv.sum(-1), p.sum(-1), rtol=1e-12)


def test_fold_matches_oracle():
    cfg = DEFAULT_CONFIG
    iq = oracle.synthetic_iq(cfg, kind="noise", seed=14)
    zdb64, zdr64 = oracle.process_sector(iq, cfg)
    proc = pipeline.SectorProcessor(cfg, method="radix",
                                    matched_filter="fold",
                                    precision="highest")
    zdb, zdr = proc(np.asarray(iq[None], np.complex64))
    assert oracle.relative_l2(zdb64, np.asarray(zdb)[0]) < 2e-4
    assert oracle.relative_l2(zdr64, np.asarray(zdr)[0]) < 2e-4
