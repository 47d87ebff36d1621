"""TPU-native implementation of the 11-stage polarimetric radar chain.

Five interchangeable compute paths, all pure functions over a batch of
sectors (jit once, vmap-free — every stage broadcasts over leading axes),
all validated against the fp64 oracle and the reference goldens:

* ``method="fft"``  — direct XLA formulation: window multiply, two batched
  ``jnp.fft.fft`` calls, fused elementwise stages.  Mirrors the reference
  chain stage-for-stage (read.cc:131-345) and produces every intermediate
  product for golden-parity tests.

* ``method="mxu"``  — the MXU formulation: stages 01-04 are linear in the
  IQ matrix up to conjugation, so they collapse into two constant complex
  matmuls ``A_half @ X @ B`` (see constants.stage1_operators) that run on
  the systolic array, followed by a 7-tap circular convolution and
  reductions on the VPU.  This is not a port of anything in the reference —
  it is the natural TPU mapping (the reference's own scratch experiment
  examples/matrixmul.cu:13-48 hints at the outer-product form).

* ``method="parseval"`` — the B matmul and conv collapse into a closed
  form by Parseval (constants.parseval_vectors); the A matmul runs in
  Gauss 3-multiply form.

* ``method="pallas"`` — the flagship: the whole chain in ONE fused Pallas
  kernel with a radix-8 DIT range DFT (ops/pallas/fullchain.py).

* ``method="radix"`` — Cooley-Tukey split DFTs as XLA einsums
  (ops/dft.py); kept as the measured-slower-than-mxu data point (the
  layout shuffles are HBM-bound outside a fused kernel).

See DESIGN.md for the derivations and the measured ladder.

The matched filter (stages 05-07) is a circular convolution; we compute it
directly with 7 shifted fused multiply-adds instead of FFT->multiply->IFFT
(identical in exact arithmetic, cheaper and *more* accurate in fp32).  The
spectral form is kept as ``matched_filter_spectral`` for parity testing.

Dtype policy: complex64/float32 throughout — accuracy is the contract
(BASELINE.md), bfloat16 only inside MXU passes via precision=HIGHEST
(bf16x6 accumulation), which keeps ~fp32 end-to-end error.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RadarConfig, DEFAULT_CONFIG
from .constants import PipelineConstants

Array = jax.Array


# --------------------------------------------------------------------------
# Stage ops (method="fft" path).  All take [..., m, n] and broadcast.
# --------------------------------------------------------------------------


def stage01_window(iq: Array, hamming: Array) -> Array:
    return iq * hamming


def stage02_range_fft(x: Array) -> Array:
    return jnp.fft.fft(x, axis=-2)


def stage03_doppler(x: Array) -> Array:
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    y = jnp.conj(x - mean)
    y = jnp.fft.fft(y, axis=-1)
    y = jnp.conj(jnp.roll(y, n // 2, axis=-1))
    return y.at[..., n - 2 :].set(0.0)


def stage04_power(x: Array) -> Array:
    m = x.shape[-2]
    half = x[..., : m // 2, :]
    return jnp.real(half) ** 2 + jnp.imag(half) ** 2


def matched_filter_direct(p: Array, ma_taps: Array) -> Array:
    """Stages 05-07 as an explicit circular convolution along the pulse
    axis: conv[j] = sum_k ma[k] * p[(j - k) mod n].  XLA fuses the 7
    roll+FMA passes into one VPU sweep."""
    taps = np.asarray(ma_taps)
    out = taps[0] * p
    for k in range(1, taps.shape[0]):
        out = out + taps[k] * jnp.roll(p, k, axis=-1)
    return out


def matched_filter_spectral(p: Array, fft_ma: Array) -> Array:
    """Stages 05-07 in the reference's spectral form: forward FFT of the
    (real) power rows, pointwise multiply by the MA spectrum, inverse FFT,
    real part (read.cc:272-327; jnp.fft.ifft normalises by 1/n exactly like
    the reference's explicit /n after unnormalised FFTW BACKWARD)."""
    spec = jnp.fft.fft(p.astype(fft_ma.dtype), axis=-1) * fft_ma
    return jnp.fft.ifft(spec, axis=-1).real


def stage08_pulse_sum(conv: Array) -> Array:
    return jnp.sum(conv, axis=-1)


def stage09_10_products(pow_hh: Array, pow_vv: Array, gain: Array):
    zdb = 10.0 * log10(gain * pow_hh)
    # zdr as log of the power ratio, not difference of logs: identical in
    # exact arithmetic (read.cc:343) but far better conditioned in fp32 —
    # hh/vv are close, and subtracting two ~2e-6-absolute-error device logs
    # leaves a catastrophically cancelled small number (measured 4e-4 rel
    # L2 on TPU vs 1e-6 for the ratio form).  inf/nan edge semantics match:
    # vv=0 -> +inf, hh=vv=0 -> nan either way.
    zdr = 10.0 * log10(pow_hh / pow_vv)
    return zdb, zdr


def log10(x: Array) -> Array:
    return jnp.log(x) / np.log(10.0)


# --------------------------------------------------------------------------
# MXU path: stages 01-04 as two complex matmuls.
# --------------------------------------------------------------------------


def _rmatmul(ar, ai, br, bi, precision):
    """(ar+i*ai) @ (br+i*bi) via four real MXU passes with controlled
    precision.  Explicit real decomposition keeps the contraction on the
    systolic array for any backend and makes the precision knob apply to
    every pass.  It also keeps the whole device dataflow real-valued,
    which matters in practice: complex64 host<->device transfer is not
    supported on all TPU runtimes (and the wire codec produces planar
    I/Q anyway)."""
    dot = functools.partial(jnp.matmul, precision=precision)
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


def _rmatmul_gauss(ar, ai, asum, br, bi, precision):
    """Gauss/Karatsuba complex matmul: 3 real MXU passes instead of 4.

    (ar + i ai)(br + i bi) with m1 = ar br, m2 = ai bi,
    m3 = (ar + ai)(br + bi); real = m1 - m2, imag = m3 - m1 - m2.
    `asum = ar + ai` is precomputed (the A operator is constant).  The
    m3 - m1 - m2 cancellation costs ~1 extra ulp; measured end-to-end
    accuracy is within 2x of the 4-pass form (tests/test_pipeline.py).
    """
    dot = functools.partial(jnp.matmul, precision=precision)
    m1 = dot(ar, br)
    m2 = dot(ai, bi)
    m3 = dot(asum, br + bi)
    return m1 - m2, m3 - m1 - m2


def stage_b_parseval(yr: Array, yi: Array, wd: Array, phasors: Array,
                     precision=jax.lax.Precision.HIGHEST) -> Array:
    """Stages 03b-08 in closed form (constants.parseval_vectors): the pulse
    sum of matched-filter power equals, by Parseval on the Doppler DFT,

        pow[i] = n * sum_j |q_ij - qbar_i|^2
                 - |q_i . f_k1|^2 - |q_i . f_k2|^2          (q = y * w_d)

    i.e. one fused VPU sweep over Y plus a [*, n] @ [n, 4] skinny matmul
    for the two clipped Doppler bins — no [n, n] matmul, no conv pass.
    (sum(ma_taps) == 1 exactly, so the matched-filter fold factor is 1.)
    The mean is subtracted *before* the clip-bin dot products (f_k is
    orthogonal to the all-ones vector, so this is exact) to avoid
    catastrophic cancellation when the DC/clutter line dominates."""
    n = yr.shape[-1]
    qr = yr * wd
    qi = yi * wd
    qr = qr - jnp.mean(qr, axis=-1, keepdims=True)
    qi = qi - jnp.mean(qi, axis=-1, keepdims=True)
    s = n * jnp.sum(qr * qr + qi * qi, axis=-1)
    # d[..., 0:2] = q . (cos_k, sin_k) for k1; 2:4 for k2.
    dot = functools.partial(jnp.matmul, precision=precision)
    dr = dot(qr, phasors.T)             # [..., 4]
    di = dot(qi, phasors.T)
    # |q . f_k|^2 = (qr.c - qi.s)^2 + (qr.s + qi.c)^2
    for c, sn in ((0, 1), (2, 3)):
        re = dr[..., c] - di[..., sn]
        im = dr[..., sn] + di[..., c]
        s = s - (re * re + im * im)
    return s


def stage01_04_mxu_planar(xr: Array, xi: Array, op_a: tuple, op_b: tuple,
                          precision=jax.lax.Precision.HIGHEST) -> Array:
    """Planar IQ ([..., m, n] real, imag) -> power [..., m/2, n] via
    A_half @ X @ B, entirely in real float32 arithmetic.

    Folds window, range FFT, mean-subtraction, Doppler FFT, conj/fftshift,
    bin clipping and the half-spectrum crop into two constant matmuls.
    """
    ar, ai = op_a
    br, bi = op_b
    yr, yi = _rmatmul(ar, ai, xr, xi, precision)
    zr, zi = _rmatmul(yr, yi, br, bi, precision)
    return zr * zr + zi * zi


def stage01_04_mxu(iq: Array, op_a_half: Array, op_b: Array,
                   precision=jax.lax.Precision.HIGHEST) -> Array:
    """Complex-input convenience wrapper over stage01_04_mxu_planar."""
    return stage01_04_mxu_planar(
        jnp.real(iq), jnp.imag(iq),
        (jnp.real(op_a_half), jnp.imag(op_a_half)),
        (jnp.real(op_b), jnp.imag(op_b)),
        precision,
    )


# --------------------------------------------------------------------------
# Full chain.
# --------------------------------------------------------------------------


def channel_power_planar(
    xr: Array,
    xi: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Stages 01-08 on planar IQ: (real, imag) [..., m, n] -> pow [..., m/2].

    The planar form is the device-facing API: no complex arrays cross the
    host<->device boundary, and the mxu path never materialises complex at
    all (pure real MXU/VPU dataflow)."""
    if method == "fft":
        x = jax.lax.complex(xr, xi)
        x = stage01_window(x, jnp.asarray(consts.hamming, xr.dtype))
        x = stage02_range_fft(x)
        x = stage03_doppler(x)
        p = stage04_power(x)
    elif method == "mxu":
        a, b = jnp.asarray(consts.op_a_half), jnp.asarray(consts.op_b)
        p = stage01_04_mxu_planar(
            xr, xi,
            (jnp.real(a), jnp.imag(a)),
            (jnp.real(b), jnp.imag(b)),
            precision,
        )
    elif method == "parseval":
        # Fastest path: Gauss 3-pass A matmul + closed-form stages 03b-08.
        # Implies the matched-filter fold (final products identical).
        ar = jnp.asarray(np.ascontiguousarray(consts.op_a_half.real))
        ai = jnp.asarray(np.ascontiguousarray(consts.op_a_half.imag))
        yr, yi = _rmatmul_gauss(ar, ai, ar + ai, xr, xi, precision)
        return stage_b_parseval(yr, yi, jnp.asarray(consts.wd),
                                jnp.asarray(consts.clip_phasors), precision)
    else:
        raise ValueError(f"unknown method {method!r}")

    if matched_filter == "direct":
        conv = matched_filter_direct(p, consts.ma_taps)
    elif matched_filter == "fold":
        # sum-preserving identity of the circular convolution; see
        # _process_planar_jit for the derivation and caveats.
        return stage08_pulse_sum(p) * float(np.sum(consts.ma_taps))
    elif matched_filter == "spectral":
        conv = matched_filter_spectral(p, jnp.asarray(consts.fft_ma))
    else:
        raise ValueError(f"unknown matched_filter {matched_filter!r}")
    return stage08_pulse_sum(conv)


def channel_power(
    iq: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Stages 01-08: IQ [..., m, n] complex64 -> pow [..., m/2] float32."""
    return channel_power_planar(
        jnp.real(iq), jnp.imag(iq), consts, method, matched_filter, precision
    )


def process_sectors_planar(
    iq_planar: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[Array, Array]:
    """Full chain on planar IQ [..., channels, 2, m, n] float32 (the codec's
    native layout, io/codec.decode_iq) -> (zdb, zdr) each [..., m/2]."""
    pow_all = channel_power_planar(
        iq_planar[..., 0, :, :], iq_planar[..., 1, :, :],
        consts, method, matched_filter, precision,
    )
    gain = jnp.asarray(consts.gain)
    return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :], gain)


def process_sectors(
    iq: Array,
    consts: PipelineConstants,
    method: str = "mxu",
    matched_filter: str = "direct",
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[Array, Array]:
    """Full chain over a batch: IQ [..., channels, m, n] complex ->
    (zdb, zdr) each [..., m/2].  Channel 0 = hh, channel 1 = vv; extra
    channels (vh) ride along through the power stages like the reference
    (read_single.cc:485-502) so per-channel power is available."""
    pow_all = channel_power(iq, consts, method, matched_filter, precision)
    gain = jnp.asarray(consts.gain)
    return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :], gain)


def all_stages(
    iq: Array, consts: PipelineConstants, matched_filter: str = "direct"
) -> Dict[str, Array]:
    """Every stage boundary of the fft path, keyed like the reference's
    golden files — the formalisation of its staged-dump test methodology."""
    out = {"00iq": iq}
    out["01hamm"] = stage01_window(iq, jnp.asarray(consts.hamming, iq.real.dtype))
    out["02fft1"] = stage02_range_fft(out["01hamm"])
    out["03fft2"] = stage03_doppler(out["02fft1"])
    out["04abs"] = stage04_power(out["03fft2"])
    if matched_filter == "direct":
        out["07conv"] = matched_filter_direct(out["04abs"], consts.ma_taps)
    else:
        out["07conv"] = matched_filter_spectral(out["04abs"], jnp.asarray(consts.fft_ma))
    out["08pow"] = stage08_pulse_sum(out["07conv"])
    zdb, zdr = stage09_10_products(
        out["08pow"][..., 0, :], out["08pow"][..., 1, :], jnp.asarray(consts.gain)
    )
    out["09zdb"], out["10zdr"] = zdb, zdr
    return out


# --------------------------------------------------------------------------
# Jitted entry points.
# --------------------------------------------------------------------------


#: Named dot-precision policies.  "bf16x3" (3 bf16 MXU passes, fp32
#: accumulation) measures within 1.5x of the fp64 oracle error of
#: "highest" (6 passes) on the full chain while being ~20% faster; it is
#: the TPU default.  CPU backends may not implement the algorithm presets,
#: so "highest" is the portable default.
PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
    "bf16x3": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
    "bf16x6": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X6,
}


def default_precision_name() -> str:
    return "bf16x3" if jax.default_backend() == "tpu" else "highest"


@functools.partial(
    jax.jit,
    static_argnames=("ma_taps_tuple", "method", "matched_filter", "precision"),
)
def _process_planar_jit(iq_planar, hamming, ma_taps_tuple, fft_ma, gain,
                        op_ar, op_ai, op_br, op_bi, op_asum, wd, phasors,
                        method, matched_filter, precision="highest"):
    # int16 planar input (compact device feed) casts on-device; f32 no-op.
    xr = iq_planar[..., 0, :, :].astype(jnp.float32)
    xi = iq_planar[..., 1, :, :].astype(jnp.float32)
    if method == "parseval":
        prec = PRECISIONS[precision]
        yr, yi = _rmatmul_gauss(op_ar, op_ai, op_asum, xr, xi, prec)
        pow_all = stage_b_parseval(yr, yi, wd, phasors, prec)
        return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :],
                                   gain)
    if method == "mxu":
        p = stage01_04_mxu_planar(xr, xi, (op_ar, op_ai), (op_br, op_bi),
                                  PRECISIONS[precision])
    elif method == "fft":
        x = jax.lax.complex(xr, xi)
        x = stage01_window(x, hamming)
        x = stage02_range_fft(x)
        x = stage03_doppler(x)
        p = stage04_power(x)
    else:
        raise ValueError(f"unknown method {method!r}")
    if matched_filter not in ("direct", "fold", "spectral"):
        raise ValueError(f"unknown matched_filter {matched_filter!r}")
    if matched_filter == "direct":
        conv = matched_filter_direct(p, np.asarray(ma_taps_tuple, np.float32))
        pow_all = stage08_pulse_sum(conv)
    elif matched_filter == "fold":
        # Stages 05-08 folded: circular convolution preserves row sums
        # exactly (sum_j (p (*) ma)[j] = sum_j p[j] * sum_k ma[k]), so the
        # pulse-sum of the matched-filter output equals the pulse-sum of
        # the power matrix scaled by sum(ma).  Identity tested to ~1e-8 in
        # fp32 (tests/test_pipeline.py); use "direct" when stage-07
        # intermediates must be materialised.
        pow_all = stage08_pulse_sum(p) * float(np.sum(ma_taps_tuple))
    else:
        # fft_ma is carried planar [2, n] (complex64 transfer is not
        # universally supported); rebuild complex on device.
        conv = matched_filter_spectral(p, jax.lax.complex(fft_ma[0], fft_ma[1]))
        pow_all = stage08_pulse_sum(conv)
    return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :], gain)


def to_planar(iq) -> np.ndarray:
    """Complex [..., m, n] -> planar float32 [..., 2, m, n] (host-side)."""
    if isinstance(iq, np.ndarray):
        return np.stack([iq.real.astype(np.float32),
                         iq.imag.astype(np.float32)], axis=-3)
    return jnp.stack([jnp.real(iq).astype(jnp.float32),
                      jnp.imag(iq).astype(jnp.float32)], axis=-3)


class SectorProcessor:
    """Compiled batch processor bound to one config + device placement.

    Accepts complex IQ [B, C, m, n] (split to planar host-side) or planar
    float32 IQ [B, C, 2, m, n] (the codec's native layout).  The on-device
    dataflow is entirely real-valued.

    Methods:
      * "mxu"   — stages 01-04 as two dense constant matmuls (ops folded)
      * "radix" — same math with Cooley-Tukey radix-128 split DFTs,
                  ~3.8x fewer MACs (ops/dft.py); falls back to "mxu" when
                  the geometry doesn't split
      * "fft"   — literal XLA-FFT formulation (stage-parity/golden path;
                  unavailable on TPU runtimes without FFT support)

    Usage::

        proc = SectorProcessor(cfg, method="radix")
        zdb, zdr = proc(iq_batch)
    """

    def __init__(
        self,
        cfg: RadarConfig = DEFAULT_CONFIG,
        method: str = "mxu",
        matched_filter: str = "direct",
        device=None,
        precision: str | None = None,
        layout: str = "natural",
        wire_input: bool = False,
        wire_decode: str | None = None,
        wire_order: str = "natural",
    ):
        """layout="radix" (pallas only): input range rows arrive already in
        radix-DIT order (io/codec.decode_iq_i16(radix=proc.input_radix)),
        skipping the on-device permutation.

        wire_decode (with wire_input): "fused" folds the decode INTO the
        flagship kernel (fused_chain_power_wire — the deinterleave never
        happens; needs the radix kernel, i.e. radix layout support);
        "xla" is the standalone decode_wire_i16 pass feeding the planar
        kernel.  None picks fused when the geometry supports it.

        wire_order (with wire_input and layout="radix"): "radix" means
        the wire BYTES arrive with range rows already in radix-DIT order
        (io/codec.reorder_wire_rows — a host row-placement copy, free
        for per-row-datagram ingest), so the device skips its row gather
        — a measured 57 us/sector of chip time (WIRE_AB_r05.json);
        "natural" (default) reorders on the device.

        device: placement for the chain's constants (mxu/radix/fft
        methods stage them there; inputs follow).  The pallas method's
        constants are uncommitted, so its compute follows the INPUT's
        device — callers staging input onto `device` (the executor,
        bench) get the requested placement either way.

        matched_filter/precision apply to the XLA methods; the fused
        pallas kernel has its own fixed formulation (direct-equivalent
        matched filter, bf16x3 splits) and rejects a non-default
        matched_filter rather than silently ignoring it."""
        if matched_filter not in ("direct", "fold", "spectral"):
            raise ValueError(
                f"unknown matched_filter {matched_filter!r}: use "
                "'direct', 'fold', or 'spectral'")
        if method == "pallas" and matched_filter != "direct":
            raise ValueError(
                "method='pallas' fuses the whole chain; its output is "
                "exactly the direct/fold matched-filter result and the "
                "spectral variant does not exist there — pass "
                "matched_filter='direct' (the default)")
        if method == "radix" and matched_filter == "spectral":
            raise ValueError(
                "method='radix' implements 'direct' and 'fold' matched "
                "filters; use method='mxu' or 'fft' for the spectral "
                "parity path")
        if wire_input and method != "pallas":
            raise ValueError("wire_input (on-device decode of raw wire "
                             "bytes) requires method='pallas'")
        if wire_decode is not None and not wire_input:
            raise ValueError("wire_decode applies with wire_input=True")
        if wire_decode not in (None, "fused", "xla"):
            raise ValueError(f"unknown wire_decode {wire_decode!r}: use "
                             "'fused' or 'xla'")
        if wire_order not in ("natural", "radix"):
            raise ValueError(f"unknown wire_order {wire_order!r}: use "
                             "'natural' or 'radix'")
        if wire_order == "radix" and not (wire_input and layout == "radix"):
            raise ValueError(
                "wire_order='radix' (pre-permuted wire rows) requires "
                "wire_input=True and layout='radix' — the row order must "
                "match the kernel's")
        self.cfg = cfg
        self.wire_input = wire_input
        #: dtype the wire path prefers its input in.  np.int32 for the
        #: fused decode (the host VIEWS its staging bytes as '<i4' —
        #: free — and the kernel skips the device-side byte bitcast);
        #: np.uint8 otherwise.  Both dtypes are always accepted.
        self.wire_dtype = np.uint8
        self.wire_decode = None
        #: row order the wire path expects its bytes in ("radix" = the
        #: host pre-permuted the rows, io/codec.reorder_wire_rows)
        self.wire_order = wire_order if wire_input else "natural"
        self.input_radix = 1
        if method == "pallas":
            from .ops.pallas.fullchain import radix_for

            if layout == "radix":
                self.input_radix = radix_for(cfg.num_range_cells)
            if wire_input:
                fused_ok = (layout == "radix" and self.input_radix > 1)
                if wire_decode is None:
                    wire_decode = "fused" if fused_ok else "xla"
                elif wire_decode == "fused" and not fused_ok:
                    raise ValueError(
                        "wire_decode='fused' needs the radix kernel "
                        f"(layout='radix' and a radix-splittable m); got "
                        f"layout={layout!r}, m={cfg.num_range_cells}")
                self.wire_decode = wire_decode
                if wire_decode == "fused":
                    self.wire_dtype = np.int32
            self._pallas_fn = self._build_pallas_fn(
                cfg, device, pre_permuted=layout == "radix",
                wire_input=wire_input)
        elif layout != "natural":
            raise ValueError("layout='radix' requires method='pallas'")
        if method == "radix":
            from .ops.dft import RadixStageOperators

            if RadixStageOperators.supports(cfg):
                self._radix_ops = RadixStageOperators.build(cfg)
            else:
                method = "mxu"  # geometry too small to split
        self.method = method
        self.matched_filter = matched_filter
        self.device = device
        self.precision = precision or default_precision_name()
        if method == "pallas":
            return  # fused path: no XLA-side constants needed
        consts = PipelineConstants.build(cfg)
        if method == "radix":
            self._radix_fn = self._build_radix_fn(consts)
            return
        put = functools.partial(jax.device_put, device=device)
        self._dev_consts = (
            put(consts.hamming),
            tuple(float(t) for t in consts.ma_taps),  # static: baked into jit
            put(np.stack([consts.fft_ma.real, consts.fft_ma.imag]).astype(
                np.float32)),
            put(consts.gain),
            put(np.ascontiguousarray(consts.op_a_half.real)),
            put(np.ascontiguousarray(consts.op_a_half.imag)),
            put(np.ascontiguousarray(consts.op_b.real)),
            put(np.ascontiguousarray(consts.op_b.imag)),
            put(np.ascontiguousarray(consts.op_a_half.real
                                     + consts.op_a_half.imag)),
            put(consts.wd),
            put(consts.clip_phasors),
        )

    def _build_pallas_fn(self, cfg: RadarConfig, device,
                         pre_permuted: bool = False,
                         wire_input: bool = False):
        """Fused single-kernel chain (ops/pallas/fullchain.py): Gauss
        complex matmul + Parseval epilogue, all VMEM-resident.  Falls back
        to interpret mode off-TPU (tests).  wire_input=True prepends the
        on-device wire decode (ops/device_codec) inside the same jit: the
        caller feeds RAW reference wire bytes [B, nbytes] uint8."""
        from .ops.pallas.fullchain import build_pallas_processor, use_interpret

        consts = PipelineConstants.build(cfg)
        interpret = use_interpret()
        gain = jnp.asarray(consts.gain)
        input_radix = self.input_radix
        # device-side row gather: skipped when the host pre-permuted the
        # wire rows (wire_order="radix") — the rows then arrive exactly
        # as the radix kernel wants them
        dev_radix = 1 if self.wire_order == "radix" else input_radix

        if wire_input and self.wire_decode == "fused":
            # decode folded INTO the kernel (fused_chain_power_wire): the
            # wire's channel deinterleave never happens — the contraction
            # runs on the interleaved lanes and the epilogue is channel-
            # masked.  The only XLA-side work left is the contiguous
            # radix row gather (+ one bitcast when handed uint8 bytes).
            from .ops.device_codec import wire_words_i32
            from .ops.pallas.fullchain import (fused_chain_power_wire,
                                               radix_plan_host,
                                               wire_lane_consts)

            a_np, fac = radix_plan_host(consts, input_radix)
            a_radix = jnp.asarray(a_np)
            wd_il, ph_il = wire_lane_consts(consts, cfg.num_channels)
            wd_il = jnp.asarray(wd_il)
            ph_il = jnp.asarray(ph_il)
            ch = cfg.num_channels

            @jax.jit
            def fn(wire):
                w32 = wire_words_i32(wire, cfg, radix=dev_radix)
                pow_all = fused_chain_power_wire(
                    w32, a_radix, fac, wd_il, ph_il, ch,
                    interpret=interpret)
                return stage09_10_products(pow_all[..., 0, :],
                                           pow_all[..., 1, :], gain)

            return fn

        power_fn = build_pallas_processor(consts, interpret=interpret,
                                          pre_permuted=pre_permuted)

        if wire_input:
            from .ops.device_codec import decode_wire_i16

            @jax.jit
            def fn(wire_u8):
                iq_planar = decode_wire_i16(wire_u8, cfg, radix=dev_radix)
                pow_all = power_fn(iq_planar)
                return stage09_10_products(pow_all[..., 0, :],
                                           pow_all[..., 1, :], gain)

            return fn

        @jax.jit
        def fn(iq_planar):
            pow_all = power_fn(iq_planar)
            return stage09_10_products(pow_all[..., 0, :],
                                       pow_all[..., 1, :], gain)

        return fn

    def _build_radix_fn(self, consts: PipelineConstants):
        """Per-instance jit for the radix method (its operator tables are
        embedded as XLA constants — a few hundred KB)."""
        from .ops.dft import stage01_04_radix

        ops = self._radix_ops
        taps = consts.ma_taps.copy()
        gain = consts.gain.copy()
        prec = PRECISIONS[self.precision]

        matched_filter = self.matched_filter

        @jax.jit
        def fn(iq_planar):
            p = stage01_04_radix(iq_planar[..., 0, :, :],
                                 iq_planar[..., 1, :, :], ops, prec)
            if matched_filter == "fold":
                pow_all = stage08_pulse_sum(p) * float(np.sum(taps))
            else:
                pow_all = stage08_pulse_sum(matched_filter_direct(p, taps))
            return stage09_10_products(pow_all[..., 0, :], pow_all[..., 1, :],
                                       jnp.asarray(gain))

        return fn

    def __call__(self, iq: Array) -> Tuple[Array, Array]:
        if self.wire_input:
            nb = self.cfg.sector_nbytes_wire
            ok = (not np.iscomplexobj(iq)
                  and ((iq.dtype == np.uint8 and iq.shape[-1] == nb)
                       or (iq.dtype == np.int32
                           and iq.shape[-1] == nb // 4
                           and self.wire_decode == "fused")))
            if not ok:
                raise ValueError(
                    f"wire_input processor expects uint8 [..., {nb}] raw "
                    "wire bytes (or, with wire_decode='fused', int32 "
                    f"[..., {nb // 4}] LE-viewed words); got "
                    f"{iq.dtype} {tuple(iq.shape)}")
            if iq.ndim == 1:
                zdb, zdr = self._pallas_fn(iq[None])
                return zdb[0], zdr[0]
            return self._pallas_fn(iq)
        if np.iscomplexobj(iq):
            iq = to_planar(np.asarray(iq) if isinstance(iq, np.ndarray) else iq)
            if self.input_radix > 1:
                # layout="radix" expects pre-permuted rows; complex input
                # is in natural order, so permute here (host-side)
                from .ops.pallas.fullchain import radix_row_order

                order = radix_row_order(self.cfg.num_range_cells,
                                        self.input_radix)
                iq = np.asarray(iq)[..., order, :]
        expect = (self.cfg.num_channels, 2, self.cfg.m, self.cfg.n)
        if tuple(iq.shape[-4:]) != expect:
            raise ValueError(
                f"planar IQ must end in [channels, 2, m, n] = {expect}, "
                f"got {tuple(iq.shape)}"
            )
        if self.method in ("pallas", "radix") and iq.ndim == 4:
            # unbatched single sector: the fused/radix paths unpack an
            # explicit batch axis (mxu/fft broadcast) — normalise so the
            # API is consistent across methods
            fn = self._pallas_fn if self.method == "pallas" else self._radix_fn
            zdb, zdr = fn(iq[None])
            return zdb[0], zdr[0]
        if self.method == "pallas":
            return self._pallas_fn(iq)
        if self.method == "radix":
            return self._radix_fn(iq)
        h, taps, fm, g, ar, ai, br, bi, asum, wd, ph = self._dev_consts
        return _process_planar_jit(iq, h, taps, fm, g, ar, ai, br, bi,
                                   asum, wd, ph,
                                   self.method, self.matched_filter,
                                   self.precision)
