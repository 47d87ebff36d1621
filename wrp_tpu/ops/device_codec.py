"""On-device wire decode: raw interleaved big-endian int16 -> planar i16.

The host-side decoder (io/codec.py, native/codec.cpp) is the end-to-end
bottleneck of the consolidation design: one SIMD host core decodes
~1 440 wire sectors/s while one chip processes ~36 000/s, so saturating
a chip takes ~25 decode cores (DESIGN.md §6).  This module moves the
decode (byteswap + channel/IQ deinterleave + optional radix row
reorder) onto the device as fused XLA elementwise ops plus one
HBM-bandwidth transpose: the host then only reassembles datagrams and
memcpys wire bytes, and the H2D traffic is unchanged (the wire IS
int16: 12 B/sample either way).

Chip-side decode spends device time a host-decoded feed would not —
it is a deployment OPTION for host-core-constrained consolidation
(`bench.py --in-dtype wire` measures exactly what it costs on the
timed path), not an unconditional win.

Wire format (reference sector.cpp:52-62, read_single.cc:15): one
sector = m*n samples x 12 bytes, each sample interleaved big-endian
int16 ``hhI hhQ vvI vvQ vhI vhQ``.  Parity with the host decoder is
pinned to exact int16 equality in tests/test_codec.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RadarConfig, DEFAULT_CONFIG
from .pallas.fullchain import radix_row_order


def decode_wire_i16(wire_u8: jax.Array,
                    cfg: RadarConfig = DEFAULT_CONFIG,
                    radix: int = 1) -> jax.Array:
    """uint8 [..., m*n*ch*4] wire bytes -> int16 [..., ch, 2, m, n].

    Matches io/codec.decode_iq_i16 bit-exactly (big-endian int16
    deinterleave, optional radix row reorder).  All arithmetic is int32
    (TPU-native); the only data movement is the deinterleave transpose,
    which XLA performs at HBM bandwidth.
    """
    m, n, ch = cfg.num_range_cells, cfg.num_pulses, cfg.num_channels
    nbytes = m * n * cfg.bytes_per_sample
    lead = wire_u8.shape[:-1]
    if wire_u8.dtype != jnp.uint8 or wire_u8.shape[-1] != nbytes:
        raise ValueError(
            f"expected uint8 [..., {nbytes}] wire bytes; got "
            f"{wire_u8.dtype} {wire_u8.shape}")
    # [..., m, n, ch, 2(IQ), 2(BE bytes)] -> int32 big-endian compose
    b = wire_u8.reshape(*lead, m, n, ch, 2, 2).astype(jnp.int32)
    v = b[..., 0] * 256 + b[..., 1]              # 0..65535
    v = jnp.where(v >= 32768, v - 65536, v)      # sign per int16
    # cast BEFORE the deinterleave transpose: the transpose is the
    # decode's only real data movement, so moving i16 instead of i32
    # halves its HBM traffic (the compose arithmetic fuses either way)
    v = v.astype(jnp.int16)
    # [..., m, n, ch, 2] -> [..., ch, 2, m, n]
    nd = v.ndim
    perm = tuple(range(nd - 4)) + (nd - 2, nd - 1, nd - 4, nd - 3)
    planar = jnp.transpose(v, perm)
    if radix > 1:
        # the ONE canonical permutation (shared with the kernel plan and,
        # by parity test, the host decoder) — a drifting copy here would
        # break the bit-parity contract silently
        order = radix_row_order(m, radix)
        planar = jnp.take(planar, jnp.asarray(order), axis=nd - 2)
    return planar
