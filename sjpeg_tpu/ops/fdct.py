"""Device 8x8 forward DCT, integer-exact, output scaled x16.

Reproduces the reference's fixed-point butterfly network (column pass,
src/fdct.cc:67-144) and cosine-table row pass (src/fdct.cc:174-209) with
identical shift orders and the LSB correction, so quantized output is
bit-identical to the spec oracle.  All arithmetic is int32 with natural
wraparound; int16 stores are emulated by sign-extension.

The whole transform is elementwise over the block axis (VPU work); XLA fuses
it with the surrounding color-conversion and quantization stages.
"""

import jax.numpy as jnp

from .. import constants as C


def _mult(a, b):
    """Q15-ish fixed multiply: (a * b) >> 16 in int32."""
    return (a * b) >> 16


def _butterfly(a, b):
    """{a, b} <- {a - b, a + b}."""
    return a - b, a + b


def _sext16(x):
    """Emulate int16 store + int32 reload (sign extension)."""
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def fdct_blocks(blocks):
    """[N, 64] int32 (centered samples) -> [N, 64] int32 coeffs (x16)."""
    x = blocks.reshape(-1, 8, 8).astype(jnp.int32)

    # ---- column pass: operates along rows axis, vectorized over (N, col) --
    m0, m1, m2, m3 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    m4, m5, m6, m7 = x[:, 4], x[:, 5], x[:, 6], x[:, 7]

    m0, m7 = _butterfly(m0, m7)
    m2, m5 = _butterfly(m2, m5)
    m3, m4 = _butterfly(m3, m4)
    m1, m6 = _butterfly(m1, m6)
    m7, m4 = _butterfly(m7, m4)
    m6, m5 = _butterfly(m6, m5)

    m4 = m4 << 3
    m5 = m5 << 3
    m4, m5 = _butterfly(m4, m5)
    col0, col4 = m5, m4

    m7 = m7 << 3
    m6 = m6 << 3
    m3 = m3 << 3
    m0 = m0 << 3

    t4 = _mult(jnp.int32(C.FDCT_K_TAN2), m7) - m6
    t5 = _mult(jnp.int32(C.FDCT_K_TAN2), m6) + m7
    col2, col6 = t5, t4

    m2 = m2 << 4
    m1 = m1 << 4
    m1, m2 = _butterfly(m1, m2)
    m2 = _mult(m2, jnp.int32(C.FDCT_K_2SQRT2))
    m1 = _mult(m1, jnp.int32(C.FDCT_K_2SQRT2))
    m3, m1 = _butterfly(m3, m1)
    m0, m2 = _butterfly(m0, m2)

    t7 = m3
    t6 = m1
    m3 = _mult(m3, jnp.int32(C.FDCT_K_TAN3M1)) + t7
    m1 = _mult(m1, jnp.int32(C.FDCT_K_TAN1)) + m2
    m1 = m1 + 1            # CORRECT_LSB
    m3 = m3 + 1            # CORRECT_LSB
    t4b = _mult(jnp.int32(C.FDCT_K_TAN3M1), m0) + m0
    t5b = _mult(jnp.int32(C.FDCT_K_TAN1), m2)

    col1 = m1
    col3 = m0 - m3
    col5 = t7 + t4b
    col7 = t5b - t6

    cols = jnp.stack([col0, col1, col2, col3, col4, col5, col6, col7], axis=1)
    r = _sext16(cols)       # [N, 8(row), 8(col)] after int16 store

    # ---- row pass ----
    a0 = r[:, :, 0] + r[:, :, 7]
    b0 = r[:, :, 0] - r[:, :, 7]
    a1 = r[:, :, 1] + r[:, :, 6]
    b1 = r[:, :, 1] - r[:, :, 6]
    a2 = r[:, :, 2] + r[:, :, 5]
    b2 = r[:, :, 2] - r[:, :, 5]
    a3 = r[:, :, 3] + r[:, :, 4]
    b3 = r[:, :, 3] - r[:, :, 4]

    tab = jnp.asarray(C.FDCT_ROW_TABLES, dtype=jnp.int32)   # [8, 7]
    C1, C2, C3 = tab[None, :, 0], tab[None, :, 1], tab[None, :, 2]
    C4, C5, C6, C7 = (tab[None, :, 3], tab[None, :, 4], tab[None, :, 5],
                      tab[None, :, 6])

    c0 = a0 + a3
    c1 = a0 - a3
    c2 = a1 + a2
    c3 = a1 - a2

    o0 = (C4 * (c0 + c2)) >> 16
    o4 = (C4 * (c0 - c2)) >> 16
    o2 = (C2 * c1 + C6 * c3) >> 16
    o6 = (C6 * c1 - C2 * c3) >> 16
    o1 = (C1 * b0 + C3 * b1 + C5 * b2 + C7 * b3) >> 16
    o3 = (C3 * b0 - C7 * b1 - C1 * b2 - C5 * b3) >> 16
    o5 = (C5 * b0 - C1 * b1 + C7 * b2 + C3 * b3) >> 16
    o7 = (C7 * b0 - C5 * b1 + C3 * b2 - C1 * b3) >> 16

    out = jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=2)
    return _sext16(out).reshape(-1, 64)
