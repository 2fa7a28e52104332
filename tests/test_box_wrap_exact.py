"""Box.wrap / from_fraction must be bit-exact (no MXU rounding).

On TPU, f32 matmuls lower to single-pass bf16 on the MXU, so the
original `shift @ h.T` form of Box.wrap subtracted a bf16-ROUNDED box
length: every boundary crossing kicked the particle by ~L*2^-9
(0.0185 sigma at L=34.7) — a steady energy injection that sent the
32k Kremer-Grest benchmark into a FENE blowup on TPU while CPU (exact
f32 matmul) stayed green.  The elementwise forms are exact on every
backend; these tests pin the exactness property itself."""

import numpy as np


def test_wrap_exact_subtraction():
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    L = (34.7315, 34.7315, 31.04)
    b = Box.create(*L)
    rng = np.random.RandomState(0)
    pos = rng.uniform(-1.5, 1.5, (256, 3)).astype(np.float32)
    pos *= np.asarray(L, np.float32)  # many out-of-box rows
    img = jnp.zeros((256, 3), jnp.int32)
    w, im = b.wrap(jnp.asarray(pos), img)
    w = np.asarray(w)
    im = np.asarray(im)
    # exact f64 oracle of the same f32 arithmetic
    Lf = np.asarray(L, np.float32)
    f = pos / Lf + np.float32(0.5)
    shift = np.floor(f).astype(np.float32)
    expect = pos - shift * Lf
    assert np.array_equal(w, expect)
    assert np.array_equal(im, shift.astype(np.int32))
    assert np.all(np.abs(w) <= Lf / 2 + 1e-4)


def test_from_fraction_roundtrip_exact():
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    b = Box.create(17.25, 9.5, 31.0)
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.rand(128, 3), jnp.float32)
    pos = np.asarray(b.from_fraction(f))
    Lf = np.asarray([17.25, 9.5, 31.0], np.float32)
    expect = (np.asarray(f) - np.float32(0.5)) * Lf
    assert np.array_equal(pos, expect)
