"""Box geometry tests (reference hoomd/test/test_boxdim.cc semantics)."""

import numpy as np
import pytest


def make_box(*a, **k):
    from hoomd_tpu.box import Box
    return Box.create(*a, **k)


def test_volume():
    b = make_box(2.0, 3.0, 4.0)
    assert float(b.volume()) == pytest.approx(24.0)


def test_wrap_orthorhombic():
    import jax.numpy as jnp
    b = make_box(10.0)
    pos = jnp.array([[6.0, -7.0, 0.0]])
    img = jnp.zeros((1, 3), dtype=jnp.int32)
    p, i = b.wrap(pos, img)
    np.testing.assert_allclose(np.asarray(p), [[-4.0, 3.0, 0.0]],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), [[1, -1, 0]])


def test_min_image():
    import jax.numpy as jnp
    b = make_box(10.0)
    dr = jnp.array([[6.0, -6.0, 4.9]])
    mi = np.asarray(b.min_image(dr))
    np.testing.assert_allclose(mi, [[-4.0, 4.0, 4.9]], atol=1e-5)


def test_fraction_roundtrip():
    import jax.numpy as jnp
    b = make_box(8.0, 6.0, 4.0, xy=0.3, xz=-0.2, yz=0.1)
    pos = jnp.array([[1.0, -2.0, 1.5], [0.0, 0.0, 0.0]])
    f = b.make_fraction(pos)
    back = b.from_fraction(f)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pos),
                               atol=1e-5)


def test_triclinic_min_image_lattice_equivalence():
    """min_image(dr) must differ from dr by an integer lattice translation
    and be idempotent (the greedy z->y->x reduction, BoxDim::minImage, is
    exact only for reduced tilts but always lattice-equivalent)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    b = make_box(5.0, 7.0, 6.0, xy=0.5, xz=0.1, yz=-0.3)
    h = np.asarray(b.lattice_vectors())
    dr = jnp.asarray(rng.uniform(-10, 10, (100, 3)).astype(np.float32))
    mi = np.asarray(b.min_image(dr))
    n = np.linalg.solve(h, (np.asarray(dr) - mi).T).T
    np.testing.assert_allclose(n, np.round(n), atol=1e-3)
    # idempotent
    mi2 = np.asarray(b.min_image(jnp.asarray(mi)))
    np.testing.assert_allclose(mi2, mi, atol=1e-5)


def test_orthorhombic_min_image_is_minimal():
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    b = make_box(5.0, 7.0, 6.0)
    L = np.array([5.0, 7.0, 6.0])
    dr_np = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
    mi = np.asarray(b.min_image(jnp.asarray(dr_np)))
    ref = dr_np - L * np.round(dr_np / L)
    np.testing.assert_allclose(mi, ref, atol=1e-4)


def test_wrap_preserves_min_image_distances():
    """Wrapping any particle must not change min-image pair distances."""
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    b = make_box(6.0, 5.0, 4.0, xy=0.2)
    pos = jnp.asarray(rng.uniform(-10, 10, (20, 3)).astype(np.float32))
    img = jnp.zeros((20, 3), dtype=jnp.int32)
    w, _ = b.wrap(pos, img)
    d0 = np.asarray(b.min_image(pos[:, None] - pos[None, :]))
    d1 = np.asarray(b.min_image(w[:, None] - w[None, :]))
    np.testing.assert_allclose(np.linalg.norm(d0, axis=-1),
                               np.linalg.norm(d1, axis=-1), atol=1e-4)
