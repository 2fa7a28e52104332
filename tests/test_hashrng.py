"""Statistical gates for the fast-engine counter RNG (ops/hashrng.py).
The reference trusts Saru's avalanche for the same role
(hoomd/Saru.h:51-121); these tests assert the properties Langevin
actually consumes: correct moments, near-independence across tags,
steps, and axes, and determinism."""

import numpy as np

from hoomd_tpu.ops import hashrng


def _draws(n=1 << 15, step=123, seed=7, salt=1):
    tag = np.arange(n, dtype=np.int32)
    return np.asarray(hashrng.uniform_pm1(seed, step, tag, salt=salt))


def test_moments():
    u = _draws()
    n = u.size
    # uniform[-1,1): mean 0 (se = 1/sqrt(3n)), var 1/3
    assert abs(u.mean()) < 4.0 / np.sqrt(3 * n)
    assert abs(u.var() - 1.0 / 3.0) < 0.01
    assert u.min() >= -1.0 and u.max() < 1.0
    # fourth moment of U(-1,1) is 1/5 (flatness check: catches weak
    # mixers that cluster draws)
    assert abs((u ** 4).mean() - 0.2) < 0.01


def test_uniformity_chi2():
    u = _draws(1 << 16)
    counts, _ = np.histogram(u, bins=64, range=(-1.0, 1.0))
    expect = u.size / 64
    chi2 = ((counts - expect) ** 2 / expect).sum()
    # 63 dof: mean 63, sd ~11.2; 5 sigma gate
    assert chi2 < 63 + 5 * np.sqrt(2 * 63)


def test_independence_axes_tags_steps():
    a = _draws(salt=1)
    b = _draws(salt=2)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02        # axes
    c = _draws(step=124)
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.02        # steps
    assert abs(np.corrcoef(a[:-1], a[1:])[0, 1]) < 0.02   # adjacent tags
    d = _draws(seed=8)
    assert abs(np.corrcoef(a, d)[0, 1]) < 0.02        # seeds


def test_deterministic_and_tag_keyed():
    a = _draws()
    b = _draws()
    assert np.array_equal(a, b)
    # permuting tag order permutes draws identically (re-sort invariance,
    # the property that makes slot-space evaluation exact)
    tag = np.arange(1 << 10, dtype=np.int32)
    perm = np.random.RandomState(0).permutation(tag)
    u1 = np.asarray(hashrng.uniform_pm1(7, 5, tag))
    u2 = np.asarray(hashrng.uniform_pm1(7, 5, perm))
    assert np.array_equal(u1[perm], u2)


def test_vector_shape():
    tag = np.arange(100, dtype=np.int32)
    v = np.asarray(hashrng.uniform3_pm1(3, 9, tag))
    assert v.shape == (100, 3)
    assert abs(v.var() - 1.0 / 3.0) < 0.05
