"""Plane-local rebin op vs a numpy re-binning oracle.

The op's contract (ops/pallas_rebin.py): given correctly binned
cell-major state whose particles have since drifted less than one cell
along any axis, produce a correctly re-binned layout where every
particle sits in the cell containing its wrapped position, positions
are shifted by ±L (and images counted) on periodic-boundary crossings,
and all payload columns ride along bit-exactly.  Slot order within a
cell is unspecified.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hoomd_tpu.ops.pallas_rebin import cell_rebin_plane
from hoomd_tpu._config import PAD_COORD


def _mkconfig(rng, cell_dim, C, L, fill_lo, fill_hi, margin=0.45):
    nx, ny, nz = cell_dim
    nc = nx * ny * nz
    w = np.array([L[0] / nx, L[1] / ny, L[2] / nz])
    pos = np.full((nc, C, 3), PAD_COORD, np.float32)
    vel = np.zeros((nc, C, 3), np.float32)
    frc = np.zeros((nc, C, 3), np.float32)
    img = np.zeros((nc, C, 3), np.int32)
    tag = np.full((nc, C), -1, np.int32)
    mass = np.ones((nc, C), np.float32)
    t = 0
    for iz in range(nz):
        for iy in range(ny):
            for ix in range(nx):
                c = ix + nx * (iy + ny * iz)
                k = rng.randint(fill_lo, fill_hi + 1)
                org = np.array([ix, iy, iz]) * w - np.array(L) / 2
                # interior points, then drift below moves some across
                u = rng.uniform(0.02, 0.98, (k, 3))
                pos[c, :k] = (org + u * w).astype(np.float32)
                vel[c, :k] = rng.randn(k, 3)
                frc[c, :k] = rng.randn(k, 3)
                img[c, :k] = rng.randint(-3, 4, (k, 3))
                tag[c, :k] = np.arange(t, t + k)
                mass[c, :k] = rng.uniform(0.5, 2.0, k)
                t += k
    # drift: up to margin*w in each axis (can cross one boundary)
    drift = rng.uniform(-margin, margin, (nc, C, 3)) * w
    live = tag >= 0
    pos[live] = pos[live] + drift[live].astype(np.float32)
    return pos, vel, frc, img, tag, mass, t


def _oracle(pos, vel, frc, img, tag, mass, cell_dim, L):
    """Expected state per tag: wrapped position, adjusted image, and
    target cell id."""
    nx, ny, nz = cell_dim
    w = np.array([L[0] / nx, L[1] / ny, L[2] / nz], np.float32)
    live = tag >= 0
    out = {}
    for c, s in zip(*np.nonzero(live)):
        p = pos[c, s].copy()
        im = img[c, s].copy()
        # wrap exactly as the op: one crossing max per axis
        f = p + np.asarray(L, np.float32) / 2
        cid3 = np.floor(f / w).astype(int)
        for a, n in enumerate((nx, ny, nz)):
            if cid3[a] >= n:
                cid3[a] -= n
                p[a] = np.float32(p[a] - np.float32(L[a]))
                im[a] += 1
            elif cid3[a] < 0:
                cid3[a] += n
                p[a] = np.float32(p[a] + np.float32(L[a]))
                im[a] -= 1
        cell = cid3[0] + nx * (cid3[1] + ny * cid3[2])
        out[int(tag[c, s])] = (cell, p, vel[c, s], frc[c, s], im,
                               mass[c, s])
    return out


@pytest.mark.parametrize('variant', ['select', 'grid', 'xsel',
                                     'xsel_planes'])
@pytest.mark.parametrize('cell_dim,C,fill', [((4, 4, 4), 24, (6, 10)),
                                             ((5, 3, 4), 32, (10, 14)),
                                             ((3, 3, 3), 24, (4, 8))])
def test_rebin_matches_oracle(cell_dim, C, fill, variant):
    rng = np.random.RandomState(7)
    L = (float(cell_dim[0]) * 3.1, float(cell_dim[1]) * 3.3,
         float(cell_dim[2]) * 2.9)
    pos, vel, frc, img, tag, mass, N = _mkconfig(
        rng, cell_dim, C, L, *fill)
    exp = _oracle(pos, vel, frc, img, tag, mass, cell_dim, L)

    if variant == 'xsel':
        from hoomd_tpu.ops.pallas_rebin import cell_rebin_xsel
        p2, v2, f2, i2, t2, m2, cap_ovf, lost = cell_rebin_xsel(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(frc),
            jnp.asarray(img), jnp.asarray(tag), jnp.asarray(mass),
            cell_dim, jnp.asarray(L, jnp.float32), C=C)
        ovf = cap_ovf | lost
    elif variant == 'xsel_planes':
        # plane-layout entry: must be bit-identical to the (nc, C)
        # layout result after the layout round-trip
        from hoomd_tpu.ops.pallas_rebin import cell_rebin_xsel_planes
        nx, ny, nz = cell_dim
        nc = nx * ny * nz

        def to_p(a):
            return jnp.transpose(
                jnp.asarray(a).reshape(nz, ny, nx, C, 3),
                (4, 0, 1, 2, 3))

        def from_p(a):
            return jnp.transpose(a, (1, 2, 3, 4, 0)).reshape(nc, C, 3)
        gp, gv, gf, gim, gtag, gmass, cap_ovf, lost = \
            cell_rebin_xsel_planes(
                to_p(pos), to_p(vel), to_p(frc), to_p(img),
                jnp.asarray(tag).reshape(nz, ny, nx, C),
                jnp.asarray(mass).reshape(nz, ny, nx, C),
                cell_dim, jnp.asarray(L, jnp.float32), C=C)
        p2, v2, f2 = from_p(gp), from_p(gv), from_p(gf)
        i2 = from_p(gim)
        t2 = gtag.reshape(nc, C)
        m2 = gmass.reshape(nc, C)
        ovf = cap_ovf | lost
    else:
        p2, v2, f2, i2, t2, m2, ovf = cell_rebin_plane(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(frc),
            jnp.asarray(img), jnp.asarray(tag), jnp.asarray(mass),
            cell_dim, jnp.asarray(L, jnp.float32), C=C, E=8,
            interpret=True, variant=variant)
    p2, v2, f2, i2, t2, m2 = map(np.asarray, (p2, v2, f2, i2, t2, m2))
    assert not bool(ovf)

    live = t2 >= 0
    assert live.sum() == N
    seen = set()
    for c, s in zip(*np.nonzero(live)):
        tg = int(t2[c, s])
        assert tg not in seen
        seen.add(tg)
        cell, p, v, f, im, ms = exp[tg]
        assert cell == c, (tg, cell, c)
        np.testing.assert_array_equal(p2[c, s], p)
        np.testing.assert_array_equal(v2[c, s], v)
        np.testing.assert_array_equal(f2[c, s], f)
        np.testing.assert_array_equal(i2[c, s], im)
        assert m2[c, s] == ms
    # padding slots carry the canonical fill
    assert np.all(p2[~live] == PAD_COORD)
    assert np.all(m2[~live] == 1.0)


def test_rebin_emigrant_overflow_flags():
    """More than E emigrants out of one cell face in one axis must
    raise the sticky overflow flag."""
    cell_dim, C = (3, 3, 3), 32
    L = (9.0, 9.0, 9.0)
    nc = 27
    pos = np.full((nc, C, 3), PAD_COORD, np.float32)
    tag = np.full((nc, C), -1, np.int32)
    # 12 particles all pushed past the +x face of cell 0
    pos[0, :12] = np.array([3.1, 1.5, 1.5], np.float32) - 4.5
    tag[0, :12] = np.arange(12)
    z3 = jnp.zeros((nc, C, 3), jnp.float32)
    out = cell_rebin_plane(
        jnp.asarray(pos), z3, z3, jnp.zeros((nc, C, 3), jnp.int32),
        jnp.asarray(tag), jnp.ones((nc, C), jnp.float32),
        cell_dim, jnp.asarray(L, jnp.float32), C=C, E=8,
        interpret=True)
    assert bool(out[-1])


def test_rebin_idempotent_when_binned():
    """A correctly binned configuration with zero drift passes through
    unchanged (up to slot order)."""
    rng = np.random.RandomState(3)
    cell_dim, C = (4, 4, 4), 16
    L = (12.0, 12.0, 12.0)
    pos, vel, frc, img, tag, mass, N = _mkconfig(
        rng, cell_dim, C, L, 5, 9, margin=0.0)
    p2, v2, f2, i2, t2, m2, ovf = cell_rebin_plane(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(frc),
        jnp.asarray(img), jnp.asarray(tag), jnp.asarray(mass),
        cell_dim, jnp.asarray(L, jnp.float32), C=C, E=8,
        interpret=True)
    assert not bool(ovf)
    t2 = np.asarray(t2)
    for c in range(pos.shape[0]):
        assert (set(t2[c][t2[c] >= 0].tolist())
                == set(tag[c][tag[c] >= 0].tolist()))
