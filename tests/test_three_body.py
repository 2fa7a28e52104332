"""3-body potentials (tersoff, square_density) and DLVO vs numpy
oracles; forces via finite difference (autodiff path)."""

import numpy as np
import pytest

P = dict(cutoff_thickness=0.3, C1=1.2, C2=1.6, lambda1=2.0, lambda2=1.1,
         dimer_r=1.5, n=0.8, gamma=1.3, lambda3=1.2, c=1.5, d=0.9, m=0.2,
         alpha=3.0)
RC = 2.6


def _tersoff_oracle(pos):
    def fcut(r):
        inner = RC - P['cutoff_thickness']
        if r <= inner:
            return 1.0
        if r >= RC:
            return 0.0
        x = (r - inner) / P['cutoff_thickness']
        return np.exp(P['alpha'] * x ** 3 / (x ** 3 - 1))
    E = 0.0
    Np = len(pos)
    for i in range(Np):
        for j in range(Np):
            if i == j:
                continue
            rij = np.linalg.norm(pos[i] - pos[j])
            if rij >= RC:
                continue
            chi = 0.0
            for k in range(Np):
                if k in (i, j):
                    continue
                rik = np.linalg.norm(pos[i] - pos[k])
                if rik >= RC:
                    continue
                cth = np.dot(pos[j] - pos[i],
                             pos[k] - pos[i]) / (rij * rik)
                g = 1 + P['c'] ** 2 / P['d'] ** 2 \
                    - P['c'] ** 2 / (P['d'] ** 2 + (P['m'] - cth) ** 2)
                h = np.exp(P['lambda3'] ** 3 * (rij - rik) ** 3)
                chi += fcut(rik) * g * h
            gn = P['gamma'] ** P['n']
            bij = (1 + gn * chi ** P['n']) ** (-0.5 / P['n']) \
                if chi > 0 else 1.0
            fR = P['C1'] * np.exp(P['lambda1'] * (P['dimer_r'] - rij))
            fA = P['C2'] * np.exp(P['lambda2'] * (P['dimer_r'] - rij))
            E += 0.5 * fcut(rij) * (fR - bij * fA)
    return E


def test_tersoff_energy_and_forces():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    pos = np.array([[0, 0, 0], [1.8, 0, 0], [0.4, 1.7, 0],
                    [-.9, -1.2, 0.8]])
    snap = hoomd.data.make_snapshot(4, hoomd.data.boxdim(L=30))
    snap.particles.position[:] = pos
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    t = md.pair.tersoff(r_cut=RC, nlist=nl)
    t.pair_coeff.set('A', 'A', **P)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    E = system.thermo_quantities()['potential_energy']
    assert E == pytest.approx(_tersoff_oracle(pos), rel=1e-3)
    f = np.asarray(system.state.net_force)[np.asarray(system.state.rtag)]
    h = 1e-4
    for (i, a) in ((1, 0), (2, 1), (3, 2)):
        pp = pos.copy(); pp[i, a] += h; Ep = _tersoff_oracle(pp)
        pp = pos.copy(); pp[i, a] -= h; Em = _tersoff_oracle(pp)
        fd = -(Ep - Em) / (2 * h)
        assert f[i, a] == pytest.approx(fd, rel=1e-2, abs=1e-3)


def test_square_density_energy():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    rng = np.random.RandomState(2)
    N, L, rc = 30, 6.0, 1.8
    pos = rng.uniform(-L / 2, L / 2, (N, 3))
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L))
    snap.particles.position[:] = pos
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    sq = md.pair.square_density(r_cut=rc, nlist=nl)
    sq.pair_coeff.set('A', 'A', A=2.0, B=3.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    E = hoomd.context.current.system.thermo_quantities()[
        'potential_energy']
    dr = pos[None] - pos[:, None]
    dr -= L * np.round(dr / L)
    r = np.linalg.norm(dr, axis=-1)
    np.fill_diagonal(r, 1e9)
    w = np.where(r < rc, 15 / (2 * np.pi * rc ** 3) * (1 - r / rc) ** 2,
                 0)
    E_ref = (3.0 / 2 * (w.sum(1) - 2.0) ** 2).sum()
    assert E == pytest.approx(E_ref, rel=1e-3)


def test_dlvo_energy_and_force():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(2, hoomd.data.boxdim(L=20))
    snap.particles.position[:] = [[0, 0, 0], [2.6, 0, 0]]
    snap.particles.diameter[:] = [2.0, 1.0]
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    p = md.pair.dlvo(r_cut=4.0, nlist=nl)
    p.pair_coeff.set('A', 'A', kappa=1.5, Z=3.0, A=2.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system

    def dlvo_e(r, d1=2.0, d2=1.0, kappa=1.5, Z=3.0, A=2.0):
        rs, rb = (d1 + d2) / 2, (d1 - d2) / 2
        rp = d1 * d2 / 4
        frep = kappa * rp / rs * Z * np.exp(-kappa * (r - rs)) / r
        s, m = r * r - rs * rs, r * r - rb * rb
        return (r * frep / kappa - rp / s * A / 3 - rp / m * A / 3
                - np.log(s / m) * A / 6)
    E = system.thermo_quantities()['potential_energy']
    assert E == pytest.approx(dlvo_e(2.6), rel=1e-3)
    f = np.asarray(system.state.net_force)[np.asarray(system.state.rtag)]
    h = 1e-4
    fd = (dlvo_e(2.6 + h) - dlvo_e(2.6 - h)) / (2 * h)
    assert f[0, 0] == pytest.approx(fd, rel=1e-2)
