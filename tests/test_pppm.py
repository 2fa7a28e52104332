"""PPPM electrostatics validation (reference md/test/test_pppm_force.cc
uses analytic two-charge configs; the classic global check is the NaCl
Madelung constant)."""

import numpy as np
import pytest


def direct_ewald(pos, q, L, kappa, kmax=8, rmax_cells=1):
    """Well-converged direct Ewald sum (numpy, float64) as oracle."""
    N = len(pos)
    U_real = 0.0
    from scipy.special import erfc
    for i in range(N):
        for j in range(N):
            for nx in range(-rmax_cells, rmax_cells + 1):
                for ny in range(-rmax_cells, rmax_cells + 1):
                    for nz in range(-rmax_cells, rmax_cells + 1):
                        if i == j and nx == ny == nz == 0:
                            continue
                        d = pos[i] - pos[j] + L * np.array([nx, ny, nz])
                        r = np.linalg.norm(d)
                        U_real += 0.5 * q[i] * q[j] * erfc(kappa * r) / r
    V = L ** 3
    U_k = 0.0
    ms = range(-kmax, kmax + 1)
    for mx in ms:
        for my in ms:
            for mz in ms:
                if mx == my == mz == 0:
                    continue
                k = 2 * np.pi / L * np.array([mx, my, mz])
                k2 = k @ k
                rho = np.sum(q * np.exp(1j * pos @ k))
                U_k += (2 * np.pi / (V * k2) * np.exp(-k2 / (4 * kappa ** 2))
                        * np.abs(rho) ** 2)
    U_self = -kappa / np.sqrt(np.pi) * np.sum(q ** 2)
    return U_real + U_k + U_self


def test_madelung_nacl():
    """NaCl rock salt: U/ion = -1.747565 q^2/a (Madelung)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    a = 1.0
    n = 4  # 4^3 conventional-ish cells of 2 ions along each axis
    # build CsCl-style alternating lattice = rock salt along cubic axes
    snap = hoomd.data.make_snapshot(
        (2 * n) ** 3, hoomd.data.boxdim(L=2 * n * a),
        particle_types=['A', 'B'])
    idx = 0
    for i in range(2 * n):
        for j in range(2 * n):
            for k in range(2 * n):
                snap.particles.position[idx] = (np.array([i, j, k]) * a
                                                - n * a + a / 2)
                s = (-1) ** (i + j + k)
                snap.particles.charge[idx] = s
                snap.particles.typeid[idx] = 0 if s > 0 else 1
                idx += 1
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=32, Ny=32, Nz=32, order=5, rcut=3.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = system.thermo_quantities()['potential_energy']
    N = snap.particles.N
    # total lattice energy = -(N/2) * alpha * q^2/a  =>  per ION -alpha/2
    madelung = -1.747565
    assert pe / N == pytest.approx(madelung / 2, rel=2e-3)
    # forces vanish by symmetry on a perfect lattice
    f = np.asarray(system.state.net_force)
    assert np.abs(f).max() < 5e-2


def test_pppm_vs_direct_ewald_random():
    """Random neutral charge cloud vs converged direct Ewald."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    rng = np.random.RandomState(2)
    N, L = 16, 6.0
    pos = rng.uniform(-L / 2, L / 2, (N, 3))
    # enforce minimum separation so energies are moderate
    ok = False
    while not ok:
        d = pos[None] - pos[:, None]
        d -= L * np.round(d / L)
        r = np.linalg.norm(d, axis=-1) + np.eye(N) * 1e9
        if r.min() > 0.8:
            ok = True
        else:
            pos = rng.uniform(-L / 2, L / 2, (N, 3))
    q = np.ones(N)
    q[N // 2:] = -1.0
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['A'])
    snap.particles.position[:] = pos
    snap.particles.charge[:] = q
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=32, Ny=32, Nz=32, order=5, rcut=2.8)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = system.thermo_quantities()['potential_energy']
    u_ref = direct_ewald(pos, q, L, kappa=p.kappa)
    assert pe == pytest.approx(u_ref, rel=5e-3)


def test_pppm_force_on_dipole():
    """Two opposite charges: PPPM force ~ direct Ewald force by finite
    difference of the oracle energy."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    L = 10.0
    d0 = 1.1
    pos = np.array([[-d0 / 2, 0, 0], [d0 / 2, 0, 0]])
    q = np.array([1.0, -1.0])
    snap = hoomd.data.make_snapshot(2, hoomd.data.boxdim(L=L),
                                    particle_types=['A'])
    snap.particles.position[:] = pos
    snap.particles.charge[:] = q
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=48, Ny=48, Nz=48, order=6, rcut=4.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    f = np.asarray(system.state.net_force)
    # oracle force via central difference on the direct Ewald energy
    eps = 1e-4
    kap = p.kappa

    def U(x0):
        pp = pos.copy()
        pp[0, 0] = x0
        return direct_ewald(pp, q, L, kappa=kap, kmax=10)
    f_ref = -(U(-d0 / 2 + eps) - U(-d0 / 2 - eps)) / (2 * eps)
    assert f[0, 0] == pytest.approx(f_ref, rel=2e-2)
    np.testing.assert_allclose(f[0], -f[1], atol=5e-3)


def test_pppm_momentum_conservation_md():
    """Charged fluid under NVE: net force ~0 and finite energies
    (bench config 4 smoke)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    rng = np.random.RandomState(5)
    n = 4
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=n)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    N = snap.particles.N
    qs = np.ones(N)
    qs[::2] = -1.0
    snap.particles.charge[:] = qs
    snap.particles.velocity[:] = rng.normal(0, 0.5, (N, 3))
    system.restore_snapshot(snap)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=16, Ny=16, Nz=16, order=4, rcut=2.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(100, quiet=True)
    q = system.thermo_quantities()
    assert np.isfinite(q['potential_energy'])
    fnet = np.asarray(system.state.net_force).sum(axis=0)
    assert np.abs(fnet).max() < 0.5
