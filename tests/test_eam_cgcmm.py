"""EAM (metal) and CG-CMM tests: synthetic setfl file vs numpy oracle."""

import numpy as np
import pytest


def write_synthetic_setfl(path):
    """Analytic EAM model tabulated in setfl format:
    F(rho) = -sqrt(rho), rho(r) = exp(-r), phi(r) = 0.5 exp(-2(r-1.5))."""
    nrho, nr = 2000, 2000
    rcut = 3.5
    rhomax = 20.0
    drho = rhomax / nrho
    dr = rcut / nr
    rho_grid = np.arange(nrho) * drho
    r_grid = np.arange(nr) * dr
    F = -np.sqrt(rho_grid)
    rho_r = np.exp(-r_grid)
    phi = 0.5 * np.exp(-2.0 * (r_grid - 1.5))
    rphi = r_grid * phi
    with open(path, 'w') as f:
        f.write("synthetic EAM\nfor testing\nonly\n")
        f.write("1 Cu\n")
        f.write(f"{nrho} {drho:.10e} {nr} {dr:.10e} {rcut:.10e}\n")
        f.write("29 63.5 3.6 fcc\n")
        for arr in (F, rho_r, rphi):
            for i in range(0, len(arr), 5):
                f.write(" ".join(f"{x:.10e}" for x in arr[i:i + 5])
                        + "\n")
    return dict(rcut=rcut)


def eam_oracle(pos, L, rcut):
    N = len(pos)
    dr = pos[None] - pos[:, None]
    dr -= L * np.round(dr / L)
    r = np.linalg.norm(dr, axis=-1)
    np.fill_diagonal(r, 1e9)
    within = r < rcut
    rho_i = np.sum(np.where(within, np.exp(-r), 0.0), axis=1)
    F = -np.sqrt(rho_i)
    phi = np.where(within, 0.5 * np.exp(-2.0 * (r - 1.5)), 0.0)
    U = F.sum() + 0.5 * phi.sum()
    # forces by finite difference would be slow; check energy only here
    return U


def test_eam_energy_vs_oracle(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, metal
    f = str(tmp_path / "synth.eam.alloy")
    meta = write_synthetic_setfl(f)
    rng = np.random.RandomState(1)
    N, L = 40, 8.0
    pos = rng.uniform(-L / 2, L / 2, (N, 3))
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['Cu'])
    snap.particles.position[:] = pos
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    e = metal.pair.eam(file=f, type='alloy', nlist=nl)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = system.thermo_quantities()['potential_energy']
    u_ref = eam_oracle(pos, L, meta['rcut'])
    assert pe == pytest.approx(u_ref, rel=2e-3)


def test_eam_nve_energy_conservation(tmp_path):
    """Many-body forces consistent with the energy: NVE conserves."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, metal
    f = str(tmp_path / "synth.eam.alloy")
    write_synthetic_setfl(f)
    rng = np.random.RandomState(3)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.fcc(a=2.0), n=3)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    snap.particles.types[0] = 'Cu'
    snap.particles.velocity[:] = rng.normal(
        0, 0.3, (snap.particles.N, 3))
    system.restore_snapshot(snap)
    system.particle_types = ['Cu']
    nl = md.nlist.cell()
    e = metal.pair.eam(file=f, type='alloy', nlist=nl)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(10, quiet=True)
    q0 = system.thermo_quantities()
    e0 = q0['kinetic_energy'] + q0['potential_energy']
    hoomd.run(400, quiet=True)
    q1 = system.thermo_quantities()
    e1 = q1['kinetic_energy'] + q1['potential_energy']
    assert abs(e1 - e0) / system.state.N < 2e-3


def test_cgcmm_pair_forms():
    """CG-CMM 9-6 form: V(r) = 27/4 eps [(s/r)^9 - (s/r)^6]."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, cgcmm
    r = 1.2
    snap = hoomd.data.make_snapshot(2, hoomd.data.boxdim(L=20),
                                    particle_types=['A'])
    snap.particles.position[0] = [-r / 2, 0, 0]
    snap.particles.position[1] = [r / 2, 0, 0]
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    cg = cgcmm.pair.cgcmm(r_cut=3.0, nlist=nl)
    cg.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0,
                      exponents='lj9_6')
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = hoomd.context.current.system.thermo_quantities()[
        'potential_energy']
    v_ref = 27.0 / 4.0 * (r ** -9 - r ** -6)
    assert pe == pytest.approx(v_ref, rel=1e-3)


def test_cgcmm_angle():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, cgcmm
    snap = hoomd.data.make_snapshot(3, hoomd.data.boxdim(L=20),
                                    particle_types=['A'],
                                    angle_types=['a'])
    snap.particles.position[0] = [1.2, 0, 0]
    snap.particles.position[1] = [0, 0, 0]
    snap.particles.position[2] = [0, 1.2, 0]
    snap.angles.resize(1)
    snap.angles.group[0] = [0, 1, 2]
    hoomd.init.read_snapshot(snap)
    a = cgcmm.angle.cgcmm()
    a.angle_coeff.set('a', k=5.0, t0=np.pi / 2, epsilon=0.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = hoomd.context.current.system.thermo_quantities()[
        'potential_energy']
    assert pe == pytest.approx(0.0, abs=1e-5)   # at the minimum


def write_synthetic_fs(path):
    """Two-element Finnis-Sinclair file with ASYMMETRIC densities:
    rho[A->A](r)=exp(-r), rho[A->B]=2exp(-r), rho[B->A]=3exp(-r),
    rho[B->B]=4exp(-r); F(rho) = -sqrt(rho); phi_AA = 0.5exp(-2(r-1.5)),
    phi_AB = 0.7exp(-2(r-1.5)), phi_BB = 0.9exp(-2(r-1.5))."""
    nrho, nr = 2000, 2000
    rcut = 3.5
    drho = 20.0 / nrho
    dr = rcut / nr
    rho_grid = np.arange(nrho) * drho
    r_grid = np.arange(nr) * dr
    F = -np.sqrt(rho_grid)
    e = np.exp(-r_grid)
    base = np.exp(-2.0 * (r_grid - 1.5))
    with open(path, 'w') as f:
        f.write("synthetic FS\nfor testing\nonly\n")
        f.write("2 A B\n")
        f.write(f"{nrho} {drho:.10e} {nr} {dr:.10e} {rcut:.10e}\n")

        def wr(arr):
            for i in range(0, len(arr), 5):
                f.write(" ".join(f"{x:.10e}" for x in arr[i:i + 5])
                        + "\n")
        # element A: F, rho[A->A], rho[A->B]
        f.write("1 1.0 1.0 fcc\n")
        wr(F); wr(1.0 * e); wr(2.0 * e)
        # element B: F, rho[B->A], rho[B->B]
        f.write("2 2.0 1.0 fcc\n")
        wr(F); wr(3.0 * e); wr(4.0 * e)
        # pair section: i>=j ordering: AA, BA, BB  (r*phi)
        wr(r_grid * 0.5 * base)
        wr(r_grid * 0.7 * base)
        wr(r_grid * 0.9 * base)
    return dict(rcut=rcut)


def test_eam_fs_energy_vs_oracle(tmp_path):
    """fs densities are directional: rho_i sums rho[t_j][t_i](r)
    (reference EAMForceCompute.cc:433-435)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, metal
    f = str(tmp_path / "synth.eam.fs")
    meta = write_synthetic_fs(f)
    rng = np.random.RandomState(3)
    N, L = 40, 8.0
    pos = rng.uniform(-L / 2, L / 2, (N, 3))
    tid = rng.randint(0, 2, N)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['A', 'B'])
    snap.particles.position[:] = pos
    snap.particles.typeid[:] = tid
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    metal.pair.eam(file=f, type='fs', nlist=nl)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    E = system.thermo_quantities()['potential_energy']

    # numpy oracle
    dr = pos[None] - pos[:, None]
    dr -= L * np.round(dr / L)
    r = np.linalg.norm(dr, axis=-1)
    np.fill_diagonal(r, 1e9)
    within = r < meta['rcut']
    dens = np.array([[1.0, 2.0], [3.0, 4.0]])   # rho[tj][ti] scale
    scale = dens[tid[None, :].repeat(N, 0), tid[:, None].repeat(N, 1)]
    # rho_i = sum_j dens[tj, ti] * exp(-r)
    rho_i = np.sum(np.where(within, scale * np.exp(-r), 0.0), axis=1)
    F_i = -np.sqrt(rho_i)
    phis = np.array([[0.5, 0.7], [0.7, 0.9]])
    pscale = phis[tid[:, None].repeat(N, 1), tid[None, :].repeat(N, 0)]
    phi = np.where(within, pscale * np.exp(-2.0 * (r - 1.5)), 0.0)
    U_ref = F_i.sum() + 0.5 * phi.sum()
    assert E == pytest.approx(U_ref, rel=2e-3)
