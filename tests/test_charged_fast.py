"""Charged fast-engine path (lj_ewald stencil evaluator + PPPM mesh
hook) vs the general engine.  The fast path fuses pair.lj and the
solver's real-space pair.ewald into one scan (charge window planes in
the planar kernel) and evaluates the k-space mesh as a per-step XLA
term on the cell-major layout (reference analog: the GPU runs
PPPMForceComputeGPU + the ewald pair kernel in the same step chain).

erfc differs between paths by the A&S 7.1.26 approximation error
(<= 1.5e-7), so parity is tight but not bitwise."""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _env():
    yield
    os.environ.pop('HOOMD_TPU_FAST', None)


def _build(fast):
    os.environ['HOOMD_TPU_FAST'] = 'on' if fast else 'off'
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    n, a = 6, 1.6
    L = n * a
    N = n ** 3
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['A', 'B'])
    idx = 0
    rng = np.random.RandomState(9)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                snap.particles.position[idx] = [
                    (i + .5) * a - L / 2, (j + .5) * a - L / 2,
                    (k + .5) * a - L / 2]
                s = 1.0 if (i + j + k) % 2 == 0 else -1.0
                snap.particles.charge[idx] = s
                snap.particles.typeid[idx] = 0 if s > 0 else 1
                idx += 1
    snap.particles.position[:] += rng.uniform(-0.05, 0.05, (N, 3))
    v = rng.normal(0, 1.0, (N, 3))
    v -= v.mean(0)
    snap.particles.velocity[:] = v
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    nl.reset_exclusions([])
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    for t1, t2 in [('A', 'A'), ('A', 'B'), ('B', 'B')]:
        lj.pair_coeff.set(t1, t2, epsilon=1.0, sigma=1.0)
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=16, Ny=16, Nz=16, order=5, rcut=2.5)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    return hoomd, system, N


def test_charged_single_eval_parity():
    hoomd, s1, N = _build(False)
    hoomd.run(1, quiet=True)
    assert not s1._program.get('fast')
    o1 = np.asarray(s1.state.rtag)
    f1 = np.asarray(s1.state.net_force)[o1]
    pe1 = float(np.asarray(s1.state.net_pe).sum())

    hoomd, s2, N = _build(True)
    hoomd.run(1, quiet=True)
    fast = s2._program.get('fast')
    assert fast and fast['eval_name'] == 'lj_ewald'
    o2 = np.asarray(s2.state.rtag)
    f2 = np.asarray(s2.state.net_force)[o2]
    pe2 = float(np.asarray(s2.state.net_pe).sum())

    scale = max(np.abs(f1).max(), 1.0)
    assert np.abs(f1 - f2).max() < 5e-4 * scale
    assert pe1 == pytest.approx(pe2, rel=2e-4, abs=5e-2)


def test_charged_fast_energy_and_temperature():
    hoomd, system, N = _build(True)
    hoomd.run(300, quiet=True)
    q = system.thermo_quantities()
    # NVT holds near kT; the melt stays bound (PE/N well below zero for
    # the NaCl-like lattice)
    assert 0.5 < q['temperature'] < 2.0
    assert q['potential_energy'] / N < -0.5
