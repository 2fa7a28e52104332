"""Neighbor-capacity growth: systems denser than the mean-density estimate
must grow capacities (possibly several rounds) and produce exact forces —
the reference's nlist grow-and-rebuild protocol (md/NeighborList.cc)."""

import numpy as np
import pytest


def clustered_system(N=200, L=30.0, cluster_radius=2.0, seed=0):
    """All particles packed in a small ball inside a huge box: global
    density lies to the capacity estimator by ~1000x."""
    import hoomd_tpu as hoomd
    rng = np.random.RandomState(seed)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['A'])
    pos = rng.normal(0, cluster_radius / 2, (N, 3))
    pos = np.clip(pos, -cluster_radius, cluster_radius)
    snap.particles.position[:] = pos
    hoomd.init.read_snapshot(snap)
    return hoomd


def test_multi_round_growth_exact_energy():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd_mod = clustered_system()
    nl = md.nlist.cell()
    g = md.pair.gauss(r_cut=3.0, nlist=nl)
    g.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    sys_ = hoomd.context.current.system
    pe = sys_.thermo_quantities()['potential_energy']

    # oracle: brute-force gaussian energy
    snap = sys_.take_snapshot()
    p = snap.particles.position
    L = 30.0
    dr = p[None] - p[:, None]
    dr -= L * np.round(dr / L)
    r2 = (dr ** 2).sum(-1)
    iu = np.triu_indices(len(p), k=1)
    r2 = r2[iu]
    pe_ref = np.sum(np.exp(-0.5 * r2[r2 < 9.0]))
    assert pe == pytest.approx(pe_ref, rel=1e-4)
    # growth must have happened (estimate was ~mean density)
    assert sys_._program['nl_cfgs'][0].max_neigh > 40
    # and the final list must not be clipped
    nn = np.asarray(sys_._nl_data[0].n_neigh)
    assert nn.max() <= sys_._program['nl_cfgs'][0].max_neigh


def test_growth_mid_run():
    """Condensing gas grows its list mid-run without energy artifacts."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.2), n=5)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=0.1, seed=9)
    hoomd.run(1500, quiet=True)
    sys_ = hoomd.context.current.system
    nn = np.asarray(sys_._nl_data[0].n_neigh)
    assert nn.max() <= sys_._program['nl_cfgs'][0].max_neigh
    # cached PE must equal freshly recomputed PE
    pe_cached = sys_.thermo_quantities()['potential_energy']
    sys_._forces_fresh = False
    sys_.reset_nlist()
    pe_fresh = sys_.thermo_quantities()['potential_energy']
    assert pe_cached == pytest.approx(pe_fresh, rel=1e-5, abs=1e-3)
