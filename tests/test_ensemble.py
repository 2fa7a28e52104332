"""Partition-parallel ensembles (reference: MPI partitions via --nrank,
hoomd/comm.py get_partition; UpdaterMuVT Gibbs partitions).  The
TPU-native redesign vmaps the general engine over a leading replica axis
sharded over a 'replica' device mesh — see hoomd_tpu/ensemble.py."""

import numpy as np
import pytest

import jax


def _build_lj_langevin(kT=1.0, seed=42):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.4), n=6)
    system = hoomd.context.current.system
    nl = md.nlist.cell(r_buff=0.5)
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=kT, seed=seed)
    return hoomd, system


def test_replicas_temperature_ladder():
    """4 replicas with vary={'kT': ladder}: each must thermalize to its
    own target — proves the replicas are independent and the varied
    parameter actually lands per replica."""
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin()
    ladder = [0.5, 1.0, 2.0, 4.0]
    ens = hoomd.ensemble.replicas(4, vary={'kT': ladder})
    ens.run(3000)
    T = [ens.thermo(i)['temperature'] for i in range(4)]
    for i, kT in enumerate(ladder):
        assert T[i] == pytest.approx(kT, rel=0.25), (i, T)
    # strictly increasing ladder — replicas cannot be sharing state
    assert all(T[i] < T[i + 1] for i in range(3)), T


def test_replicas_sharded_over_devices():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin()
    ens = hoomd.ensemble.replicas(4, vary={'kT': [0.5, 1.0, 1.5, 2.0]})
    # 4 replicas on >= 4 devices: every device carries work (8 devices
    # -> R=4 x D=2 two-level layout)
    ndev = min(len(jax.devices()), 8)
    assert len(ens.state.pos.sharding.device_set) == ndev
    ens.run(50)
    assert len(ens.state.pos.sharding.device_set) == ndev


def test_replicas_two_level_hierarchy():
    """2 replicas x 4 domain shards on 8 devices: the two-level
    ('replica','domain') mesh (reference DomainDecomposition node-local
    sub-grids, DomainDecomposition.h:49-175) — replicas stay independent
    while each replica's particle arrays shard over its device group."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin()
    assert system.state.N % 4 == 0
    ens = hoomd.ensemble.replicas(2, vary={'kT': [0.5, 2.0]})
    assert ens._mesh.shape == {'replica': 2, 'domain': 4}
    assert len(ens.state.pos.sharding.device_set) == 8
    ens.run(600)
    T0 = ens.thermo(0)['temperature']
    T1 = ens.thermo(1)['temperature']
    assert T0 < T1                  # independent thermostats
    assert np.isfinite(ens.thermo(0)['potential_energy'])


def test_replica_matches_single_run():
    """Replica r's trajectory must equal a solo run with the same seed
    and kT — the ensemble is a pure batching transform, not a different
    integrator."""
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin(kT=1.0, seed=42)
    ens = hoomd.ensemble.replicas(3, vary={'kT': [0.7, 1.0, 1.3]})
    ens.run(100)
    pos_r1 = ens.take_snapshot(1).particles.position.copy()

    # solo: seed 42+1, kT 1.0 (replica 1's parameters)
    _, sys_solo = _build_lj_langevin(kT=1.0, seed=43)
    sys_solo.run(100, quiet=True)
    pos_solo = sys_solo.take_snapshot().particles.position.copy()
    np.testing.assert_allclose(pos_r1, pos_solo, atol=5e-5)


def test_replicas_different_seeds_diverge():
    """Same kT, auto-offset seeds: stochastic kicks must differ across
    replicas (guards against a shared noise stream)."""
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin()
    ens = hoomd.ensemble.replicas(2)
    ens.run(50)
    p0 = ens.take_snapshot(0).particles.position
    p1 = ens.take_snapshot(1).particles.position
    assert np.abs(p0 - p1).max() > 1e-3


def test_replicas_overflow_growth():
    """A gas that condenses: neighbor capacity must grow mid-ensemble
    via the shared retry protocol without losing replicas."""
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin(kT=0.2)
    ens = hoomd.ensemble.replicas(2, vary={'kT': [0.2, 0.3]})
    ens.run(400, chunk=200)
    for i in range(2):
        q = ens.thermo(i)
        assert np.isfinite(q['potential_energy'])


def test_vary_unknown_param_raises():
    import hoomd_tpu as hoomd
    _, system = _build_lj_langevin()
    with pytest.raises(ValueError, match='no integration method'):
        hoomd.ensemble.replicas(2, vary={'zzz': [1, 2]})


def _build_hs(d=0.15, seed=9):
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.25), n=5)
    mc = hpmc.integrate.sphere(seed=seed, d=d, nselect=2)
    mc.shape_param.set('A', diameter=1.0)
    return hoomd, hoomd.context.current.system, mc


def test_hpmc_replicas_vary_move_size():
    """HPMC replicas (reference: partition-parallel HPMC sweeps): two
    chains with different d run in one vmapped program; the smaller-d
    chain must accept more."""
    import hoomd_tpu as hoomd
    _, system, mc = _build_hs()
    ens = hoomd.ensemble.replicas(2, vary={'d': [0.3, 0.02]})
    ens.run(15)
    c0, c1 = ens.counters(0), ens.counters(1)

    def acc(c):
        return c['translate_accept'] / (c['translate_accept']
                                        + c['translate_reject'])
    assert acc(c1) > acc(c0) + 0.2, (acc(c0), acc(c1))
    # both chains actually moved
    p0 = ens.take_snapshot(0).particles.position
    p1 = ens.take_snapshot(1).particles.position
    assert np.abs(p0 - p1).max() > 1e-4


def test_hpmc_replica_matches_solo_run():
    """Replica r's Markov chain must equal a solo run with the same
    seed (counter RNG keyed on (seed, timestep): the ensemble is a pure
    batching transform)."""
    import hoomd_tpu as hoomd
    _, system, mc = _build_hs(d=0.15, seed=9)
    ens = hoomd.ensemble.replicas(3)
    ens.run(10)
    pos_r2 = ens.take_snapshot(2).particles.position.copy()
    acc_r2 = ens.counters(2)['translate_accept']

    _, sys_solo, mc_solo = _build_hs(d=0.15, seed=11)   # 9 + r=2
    # replicas advance purely device-side (no host-op fires), so switch
    # off the default SFC sorter whose step-0 slot permutation would
    # change the checkerboard's RNG pairing in the solo chain
    hoomd.context.current.sorter.disable()
    hoomd.run(10, quiet=True)
    pos_solo = sys_solo.take_snapshot().particles.position.copy()
    np.testing.assert_allclose(pos_r2, pos_solo, atol=1e-6)
    c = sys_solo._hpmc_counters
    assert acc_r2 == int(c['translate_accept'])
