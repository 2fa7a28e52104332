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
