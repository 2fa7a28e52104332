"""Plugin example (the reference example_plugin/ analog): extending
hoomd_tpu with a custom force needs no build system — subclass Force and
register it.  The compute function is traced into the same jitted step as
the built-ins."""
import jax.numpy as jnp
import numpy as np

import hoomd_tpu as hoomd
from hoomd_tpu import md
from hoomd_tpu.operation import Force


class harmonic_trap(Force):
    """Pulls every particle toward the origin with spring constant k."""

    def __init__(self, k=1.0, name=None):
        Force.__init__(self, name)
        self._log_base = 'harmonic_trap_energy'
        self.k = float(k)
        hoomd.context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))

    def _pack_params(self, system):
        return {'k': jnp.asarray(self.k, system.real_dtype)}

    def _make_compute(self, system):
        def compute(state, nl, params):
            f = -params['k'] * state.pos
            e = 0.5 * params['k'] * jnp.sum(state.pos ** 2, axis=-1)
            vir = jnp.zeros((state.N, 6), state.pos.dtype)
            return f, e, vir
        return compute


if __name__ == '__main__':
    hoomd.context.initialize("")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=4)
    trap = harmonic_trap(k=0.5)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=0.5, seed=1)
    hoomd.run(2000)
    print("trap energy:", hoomd.context.current.system.force_energy(trap))
