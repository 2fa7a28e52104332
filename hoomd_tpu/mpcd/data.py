"""MPCD solvent particle data (reference mpcd/ParticleData.h,
mpcd/data.py)."""

from __future__ import annotations

import numpy as np

from .. import context


class snapshot:
    """Host-side solvent snapshot (reference mpcd.data.snapshot)."""

    def __init__(self, N=0):
        self.N = int(N)
        self.position = np.zeros((N, 3))
        self.velocity = np.zeros((N, 3))
        self.typeid = np.zeros(N, dtype=np.int32)
        self.types = ['A']
        self.mass = 1.0


class system_data:
    """Handle to the solvent attached to the running system."""

    def __init__(self, snap):
        self.snapshot = snap
        sys_ = context.current.system
        sys_.mpcd = self

    def take_snapshot(self):
        import numpy as np
        sys_ = context.current.system
        aux = sys_._method_aux_by_obj.get(getattr(sys_, '_mpcd_method',
                                                  None))
        if aux is not None:
            out = snapshot(self.snapshot.N)
            out.position[:] = np.asarray(aux['pos'])
            out.velocity[:] = np.asarray(aux['vel'])
            out.mass = self.snapshot.mass
            return out
        return self.snapshot

    def thermo(self):
        """Solvent thermodynamics (reference mpcd/CellThermoCompute.h
        net quantities): kinetic energy, temperature (momentum-corrected
        ndof like the reference's net_ke path), and total momentum."""
        snap = self.take_snapshot()
        m = snap.mass
        v = snap.velocity
        ke = 0.5 * m * float(np.sum(v * v))
        mom = m * v.sum(axis=0)
        ndof = 3.0 * max(snap.N, 1) - 3.0
        T = 2.0 * (ke - 0.5 * float(np.dot(mom, mom)) / (m * snap.N)) \
            / ndof
        return {'mpcd_ke': ke, 'mpcd_temperature': T,
                'mpcd_momentum': mom}
