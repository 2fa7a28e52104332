"""Shared base for external (one-body) forces."""

from __future__ import annotations

import numpy as np

from .operation import Force


class ExternalForce(Force):
    """One-body force: no neighbor list, no topology
    (reference PotentialExternal, md/PotentialExternal.h)."""

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))
