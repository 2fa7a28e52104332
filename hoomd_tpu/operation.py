"""Base classes for the operation layer.

The reference's operator taxonomy (hoomd/Compute.h, Updater.h, Analyzer.h,
Integrator.h, ForceCompute.h) maps here to light python-side objects that
*describe* an operation; the actual work is pure jitted functions the System
assembles into one step pipeline.  Analyzers/updaters execute host-side at
chunk boundaries (reproducing the period/phase semantics of System.h:71-128);
forces and integration methods are traced into the device step.
"""

from __future__ import annotations

import numpy as np


class Force:
    """Base of every force compute (reference ForceCompute.h).

    Subclasses implement:
      * ``log_name``: quantity name for the logger (e.g. 'pair_lj_energy')
      * ``_pack_params(types)`` -> pytree of traced parameters
      * ``_make_compute(system, types)`` -> fn(state, nl_data, params) ->
        (force, pe, virial); nl_data is None for non-pair forces.
      * ``_nlist``: the neighbor list object or None
    """
    def __init__(self, name=None):
        self.user_name = name
        self.name = name or type(self).__name__
        self._log_base = type(self).__name__ + "_energy"
        self.enabled = True
        self._nlist = None

    def disable(self):
        self.enabled = False
        _current_system()._dirty()

    def enable(self):
        self.enabled = True
        _current_system()._dirty()

    @property
    def log_name(self):
        """Logger quantity name, matching the reference convention
        (e.g. 'pair_lj_energy', suffixed by the user name if given)."""
        suffix = f"_{self.user_name}" if self.user_name else ""
        return self._log_base + suffix

    def get_energy(self, group=None):
        """Total potential energy of this force (optionally over a group),
        matching reference ForceCompute::calcEnergySum."""
        return _current_system().force_energy(self, group)


class Analyzer:
    """Periodic host-side observer (reference Analyzer.h)."""

    def __init__(self, period, phase=0):
        self.period = int(period) if period else None
        self.phase = int(phase)
        self.enabled = True

    def analyze(self, system, timestep):  # pragma: no cover - interface
        raise NotImplementedError

    def disable(self):
        self.enabled = False

    def enable(self):
        self.enabled = True


class Updater:
    """Periodic host-side state mutator (reference Updater.h)."""

    def __init__(self, period, phase=0):
        self.period = int(period) if period else None
        self.phase = int(phase)
        self.enabled = True

    def update(self, system, timestep):  # pragma: no cover - interface
        raise NotImplementedError

    def disable(self):
        self.enabled = False

    def enable(self):
        self.enabled = True


class IntegrationMethod:
    """Base two-step integration method
    (reference md/IntegrationMethodTwoStep.h).

    Subclasses implement ``_pack_params()``, ``_init_aux(state)`` and the
    pure ``_step1`` / ``_step2`` functions.
    """

    def __init__(self, group):
        self.group = group
        self.enabled = True

    def disable(self):
        self.enabled = False
        _current_system()._dirty()

    def enable(self):
        self.enabled = True
        _current_system()._dirty()

    def _init_aux(self, state):
        return ()

    def restore_state(self):
        """Restore persisted integrator variables from the read-in frame
        (reference IntegratorData restart path, md/integrate.py:181-194)."""
        _current_system().restore_method_state(self)


def _current_system():
    from . import context
    if context.current is None or context.current.system is None:
        raise RuntimeError("no simulation context: call "
                           "context.initialize() and init.* first")
    return context.current.system


def is_due(period, phase, timestep):
    """Period/phase gating (reference System.h:71-106)."""
    if period is None:
        return False
    return (timestep - phase) % period == 0
