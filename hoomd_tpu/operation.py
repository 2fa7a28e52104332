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


class _Periodic:
    """Period/phase firing schedule shared by Analyzer/Updater.

    ``period`` may be a callable n -> step offset — the reference's
    variable-period specification (System.h:210-232 shouldExecute,
    sphinx-doc/varperiod.rst): the creation step is recorded, n starts
    at 1, and after each fire the next execute step becomes
    ``created + period(n)`` (clamped forward), n += 1.  The creation
    step is captured at the first due-check (ops are created between
    runs, so this equals the reference's creation-time capture)."""

    def _init_period(self, period, phase):
        self.phase = int(phase)
        self.enabled = True
        if callable(period):
            self.period = period
            self._vp_n = 1
            self._vp_created = None
            self._vp_next = None
        else:
            self.period = int(period) if period else None

    def _due(self, ts):
        """True when this op fires at ``ts`` (advances variable-period
        state, like the reference's shouldExecute)."""
        if not self.enabled or self.period is None:
            return False
        if callable(self.period):
            if self._vp_created is None:
                self._vp_created = ts
                self._vp_next = ts
            # >= not ==: a fire step skipped while disabled must not
            # wedge the schedule forever
            if ts >= self._vp_next:
                nxt = int(self.period(self._vp_n)) + self._vp_created
                if nxt <= ts:
                    nxt = ts + 1      # reference clamps forward
                self._vp_next = nxt
                self._vp_n += 1
                return True
            return False
        return (ts - self.phase) % self.period == 0

    def _next_stop(self, ts):
        """First step > ts at which this op must fire (chunk boundary);
        None when it never fires."""
        if not self.enabled or self.period is None:
            return None
        if callable(self.period):
            if self._vp_next is None:
                return ts + 1
            return max(self._vp_next, ts + 1)
        return ts + self.period - ((ts - self.phase) % self.period)

    def disable(self):
        self.enabled = False

    def enable(self):
        self.enabled = True


class Analyzer(_Periodic):
    """Periodic host-side observer (reference Analyzer.h)."""

    def __init__(self, period, phase=0):
        self._init_period(period, phase)

    def analyze(self, system, timestep):  # pragma: no cover - interface
        raise NotImplementedError


class Updater(_Periodic):
    """Periodic host-side state mutator (reference Updater.h)."""

    def __init__(self, period, phase=0):
        self._init_period(period, phase)

    def update(self, system, timestep):  # pragma: no cover - interface
        raise NotImplementedError


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
