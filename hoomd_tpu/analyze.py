"""Analyzers: quantity logging and python callbacks
(reference hoomd/analyze.py:260-531, Logger.cc:42-160,
CallbackAnalyzer.h).
"""

from __future__ import annotations

import numpy as np

from . import context
from .operation import Analyzer


def _sys():
    return context.current.system


class log(Analyzer):
    """Log named quantities to a TSV file (reference analyze.log).

    Quantity resolution order (reference Logger::getValue):
      1. built-in thermo names (temperature, pressure, kinetic_energy, ...)
      2. per-force energies (e.g. 'pair_lj_energy')
      3. user callbacks registered with register_callback()
    """

    def __init__(self, filename, quantities, period, header_prefix='',
                 overwrite=False, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        self.quantities = list(quantities)
        self.header_prefix = header_prefix
        self.user_callbacks = {}
        self._wrote_header = False
        self._last_row = {}
        if filename and overwrite:
            open(filename, 'w').close()
        elif filename:
            import os
            if os.path.exists(filename) and os.path.getsize(filename):
                self._wrote_header = True
        _sys().register_analyzer(self)

    def register_callback(self, name, callback):
        """Add a python-sourced quantity (reference Logger python
        callbacks)."""
        self.user_callbacks[name] = callback

    def query(self, quantity):
        """Current value of one quantity (reference analyze.log.query)."""
        ts = _sys().timestep
        return self._value(quantity, ts)

    def _value(self, q, ts):
        if q == 'timestep':
            return ts
        if q == 'time':
            ts_quant = _sys().integrator_mode
            return ts * (ts_quant.dt if ts_quant else 0.0)
        if q in self.user_callbacks:
            return float(self.user_callbacks[q](ts))
        thermo = _sys().thermo_quantities()
        if q in thermo:
            return thermo[q]
        if q.startswith('mpcd_') and getattr(_sys(), 'mpcd', None):
            mq = _sys().mpcd.thermo()
            if q in mq:
                v = mq[q]
                return float(v) if np.ndim(v) == 0 else v
        for f in _sys().forces:
            if f.log_name == q:
                return _sys().force_energy(f)
        raise ValueError(f"unknown log quantity {q!r}")

    def analyze(self, system, timestep):
        row = {q: self._value(q, timestep) for q in self.quantities}
        self._last_row = row
        if not self.filename:
            return
        with open(self.filename, 'a') as f:
            if not self._wrote_header:
                f.write(self.header_prefix + 'timestep\t'
                        + '\t'.join(self.quantities) + '\n')
                self._wrote_header = True
            f.write(str(timestep) + '\t'
                    + '\t'.join(f"{row[q]:.9g}" for q in self.quantities)
                    + '\n')


class callback(Analyzer):
    """Call a python function periodically (reference analyze.callback)."""

    def __init__(self, callback, period, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.cb = callback
        _sys().register_analyzer(self)

    def analyze(self, system, timestep):
        self.cb(timestep)


class imd(Analyzer):
    """VMD live-connection placeholder (reference analyze.imd,
    IMDInterface.h).  Live socket streaming to VMD is not available in this
    environment; the class accepts the reference arguments and warns."""

    def __init__(self, port, period=1, rate=1, pause=False, force=None,
                 force_scale=0.1, phase=0):
        Analyzer.__init__(self, None, 0)
        import warnings
        warnings.warn("analyze.imd: live VMD connection not supported on "
                      "this platform; analyzer is inactive")
        _sys().register_analyzer(self)

    def analyze(self, system, timestep):
        pass
