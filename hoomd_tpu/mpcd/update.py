"""MPCD updaters (reference mpcd/Sorter.h, mpcd/update.py)."""

from __future__ import annotations


class sort:
    """Solvent cell-order compaction (reference mpcd.update.sort).
    The TPU solvent arrays are re-binned with a sort every collision step
    already, so this is a no-op accepted for script compatibility."""

    def __init__(self, system=None, period=50):
        self.period = period
