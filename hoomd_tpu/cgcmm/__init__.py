"""CG-CMM coarse-grained force field (reference hoomd/cgcmm/)."""

from . import angle, pair

__all__ = ['angle', 'pair']
