"""Faceted DEM pair potentials (reference hoomd/dem/)."""

from . import pair, utils

__all__ = ['pair', 'utils']
