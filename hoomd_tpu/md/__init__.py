"""Molecular dynamics package (reference hoomd/md/).

Namespaces mirror the reference public API (SURVEY Appendix A):
nlist, pair, bond, angle, dihedral, improper, special_pair, integrate,
force, external, wall, update, charge, constrain.
"""

from . import (angle, bond, charge, constrain, dihedral, external, force,
               improper, integrate, nlist, pair, special_pair, update, wall)

__all__ = ['angle', 'bond', 'charge', 'constrain', 'dihedral', 'external',
           'force', 'improper', 'integrate', 'nlist', 'pair',
           'special_pair', 'update', 'wall']
