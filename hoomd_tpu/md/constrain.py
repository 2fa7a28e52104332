"""Constraints (reference md/constrain.py: distance, sphere, rigid bodies).

Status: rigid-body composites (ForceComposite analog) and distance
constraints arrive in a later slice of this build; constructors raise
clearly until then.
"""

from __future__ import annotations


class distance:
    def __init__(self, exclude_from_nlist=True):
        raise NotImplementedError(
            "constrain.distance: exact distance constraints not yet "
            "implemented in hoomd_tpu")


class sphere:
    def __init__(self, group, P, r):
        raise NotImplementedError(
            "constrain.sphere: manifold constraints not yet implemented")


class rigid:
    def __init__(self):
        raise NotImplementedError(
            "constrain.rigid: rigid-body composites not yet implemented")


class oneD:
    def __init__(self, group, constraint_vector):
        raise NotImplementedError(
            "constrain.oneD: not yet implemented")
