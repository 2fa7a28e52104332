"""Embedded-atom-method metals (reference hoomd/metal/)."""

from . import pair

__all__ = ['pair']
