"""Deprecated-but-supported operations (reference hoomd/deprecated/):
XML init/dump, MSD analyzer, POS writer, random initializers."""

from . import analyze, dump, init

__all__ = ['analyze', 'dump', 'init']
