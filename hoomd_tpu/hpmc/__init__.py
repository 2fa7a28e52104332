"""Hard-particle Monte Carlo (reference hoomd/hpmc/).

Vectorized checkerboard MC — the TPU-native translation of the reference's
GPU cell-set scheme (hpmc/IntegratorHPMCMonoGPU.cuh:124-160).
"""

from . import integrate, update, compute, analyze, field, util, data

__all__ = ['integrate', 'update', 'compute', 'analyze', 'field', 'util',
           'data']
