"""Long-range electrostatics (reference md/charge.py, PPPMForceCompute.h).

pppm: particle-mesh Ewald.  Charge assignment to a regular mesh
(scatter-add), k-space solve via jnp.fft (XLA-native FFT — the analog of the
reference's kiss_fft/dfftlib pipeline, PPPMForceCompute.h:185-186), force
interpolation back to particles.  Short-range part = md.pair.ewald on the
neighbor list, set up automatically like the reference (charge.py:29).

Status: arriving later this build round; constructing it raises with a clear
message until the mesh kernels land.
"""

from __future__ import annotations


class pppm:
    def __init__(self, group, nlist):
        raise NotImplementedError(
            "md.charge.pppm: PPPM mesh electrostatics is not yet wired in "
            "this build; md.pair.ewald (real-space) is available")
