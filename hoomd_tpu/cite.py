"""Citation helper (reference hoomd/cite.py)."""

from __future__ import annotations

_citations = []


def save(file='hoomd_tpu_citations.bib'):
    with open(file, 'w') as f:
        f.write("% hoomd_tpu — TPU-native particle simulation framework\n")
        f.write("% API modeled on HOOMD-blue v2.3 "
                "(Anderson/Lorenz/Travesset 2008; Glaser et al. 2015)\n")
