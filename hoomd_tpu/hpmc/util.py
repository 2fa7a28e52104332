"""HPMC tuning utilities (reference hpmc/util.py:238-785)."""

from __future__ import annotations

import numpy as np


class tune:
    """Adjust move sizes toward a target acceptance
    (reference hpmc.util.tune)."""

    def __init__(self, obj, tunables=('d',), target=0.3, max_val=None,
                 gamma=0.5, type=None):
        self.obj = obj
        self.tunables = list(tunables)
        self.target = float(target)
        self.max_val = max_val
        self.gamma = float(gamma)

    def update(self):
        """One tuning step: rescale d (and a) by acceptance/target."""
        import hoomd_tpu as hoomd
        mc = self.obj
        acc = mc.get_translate_acceptance()
        if acc <= 0.0:
            scale = 0.5
        else:
            scale = max(0.5, min(2.0, (acc / self.target) ** self.gamma))
        if 'd' in self.tunables:
            new_d = mc._default_d * scale
            if self.max_val:
                new_d = min(new_d, self.max_val if np.isscalar(self.max_val)
                            else self.max_val[0])
            mc.set_params(d=new_d)
        if 'a' in self.tunables and mc._has_rotation():
            mc.set_params(a=mc._default_a * scale)
        # reset counters so the next update sees fresh statistics
        sys_ = hoomd.context.current.system
        if sys_._hpmc_counters is not None and sys_._program is not None \
                and sys_._program.get('kind') == 'hpmc':
            sys_._hpmc_counters = sys_._program['init_counters']()


class compress:
    """Gradual box compression to a target packing (reference
    hpmc.util.compress): shrink the box in small steps, rejecting steps
    that create overlaps, until the target volume is reached."""

    def __init__(self, mc, npt_updater=None, relax=1000):
        self.mc = mc
        self.relax = int(relax)

    def run(self, target_volume, scale=0.99, max_iters=1000):
        import hoomd_tpu as hoomd
        from ..snapshot import BoxSnapshot
        system = hoomd.context.current.system
        it = 0
        while float(system.state.box.volume()) > target_volume \
                and it < max_iters:
            snap = system.take_snapshot()
            s = max(scale, (target_volume
                            / snap.box.get_volume()) ** (1.0 / 3.0))
            new_box = BoxSnapshot(snap.box.Lx * s, snap.box.Ly * s,
                                  snap.box.Lz * s,
                                  dimensions=snap.box.dimensions)
            pos = snap.particles.position * s
            snap.box = new_box
            snap.particles.position[:] = pos
            system.restore_snapshot(snap)
            hoomd.run(self.relax, quiet=True)
            it += 1
        return float(system.state.box.volume())
