"""Analyzers: quantity logging and python callbacks
(reference hoomd/analyze.py:260-531, Logger.cc:42-160,
CallbackAnalyzer.h).
"""

from __future__ import annotations

import numpy as np

from . import context
from .operation import Analyzer


def _sys():
    return context.current.system


class log(Analyzer):
    """Log named quantities to a TSV file (reference analyze.log).

    Quantity resolution order (reference Logger::getValue):
      1. built-in thermo names (temperature, pressure, kinetic_energy, ...)
      2. per-force energies (e.g. 'pair_lj_energy')
      3. user callbacks registered with register_callback()
    """

    def __init__(self, filename, quantities, period, header_prefix='',
                 overwrite=False, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        self.quantities = list(quantities)
        self.header_prefix = header_prefix
        self.user_callbacks = {}
        self._wrote_header = False
        self._last_row = {}
        if filename and overwrite:
            open(filename, 'w').close()
        elif filename:
            import os
            if os.path.exists(filename) and os.path.getsize(filename):
                self._wrote_header = True
        _sys().register_analyzer(self)

    def register_callback(self, name, callback):
        """Add a python-sourced quantity (reference Logger python
        callbacks)."""
        self.user_callbacks[name] = callback

    def query(self, quantity):
        """Current value of one quantity (reference analyze.log.query)."""
        ts = _sys().timestep
        return self._value(quantity, ts)

    def _value(self, q, ts):
        if q == 'timestep':
            return ts
        if q == 'time':
            ts_quant = _sys().integrator_mode
            return ts * (ts_quant.dt if ts_quant else 0.0)
        if q in self.user_callbacks:
            return float(self.user_callbacks[q](ts))
        thermo = _sys().thermo_quantities()
        if q in thermo:
            return thermo[q]
        if q.startswith('mpcd_') and getattr(_sys(), 'mpcd', None):
            mq = _sys().mpcd.thermo()
            if q in mq:
                v = mq[q]
                return float(v) if np.ndim(v) == 0 else v
        for f in _sys().forces:
            if f.log_name == q:
                return _sys().force_energy(f)
        raise ValueError(f"unknown log quantity {q!r}")

    def analyze(self, system, timestep):
        row = {q: self._value(q, timestep) for q in self.quantities}
        self._last_row = row
        if not self.filename:
            return
        with open(self.filename, 'a') as f:
            if not self._wrote_header:
                f.write(self.header_prefix + 'timestep\t'
                        + '\t'.join(self.quantities) + '\n')
                self._wrote_header = True
            f.write(str(timestep) + '\t'
                    + '\t'.join(f"{row[q]:.9g}" for q in self.quantities)
                    + '\n')


class callback(Analyzer):
    """Call a python function periodically (reference analyze.callback)."""

    def __init__(self, callback, period, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.cb = callback
        _sys().register_analyzer(self)

    def analyze(self, system, timestep):
        self.cb(timestep)


class imd(Analyzer):
    """VMD live link (reference analyze.imd, IMDInterface.h,
    extern/imd.cc) speaking the public IMD v2 wire protocol: 8-byte
    headers (two network-order int32: message type, length), handshake
    carrying the version in raw byte order for client endianness
    detection, FCOORDS frames of 3N float32 positions every ``rate``
    fires, and MDCOMM steering forces received from the client and
    applied as per-particle constant forces scaled by ``force_scale``.

    The listener is non-blocking: with no client attached the analyzer
    is a no-op, so job scripts run unchanged with or without VMD."""

    HANDSHAKE, GO, KILL, MDCOMM, PAUSE, TRATE = 4, 3, 5, 6, 7, 8
    DISCONNECT, ENERGIES, FCOORDS = 0, 1, 2
    VERSION = 2

    def __init__(self, port, period=1, rate=1, pause=False, force=None,
                 force_scale=0.1, phase=0):
        import socket
        Analyzer.__init__(self, period, phase)
        self.rate = max(1, int(rate))
        self.force = force           # md.force.constant to steer, or None
        self.force_scale = float(force_scale)
        self.paused = bool(pause)
        self._nfire = 0
        self._conn = None
        self._go = False
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(('', int(port)))
        self._srv.listen(1)
        self._srv.setblocking(False)
        _sys().register_analyzer(self)

    @staticmethod
    def _header(msg_type, length):
        import struct
        return struct.pack('!ii', msg_type, length)

    def _accept(self):
        import struct
        try:
            conn, _ = self._srv.accept()
        except (BlockingIOError, OSError):
            return
        conn.setblocking(False)
        # handshake: type in network order, version RAW so the client
        # detects our endianness (the IMD v2 convention)
        import socket as _socket
        conn.sendall(struct.pack('!i', self.HANDSHAKE)
                     + struct.pack('i', self.VERSION))
        self._conn = conn
        self._go = False

    def _drain(self, system):
        """Process pending client messages (GO/PAUSE/KILL/MDCOMM)."""
        import struct
        import numpy as np
        conn = self._conn
        while True:
            try:
                hdr = conn.recv(8, )
            except (BlockingIOError, OSError):
                return
            if not hdr:
                self._disconnect()
                return
            while len(hdr) < 8:
                hdr += conn.recv(8 - len(hdr))
            mtype, length = struct.unpack('!ii', hdr)
            if mtype == self.GO:
                self._go = True
            elif mtype == self.PAUSE:
                self.paused = not self.paused
            elif mtype == self.TRATE:
                self.rate = max(1, int(length))
            elif mtype in (self.KILL, self.DISCONNECT):
                self._disconnect()
                return
            elif mtype == self.MDCOMM:
                n = int(length)
                conn.setblocking(True)
                raw = b''
                want = n * 4 + n * 12
                while len(raw) < want:
                    chunk = conn.recv(want - len(raw))
                    if not chunk:
                        break
                    raw += chunk
                conn.setblocking(False)
                idx = np.frombuffer(raw[:4 * n], dtype='>i4')
                frc = np.frombuffer(raw[4 * n:], dtype='>f4') \
                    .reshape(n, 3)
                if self.force is not None:
                    self.force.set_forces(
                        indices=np.asarray(idx, dtype=int),
                        forces=np.asarray(frc, float)
                        * self.force_scale)

    def _disconnect(self):
        try:
            self._conn.close()
        except OSError:
            pass
        self._conn = None
        self._go = False

    def analyze(self, system, timestep):
        import struct
        import numpy as np
        if self._conn is None:
            self._accept()
            if self._conn is None:
                return
        self._drain(system)
        if self._conn is None or not self._go or self.paused:
            return
        self._nfire += 1
        if (self._nfire - 1) % self.rate:
            return
        pos = np.asarray(system.state.pos, dtype='>f4')
        try:
            self._conn.sendall(
                self._header(self.FCOORDS, pos.shape[0])
                + pos.tobytes())
        except (BlockingIOError, BrokenPipeError, OSError):
            self._disconnect()

    def disable(self):
        Analyzer.disable(self)
        if self._conn is not None:
            try:
                self._conn.sendall(self._header(self.DISCONNECT, 0))
            except OSError:
                pass
            self._disconnect()
        try:
            self._srv.close()
        except OSError:
            pass
