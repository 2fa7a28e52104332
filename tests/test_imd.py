"""IMD (VMD live link) wire protocol (reference IMDInterface.h,
extern/imd.cc): handshake, GO, FCOORDS frames, MDCOMM steering."""

import socket
import struct

import numpy as np


def _recv_exact(s, n):
    buf = b''
    while len(buf) < n:
        c = s.recv(n - len(buf))
        if not c:
            raise EOFError
        buf += c
    return buf


def test_imd_handshake_coords_and_steering():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    steer = md.force.constant(fvec=(0.0, 0.0, 0.0))

    # free port
    tmp = socket.socket()
    tmp.bind(('', 0))
    port = tmp.getsockname()[1]
    tmp.close()

    imd = hoomd.analyze.imd(port=port, period=1, rate=1, force=steer,
                            force_scale=1.0)
    hoomd.run(2, quiet=True)        # no client yet: must be a no-op

    client = socket.create_connection(('127.0.0.1', port), timeout=10)
    hoomd.run(1, quiet=True)        # server accepts, sends handshake
    hdr = _recv_exact(client, 8)
    mtype = struct.unpack('!i', hdr[:4])[0]
    assert mtype == 4               # IMD_HANDSHAKE
    ver_native = struct.unpack('i', hdr[4:])[0]
    assert ver_native == 2          # same-endian host

    client.sendall(struct.pack('!ii', 3, 0))       # IMD_GO
    hoomd.run(2, quiet=True)
    client.settimeout(10)
    fhdr = _recv_exact(client, 8)
    ftype, n = struct.unpack('!ii', fhdr)
    assert ftype == 2               # IMD_FCOORDS
    N = hoomd.context.current.system.state.N
    assert n == N
    coords = np.frombuffer(_recv_exact(client, 12 * n), dtype='>f4')
    assert coords.shape == (3 * N,)
    assert np.isfinite(coords).all()

    # steer particle 0 with a big +x force via MDCOMM
    payload = struct.pack('!ii', 6, 1)
    payload += np.asarray([0], dtype='>i4').tobytes()
    payload += np.asarray([50.0, 0.0, 0.0], dtype='>f4').tobytes()
    client.sendall(payload)
    v0 = float(hoomd.context.current.system.state.vel[0, 0])
    hoomd.run(10, quiet=True)
    v1 = float(hoomd.context.current.system.state.vel[0, 0])
    assert v1 > v0 + 0.5            # 50*10*0.005 = 2.5 minus LJ noise
    # drain remaining frames, then detach cleanly
    imd.disable()
    client.close()
