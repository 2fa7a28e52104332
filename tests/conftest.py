"""Test configuration: run everything on a virtual 8-device CPU platform.

Mirrors the reference's testing strategy of oversubscribing a single node
with ``mpirun -n 8`` to test distributed code without a cluster
(reference hoomd/test-py/CMakeLists.txt:9-55): here
xla_force_host_platform_device_count=8 gives 8 virtual devices for
sharding tests while keeping the suite runnable anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# no persistent compile cache under the suite: jax's CPU AOT cache can
# segfault on read-back when the stored executable's machine-feature
# profile (+prefer-no-scatter etc.) mismatches the host ("could lead
# to execution errors such as SIGILL" per the loader warning — and it
# does, reproducibly, on the gjk fori_loop).  A per-run cache dir has
# zero reuse value anyway.
os.environ.setdefault('HOOMD_TPU_NO_COMPILE_CACHE', '1')
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

# jax may already be imported at interpreter startup (sitecustomize) with
# a hardware platform in JAX_PLATFORMS — env edits alone come too late in
# that case, but the backend is not yet initialized, so config.update
# still redirects everything to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_context():
    """Each test gets a clean simulation context."""
    import hoomd_tpu as hoomd
    hoomd.context.initialize('--notice-level=0')
    yield
    hoomd.context.current = None
