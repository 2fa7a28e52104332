"""Test configuration: run everything on a virtual 8-device CPU platform.

Mirrors the reference's testing strategy of oversubscribing a single node
with ``mpirun -n 8`` to test distributed code without a cluster
(reference hoomd/test-py/CMakeLists.txt:9-55): here
xla_force_host_platform_device_count=8 gives 8 virtual devices for
sharding tests while keeping the suite runnable anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_context():
    """Each test gets a clean simulation context."""
    import hoomd_tpu as hoomd
    hoomd.context.initialize('--notice-level=0')
    yield
    hoomd.context.current = None
