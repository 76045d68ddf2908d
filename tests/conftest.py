"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware, and with x64 enabled so oracle-parity tests
can run the filter bank at float64 like the reference.
"""

import os
import sys

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('MPLBACKEND', 'Agg')

import jax

# The sandbox's axon sitecustomize force-selects the TPU tunnel backend
# (jax_platforms="axon,cpu"); tests must run on the local CPU backend —
# the tunnel remote-compiles each eager op and rejects complex128.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope='session')
def ntsc_cfg():
    from ld_decode_tpu.utils.params import DecoderConfig
    return DecoderConfig(system='NTSC', freq_mhz=40.0)


@pytest.fixture(scope='session')
def pal_cfg():
    from ld_decode_tpu.utils.params import DecoderConfig
    return DecoderConfig(system='PAL', freq_mhz=40.0)
