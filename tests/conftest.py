"""Test harness: force an 8-device virtual CPU mesh before jax initialises.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), matching how the reference validated
its 'distributed' dataflow on localhost loopback (SURVEY.md section 4.5).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU-tunnel environment pre-sets jax_platforms="axon,cpu", which
# overrides JAX_PLATFORMS; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, jax.devices()

REFERENCE = "/root/reference"


def cpu_subprocess_env(**extra):
    """Environment for spawning a CPU-only wrp_tpu subprocess that cannot
    hang on the TPU tunnel.

    The host environment routes every interpreter through the TPU
    plugin's sitecustomize (via PYTHONPATH) and pins JAX_PLATFORMS to
    the TPU backend; when the tunnel is wedged — a recurring condition —
    that blocks *interpreter startup* indefinitely, long before the
    subprocess reaches any of our code.  Strip the sitecustomize dir
    from PYTHONPATH so it never loads, and pin both platform vars to
    cpu so jax's own env-var precedence (JAX_PLATFORMS wins) cannot
    resurrect the TPU backend from the inherited value."""
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.update(extra)
    return env


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def golden_04abs(reference_dir):
    from wrp_tpu.io.files import read_ascii_matrix

    return read_ascii_matrix(os.path.join(reference_dir, "in/04abs.altb"))


@pytest.fixture(scope="session")
def golden_08pow(reference_dir):
    from wrp_tpu.io.files import read_ascii_matrix

    return read_ascii_matrix(os.path.join(reference_dir, "out/08pow.cpu.out"))


@pytest.fixture(scope="session")
def golden_09zdb(reference_dir):
    from wrp_tpu.io.files import read_ascii_matrix

    return read_ascii_matrix(os.path.join(reference_dir, "in/09zdb.altb")).ravel()


@pytest.fixture(scope="session")
def golden_10zdr(reference_dir):
    from wrp_tpu.io.files import read_ascii_matrix

    return read_ascii_matrix(os.path.join(reference_dir, "in/10zdr.altb")).ravel()


@pytest.fixture(scope="session")
def golden_result(reference_dir):
    from wrp_tpu.io.files import read_result_file

    return read_result_file(os.path.join(reference_dir, "out/99result.cpu.out"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
