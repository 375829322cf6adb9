"""Test configuration: force a virtual 8-device CPU mesh and f64 support.

Multi-chip sharding tests run on jax's host-platform device virtualization
(no TPU needed); the driver separately compile-checks the TPU path via
__graft_entry__.py.  Must run before jax is imported anywhere.
"""

import os

# NOTE: the harness environment pins JAX_PLATFORMS=axon (the tunneled TPU);
# the env var wins over in-process assignment, so the config.update below is
# what actually forces the CPU backend for tests.
os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from kmer_spans_tpu.utils.testgen import golden_genome  # noqa: E402


@pytest.fixture(scope="session")
def golden():
    """The SURVEY.md Appendix-B golden genome (100 kb, 3 planted islands)."""
    return golden_genome()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_seq(rng, n, n_prob=0.0, alphabet="ACGT"):
    """Random sequence with optional N runs."""
    chars = rng.choice(list(alphabet), size=n)
    if n_prob > 0:
        mask = rng.random(n) < n_prob
        chars[mask] = "N"
    return "".join(chars)
