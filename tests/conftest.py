"""Test harness configuration.

Mirrors the reference's testing split (SURVEY.md §4): serial unit tests plus
"parallel" tests that in MFEM run under ``mpirun -np N``.  Here the analog is
a virtual 8-device CPU mesh (``--xla_force_host_platform_device_count=8``),
and x64 is enabled so correctness tests hit the 1e-8 parity bar (BASELINE.md).

Note: the environment pins ``JAX_PLATFORMS=axon`` (tunneled TPU with ~30s
remote compiles) via sitecustomize, so we must force the cpu platform through
``jax.config`` *after* import — env vars alone are overridden.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
