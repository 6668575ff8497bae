"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (single real TPU behind a
single-client tunnel) and the axon plugin re-registers itself even when the
env var is overridden, so the env var alone is NOT sufficient — the config
update below is the authoritative switch. Tests must never touch the TPU:
the tunnel admits one process and concurrent use deadlocks.
"""

import os

# XLA flags must be in the env before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Watchdog: dump all stacks if anything hangs for 300s.
import faulthandler as _fh  # noqa: E402

_fh.dump_traceback_later(300, repeat=True)
