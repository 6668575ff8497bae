"""Test configuration (platform forcing lives in the ROOT conftest.py,
which must run before any jax backend initializes — SURVEY.md §4.5:
distributed code paths are exercised with 8 virtual CPU devices so CI needs
no TPU; Pallas kernels run in interpreter mode on CPU)."""

import jax

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: first-compile on this host is ~5s even for
# trivial programs; cache makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from han_tpu.graph import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def tiny_ds():
    """Small planted heterogeneous dataset shared across tests."""
    return synthetic.planted_hetero(
        n_nodes=96, n_feats=24, n_classes=3, n_metapaths=2,
        avg_degree=6.0, train_per_class=10, n_val=16, seed=7, name="tiny",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
