"""han_tpu — a TPU-native heterogeneous graph attention framework.

A from-scratch JAX/XLA/Pallas implementation of the HAN model family
(heterogeneous graph attention networks: GAT-style node-level attention over
meta-path induced neighbor graphs, fused by semantic-level attention), built
TPU-first:

- compute path: XLA einsums for feature transforms, Pallas kernels for the
  sparse attention pipeline (SDDMM edge logits, segment softmax over
  neighborhoods, SpMM aggregation) with a fused block-sparse flash-GAT kernel;
- scale-out: edge-partitioned execution over a ``jax.sharding.Mesh`` with XLA
  collectives (psum / all_gather / ppermute) over ICI/DCN;
- training: jit-compiled full-graph steps, optax Adam + global L2, early
  stopping, orbax checkpointing, KNN/KMeans embedding evaluation.

Reference capability map: CG-Labs/HAN (WWW 2019 official code) — see
SURVEY.md at the repo root for the component-by-component parity inventory.
"""

__version__ = "0.1.0"

from han_tpu.graph.containers import CSRGraph, EllGraph, DenseGraph  # noqa: F401
