"""Device mesh construction: ('graph', 'heads') axes.

- ``graph``: edge/node partition of each meta-path adjacency (the GNN analog
  of sequence/context parallelism — SURVEY.md §2.3, §5.7) and the data axis
  for multi-graph (PPI) batching.
- ``heads``: attention heads sharded model-parallel (heads are independent
  until the concat, reference gat.py:42-46).

XLA lowers all collectives over ICI (intra-slice) / DCN (multi-slice); no
explicit NCCL/MPI layer exists (SURVEY.md §5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

GRAPH_AXIS = "graph"
HEAD_AXIS = "heads"


def make_mesh(graph: int = 0, heads: int = 1, devices=None) -> Mesh:
    """Build a (graph × heads) mesh. graph=0 → use all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if graph == 0:
        if n % heads:
            raise ValueError(f"{n} devices not divisible by heads={heads}")
        graph = n // heads
    if graph * heads > n:
        raise ValueError(f"mesh {graph}x{heads} exceeds {n} devices")
    devs = devices[: graph * heads].reshape(graph, heads)
    return Mesh(devs, (GRAPH_AXIS, HEAD_AXIS))
