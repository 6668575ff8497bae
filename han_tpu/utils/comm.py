"""Collective-traffic accounting (SURVEY.md §5.5 "collective bytes" +
§5.8): count the bytes each collective in a COMPILED program moves, and
model the ICI time they cost on a v5e mesh.

The counter parses the optimized HLO of a lowered+compiled jax function —
it measures what XLA actually emitted (post-fusion, post-SPMD), not what
the Python source suggests. Per-device bytes-on-the-wire use the standard
ring-algorithm costs:

    all-gather:        out_bytes · (S-1)/S        (each device receives
                                                   every other shard)
    reduce-scatter:    in_bytes  · (S-1)/S
    all-reduce:        2 · bytes · (S-1)/S        (reduce-scatter + gather)
    collective-permute bytes                      (one neighbor hop)
    all-to-all:        bytes · (S-1)/S

ICI model (stated assumption, jax-ml.github.io/scaling-book): TPU v5e
one ICI link ≈ 45 GB/s per direction; ring collectives ride one link per
step, so t_ici = wire_bytes / 45e9 per device. DCN (multi-slice) is ~25x
slower — the projection reports both.
"""

from __future__ import annotations

import dataclasses
import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

ICI_BW = 45e9   # bytes/s per direction per link, v5e (assumption, see above)
DCN_BW = 1.8e9  # bytes/s per host pair (assumption)

# one shape token, e.g. f32[512,2048]{1,0:T(8,128)} or pred[128]
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in _DTYPE_BYTES:
        return 0
    size = 1
    for d in dims.split(","):
        if d:
            size *= int(d)
    return size * _DTYPE_BYTES[dtype]


@dataclasses.dataclass
class CollectiveStats:
    counts: dict        # op kind -> number of instructions
    logical_bytes: dict  # op kind -> summed operand/result bytes
    wire_bytes_per_device: float  # ring-cost bytes each device sends

    def ici_seconds(self, bw: float = ICI_BW) -> float:
        return self.wire_bytes_per_device / bw


def collective_stats(compiled, n_shards: int) -> CollectiveStats:
    """Parse a jax Compiled object's optimized HLO for collective ops.

    ``compiled`` = jax.jit(f).lower(*args).compile(); counts every
    collective instruction once (while-loop bodies appear once in HLO —
    multiply by trip count externally if the loop dominates)."""
    text = compiled.as_text()
    counts: dict[str, int] = {}
    logical: dict[str, float] = {}
    wire = 0.0
    s = max(n_shards, 2)
    ring = (s - 1) / s
    for line in text.splitlines():
        line = line.strip()
        # result shape = token before " = op-name(", e.g.
        #   %ag = f32[8192,8,64]{...} all-gather(%x), ...
        m = re.match(r"(?:%\S+\s*=\s*)?(\(?[\w\[\],{}:()\s]*?)\s*"
                     r"(all-gather|all-reduce|reduce-scatter|"
                     r"collective-permute|all-to-all)"
                     r"(?:-start|-done)?\(", line)
        if not m:
            continue
        kind = m.group(2)
        if "-done(" in line:
            continue  # count start+done pairs once (at the start)
        shapes = [_shape_bytes(dt, dims) for dt, dims in _SHAPE_RE.findall(
            m.group(1).replace(" ", ""))]
        nbytes = float(sum(shapes))
        counts[kind] = counts.get(kind, 0) + 1
        logical[kind] = logical.get(kind, 0.0) + nbytes
        if kind == "all-gather":
            wire += nbytes * ring
        elif kind == "all-reduce":
            wire += 2.0 * nbytes * ring
        elif kind == "reduce-scatter":
            wire += nbytes * (s - 1)  # result is the 1/S piece
        elif kind == "collective-permute":
            wire += nbytes
        elif kind == "all-to-all":
            wire += nbytes * ring
    return CollectiveStats(counts=counts, logical_bytes=logical,
                           wire_bytes_per_device=wire)


def projected_efficiency(t_compute_1chip: float, wire_bytes: float,
                         n_shards: int, *, bw: float = ICI_BW,
                         overlap: float = 0.0) -> float:
    """Scaling efficiency of an S-shard step: perfect-split compute plus
    non-overlapped collective time. ``overlap`` ∈ [0, 1] is the fraction
    of collective time hidden under compute (ring rotation overlaps;
    blocking all-gathers mostly don't)."""
    t_comp = t_compute_1chip / n_shards
    t_comm = (wire_bytes / bw) * (1.0 - overlap)
    return t_comp / (t_comp + t_comm)
