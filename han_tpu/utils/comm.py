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
    # split by position: collectives inside while-loop BODIES (the ring
    # rotations — overlappable with the loop's kernel, verified in
    # scheduled HLO by permute_overlap_report) vs everything else
    # (gradient all-reduces, the ring's final hop home — exposed)
    wire_bytes_in_loop: float = 0.0
    wire_bytes_outside: float = 0.0

    def ici_seconds(self, bw: float = ICI_BW) -> float:
        return self.wire_bytes_per_device / bw


def _while_body_names(text: str) -> set:
    """Names of computations used as while-loop bodies (one level; our
    lax.fori_loop ring rotations put their ppermutes directly in the body)."""
    names = set()
    for m in re.finditer(r"\bwhile\([^)]*\)[^\n]*?body=\s*%?([\w.\-]+)", text):
        names.add(m.group(1))
    return names


def collective_stats(compiled, n_shards: int, *,
                     warn_if_none: bool = True,
                     while_trip_count: int = 1) -> CollectiveStats:
    """Parse a jax Compiled object's optimized HLO for collective ops.

    ``compiled`` = jax.jit(f).lower(*args).compile(). Collectives inside
    while-loop BODIES (e.g. the lax.fori_loop ring rotations of
    parallel/ring_bcsr.py) appear once in HLO but execute once per trip —
    they are counted with ``while_trip_count`` as the multiplier (pass the
    known static trip count, e.g. S for an S-step ring).

    ``warn_if_none``: a multi-shard program that parses to ZERO collectives
    almost always means the HLO text format drifted (the regex below assumes
    ``%name = shape op(...)``) — warn loudly rather than let callers report
    a silently-perfect projected efficiency."""
    text = compiled.as_text()
    body_names = _while_body_names(text)
    counts: dict[str, int] = {}
    logical: dict[str, float] = {}
    wire = wire_in_loop = wire_outside = 0.0
    s = max(n_shards, 2)
    ring = (s - 1) / s
    current_comp = ""
    for line in text.splitlines():
        raw = line
        line = line.strip()
        # computation header: `%name (params...) -> result {` at indent 0
        hm = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\{\s*$", raw)
        if hm and not raw.startswith(" "):
            current_comp = hm.group(1)
            continue
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
        if f"{kind}-start(" in line and len(shapes) > 1:
            # async collectives have a tuple result (operand, result, ...);
            # the RESULT is the last shape token — summing the whole tuple
            # would double-count the moved bytes
            shapes = shapes[-1:]
        nbytes = float(sum(shapes))
        in_loop = current_comp in body_names
        mult = while_trip_count if in_loop else 1
        counts[kind] = counts.get(kind, 0) + mult
        logical[kind] = logical.get(kind, 0.0) + nbytes * mult
        if kind == "all-gather":
            add = nbytes * ring * mult
        elif kind == "all-reduce":
            add = 2.0 * nbytes * ring * mult
        elif kind == "reduce-scatter":
            add = nbytes * (s - 1) * mult  # result is the 1/S piece
        elif kind == "collective-permute":
            add = nbytes * mult
        elif kind == "all-to-all":
            add = nbytes * ring * mult
        else:
            add = 0.0
        wire += add
        if in_loop:
            wire_in_loop += add
        else:
            wire_outside += add
    if warn_if_none and n_shards > 1 and not counts:
        import warnings

        warnings.warn(
            f"collective_stats: {n_shards}-shard program parsed to ZERO "
            "collectives — either the program is truly collective-free or "
            "the HLO text format drifted; efficiency projections from this "
            "result are unreliable", stacklevel=2)
    return CollectiveStats(counts=counts, logical_bytes=logical,
                           wire_bytes_per_device=wire,
                           wire_bytes_in_loop=wire_in_loop,
                           wire_bytes_outside=wire_outside)


def permute_overlap_report(hlo_text: str) -> dict:
    """Per-computation async-overlap audit of collective permutes
    (VERDICT r4 #2): in a SCHEDULED TPU HLO module (instruction order =
    execution order), count ``collective-permute-start``/``-done`` pairs
    and how many straddle a Mosaic kernel custom-call — i.e. the rotation
    is in flight while the kernel runs.

    Returns {computation: {"pairs": n, "straddling": n, "kernels": n}}
    for computations containing at least one permute; plus "_total".
    """
    per_comp: dict[str, dict] = {}
    current = ""
    seq: dict[str, list] = {}
    for raw in hlo_text.splitlines():
        line = raw.strip()
        hm = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\{\s*$", raw)
        if hm and not raw.startswith(" "):
            current = hm.group(1)
            continue
        nm = re.match(r"%?([\w.\-]+)\s*=", line)
        name = nm.group(1) if nm else ""
        if "collective-permute-start(" in line:
            seq.setdefault(current, []).append(("start", name))
        elif "collective-permute-done(" in line:
            # operand name identifies the matching start
            om = re.search(r"collective-permute-done\(\s*%?([\w.\-]+)", line)
            seq.setdefault(current, []).append(
                ("done", om.group(1) if om else ""))
        elif re.search(r"custom-call\(.*custom_call_target=\"tpu_custom_call\"",
                       line) or "tpu_custom_call" in line and "custom-call" in line:
            seq.setdefault(current, []).append(("kernel", name))
    total = {"pairs": 0, "straddling": 0, "kernels": 0}
    for comp, events in seq.items():
        pairs = strad = 0
        kernels = sum(1 for k, _ in events if k == "kernel")
        starts = {}
        kernel_seen_at: list[int] = [i for i, (k, _) in enumerate(events)
                                     if k == "kernel"]
        for i, (kind, name) in enumerate(events):
            if kind == "start":
                starts[name] = i
            elif kind == "done":
                j = starts.pop(name, None)
                if j is None:
                    continue
                pairs += 1
                if any(j < ki < i for ki in kernel_seen_at):
                    strad += 1
        if pairs:
            per_comp[comp] = {"pairs": pairs, "straddling": strad,
                              "kernels": kernels}
            total["pairs"] += pairs
            total["straddling"] += strad
            total["kernels"] += kernels
    per_comp["_total"] = total
    return per_comp


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


def projected_efficiency_overlapped(
        t_compute_1chip: float, in_loop_bytes: float, outside_bytes: float,
        n_shards: int, *, bw: float = ICI_BW) -> float:
    """Overlap-roofline efficiency for the VERIFIED ring schedule
    (scripts/overlap_check.py → results/OVERLAP_r5.json): in-loop rotation
    bytes ride the wire while the loop's kernels compute — hidden up to the
    shard's compute time, only the excess is exposed; outside-loop
    collectives (gradient all-reduce, the ring's final hop home) are fully
    exposed."""
    t_comp = t_compute_1chip / n_shards
    t_exposed = outside_bytes / bw + max(0.0, in_loop_bytes / bw - t_comp)
    return t_comp / (t_comp + t_exposed)
