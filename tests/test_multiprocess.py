"""Multi-process jax.distributed exercise (SURVEY.md §4.5a/§5.8; VERDICT
round-1 item 6): two REAL processes join via launch.init_distributed
(coordinator + HAN_TPU_* env resolution), form one 4-device global mesh
(2 local CPU devices each), and run edge-partitioned attention across the
process boundary — gloo CPU collectives stand in for ICI/DCN. Equality
with the single-process result is asserted inside each worker."""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_ROOT, "tests", "mp_partitioned_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_partitioned_attention():
    port = str(_free_port())
    env = dict(os.environ)
    # children pick their own platform/device-count; scrub pytest's flags
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, _CHILD, str(pid), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=_ROOT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MP_OK" in out, f"proc {pid} no MP_OK:\n{out[-3000:]}"
