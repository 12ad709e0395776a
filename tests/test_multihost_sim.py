"""Two-process jax.distributed simulation executes the multi-host path.

Round-3 verdict item 6: initialize_multihost + a global 2-process mesh +
data-parallel train steps (gradient psum across the process boundary) +
the cross-process heartbeat channel, simulated with 2 local CPU processes
(the closest in-env proxy to real multi-host; see tools/multihost_sim.py).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tools", "multihost_sim.py")


def test_two_process_simulation():
    out = subprocess.run([sys.executable, TOOL], capture_output=True,
                         text=True, timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    w0, w1 = rec["workers"]
    assert w0["processes"] == w1["processes"] == 2
    assert w0["devices"] == w1["devices"] == 8
    # SPMD invariant: replicated losses identical across processes
    assert w0["losses"] == w1["losses"]
