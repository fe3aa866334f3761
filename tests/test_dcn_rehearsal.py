"""Multi-process DCN rehearsal (VERDICT round-1 item 8).

Launches TWO separate Python processes that form a jax.distributed cluster
over localhost (gloo collectives = the CPU stand-in for DCN), each owning 2
virtual CPU devices, and drives 3 real sharded curriculum train steps over
the resulting 4-device global mesh. This executes parallel/distributed.py's
init path and the cross-process input-pipeline contract
(make_array_from_process_local_data) — previously code-only.

Replaces the reference's implicit trust in Lightning DDP spawn
(train/train_lce.py:89-91); here the multi-host contract is CI-testable
without a pod.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_cluster_trains_in_lockstep():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {i} failed:\n{out}\n{err[-3000:]}"
        assert "DCN_OK" in out, out
        outs.append(out)

    # Both hosts must report identical loss/eta/difficulty trajectories —
    # the replicated state stayed in sync across the process boundary.
    step_re = re.compile(r"STEP (\d+) loss=([\d.]+) eta=([\d.]+) difficulty=([\d.]+)")
    t0, t1 = (step_re.findall(o) for o in outs)
    assert len(t0) == 3 and t0 == t1, (t0, t1)
    # and the loss actually moved (the steps did real work)
    assert t0[0][1] != t0[-1][1]
