"""Multi-host BO fanout (parallel/multihost.py) on a real 2-process
jax.distributed 'pod' of CPU workers.

The reference's multi-GPU fanout is process-per-local-GPU and cannot span
hosts (/root/reference/bayesian_optimization.py:3709-3775); the TPU-native
replacement partitions each BO round's candidates across jax processes and
allgathers (index, score) pairs over DCN. This test spawns two actual JAX
processes against a local coordinator and asserts every process reconstructs
the IDENTICAL filtered candidate list — including a deliberately crashed
candidate being dropped on both hosts.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def pod_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(2):
        out = tmp / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), "2", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fails = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
            fails.append(f"proc {pid} timed out:\n{stdout.decode()}")
            continue
        if p.returncode != 0:
            fails.append(f"proc {pid} rc={p.returncode}:\n{stdout.decode()}")
    assert not fails, "\n\n".join(fails)
    return [json.loads(o.read_text()) for o in outs]


def test_processes_agree(pod_results):
    r0, r1 = pod_results
    assert r0["kept_c"] == r1["kept_c"]
    assert r0["kept_y"] == r1["kept_y"]


def test_crashed_candidate_dropped_everywhere(pod_results):
    r0, _ = pod_results
    # worker crashes candidate (4, 4); the rest score 10*p1 + p2
    assert r0["kept_c"] == [[1.0, 1.0], [2.0, 2.0], [3.0, 3.0], [5.0, 5.0]]
    assert r0["kept_y"] == [11.0, 22.0, 33.0, 55.0]


def test_rank_routing(pod_results):
    r0, r1 = pod_results
    assert r0["routed_multihost"] and r1["routed_multihost"]
    assert r0["is_main"] is True and r1["is_main"] is False
    assert r0["global_devices"] == 4  # 2 procs x 2 virtual cpu devices
    assert r0["local_devices"] == 2
