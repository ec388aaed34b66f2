"""Multi-process mesh execution: 2 host processes x 4 virtual CPU devices
form one 8-device 'shards' mesh; aggregates psum across the process
boundary (the DCN leg).  Reference: multi-node mapReduce executor.go:6449 /
test.MustRunCluster multi-node harness (test/cluster.go:89)."""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_aggregates():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests",
                                          "multihost_worker.py"),
             str(port), str(pid)],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    bytes_by_pid = {}
    owned_by_pid = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {pid}" in out
        for line in out.splitlines():
            if line.startswith("MULTIHOST_BYTES"):
                _, wpid, nbytes, nowned = line.split()
                bytes_by_pid[int(wpid)] = int(nbytes)
                owned_by_pid[int(wpid)] = int(nowned)
    # owner-placed host masters: per-process host bytes ~= owned share
    # (VERDICT r3 #3 done criterion)
    assert set(bytes_by_pid) == {0, 1}
    total_b = sum(bytes_by_pid.values())
    total_o = sum(owned_by_pid.values())
    assert total_o == 16
    for pid in (0, 1):
        share = bytes_by_pid[pid] / total_b
        owned_share = owned_by_pid[pid] / total_o
        assert abs(share - owned_share) < 0.15, \
            (pid, share, owned_share, bytes_by_pid, owned_by_pid)
