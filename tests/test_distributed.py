"""Multi-host execution test: a REAL 2-process `jax.distributed` job on CPU
(gloo collectives) running one data-parallel train step over a global
4-device mesh.  The reference has nothing distributed (SURVEY.md §2.3);
this validates the new first-class layer end-to-end — coordinator
rendezvous, global mesh, per-process batch feeding, and coherent gradient
reduction (bit-identical replicated params on both processes)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    # both processes computed the same global loss and identical params
    assert by_pid[0]["loss"] == pytest.approx(by_pid[1]["loss"], rel=1e-6)
    assert by_pid[0]["checksum"] == by_pid[1]["checksum"]
    assert all(abs(o["loss"]) < 1e6 for o in outs)
    # process_shard partitions the dataset without overlap
    assert by_pid[0]["shard"] == [0, 5]
    assert by_pid[1]["shard"] == [5, 10]


def test_initialize_ignores_axon_relay_env(monkeypatch):
    """The axon PJRT relay sets TPU_WORKER_HOSTNAMES for single-host tunnel
    sessions; auto-initialize must NOT treat that as a pod marker (it would
    hang waiting for a nonexistent coordinator)."""
    from feature_point_cnn_tpu.parallel import distributed

    called = {}
    monkeypatch.setattr(
        "jax.distributed.initialize",
        lambda **kw: called.setdefault("kw", kw),
    )
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    for var in distributed._COORDINATOR_VARS:
        monkeypatch.delenv(var, raising=False)
    distributed.initialize()
    assert "kw" not in called  # no-op

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    distributed.initialize()
    assert called["kw"]["coordinator_address"] == "10.0.0.1:1234"
