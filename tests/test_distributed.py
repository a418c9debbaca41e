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


def test_two_process_selflabel(tmp_path):
    """Multi-host self-labeling proven the way training was (VERDICT r4
    item 6): a REAL 2-process `jax.distributed` job labels a shared folder
    with `preprocess_folder` shard_index/num_shards, and the union of the
    shard outputs equals a single-process labeling run.

    Keypoint COORDINATES must match bit-for-bit.  Scores are compared to
    float tolerance here because the comparison crosses process boundaries
    with different XLA host configurations (the pytest process forces 8
    virtual devices, workers 2), and XLA CPU's intra-op thread partitioning
    shifts conv reductions by ~1 ULP.  Full bitwise equality under a fixed
    program (the real multi-host setup: one binary, one config per host) is
    asserted in-process by
    test_inference.py::test_selflabel_shard_union_bit_identical."""
    import cv2
    import numpy as np

    src = tmp_path / "imgs"
    src.mkdir()
    out = tmp_path / "sharded"
    rng = __import__("numpy").random.default_rng(11)
    for i in range(6):
        img = (rng.uniform(0, 255, (48, 64, 3))).astype("uint8")
        cv2.imwrite(str(src / f"im{i}.jpg"), img)

    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    worker = Path(__file__).parent / "selflabel_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), "2", str(pid),
             str(src), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("selflabel worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(o.strip().splitlines()[-1]))
    assert sum(o["written"] for o in outs) == 6
    assert sorted(p.name for p in out.glob("*.npz")) == [
        f"im{i}.npz" for i in range(6)
    ]

    # single-process reference labeling with an identical frontend
    from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
    from feature_point_cnn_tpu.selflabel.coco import preprocess_folder

    cfg = SuperPointConfig(
        train_image_size=(48, 64), max_keypoints=64, compute_dtype="float32"
    )
    frontend = SuperPointFrontend(config=cfg, seed=0)
    homo = HomographyConfig(num=3, valid_border_margin=4)
    single = tmp_path / "single"
    # batch_size must match the workers': bitwise equality holds per compiled
    # program (same static shapes); a different batch size shifts scores ~1 ULP
    n = preprocess_folder(
        frontend, str(src), str(single), homo,
        batch_size=2, seed=0, use_mesh=False,
    )
    assert n == 6
    for f in sorted(single.glob("*.npz")):
        a, b = np.load(f), np.load(out / f.name)
        pa, pb = a["points"], b["points"]
        assert pa.shape == pb.shape, f.name
        # rows 0-1: (x, y) coordinates — exact; row 2: confidence — 1 ULP
        assert np.array_equal(pa[:2], pb[:2]), f.name
        np.testing.assert_allclose(pa[2], pb[2], rtol=1e-5, err_msg=f.name)
        assert np.array_equal(a["image"], b["image"]), f.name


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
