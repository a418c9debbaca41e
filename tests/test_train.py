"""Training smoke tests: loss decreases on a tiny synthetic set, the
SuperPoint joint step runs finite on-device augmentation, freeze/decay
masks match the reference rules, checkpoint resume and phase graft work."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.data.datasets import BatchLoader, NpzPointDataset
from feature_point_cnn_tpu.data.synthetic_shapes import (
    PRIMITIVES,
    SyntheticShapeGenerator,
)
from feature_point_cnn_tpu.models.superpoint import init_superpoint
from feature_point_cnn_tpu.train import steps as S
from feature_point_cnn_tpu.train.optimizer import decay_mask, make_optimizer
from feature_point_cnn_tpu.train.trainer import Trainer

CFG = SuperPointConfig(
    train_image_size=(48, 64),
    batch_size=4,
    max_points=64,
    max_keypoints=64,
    compute_dtype="float32",   # CPU test speed; bf16 on TPU
)
HOMO = HomographyConfig(valid_border_margin=4)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    gen = SyntheticShapeGenerator(
        np.random.default_rng(1), image_size=(192, 256), out_size=(48, 64), blur_size=5
    )
    for split, n in (("train", 16), ("test", 8)):
        d = root / split
        d.mkdir()
        for i in range(n):
            prim = PRIMITIVES[i % 4]  # corner-rich primitives only
            image, points = gen.sample(prim)
            np.savez_compressed(d / f"{prim}_{i}.npz", image=image, points=points)
    return root


def _loaders(root):
    train = BatchLoader(
        NpzPointDataset(str(root), "train"), CFG.batch_size, CFG.max_points
    )
    test = BatchLoader(
        NpzPointDataset(str(root), "test"), CFG.batch_size, CFG.max_points,
        shuffle=False,
    )
    return train, test


def test_decay_mask_rules():
    _, variables = init_superpoint(jax.random.PRNGKey(0), CFG)
    mask = decay_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    decayed = {"/".join(str(getattr(k, "key", k)) for k in p): v for p, v in flat}
    assert decayed["encoder/conv1/kernel"] is True
    assert decayed["encoder/bn1/scale"] is False
    assert decayed["encoder/layer1/block0/identity_conv/kernel"] is False
    assert decayed["descriptor/up_sample/bias"] is False
    assert decayed["descriptor/up_sample/kernel"] is True


@pytest.fixture(scope="module")
def mp_trained(tiny_dataset):
    """Train MagicPoint for 6 tiny epochs and checkpoint epoch 5."""
    train, _ = _loaders(tiny_dataset)
    trainer = Trainer(
        CFG, "magicpoint", train, None,
        checkpoint_dir=str(tiny_dataset / "ckpt_mp"),
        write_statistics=True, log_every=4,
    )
    losses = [trainer.train_epoch(e)["loss"] for e in range(6)]
    trainer.save(5)
    return trainer, losses


def test_model_graph_summary_written(mp_trained, tiny_dataset):
    """Train start writes the model-graph analog of the reference's
    `add_graph` (`basetrainer.py:53-59`): the flax module table and the
    jitted train step's StableHLO, as files next to metrics.jsonl."""
    runs = tiny_dataset / "ckpt_mp" / "runs"
    table = (runs / "model_magicpoint_table.txt").read_text()
    assert "SuperPoint" in table and "params" in table
    hlo = (runs / "model_magicpoint_train_step_stablehlo.txt").read_text()
    assert "stablehlo" in hlo or "module @" in hlo
    assert (runs / "metrics.jsonl").exists()


def test_magicpoint_loss_decreases(mp_trained):
    trainer, losses = mp_trained
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses

    # descriptor head must be untouched (frozen) in this phase
    _, fresh = init_superpoint(jax.random.fold_in(trainer.base_key, 17), CFG)
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        trainer.state.params["descriptor"], fresh["params"]["descriptor"],
    )
    assert all(jax.tree_util.tree_leaves(same))


def test_resume_and_superpoint_graft(tiny_dataset, mp_trained):
    train, test = _loaders(tiny_dataset)
    # resume magicpoint from the checkpoint the fixture wrote
    t2 = Trainer(
        CFG, "magicpoint", train, None,
        checkpoint_dir=str(tiny_dataset / "ckpt_mp"),
        write_statistics=False,
    )
    assert t2.start_epoch == 6

    # superpoint phase grafts encoder+detector, fresh descriptor
    sp = Trainer(
        CFG, "superpoint", train, test,
        checkpoint_dir=str(tiny_dataset / "ckpt_sp"),
        magicpoint_checkpoint_dir=str(tiny_dataset / "ckpt_mp"),
        homo_config=HOMO,
        write_statistics=False, log_every=2,
    )
    enc_equal = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        sp.state.params["encoder"], t2.state.params["encoder"],
    )
    assert all(jax.tree_util.tree_leaves(enc_equal))

    m = sp.train_epoch(0)
    assert np.isfinite(m["loss"])
    ev = sp.evaluate(0)
    assert np.isfinite(ev["loss"]) and 0.0 <= ev["f1"] <= 1.0


def test_superpoint_graft_from_npz_snapshot(tiny_dataset, mp_trained):
    """`--magic-point-weights X.npz` grafts from the portable snapshot —
    the committed `.npz` is the only artifact surviving an environment
    reset (the orbax dir is gitignored), so the graft path must accept it."""
    from feature_point_cnn_tpu.utils import weights as wsnap

    trainer, _ = mp_trained
    snap = tiny_dataset / "mp_snapshot.npz"
    wsnap.save_weights(
        str(snap),
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
    )
    train, test = _loaders(tiny_dataset)
    sp = Trainer(
        CFG, "superpoint", train, test,
        checkpoint_dir=str(tiny_dataset / "ckpt_sp_npz"),
        magicpoint_checkpoint_dir=str(snap),
        homo_config=HOMO,
        write_statistics=False, log_every=2,
    )
    enc_equal = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        sp.state.params["encoder"], trainer.state.params["encoder"],
    )
    assert all(jax.tree_util.tree_leaves(enc_equal))


def test_superpoint_step_runs_standalone(rng):
    """One jitted joint step end-to-end with on-device augmentation."""
    model, variables = init_superpoint(jax.random.PRNGKey(0), CFG)
    tx = make_optimizer(CFG, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32),
        "points": jnp.asarray(rng.random((2, 16, 2)) * [47, 63], jnp.float32),
        "points_valid": jnp.ones((2, 16), bool),
    }
    state2, metrics = S.superpoint_train_step(
        state, batch, jax.random.PRNGKey(1),
        model=model, tx=tx, config=CFG, homo_config=HOMO,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params["encoder"], state2.params["encoder"],
    )
    assert any(jax.tree_util.tree_leaves(moved))


def test_grad_accum_multisteps(rng):
    cfg = CFG.replace(grad_accum_steps=2)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32),
        "points": jnp.asarray(rng.random((2, 8, 2)) * [47, 63], jnp.float32),
        "points_valid": jnp.ones((2, 8), bool),
    }
    s1, _ = S.magicpoint_train_step(
        state, batch, jax.random.PRNGKey(1), model=model, tx=tx, config=cfg
    )
    # after one micro-step params must be unchanged (accumulating)
    unchanged = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, s1.params,
    )
    assert all(jax.tree_util.tree_leaves(unchanged))
    s2, _ = S.magicpoint_train_step(
        s1, batch, jax.random.PRNGKey(2), model=model, tx=tx, config=cfg
    )
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        s1.params["encoder"], s2.params["encoder"],
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_uint8_batch_matches_float(rng):
    """Raw uint8 single-channel batches (packed loader fast path) produce the
    same step as pre-converted float batches."""
    model, variables = init_superpoint(jax.random.PRNGKey(0), CFG)
    tx = make_optimizer(CFG, variables["params"])
    state = S.create_train_state(variables, tx)
    img_u8 = (rng.random((2, 48, 64, 1)) * 255).astype(np.uint8)
    img_f = np.repeat(img_u8.astype(np.float32) / 255.0, 3, axis=-1)
    pts = rng.random((2, 8, 2)) * [47, 63]
    mk = lambda img: {
        "image": jnp.asarray(img),
        "points": jnp.asarray(pts, jnp.float32),
        "points_valid": jnp.ones((2, 8), bool),
    }
    s_u8, m_u8 = S.magicpoint_train_step(
        state, mk(img_u8), jax.random.PRNGKey(1), model=model, tx=tx, config=CFG
    )
    s_f, m_f = S.magicpoint_train_step(
        state, mk(img_f), jax.random.PRNGKey(1), model=model, tx=tx, config=CFG
    )
    np.testing.assert_allclose(
        float(m_u8["loss"]), float(m_f["loss"]), rtol=1e-6
    )


def test_lr_schedule_warmup_cosine():
    from feature_point_cnn_tpu.train.optimizer import make_schedule

    cfg = CFG.replace(lr_schedule="warmup_cosine", warmup_steps=10,
                      learning_rate=1e-3, lr_final_ratio=0.1)
    sched = make_schedule(cfg, total_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(50)) < 1e-3
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    # constant fallback
    cfg2 = cfg.replace(lr_schedule="constant")
    assert make_schedule(cfg2, total_steps=100) == 1e-3
    # no total steps -> constant
    assert make_schedule(cfg, total_steps=None) == 1e-3


def test_scan_microbatching_matches_sequential(rng):
    """The scan accumulator must reproduce sequential per-microbatch
    value_and_grad at the SAME params with averaged grads/losses and
    threaded BN stats — the reference's batch_size_divider semantics
    (basetrainer.py:133-166).  Grads are compared directly (a full optimizer
    step would let Adam sign-flip near-zero updates on accumulation-order
    float noise)."""
    from feature_point_cnn_tpu.ops.labels import make_points_labels_batch
    from feature_point_cnn_tpu.train.loss import detector_loss

    model, variables = init_superpoint(jax.random.PRNGKey(0), CFG)
    params, stats0 = variables["params"], variables["batch_stats"]
    imgs = jnp.asarray(rng.random((4, 48, 64, 3)), jnp.float32)
    pts = jnp.asarray(rng.random((4, 8, 2)) * [47, 63], jnp.float32)
    labels = make_points_labels_batch(
        pts, jnp.ones((4, 8), bool), jax.random.PRNGKey(3), 48, 64, CFG.cell
    )

    def micro_loss(p, stats, m):
        out, mut = model.apply(
            {"params": p, "batch_stats": stats}, m["images"], train=True,
            enable_descriptor=False, mutable=["batch_stats"],
        )
        loss = detector_loss(out[2], m["labels"], None, CFG.cell, "ce")
        return loss, (mut["batch_stats"], out[2])

    data = {"images": imgs, "labels": labels}
    # jit BOTH paths: eager-vs-compiled CPU convs differ at ~1e-3 rel, which
    # would mask real semantic differences (measured; jit-vs-jit agrees to
    # float noise)
    helper = jax.jit(
        lambda p, s, d: S._microbatched_value_and_grad(micro_loss, p, s, d, 2)
    )
    loss_k, stats_k, logits_k, grads_k = helper(params, stats0, data)

    def sequential(p, stats, d):
        # the split is STRIDED (microbatch i = items [i, i+k, ...]) so each
        # microbatch stays evenly sharded under the data-parallel mesh
        gfn = jax.value_and_grad(micro_loss, has_aux=True)
        (l1, (s1, lg1)), g1 = gfn(
            p, stats,
            {"images": d["images"][0::2], "labels": d["labels"][0::2]},
        )
        (l2, (s2, lg2)), g2 = gfn(
            p, s1,
            {"images": d["images"][1::2], "labels": d["labels"][1::2]},
        )
        ref = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
        return (l1 + l2) / 2.0, s2, jnp.concatenate([lg1, lg2]), ref

    loss_r, stats_r, logits_r, grads_r = jax.jit(sequential)(
        params, stats0, data
    )

    np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        grads_k, grads_r,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        stats_k, stats_r,
    )
    # stacked aux restores the full-batch order
    np.testing.assert_allclose(
        np.asarray(logits_k.reshape((-1,) + logits_k.shape[2:])),
        np.asarray(logits_r), rtol=1e-5, atol=1e-5,
    )


def test_microbatched_steps_run(rng):
    """End-to-end: both phase steps run finite with microbatch_steps=2 and
    move parameters."""
    cfg = CFG.replace(microbatch_steps=2)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.asarray(rng.random((4, 48, 64, 3)), jnp.float32),
        "points": jnp.asarray(rng.random((4, 8, 2)) * [47, 63], jnp.float32),
        "points_valid": jnp.ones((4, 8), bool),
    }
    s_mp, m_mp = S.magicpoint_train_step(
        state, batch, jax.random.PRNGKey(1), model=model, tx=tx, config=cfg
    )
    s_sp, m_sp = S.superpoint_train_step(
        state, batch, jax.random.PRNGKey(1),
        model=model, tx=tx, config=cfg, homo_config=HOMO,
    )
    assert np.isfinite(float(m_mp["loss"]))
    assert np.isfinite(float(m_sp["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params["encoder"], s_sp.params["encoder"],
    )
    assert any(jax.tree_util.tree_leaves(moved))


@pytest.mark.parametrize("k", [4, 3])
def test_steps_per_call_scan_matches_loop(tiny_dataset, tmp_path, k):
    """`train_steps_per_call=k` (k optimizer steps chained in one jitted
    lax.scan dispatch over the device-resident store) must reproduce the
    k=1 loop: same RNG key per step index, same batch order -> matching
    params.  k=3 with 4 steps/epoch also exercises the single-step tail."""
    from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset

    out = tmp_path / "packed"
    pack_dataset(str(tiny_dataset), str(out))

    def run(steps_per_call, tag):
        ds = PackedPointDataset(str(out), "train", seed=0)
        loader = DeviceBatchLoader(
            ds, batch_size=CFG.batch_size, max_points=CFG.max_points, seed=0
        )
        tr = Trainer(
            CFG.replace(train_steps_per_call=steps_per_call), "magicpoint",
            loader, None,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            write_statistics=False, log_every=2, seed=3,
        )
        m = tr.train_epoch(0)
        return tr.state, m

    state1, m1 = run(1, "k1")
    statek, mk = run(k, f"k{k}")
    assert np.isfinite(m1["loss"]) and np.isfinite(mk["loss"])
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(statek.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    assert int(state1.step) == int(statek.step)


def test_eval_cap_limits_batches(tiny_dataset):
    """eval_max_items caps per-epoch eval like the reference's 1000-item
    test-split cap (superpointtrainer.py:11)."""
    cfg = CFG.replace(eval_max_items=4, epochs=1)  # 4 items = 1 batch of 4
    train, test = _loaders(tiny_dataset)
    seen = []
    orig_epoch = test.epoch

    def counting_epoch(e):
        for b in orig_epoch(e):
            seen.append(1)
            yield b

    test.epoch = counting_epoch
    tr = Trainer(
        cfg, "magicpoint", train, test,
        checkpoint_dir=str(tiny_dataset / "ckpt_evalcap"),
        write_statistics=False,
    )
    out = tr.evaluate(0)
    assert len(seen) <= 2  # generator may be pulled once past the cap
    assert np.isfinite(out["loss"])
