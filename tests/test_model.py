"""Model tests: topology/shape contracts of the Flax SuperPoint
(`/root/reference/python/src/superpoint.py:8-115`) and torch-parity of the
layout-sensitive primitives (explicit conv padding, transposed conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.blocks import TorchConvTranspose, torch_conv
from feature_point_cnn_tpu.models.superpoint import init_superpoint

CFG = SuperPointConfig(train_image_size=(48, 64))


@pytest.fixture(scope="module")
def model_and_vars():
    return init_superpoint(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(model_and_vars, rng):
    model, variables = model_and_vars
    img = jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32)
    prob, desc, logits = model.apply(variables, img, train=False)
    assert prob.shape == (2, 48, 64)
    assert desc.shape == (2, 6, 8, 128)
    assert logits.shape == (2, 6, 8, 65)
    assert prob.dtype == desc.dtype == logits.dtype == jnp.float32
    p = np.asarray(prob)
    assert (p >= 0).all() and (p <= 1).all()


def test_forward_any_multiple_of_8(model_and_vars, rng):
    """Fully-convolutional: any H,W divisible by 8 works with the same params
    (restore_prob_map is shape-parametric, `netutils.py:64-75`)."""
    model, variables = model_and_vars
    img = jnp.asarray(rng.random((1, 80, 96, 3)), jnp.float32)
    prob, desc, logits = model.apply(variables, img, train=False)
    assert prob.shape == (1, 80, 96)
    assert desc.shape == (1, 10, 12, 128)


def test_descriptor_disabled(model_and_vars, rng):
    model, variables = model_and_vars
    img = jnp.asarray(rng.random((1, 48, 64, 3)), jnp.float32)
    prob, desc, _ = model.apply(
        variables, img, train=False, enable_descriptor=False
    )
    assert np.all(np.asarray(desc) == 0.0)


def test_train_mode_updates_batch_stats(model_and_vars, rng):
    model, variables = model_and_vars
    img = jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32)
    (_, _, _), updates = model.apply(
        variables, img, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_param_tree_has_expected_heads(model_and_vars):
    _, variables = model_and_vars
    params = variables["params"]
    assert set(params.keys()) == {"encoder", "detector", "descriptor"}
    # identity projection exists on the first block of each layer only
    layer1 = params["encoder"]["layer1"]
    assert "identity_conv" in layer1["block0"]
    assert "identity_conv" not in layer1["block1"]


def test_conv_padding_matches_torch(rng):
    """Torch pads 7x7/s2 symmetrically (3,3); XLA SAME would pad (2,3) and
    shift activations — explicit padding must match torch."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
    conv = torch_conv(4, 7, 2, 3, dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])          # (7,7,3,4)

    tconv = torch.nn.Conv2d(3, 4, 7, stride=2, padding=3, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
    want = (
        tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(conv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_transpose_matches_torch(rng):
    """TorchConvTranspose == torch ConvTranspose2d(3, s2, p1, op1)
    (`superpoint.py:45`) with the kernel flip/permute applied."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 6, 8, 5)).astype(np.float32)
    mod = TorchConvTranspose(7, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])          # (3,3,in=5,out=7)
    b = np.asarray(variables["params"]["bias"])

    tmod = torch.nn.ConvTranspose2d(5, 7, 3, stride=2, padding=1, output_padding=1)
    with torch.no_grad():
        # ours is correlation layout: torch weight = flip(w)[kh,kw,in,out] -> (in,out,kh,kw)
        tw = w[::-1, ::-1].transpose(2, 3, 0, 1).copy()
        tmod.weight.copy_(torch.from_numpy(tw))
        tmod.bias.copy_(torch.from_numpy(b))
    want = (
        tmod(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 12, 16, 7)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_maxpool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    x = rng.standard_normal((1, 9, 11, 2)).astype(np.float32)
    got = np.asarray(
        nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    )
    want = (
        torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want)


def test_s2d_stem_exact(rng):
    """`stem_s2d="on"` computes the identical function from the identical
    param tree (blocks.py::S2DStemConv is an exact reparametrization of the
    7x7/2/pad-3 stem, `superpoint.py:12-26`)."""
    cfg_off = SuperPointConfig(compute_dtype="float32", stem_s2d="off")
    cfg_on = SuperPointConfig(compute_dtype="float32", stem_s2d="on")
    m_off, variables = init_superpoint(jax.random.PRNGKey(3), cfg_off, (64, 96))
    m_on, v_on = init_superpoint(jax.random.PRNGKey(3), cfg_on, (64, 96))
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v_on)
    )
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 96, 3))
    out_off = jax.jit(lambda v, im: m_off.apply(v, im, train=False))(
        variables, img
    )
    out_on = jax.jit(lambda v, im: m_on.apply(v, im, train=False))(
        variables, img
    )
    for a, b in zip(out_off, out_on):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_fold_batchnorm_parity(rng):
    """`fold_bn=True` + `fold_batchnorm(variables)` computes the identical
    function as the standard model with live BN stats (models/fold.py) —
    the exactness contract of the inference-export fold."""
    from feature_point_cnn_tpu.models.fold import fold_batchnorm

    cfg = SuperPointConfig(compute_dtype="float32")
    model, variables = init_superpoint(jax.random.PRNGKey(5), cfg, (48, 64))

    # make the fold non-trivial: real running stats from train-mode steps
    # and randomized BN scale/bias (init is scale=1, bias=0, mean=0, var=1,
    # for which folding is the identity)
    img = jax.random.uniform(jax.random.PRNGKey(6), (2, 48, 64, 3))
    for i in range(3):
        _, upd = model.apply(
            variables, img + 0.1 * i, train=True, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"], **upd}

    def randomize_bn(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "bn" not in name:
            return leaf
        k = jax.random.fold_in(jax.random.PRNGKey(7), hash(name) % (2**31))
        if name.endswith("scale"):
            return 0.5 + jax.random.uniform(k, leaf.shape)
        if name.endswith("bias"):
            return jax.random.normal(k, leaf.shape) * 0.1
        return leaf

    variables = {
        "params": jax.tree_util.tree_map_with_path(
            randomize_bn, variables["params"]
        ),
        "batch_stats": variables["batch_stats"],
    }

    folded = fold_batchnorm(variables)
    assert "batch_stats" not in folded
    folded_model = init_superpoint(
        jax.random.PRNGKey(5), cfg.replace(fold_bn=True), (48, 64)
    )[0]
    # the fold output must match the folded topology's param tree exactly
    ref_tree = init_superpoint(
        jax.random.PRNGKey(5), cfg.replace(fold_bn=True), (48, 64)
    )[1]
    assert jax.tree_util.tree_structure(folded) == (
        jax.tree_util.tree_structure(ref_tree)
    )

    test_img = jax.random.uniform(jax.random.PRNGKey(8), (2, 48, 64, 3))
    out = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, test_img
    )
    out_f = jax.jit(lambda v, im: folded_model.apply(v, im, train=False))(
        folded, test_img
    )
    for a, b in zip(out, out_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_fold_batchnorm_rejects_train_mode():
    cfg = SuperPointConfig(compute_dtype="float32", fold_bn=True)
    from feature_point_cnn_tpu.models.superpoint import SuperPoint

    model = SuperPoint(config=cfg)
    img = jnp.zeros((1, 48, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="inference-export"):
        model.init(jax.random.PRNGKey(0), img, train=True)
