"""Checkpoint-porting parity: torch state_dicts import into our Flax trees
and produce identical outputs (full-model oracle for the VGG family built
from the C++ spec `cpp/src/model.cc`; structural + shape checks for the
ResNet family, whose primitive parity is covered in test_model.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.superpoint import init_superpoint
from feature_point_cnn_tpu.models.torch_import import (
    resnet_variables_from_torch_state,
    vgg_variables_from_torch_state,
)
from feature_point_cnn_tpu.models.vgg_superpoint import VGGSuperPoint

torch = pytest.importorskip("torch")


def _torch_vgg_oracle():
    """The C++ app's model (`model.cc:4-94`) transcribed to torch as an
    independent oracle."""
    import torch.nn as tnn

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            dims = [(1, 64), (64, 64), (64, 128), (128, 128)]
            for i, (cin, cout) in enumerate(dims):
                setattr(self, f"encoder_conv{i}_a", tnn.Conv2d(cin, cout, 3, 1, 1))
                setattr(self, f"encoder_conv{i}_b", tnn.Conv2d(cout, cout, 3, 1, 1))
            self.detector_conv_a = tnn.Conv2d(128, 256, 3, 1, 1)
            self.detector_conv_b = tnn.Conv2d(256, 65, 1, 1, 0)
            self.descriptor_conv_a = tnn.Conv2d(128, 256, 3, 1, 1)
            self.descriptor_conv_b = tnn.Conv2d(256, 256, 1, 1, 0)

        def forward(self, x):
            for i in range(4):
                x = torch.relu(getattr(self, f"encoder_conv{i}_a")(x))
                x = torch.relu(getattr(self, f"encoder_conv{i}_b")(x))
                if i != 3:
                    x = torch.max_pool2d(x, 2, 2)
            point = self.detector_conv_b(torch.relu(self.detector_conv_a(x)))
            desc = self.descriptor_conv_b(torch.relu(self.descriptor_conv_a(x)))
            dn = torch.norm(desc, p=2, dim=1)
            desc = desc.div(torch.unsqueeze(dn, 1))
            return point, desc

    return Oracle()


def test_vgg_import_full_forward_parity(rng):
    oracle = _torch_vgg_oracle().eval()
    state = {k: v for k, v in oracle.state_dict().items()}
    variables = vgg_variables_from_torch_state(state)

    cfg = SuperPointConfig(
        image_channels=1, descriptor_dim=256, compute_dtype="float32"
    )
    model = VGGSuperPoint(config=cfg)
    x = rng.random((1, 32, 40, 1)).astype(np.float32)
    prob, desc, logits = model.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        t_logits, t_desc = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(logits), t_logits.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(desc), t_desc.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    assert prob.shape == (1, 32, 40)


def _fake_resnet_state(params, stats, rng):
    """Build a reference-named torch-layout state_dict shaped after our own
    tree (inverse of the importer's conversions), filled with random values."""
    state = {}

    def conv_w(p):  # HWIO -> OIHW
        return rng.standard_normal(
            (p["kernel"].shape[3], p["kernel"].shape[2],
             p["kernel"].shape[0], p["kernel"].shape[1])
        ).astype(np.float32)

    def add_bn(name, p):
        c = p["scale"].shape[0]
        state[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        state[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
        state[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        state[f"{name}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    def add_block(name, p):
        state[f"{name}.conv1.weight"] = conv_w(p["conv1"])
        state[f"{name}.conv2.weight"] = conv_w(p["conv2"])
        add_bn(f"{name}.bn1", p["bn1"])
        add_bn(f"{name}.bn2", p["bn2"])
        if "identity_conv" in p:
            state[f"{name}.identity_downsample.0.weight"] = conv_w(p["identity_conv"])
            add_bn(f"{name}.identity_downsample.1", p["identity_bn"])

    def add_layer(name, p):
        for i in (0, 1):
            add_block(f"{name}.{i}", p[f"block{i}"])

    state["encoder.conv1.weight"] = conv_w(params["encoder"]["conv1"])
    add_bn("encoder.bn1", params["encoder"]["bn1"])
    add_layer("encoder.layer1", params["encoder"]["layer1"])
    add_layer("encoder.layer2", params["encoder"]["layer2"])
    add_layer("detector.layer", params["detector"]["layer"])
    add_layer("descriptor.layer_in", params["descriptor"]["layer_in"])
    k = params["descriptor"]["up_sample"]["kernel"]
    state["descriptor.up_sample.weight"] = rng.standard_normal(
        (k.shape[2], k.shape[3], k.shape[0], k.shape[1])
    ).astype(np.float32)
    state["descriptor.up_sample.bias"] = rng.standard_normal(
        k.shape[3]
    ).astype(np.float32)
    add_bn("descriptor.bn", params["descriptor"]["bn"])
    add_layer("descriptor.layer_out", params["descriptor"]["layer_out"])
    return state


def test_resnet_import_structure_matches_model(rng):
    """Every imported leaf must match the model's init tree exactly (same
    paths, same shapes) — guarantees a reference checkpoint drops in."""
    cfg = SuperPointConfig(train_image_size=(48, 64), compute_dtype="float32")
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    state = _fake_resnet_state(
        variables["params"], variables["batch_stats"], rng
    )
    imported = resnet_variables_from_torch_state(state)

    want_p = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    got_p = {tuple(str(k) for k in path): v
             for path, v in jax.tree_util.tree_flatten_with_path(imported["params"])[0]}
    for path, leaf in want_p:
        key = tuple(str(k) for k in path)
        assert key in got_p, f"missing imported param {key}"
        assert got_p[key].shape == leaf.shape, key
    assert len(got_p) == len(want_p)

    # imported variables must run through the model
    model, _ = init_superpoint(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 48, 64, 3)), jnp.float32)
    prob, desc, logits = model.apply(imported, x)
    assert np.isfinite(np.asarray(prob)).all()


def test_convtranspose_import_parity(rng):
    """The flip/permute convention for ConvTranspose2d import must reproduce
    torch numerics (the subtlest conversion)."""
    from feature_point_cnn_tpu.models.blocks import TorchConvTranspose
    from feature_point_cnn_tpu.models.torch_import import _conv_transpose

    tmod = torch.nn.ConvTranspose2d(6, 4, 3, stride=2, padding=1, output_padding=1)
    state = {f"up.{k}": v for k, v in tmod.state_dict().items()}
    imported = _conv_transpose(state, "up")

    x = rng.standard_normal((1, 5, 7, 6)).astype(np.float32)
    mod = TorchConvTranspose(4, dtype=jnp.float32)
    got = np.asarray(mod.apply({"params": imported}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)
