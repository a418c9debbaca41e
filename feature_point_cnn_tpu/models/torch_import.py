"""Import reference PyTorch checkpoints into our Flax parameter trees.

This is the parity bridge demanded by SURVEY.md §6: given a trained
reference checkpoint (`saveutils.py:54-63` format or a bare ``state_dict``),
produce ``{"params", "batch_stats"}`` for `models.superpoint.SuperPoint`
(ResNet variant, `superpoint.py:8-61`) or `models.vgg_superpoint.VGGSuperPoint`
(the C++ app's hand-built model, `cpp/src/model.cc`), so identical inputs
yield identical keypoints/descriptors.

Layout conversions:
* conv weight OIHW -> HWIO;
* ConvTranspose2d weight (in, out, kh, kw) -> spatially flipped HWIO
  (our `TorchConvTranspose` stores the correlation form);
* BatchNorm weight/bias -> scale/bias params, running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file -> flat name->numpy dict.  Accepts both a
    bare state_dict and the reference trainer dict with ``model_state_dict``
    (`saveutils.py:57-62`)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: _np(v) for k, v in obj.items()}


def _conv(state: Mapping[str, np.ndarray], name: str, bias: bool = False) -> Dict:
    out = {"kernel": _np(state[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(state[f"{name}.bias"])
    return out


def _conv_transpose(state: Mapping[str, np.ndarray], name: str) -> Dict:
    w = _np(state[f"{name}.weight"])            # (in, out, kh, kw)
    kernel = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()  # -> HW, in, out
    return {"kernel": kernel, "bias": _np(state[f"{name}.bias"])}


def _bn(state: Mapping[str, np.ndarray], name: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": _np(state[f"{name}.weight"]),
        "bias": _np(state[f"{name}.bias"]),
    }
    stats = {
        "mean": _np(state[f"{name}.running_mean"]),
        "var": _np(state[f"{name}.running_var"]),
    }
    return params, stats


def _resnet_block(
    state: Mapping[str, np.ndarray], prefix: str, first: bool
) -> Tuple[Dict, Dict]:
    """One `ResNetBlock` (`resnet_blocks.py:4-27`); the first block of a layer
    carries the `identity_downsample` Sequential (conv at .0, bn at .1)."""
    params: Dict[str, Any] = {"conv1": _conv(state, f"{prefix}.conv1"),
                              "conv2": _conv(state, f"{prefix}.conv2")}
    stats: Dict[str, Any] = {}
    for bn_name in ("bn1", "bn2"):
        p, s = _bn(state, f"{prefix}.{bn_name}")
        params[bn_name] = p
        stats[bn_name] = s
    if first:
        params["identity_conv"] = _conv(state, f"{prefix}.identity_downsample.0")
        p, s = _bn(state, f"{prefix}.identity_downsample.1")
        params["identity_bn"] = p
        stats["identity_bn"] = s
    return params, stats


def _resnet_layer(
    state: Mapping[str, np.ndarray], prefix: str, num_blocks: int = 2
) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for i in range(num_blocks):
        p, s = _resnet_block(state, f"{prefix}.{i}", first=(i == 0))
        params[f"block{i}"] = p
        stats[f"block{i}"] = s
    return params, stats


def resnet_variables_from_torch_state(
    state: Mapping[str, np.ndarray]
) -> Dict[str, Dict]:
    """Reference ResNet-SuperPoint state_dict -> Flax variables."""
    params: Dict[str, Any] = {"encoder": {}, "detector": {}, "descriptor": {}}
    stats: Dict[str, Any] = {"encoder": {}, "detector": {}, "descriptor": {}}

    enc_p, enc_s = params["encoder"], stats["encoder"]
    enc_p["conv1"] = _conv(state, "encoder.conv1")
    enc_p["bn1"], enc_s["bn1"] = _bn(state, "encoder.bn1")
    for layer in ("layer1", "layer2"):
        enc_p[layer], enc_s[layer] = _resnet_layer(state, f"encoder.{layer}")

    params["detector"]["layer"], stats["detector"]["layer"] = _resnet_layer(
        state, "detector.layer"
    )

    dsc_p, dsc_s = params["descriptor"], stats["descriptor"]
    dsc_p["layer_in"], dsc_s["layer_in"] = _resnet_layer(state, "descriptor.layer_in")
    dsc_p["up_sample"] = _conv_transpose(state, "descriptor.up_sample")
    dsc_p["bn"], dsc_s["bn"] = _bn(state, "descriptor.bn")
    dsc_p["layer_out"], dsc_s["layer_out"] = _resnet_layer(
        state, "descriptor.layer_out"
    )
    return {"params": params, "batch_stats": stats}


def vgg_variables_from_torch_state(
    state: Mapping[str, np.ndarray]
) -> Dict[str, Dict]:
    """Magicleap/C++ VGG SuperPoint state_dict (names per `model.cc:8-57`)
    -> Flax variables.  No BatchNorm -> empty batch_stats."""
    params: Dict[str, Any] = {}
    for i in range(4):
        for suffix in ("a", "b"):
            name = f"encoder_conv{i}_{suffix}"
            params[name] = _conv(state, name, bias=True)
    for name in ("detector_conv_a", "detector_conv_b",
                 "descriptor_conv_a", "descriptor_conv_b"):
        params[name] = _conv(state, name, bias=True)
    return {"params": params, "batch_stats": {}}


def import_checkpoint(path: str, arch: str = "resnet") -> Dict[str, Dict]:
    state = load_torch_state(path)
    if arch == "resnet":
        return resnet_variables_from_torch_state(state)
    if arch == "vgg":
        return vgg_variables_from_torch_state(state)
    raise ValueError(f"unknown arch {arch!r}")
