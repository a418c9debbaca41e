"""PJRT export bundle tests (CPU): artifact layout, meta ABI spec, and a
real compile+execute of the exported StableHLO via the XLA client."""

import json

import jax
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


def test_module_compiles_and_runs(bundle, rng):
    """Compile the exported StableHLO with the XLA CPU client (the same
    entry point the C++ PJRT runtime uses) and execute it with meta-declared
    shapes — outputs must match meta's arity, shapes, and dtypes."""
    import numpy as np

    data = (bundle / "module.mlir").read_bytes()
    assert data[:4] == b"ML\xefR"  # MLIR bytecode magic

    from jax._src.lib import _jax, xla_client

    meta = json.loads((bundle / "meta.json").read_text())
    backend = jax.devices("cpu")[0].client
    device_list = _jax.DeviceList(tuple(backend.devices()[:1]))
    executable = backend.compile_and_load(
        data, device_list, xla_client.CompileOptions()
    )

    np_dtypes = {"f32": np.float32, "s32": np.int32, "pred": np.bool_}
    args = [
        np.zeros(spec["shape"], np_dtypes[spec["dtype"]])
        for spec in meta["inputs"]
    ]
    args[0] += rng.random(tuple(meta["inputs"][0]["shape"])).astype(np.float32)
    outs = executable.execute_sharded(
        [backend.buffer_from_pyval(a) for a in args]
    ).disassemble_into_single_device_arrays()
    assert len(outs) == len(meta["outputs"])
    for out, spec in zip(outs, meta["outputs"]):
        arr = np.asarray(out[0])
        assert list(arr.shape) == spec["shape"], spec["name"]
        assert arr.dtype == np_dtypes[spec["dtype"]], spec["name"]
