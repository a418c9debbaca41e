"""PJRT export bundle tests (CPU): artifact layout, meta ABI spec, and a
real compile+execute of the exported StableHLO via the XLA client — both
the full fixed-K ABI and the packed top-N f16 ABI (the bandwidth-slim
default, ~8x smaller per-frame readback)."""

import json

import jax
import numpy as np
import pytest

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

CFG = SuperPointConfig(
    train_image_size=(48, 64), max_keypoints=32, compute_dtype="float32"
)

NP_DTYPES = {
    "f32": np.float32,
    "f16": np.float16,
    "s32": np.int32,
    "s16": np.int16,
    "u8": np.uint8,
    "pred": np.bool_,
}


def _run_bundle(bundle, image):
    """Compile a bundle's StableHLO with the XLA CPU client and execute it
    with zero keyframe inputs; returns outputs by name."""
    from jax._src.lib import _jax, xla_client

    meta = json.loads((bundle / "meta.json").read_text())
    backend = jax.devices("cpu")[0].client
    device_list = _jax.DeviceList(tuple(backend.devices()[:1]))
    executable = backend.compile_and_load(
        (bundle / "module.mlir").read_bytes(), device_list,
        xla_client.CompileOptions(),
    )
    args = [
        np.zeros(spec["shape"], NP_DTYPES[spec["dtype"]])
        for spec in meta["inputs"]
    ]
    assert list(image.shape) == meta["inputs"][0]["shape"]
    assert image.dtype == NP_DTYPES[meta["inputs"][0]["dtype"]]
    args[0] = image
    outs = executable.execute_sharded(
        [backend.buffer_from_pyval(a) for a in args]
    ).disassemble_into_single_device_arrays()
    return {
        spec["name"]: np.asarray(out[0])
        for out, spec in zip(outs, meta["outputs"])
    }


@pytest.fixture(
    scope="module",
    params=[("full", 1), ("packed", 1), ("packed", 4)],
    ids=["full", "packed", "packed_b4"],
)
def bundle(request, tmp_path_factory):
    abi, batch = request.param
    out = tmp_path_factory.mktemp(f"pjrt_export_{abi}_b{batch}")
    SuperPointFrontend(CFG).export_pjrt(
        str(out), (48, 64), abi=abi, top_n=16, batch=batch
    )
    return out


def test_bundle_layout(bundle):
    assert (bundle / "module.mlir").stat().st_size > 10_000
    assert (bundle / "compile_options.pb").stat().st_size > 100
    meta = json.loads((bundle / "meta.json").read_text())
    assert meta["image_size"] == [48, 64]
    assert meta["max_keypoints"] == 32
    names_in = [s["name"] for s in meta["inputs"]]
    names_out = [s["name"] for s in meta["outputs"]]
    if meta["abi"] == "full":
        assert names_in == ["image", "key_desc", "key_valid"]
        assert names_out == [
            "y", "x", "score", "valid", "match_index", "match_valid", "desc",
        ]
    else:
        assert meta["top_n"] == 16
        assert names_in == ["image", "key_desc", "key_num"]
        want_out = ["num_valid", "kp_packed", "match_index", "desc"]
        if meta["batch"] > 1:
            # batched exports carry explicit keyframe-feedback outputs (the
            # per-frame arrays gained a batch dim, key inputs did not)
            want_out += ["key_desc_out", "key_num_out"]
            assert meta["inputs"][0]["shape"][0] == meta["batch"]
        assert names_out == want_out
        # the packed per-frame readback (all but desc) must be far smaller
        # than the full ABI's — the whole point of the ABI
        nbytes = sum(
            int(np.prod(s["shape"])) * np.dtype(NP_DTYPES[s["dtype"]]).itemsize
            for s in meta["outputs"]
            if s["name"] not in ("desc", "key_desc_out")
        )
        assert nbytes < 500 * meta["batch"], nbytes
    # every spec is consumable by the C++ runtime (dtype vocabulary)
    for s in meta["inputs"] + meta["outputs"]:
        assert s["dtype"] in NP_DTYPES


def test_module_compiles_and_runs(bundle, rng):
    """Compile the exported StableHLO with the XLA CPU client (the same
    entry point the C++ PJRT runtime uses) and execute it with meta-declared
    shapes — outputs must match meta's arity, shapes, and dtypes."""
    data = (bundle / "module.mlir").read_bytes()
    assert data[:4] == b"ML\xefR"  # MLIR bytecode magic

    from jax._src.lib import _jax, xla_client

    meta = json.loads((bundle / "meta.json").read_text())
    backend = jax.devices("cpu")[0].client
    device_list = _jax.DeviceList(tuple(backend.devices()[:1]))
    executable = backend.compile_and_load(
        data, device_list, xla_client.CompileOptions()
    )

    args = [
        np.zeros(spec["shape"], NP_DTYPES[spec["dtype"]])
        for spec in meta["inputs"]
    ]
    args[0] += rng.random(tuple(meta["inputs"][0]["shape"])).astype(np.float32)
    outs = executable.execute_sharded(
        [backend.buffer_from_pyval(a) for a in args]
    ).disassemble_into_single_device_arrays()
    assert len(outs) == len(meta["outputs"])
    by_name = {}
    for out, spec in zip(outs, meta["outputs"]):
        arr = np.asarray(out[0])
        assert list(arr.shape) == spec["shape"], spec["name"]
        assert arr.dtype == NP_DTYPES[spec["dtype"]], spec["name"]
        by_name[spec["name"]] = arr

    if meta["abi"] == "packed":
        # packed semantics: num_valid counts the score-sorted prefix, scores
        # are descending over the valid prefix, match indices are -1 or in
        # range (zero keyframe -> likely no matches, but stay in contract)
        nv = np.atleast_1d(by_name["num_valid"])
        kp = by_name["kp_packed"].reshape(meta["batch"], meta["top_n"], 3)
        for b in range(meta["batch"]):
            n_valid = int(nv[b])
            assert 0 <= n_valid <= meta["top_n"]
            scores = kp[b, :, 2].astype(np.float32)
            if n_valid > 1:
                assert (np.diff(scores[:n_valid]) <= 1e-6).all()
        mi = by_name["match_index"]
        assert ((mi == -1) | ((mi >= 0) & (mi < meta["top_n"]))).all()
        if meta["batch"] > 1:
            # keyframe feedback = frame 0's rows exactly
            np.testing.assert_array_equal(
                by_name["key_desc_out"], by_name["desc"][0]
            )
            assert int(by_name["key_num_out"]) == int(nv[0])


def test_u8_gray_export_matches_f32(tmp_path, rng):
    """A `--input-dtype u8 --gray` bundle (uint8 grayscale in, normalize +
    channel-broadcast ON DEVICE) must produce bit-identical outputs to the
    f32 bundle fed the equivalent pre-normalized 3-channel image — the ABI
    changes only where the bytes are expanded, not the math."""
    fe = SuperPointFrontend(CFG)
    out8, out32 = tmp_path / "u8", tmp_path / "f32"
    fe.export_pjrt(str(out8), (48, 64), abi="packed", top_n=16,
                   input_dtype="u8", input_channels=1)
    fe.export_pjrt(str(out32), (48, 64), abi="packed", top_n=16)

    meta8 = json.loads((out8 / "meta.json").read_text())
    assert meta8["inputs"][0] == {
        "name": "image", "shape": [1, 48, 64, 1], "dtype": "u8"
    }
    assert meta8["channels"] == 1 and meta8["input_dtype"] == "u8"
    # the image upload is 12x smaller than the f32 3-channel ABI's
    assert 12 * np.prod(meta8["inputs"][0]["shape"]) == 4 * 3 * 48 * 64

    img_u8 = (rng.random((1, 48, 64, 1)) * 255).astype(np.uint8)
    img_f32 = np.broadcast_to(
        img_u8.astype(np.float32) * (1.0 / 255.0), (1, 48, 64, 3)
    ).copy()
    got8 = _run_bundle(out8, img_u8)
    got32 = _run_bundle(out32, img_f32)
    assert set(got8) == set(got32)
    for name in got32:
        np.testing.assert_array_equal(got8[name], got32[name], err_msg=name)


def test_cli_export_fold_bn_with_raw_weights(tmp_path, monkeypatch):
    """`export --fold-bn --raw-weights` must write an UNFOLDED portable
    snapshot (regression: the frontend's variables have no batch_stats
    after the fold, and save_weights rejected them)."""
    import sys

    from feature_point_cnn_tpu.main import main
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.utils.weights import load_weights, save_weights

    _, variables = init_superpoint(jax.random.PRNGKey(0), CFG, (48, 64))
    src = tmp_path / "src.npz"
    save_weights(str(src), variables)

    out = tmp_path / "bundle"
    snap = tmp_path / "snap.npz"
    monkeypatch.setattr(sys, "argv", [
        "main", "--H", "48", "--W", "64", "--max-keypoints", "32",
        "export", "--weights-path", str(src),
        "--pjrt-out", str(out), "--abi", "packed", "--top-n", "8",
        "--fold-bn", "--raw-weights", str(snap),
    ])
    main()
    assert (out / "module.mlir").exists()
    loaded = load_weights(str(snap))
    assert "batch_stats" in loaded
