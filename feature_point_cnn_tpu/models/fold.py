"""BatchNorm folding: an exact inference-time param transform.

At inference BatchNorm is the per-channel affine ``y = (x - mu) * g + beta``
with ``g = gamma * rsqrt(var + eps)``; composed with the preceding conv it
is exactly a conv with kernel ``W' = W * g`` (output-channel scale) and bias
``b' = (b - mu) * g + beta``.  The folded model (``fold_bn=True`` on the
module tree) drops every BatchNorm from the traced program and gives the
convs a bias instead — the XLA analog of the classic TensorRT/TorchScript
deployment fold the reference gets implicitly from TRTorch graph compilation
(`/root/reference/cpp/src/superpoint.cc:20-26`).

Note XLA already fuses the BN affine into the conv epilogue, so the
*runtime* win is expected to be small (A/B'd on chip, RESULTS.md); the fold
still removes the batch_stats collection and ~30 ops from the serving
program, and is the correct export form for the packed PJRT bundle.

Pairing is by the repo's fixed naming convention (see `models/blocks.py`):
``bn1 <- conv1``, ``bn2 <- conv2``, ``identity_bn <- identity_conv``,
``bn <- conv1`` at the encoder root and ``bn <- up_sample`` in the
descriptor head.  The walk fails loudly on an unpaired BN so a future
topology change cannot silently skip a fold.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# BN child name -> conv sibling it normalizes (within one module dict)
_PARTNER = {
    "bn1": "conv1",
    "bn2": "conv2",
    "identity_bn": "identity_conv",
    "bn": "up_sample",
}

_EPS = 1e-5  # blocks.batch_norm epsilon (torch parity)


def _is_bn(node) -> bool:
    return isinstance(node, dict) and set(node) >= {"scale", "bias"}


def fold_batchnorm(variables: Dict) -> Dict:
    """``{"params", "batch_stats"}`` of the standard model -> ``{"params"}``
    of the ``fold_bn=True`` model (exact at f32; bf16 compute reorders
    rounding, tested at ~1e-2 relative like the other bf16 parity tests).

    Computed in HOST numpy deliberately: the fold is a few hundred tiny
    elementwise ops, and running them eagerly on a relay-attached device
    dispatches (and first-time-compiles) each one as its own program —
    measured >12 min wall on this environment's relay vs milliseconds on
    host.  Device arrays are pulled back once (~9 MB).
    """
    params, stats = variables["params"], variables["batch_stats"]

    def walk(p: Dict, s: Dict) -> Dict:
        out: Dict = {}
        folded_partners = set()
        for name, child in p.items():
            if name in _PARTNER and _is_bn(child):
                conv_name = _PARTNER[name]
                if conv_name not in p:
                    raise ValueError(
                        f"BN {name!r} has no partner conv {conv_name!r} "
                        f"(siblings: {sorted(p)})"
                    )
                conv = p[conv_name]
                mean = np.asarray(s[name]["mean"], np.float32)
                var = np.asarray(s[name]["var"], np.float32)
                scale = np.asarray(child["scale"], np.float32)
                beta = np.asarray(child["bias"], np.float32)
                g = scale / np.sqrt(var + _EPS)
                kernel = np.asarray(conv["kernel"], np.float32) * g  # (...,O)*(O,)
                bias = np.asarray(
                    conv.get("bias", np.zeros_like(mean)), np.float32
                )
                bias = (bias - mean) * g + beta
                out[conv_name] = {"kernel": kernel, "bias": bias}
                folded_partners.add(conv_name)
            elif _is_bn(child):
                raise ValueError(f"unrecognized BN module name {name!r}")
        for name, child in p.items():
            if name in out or name in folded_partners:
                continue
            if name in _PARTNER and _is_bn(child):
                continue
            if isinstance(child, dict):
                out[name] = walk(child, s.get(name, {}))
            else:
                out[name] = child
        return out

    return {"params": walk(params, stats)}
