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

import jax.numpy as jnp

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
                mean = s[name]["mean"]
                var = s[name]["var"]
                g = child["scale"] * jnp.float32(1.0) / jnp.sqrt(var + _EPS)
                kernel = conv["kernel"] * g  # (..., O) * (O,)
                bias = conv.get("bias", jnp.zeros_like(mean))
                bias = (bias - mean) * g + child["bias"]
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
