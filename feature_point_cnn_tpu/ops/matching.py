"""Descriptor matching as an on-chip GEMM.

Replaces both reference matchers — OpenCV ``BFMatcher(NORM_L2,
crossCheck=True)`` in the Python demo (`/root/reference/python/src/
inference.py:88-96`) and the C++ per-keypoint linear scan
(`cpp/src/main.cc:9-29`) — with one ``K x K`` similarity GEMM (MXU) plus
argmax cross-check, fixed shapes, no host round-trips.

Descriptors are unit-normalized, so ``L2² = 2 - 2·dot``; maximizing the dot
product equals minimizing L2 distance, and a distance threshold ``t`` equals
a similarity threshold ``1 - t²/2``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Matches(NamedTuple):
    """Matches from set A to set B; arrays ``(..., K)`` over A's slots."""

    index: jnp.ndarray     # (..., K) int32: matched index in B (0 if invalid)
    similarity: jnp.ndarray  # (..., K) float32 dot product
    valid: jnp.ndarray     # (..., K) bool

    @property
    def num(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    def l2_distance(self) -> jnp.ndarray:
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * self.similarity, 0.0))


def mnn_match(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    max_l2_dist: Optional[float] = None,
    cross_check: bool = True,
) -> Matches:
    """Mutual-nearest-neighbor matching.

    Args:
      desc_a: ``(Ka, D)`` unit descriptors; ``valid_a``: ``(Ka,)`` bool.
      desc_b: ``(Kb, D)``; ``valid_b``: ``(Kb,)``.
      max_l2_dist: optional L2 gate (the C++ app uses 0.8, `main.cc:25`;
        the Python demo uses cross-check only).
      cross_check: require ``a = argmax_b`` and ``b = argmax_a`` mutually.

    Returns per-A-slot matches.  ``vmap`` over a leading batch axis for
    batched matching.
    """
    sim = jnp.einsum(
        "kd,md->km", desc_a, desc_b, preferred_element_type=jnp.float32
    )
    neg = jnp.float32(-jnp.inf)
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)

    best_b = jnp.argmax(sim, axis=1)                          # (Ka,)
    best_sim = jnp.max(sim, axis=1)
    ok = valid_a & jnp.isfinite(best_sim)

    if cross_check:
        best_a_of_b = jnp.argmax(sim, axis=0)                 # (Kb,)
        mutual = best_a_of_b[best_b] == jnp.arange(desc_a.shape[0])
        ok = ok & mutual

    if max_l2_dist is not None:
        ok = ok & (best_sim >= 1.0 - 0.5 * max_l2_dist * max_l2_dist)

    return Matches(
        index=jnp.where(ok, best_b, 0).astype(jnp.int32),
        similarity=jnp.where(ok, best_sim, 0.0),
        valid=ok,
    )
