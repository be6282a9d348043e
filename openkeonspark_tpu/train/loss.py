"""Margin-based ranking loss.

Reference semantics (``TransE.py::loss_def`` reconstructed, SURVEY.md
§2.1): the TF graph averages the negative scores per positive and applies
one hinge — ``loss = Σ_i max(γ + s(pos_i) − mean_j s(neg_ij), 0)`` —
which equals the classic pairwise hinge when there is 1 negative per
positive. ``mean_neg`` reproduces that; ``pairwise`` is the textbook
per-pair hinge ``Σ_ij max(γ + s(pos_i) − s(neg_ij), 0)`` kept as an option.
Scores are distances (lower = better), so positives enter with +."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def margin_ranking_loss(pos_scores: jax.Array, neg_scores: jax.Array,
                        margin: float, mode: str = "mean_neg") -> jax.Array:
    """pos_scores [B], neg_scores [B, N] → scalar loss."""
    if mode == "mean_neg":
        neg = jnp.mean(neg_scores, axis=1)
        return jnp.sum(jnp.maximum(pos_scores - neg + margin, 0.0))
    if mode == "pairwise":
        return jnp.sum(jnp.maximum(pos_scores[:, None] - neg_scores + margin,
                                   0.0))
    raise ValueError(f"unknown loss mode {mode!r}")
