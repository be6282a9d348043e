"""Ranking losses.

Reference semantics (``TransE.py::loss_def`` reconstructed, SURVEY.md
§2.1): the TF graph averages the negative scores per positive and applies
one hinge — ``loss = Σ_i max(γ + s(pos_i) − mean_j s(neg_ij), 0)`` —
which equals the classic pairwise hinge when there is 1 negative per
positive. ``mean_neg`` reproduces that; ``pairwise`` is the textbook
per-pair hinge ``Σ_ij max(γ + s(pos_i) − s(neg_ij), 0)`` kept as an
option. Scores are distances (lower = better), so positives enter with +.

``self_adv`` (beyond-parity, r5) is the self-adversarial negative-sampling
loss of the RotatE paper (Sun et al. 2019):

    L = −log σ(γ − s_pos) − Σ_j softmax_j(α·(γ − s_neg_j)) · log σ(s_neg_j − γ)

with the softmax weights treated as constants (stop-gradient — the
paper's formulation). Negatives that score close to the margin dominate
the gradient, which is what lets rotation-structured models GENERALIZE:
on the planted-rotation KG, margin ranking fits the train split (0.66
filtered Hits@10 on train triples) but transfers ~5% of ceiling to held
-out pairs, while self_adv transfers an order of magnitude more
(BASELINE §7). α is fixed at 1.0 (the paper's common setting)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

SELF_ADV_ALPHA = 1.0


def margin_ranking_loss(pos_scores: jax.Array, neg_scores: jax.Array,
                        margin: float, mode: str = "mean_neg") -> jax.Array:
    """pos_scores [B], neg_scores [B, N] → scalar loss."""
    if mode == "mean_neg":
        neg = jnp.mean(neg_scores, axis=1)
        return jnp.sum(jnp.maximum(pos_scores - neg + margin, 0.0))
    if mode == "pairwise":
        return jnp.sum(jnp.maximum(pos_scores[:, None] - neg_scores + margin,
                                   0.0))
    if mode == "self_adv":
        w = jax.nn.softmax(SELF_ADV_ALPHA * (margin - neg_scores), axis=1)
        w = jax.lax.stop_gradient(w)
        pos_term = jax.nn.softplus(pos_scores - margin)     # −logσ(γ−s⁺)
        neg_term = jnp.sum(w * jax.nn.softplus(margin - neg_scores),
                           axis=1)                          # −Σwⱼ logσ(sⱼ−γ)
        return jnp.sum(pos_term + neg_term)
    raise ValueError(f"unknown loss mode {mode!r}")
