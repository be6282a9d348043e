"""TransH: project entities onto the relation hyperplane before translating.

Functional re-design of the reference's ``TransH.py`` (reconstructed
``TransH.py:~1–110`` per SURVEY.md §2.1): extra per-relation normal-vector
table; projection ``e⊥ = e − (ŵ_r·e) ŵ_r`` with ``ŵ_r = w_r/‖w_r‖`` applied
to head and tail, then the TransE-style p-norm residual.

The unit-normalization implements the TransH paper's ``‖w_r‖₂ = 1``
constraint (a hyperplane projection is only a projection for a unit
normal; SURVEY.md §2.1 states the hyperplane form). It is also what keeps
long training runs stable: with raw w_r the projection's gain is
``1+‖w‖²``, and w-growth ↔ entity-grad amplification form a feedback loop
that sent 20k-step runs non-finite (quality-anchor runs, round 3)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import (KGEModel, Slots, TableSpec, pnorm,
                                           register)


def unit(w: jax.Array) -> jax.Array:
    """ŵ = w/‖w‖₂ — the paper's hard unit-norm constraint, applied at use
    so the stored table stays unconstrained (checkpoint-compatible)."""
    return w * jax.lax.rsqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-12)


def _project(e: jax.Array, w: jax.Array) -> jax.Array:
    return e - jnp.sum(e * w, axis=-1, keepdims=True) * w


@register
class TransH(KGEModel):
    name = "transh"

    @staticmethod
    def tables(cfg: Config, n_ent: int, n_rel: int) -> Dict[str, TableSpec]:
        d = cfg.hidden_size
        return {
            "ent_embeddings": TableSpec(n_ent, d, "ent"),
            "rel_embeddings": TableSpec(n_rel, d, "rel"),
            "normal_vectors": TableSpec(n_rel, d, "rel"),
        }

    @staticmethod
    def gathers() -> Tuple:
        return (
            ("h_e", "ent_embeddings", "h"),
            ("t_e", "ent_embeddings", "t"),
            ("r_e", "rel_embeddings", "r"),
            ("w_r", "normal_vectors", "r"),
        )

    @staticmethod
    def score(slots: Slots, cfg: Config) -> jax.Array:
        w = unit(slots["w_r"])
        h = _project(slots["h_e"], w)
        t = _project(slots["t_e"], w)
        return pnorm(h + slots["r_e"] - t, cfg.p_norm)
