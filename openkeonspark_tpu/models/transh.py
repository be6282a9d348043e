"""TransH: project entities onto the relation hyperplane before translating.

Functional re-design of the reference's ``TransH.py`` (reconstructed
``TransH.py:~1–110`` per SURVEY.md §2.1): extra per-relation normal-vector
table; projection ``e⊥ = e − (w_r·e) w_r`` applied to head and tail (the TF
``_transfer`` uses the raw, un-renormalized w_r — matched here), then the
TransE-style p-norm residual."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import (KGEModel, Slots, TableSpec, pnorm,
                                           register)


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
        w = slots["w_r"]
        h = _project(slots["h_e"], w)
        t = _project(slots["t_e"], w)
        return pnorm(h + slots["r_e"] - t, cfg.p_norm)
