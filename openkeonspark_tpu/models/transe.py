"""TransE: score(h, r, t) = ‖e_h + v_r − e_t‖_p (lower = better).

Functional re-design of the reference's ``TransE.py`` (reconstructed
``TransE.py:~1–90`` per SURVEY.md §2.1): tables ``ent_embeddings [nE,d]``
and ``rel_embeddings [nR,d]`` with xavier-uniform init; the score is the
p-norm of the translation residual (p=1 default, matching the TF
``reduce_sum(abs(h + r − t))`` calc)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import (KGEModel, Slots, TableSpec, pnorm,
                                           register)


@register
class TransE(KGEModel):
    name = "transe"

    @staticmethod
    def tables(cfg: Config, n_ent: int, n_rel: int) -> Dict[str, TableSpec]:
        d = cfg.hidden_size
        return {
            "ent_embeddings": TableSpec(n_ent, d, "ent"),
            "rel_embeddings": TableSpec(n_rel, d, "rel"),
        }

    @staticmethod
    def gathers() -> Tuple:
        return (
            ("h_e", "ent_embeddings", "h"),
            ("t_e", "ent_embeddings", "t"),
            ("r_e", "rel_embeddings", "r"),
        )

    @staticmethod
    def score(slots: Slots, cfg: Config) -> jax.Array:
        return pnorm(slots["h_e"] + slots["r_e"] - slots["t_e"], cfg.p_norm)
