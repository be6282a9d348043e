"""Blocked candidate scoring: a chunk of queries against a block of
candidate entities, per model.

This is the compute core of link prediction (reference ``Test.h``'s
``getHeadBatch``/``getTailBatch`` + ``Config.test``'s ``sess.run(predict)``
over N_entity candidates, SURVEY.md §3.3). The reference materializes
N_entity candidate triples per test triple and scores them one test triple
at a time; here scoring is [C queries × E candidates] tiles so XLA can keep
the VPU/MXU busy, and the caller ``lax.scan``s over entity blocks so the
[C, E, d] broadcast intermediates stay small and on-chip.

Candidate blocks are taken directly as table slices (``cand0 + arange``) —
candidates are *all* entities, so no gather is needed, only a dynamic
slice. Scores follow the lower-is-better convention; the p=2 path for
TransE/TransH uses the ‖a−b‖² = ‖a‖² − 2a·b + ‖b‖² identity so the C×E
work rides the MXU instead of broadcasting."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import pnorm


def _slice_rows(table: jax.Array, start: jax.Array, size: int) -> jax.Array:
    return jax.lax.dynamic_slice_in_dim(table, start, size, axis=0)


def candidate_scores(model_name: str, params: dict, h: jax.Array,
                     t: jax.Array, r: jax.Array, cand0: jax.Array,
                     block: int, replace: str, cfg: Config) -> jax.Array:
    """Scores [C, block] of queries (h,t,r) with the ``replace`` slot swept
    over entities [cand0, cand0+block). Padding candidates are NOT masked
    here — the caller masks ids ≥ n_ent."""
    fn = _SCORERS[model_name]
    dt = jnp.dtype(cfg.eval_dtype)
    return fn(params, h, t, r, cand0, block, replace, cfg, dt)


def _resid_scores(q: jax.Array, ce: jax.Array, sign: float, p: int) -> jax.Array:
    """pnorm(q[:,None,:] + sign*ce[None,:,:]) with an MXU fast path for p=2."""
    if p == 2:
        # ‖q + s·ce‖² = ‖q‖² + 2s·(q·ce) + ‖ce‖²
        qq = jnp.sum(q * q, -1, keepdims=True)                  # [C,1]
        cc = jnp.sum(ce * ce, -1)[None, :]                      # [1,E]
        cross = jnp.dot(q, ce.T, preferred_element_type=jnp.float32)
        return qq + 2.0 * sign * cross + cc
    return pnorm(q[:, None, :] + sign * ce[None, :, :], 1)


def _transe(params, h, t, r, cand0, block, replace, cfg, dt):
    E = params["ent_embeddings"].astype(dt)
    R = params["rel_embeddings"].astype(dt)
    ce = _slice_rows(E, cand0, block)
    if replace == "tail":
        q = jnp.take(E, h, 0) + jnp.take(R, r, 0)   # score = ‖q − ce‖
        return _resid_scores(q, ce, -1.0, cfg.p_norm)
    q = jnp.take(R, r, 0) - jnp.take(E, t, 0)       # score = ‖ce + q‖
    return _resid_scores(q, ce, +1.0, cfg.p_norm)


def _transh(params, h, t, r, cand0, block, replace, cfg, dt):
    E = params["ent_embeddings"].astype(dt)
    R = params["rel_embeddings"].astype(dt)
    W = params["normal_vectors"].astype(dt)
    w = jnp.take(W, r, 0)                            # [C,d]
    ce = _slice_rows(E, cand0, block)                # [E,d]
    # candidate projection: ce − (ce·w_c) w_c ; (ce·w) on the MXU
    dots = jnp.dot(w, ce.T, preferred_element_type=jnp.float32).astype(dt)
    if replace == "tail":
        eh = jnp.take(E, h, 0)
        q = eh - jnp.sum(eh * w, -1, keepdims=True) * w + jnp.take(R, r, 0)
        diff = q[:, None, :] - ce[None, :, :] + dots[:, :, None] * w[:, None, :]
    else:
        et = jnp.take(E, t, 0)
        q = jnp.take(R, r, 0) - (et - jnp.sum(et * w, -1, keepdims=True) * w)
        diff = ce[None, :, :] - dots[:, :, None] * w[:, None, :] + q[:, None, :]
    return pnorm(diff, cfg.p_norm)


def _transr(params, h, t, r, cand0, block, replace, cfg, dt):
    de, dr = cfg.d_ent, cfg.d_rel
    E = params["ent_embeddings"].astype(dt)
    R = params["rel_embeddings"].astype(dt)
    M = params["transfer_matrix"].astype(dt)
    m = jnp.take(M, r, 0).reshape(-1, de, dr)        # [C,de,dr]
    ce = _slice_rows(E, cand0, block)                # [E,de]
    # project every candidate through every query's relation matrix — the
    # TransR eval hot matmul [C,E,dr]
    pce = jnp.einsum("ed,cdk->cek", ce, m, preferred_element_type=jnp.float32
                     ).astype(dt)
    if replace == "tail":
        ph = jnp.einsum("cd,cdk->ck", jnp.take(E, h, 0), m,
                        preferred_element_type=jnp.float32).astype(dt)
        q = ph + jnp.take(R, r, 0)
        return pnorm(q[:, None, :] - pce, cfg.p_norm)
    pt = jnp.einsum("cd,cdk->ck", jnp.take(E, t, 0), m,
                    preferred_element_type=jnp.float32).astype(dt)
    q = jnp.take(R, r, 0) - pt
    return pnorm(pce + q[:, None, :], cfg.p_norm)


def _transd(params, h, t, r, cand0, block, replace, cfg, dt):
    E = params["ent_embeddings"].astype(dt)
    R = params["rel_embeddings"].astype(dt)
    EP = params["ent_transfer"].astype(dt)
    RP = params["rel_transfer"].astype(dt)
    rp = jnp.take(RP, r, 0)                          # [C,d]
    ce = _slice_rows(E, cand0, block)
    cep = _slice_rows(EP, cand0, block)
    cdot = jnp.sum(ce * cep, -1)                     # [E] candidate·own-transfer
    # projected candidate: ce + (ce·cep) rp_c  → [C,E,d]
    if replace == "tail":
        eh, ehp = jnp.take(E, h, 0), jnp.take(EP, h, 0)
        q = eh + jnp.sum(eh * ehp, -1, keepdims=True) * rp + jnp.take(R, r, 0)
        diff = (q[:, None, :] - ce[None, :, :]
                - cdot[None, :, None] * rp[:, None, :])
    else:
        et, etp = jnp.take(E, t, 0), jnp.take(EP, t, 0)
        q = jnp.take(R, r, 0) - (et + jnp.sum(et * etp, -1, keepdims=True) * rp)
        diff = (ce[None, :, :] + cdot[None, :, None] * rp[:, None, :]
                + q[:, None, :])
    return pnorm(diff, cfg.p_norm)


_SCORERS = {
    "transe": _transe,
    "transh": _transh,
    "transr": _transr,
    "transd": _transd,
}
