"""Independent dense reference implementation ("NumPy oracle").

Re-states the reference's math (score defs from ``Trans*.py``, loss from
``loss_def``, SGD/Adam updates) with *dense* tables and dense autodiff —
a deliberately different code path from the framework's sparse
gather/scatter machinery, so per-step ``allclose`` parity tests catch
layout, aggregation, and scatter bugs (SURVEY.md §4 "Implication for the
rebuild"; BASELINE.json requires per-step score/update parity). TransE
additionally gets a fully hand-written NumPy gradient in
``transe_manual_grad`` that exercises no autodiff at all."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dense_score(model_name, cfg, params, h, t, r):
    """Scores for id arrays using dense jnp.take — formulas restated
    independently of openkeonspark_tpu.models."""
    p = cfg.p_norm

    def norm(x):
        return jnp.sum(jnp.abs(x), -1) if p == 1 else jnp.sum(x * x, -1)

    E = params["ent_embeddings"]
    R = params["rel_embeddings"]
    eh, et, er = E[h], E[t], R[r]
    if model_name == "transe":
        return norm(eh + er - et)
    if model_name == "transh":
        w = params["normal_vectors"][r]
        w = w / jnp.sqrt(jnp.sum(w * w, -1, keepdims=True) + 1e-12)
        ph = eh - jnp.sum(eh * w, -1, keepdims=True) * w
        pt = et - jnp.sum(et * w, -1, keepdims=True) * w
        return norm(ph + er - pt)
    if model_name == "transr":
        de, dr = cfg.d_ent, cfg.d_rel
        m = params["transfer_matrix"][r].reshape(-1, de, dr)
        ph = jnp.einsum("bd,bdk->bk", eh, m)
        pt = jnp.einsum("bd,bdk->bk", et, m)
        return norm(ph + er - pt)
    if model_name == "distmult":
        return -jnp.sum(eh * er * et, -1)
    if model_name == "complex":
        d = eh.shape[-1] // 2
        hr, hi = eh[:, :d], eh[:, d:]
        rr, ri = er[:, :d], er[:, d:]
        tr, ti = et[:, :d], et[:, d:]
        return -jnp.sum(hr * rr * tr + hi * rr * ti + hr * ri * ti
                        - hi * ri * tr, -1)
    if model_name == "rotate":
        d = eh.shape[-1] // 2
        hr, hi = eh[:, :d], eh[:, d:]
        tr, ti = et[:, :d], et[:, d:]
        cos, sin = jnp.cos(er), jnp.sin(er)
        re = hr * cos - hi * sin - tr
        im = hr * sin + hi * cos - ti
        return jnp.sum(jnp.sqrt(re * re + im * im + 1e-12), -1)
    if model_name == "transd":
        hp = params["ent_transfer"][h]
        tp = params["ent_transfer"][t]
        rp = params["rel_transfer"][r]
        ph = eh + jnp.sum(eh * hp, -1, keepdims=True) * rp
        pt = et + jnp.sum(et * tp, -1, keepdims=True) * rp
        return norm(ph + er - pt)
    raise ValueError(model_name)


def dense_loss(model_name, cfg, params, h, t, r, batch_size):
    """Reference layout: first batch_size slots positive, rest negatives
    grouped [n_neg, B]."""
    scores = dense_score(model_name, cfg, params, h, t, r)
    B = batch_size
    pos = scores[:B]
    neg = scores[B:].reshape(-1, B).T
    if cfg.loss_mode == "mean_neg":
        return jnp.sum(jnp.maximum(pos - jnp.mean(neg, 1) + cfg.margin, 0.0))
    if cfg.loss_mode == "self_adv":
        w = jax.lax.stop_gradient(
            jax.nn.softmax(1.0 * (cfg.margin - neg), axis=1))
        return jnp.sum(jax.nn.softplus(pos - cfg.margin)
                       + jnp.sum(w * jax.nn.softplus(cfg.margin - neg), 1))
    return jnp.sum(jnp.maximum(pos[:, None] - neg + cfg.margin, 0.0))


def dense_sgd_step(model_name, cfg, params, h, t, r, batch_size):
    """One dense SGD step; returns (loss, new_params) as numpy."""
    loss, grads = jax.value_and_grad(
        lambda p: dense_loss(model_name, cfg, p, h, t, r, batch_size))(params)
    new = {k: np.asarray(v - cfg.alpha * grads[k]) for k, v in params.items()}
    return float(loss), new


def dense_adam_step(model_name, cfg, params, m, v, step, h, t, r, batch_size):
    """One *lazy* dense Adam step: moments updated only where grad ≠ 0
    (matching the framework's sparse Adam semantics on a single batch —
    with zero-init moments, rows with zero grad see no change)."""
    loss, grads = jax.value_and_grad(
        lambda p: dense_loss(model_name, cfg, p, h, t, r, batch_size))(params)
    b1, b2, eps = cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps
    t_ = step + 1
    lr_t = cfg.alpha * np.sqrt(1 - b2 ** t_) / (1 - b1 ** t_)
    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        g = np.asarray(grads[k])
        touched = np.any(g != 0, axis=-1, keepdims=True)
        mk = np.where(touched, b1 * m[k] + (1 - b1) * g, m[k])
        vk = np.where(touched, b2 * v[k] + (1 - b2) * g * g, v[k])
        delta = np.where(touched, -lr_t * mk / (np.sqrt(vk) + eps), 0.0)
        new_p[k] = np.asarray(params[k]) + delta
        new_m[k], new_v[k] = mk, vk
    return float(loss), new_p, new_m, new_v


def dense_adagrad_step(model_name, cfg, params, accum, step, h, t, r,
                       batch_size):
    """One lazy dense Adagrad step (TF1 semantics, no epsilon — the
    reference's 1e-20 initial accumulator is the division guard)."""
    loss, grads = jax.value_and_grad(
        lambda p: dense_loss(model_name, cfg, p, h, t, r, batch_size))(params)
    new_p, new_a = {}, {}
    for k in params:
        g = np.asarray(grads[k])
        touched = np.any(g != 0, axis=-1, keepdims=True)
        ak = np.where(touched, accum[k] + g * g, accum[k])
        delta = np.where(touched, -cfg.alpha * g / np.sqrt(
            np.where(touched, ak, 1.0)), 0.0)
        new_p[k] = np.asarray(params[k]) + delta
        new_a[k] = ak
    return float(loss), new_p, new_a


def dense_adadelta_step(model_name, cfg, params, accum, accum_upd, step, h,
                        t, r, batch_size):
    """One lazy dense Adadelta step (TF1 defaults ρ=0.95, ε=1e-8)."""
    loss, grads = jax.value_and_grad(
        lambda p: dense_loss(model_name, cfg, p, h, t, r, batch_size))(params)
    rho, eps = cfg.adadelta_rho, cfg.adadelta_eps
    new_p, new_a, new_u = {}, {}, {}
    for k in params:
        g = np.asarray(grads[k])
        touched = np.any(g != 0, axis=-1, keepdims=True)
        ak = np.where(touched, rho * accum[k] + (1 - rho) * g * g, accum[k])
        u = g * np.sqrt(accum_upd[k] + eps) / np.sqrt(ak + eps)
        new_p[k] = np.asarray(params[k]) + np.where(touched,
                                                    -cfg.alpha * u, 0.0)
        new_a[k] = ak
        new_u[k] = np.where(touched, rho * accum_upd[k] + (1 - rho) * u * u,
                            accum_upd[k])
    return float(loss), new_p, new_a, new_u


def transe_manual_grad(cfg, ent, rel, h, t, r, batch_size):
    """Fully hand-derived TransE L1 mean_neg gradient in NumPy (no autodiff
    anywhere). Returns (loss, d_ent, d_rel) dense arrays."""
    assert cfg.p_norm == 1 and cfg.loss_mode == "mean_neg"
    B = batch_size
    res = ent[h] + rel[r] - ent[t]              # [N, d]
    scores = np.abs(res).sum(-1)
    pos = scores[:B]
    negs = scores[B:].reshape(-1, B)            # [n_neg, B]
    n_neg = negs.shape[0]
    hinge = pos - negs.mean(0) + cfg.margin
    active = hinge > 0                          # [B]
    loss = float(hinge[active].sum())

    # d loss / d score: +1 for active positives, -1/n_neg for their negatives
    ds = np.zeros_like(scores)
    ds[:B] = active.astype(np.float64)
    ds[B:] = (-(active.astype(np.float64)) / n_neg)[None, :].repeat(
        n_neg, 0).reshape(-1)
    sign = np.sign(res) * ds[:, None]           # d|x| = sign(x)
    d_ent = np.zeros_like(ent)
    d_rel = np.zeros_like(rel)
    np.add.at(d_ent, h, sign)
    np.add.at(d_ent, t, -sign)
    np.add.at(d_rel, r, sign)
    return loss, d_ent, d_rel
