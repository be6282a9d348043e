"""Synthetic knowledge-graph generators.

The sandbox has no network, so benchmark-scale datasets (FB15K-237 shapes,
DBpedia-scale 10M+ triples — BASELINE.md configs) are generated here with
controlled statistics. ``planted_kg`` additionally plants a ground-truth
TransE structure so that link-prediction quality (Hits@10/MRR) is a
meaningful end-to-end signal, standing in for the reference's
benchmark-protocol acceptance testing (SURVEY.md §4) in the absence of the
real splits.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from openkeonspark_tpu.data.dataset import Dataset


def _dedup(triples: np.ndarray) -> np.ndarray:
    return np.unique(triples, axis=0)


def _split(triples: np.ndarray, n_valid: int, n_test: int,
           rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    perm = rng.permutation(len(triples))
    triples = triples[perm]
    test = triples[:n_test]
    valid = triples[n_test:n_test + n_valid]
    train = triples[n_test + n_valid:]
    return train, valid, test


def random_kg(n_ent: int = 1000, n_rel: int = 20, n_triples: int = 20000,
              n_valid: int = 500, n_test: int = 500, seed: int = 0,
              skew: float = 1.2) -> Dataset:
    """Uniform-ish random KG with Zipf-skewed entity popularity (so group
    sizes / bern stats are non-trivial, like real KGs)."""
    rng = np.random.default_rng(seed)
    # Zipf-like popularity over entities
    w = 1.0 / np.arange(1, n_ent + 1, dtype=np.float64) ** skew
    w /= w.sum()
    n_draw = int(n_triples * 1.3) + n_valid + n_test
    h = rng.choice(n_ent, size=n_draw, p=w)
    t = rng.choice(n_ent, size=n_draw, p=w)
    r = rng.integers(0, n_rel, size=n_draw)
    triples = _dedup(np.stack([h, t, r], axis=1).astype(np.int32))
    triples = triples[rng.permutation(len(triples))][:n_triples + n_valid + n_test]
    train, valid, test = _split(triples, n_valid, n_test, rng)
    return Dataset(n_ent=n_ent, n_rel=n_rel, train=train, valid=valid, test=test)


def _planted_projections(model: str, n_ent: int, n_rel: int, dim: int,
                         rng: np.random.Generator):
    """Ground-truth structure per model family: a per-relation *projected*
    entity table P_r [nE, dp] and translation v_r [dp], such that a triple
    (h, r, t) is true when ‖P_r[h] + v_r − P_r[t]‖ is small — exactly each
    model's score geometry (TransH hyperplanes, TransR matrices, TransD
    dynamic maps; TransE's P is the identity). Returns
    ``(proj(r) -> [nE, dp], trans [nR, dp], params)`` where ``params`` is
    the hidden structure as that family's framework parameter tables —
    evaluating them through the ordinary evaluator gives the **recovery
    ceiling** a trained model is measured against (VERDICT r3 next #4)."""
    ent = rng.normal(size=(n_ent, dim)).astype(np.float32)
    ent /= np.linalg.norm(ent, axis=1, keepdims=True)
    if model in ("transe", "distmult", "complex"):
        # bilinear models recover translation-planted structure well
        # (nearest-neighbor clusters are also high-dot-product clusters)
        v = (0.5 * rng.normal(size=(n_rel, dim))).astype(np.float32)
        return (lambda r: ent), v, {"ent_embeddings": ent,
                                    "rel_embeddings": v}
    if model == "transh":
        w = rng.normal(size=(n_rel, dim)).astype(np.float32)
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        v = (0.5 * rng.normal(size=(n_rel, dim))).astype(np.float32)
        v -= w * np.sum(v * w, axis=1, keepdims=True)  # v ⊥ w (in-plane)

        def proj(r):
            return ent - np.outer(ent @ w[r], w[r])
        return proj, v, {"ent_embeddings": ent, "rel_embeddings": v,
                         "normal_vectors": w}
    if model == "transr":
        dr = max(2, dim // 2)
        m = rng.normal(size=(n_rel, dim, dr)).astype(np.float32) / np.sqrt(dim)
        v = (0.5 * rng.normal(size=(n_rel, dr))).astype(np.float32)
        return (lambda r: ent @ m[r]), v, {
            "ent_embeddings": ent, "rel_embeddings": v,
            "transfer_matrix": m.reshape(n_rel, dim * dr)}
    if model == "transd":
        ent_p = rng.normal(size=(n_ent, dim)).astype(np.float32) / np.sqrt(dim)
        rel_p = rng.normal(size=(n_rel, dim)).astype(np.float32)
        v = (0.5 * rng.normal(size=(n_rel, dim))).astype(np.float32)
        dot = np.sum(ent_p * ent, axis=1, keepdims=True)   # [nE, 1]

        def proj(r):  # M_rh·e = e + r_p (e_p · e)
            return ent + dot * rel_p[r][None, :]
        return proj, v, {"ent_embeddings": ent, "rel_embeddings": v,
                         "ent_transfer": ent_p, "rel_transfer": rel_p}
    if model == "rotate":
        # head and tail sides see DIFFERENT projections: a triple is true
        # when rot(h, θ_r) ≈ t, i.e. P_h = rotation, P_t = identity (v=0
        # — the rotation itself is the relation). `dim` counts table
        # lanes; the complex dim is dim//2 (the ceiling evaluates with
        # hidden_size = dim//2).
        dc = dim // 2
        theta = rng.uniform(-np.pi, np.pi,
                            size=(n_rel, dc)).astype(np.float32)
        re, im = ent[:, :dc], ent[:, dc:]

        def proj_h(r):
            cos, sin = np.cos(theta[r]), np.sin(theta[r])
            return np.concatenate([re * cos - im * sin,
                                   re * sin + im * cos], axis=1)
        v = np.zeros((n_rel, dim), np.float32)
        return (proj_h, lambda r: ent), v, {"ent_embeddings": ent,
                                            "rel_embeddings": theta}
    raise ValueError(f"no planted generator for model {model!r}")


def planted_kg(n_ent: int = 2000, n_rel: int = 24, n_triples: int = 40000,
               n_valid: int = 1000, n_test: int = 1000, dim: int = 16,
               noise: float = 0.05, seed: int = 0, model: str = "transe",
               head_frac: float = 0.5, with_params: bool = False):
    """KG generated from a hidden model of the chosen family: a triple
    (h, r, t) is emitted when the projected entities satisfy
    ``P_r[h] + v_r ≈ P_r[t]`` — so a trained model of that family should
    recover high filtered Hits@10, the end-to-end quality oracle standing
    in for the unfetchable benchmark splits (VERDICT.md r1 missing #3).

    ``head_frac`` of the pairs are planted *head-wards* (draw (t, r), pick
    h among the nearest pre-images) so head prediction is as well-posed as
    tail prediction; the original generator only planted the tail
    direction (VERDICT.md r1 next #5).

    ``with_params=True`` returns ``(Dataset, hidden_params)`` — the
    generator's own tables in framework layout (hidden dim!), whose
    evaluation through the ordinary evaluator is the recovery CEILING
    (``tools/quality_anchors.py``; VERDICT r3 next #4)."""
    rng = np.random.default_rng(seed)
    proj, trans, hidden = _planted_projections(model, n_ent, n_rel, dim,
                                               rng)
    # rotate plants with DIFFERENT head/tail projections (rot(h) ≈ t);
    # the translational families use one projection for both sides
    proj_h, proj_t = proj if isinstance(proj, tuple) else (proj, proj)

    per_pair = 4  # nearest candidates per (anchor, r) draw
    n_pairs = n_triples // per_pair + 1
    anchors = rng.integers(0, n_ent, size=n_pairs)
    rels = rng.integers(0, n_rel, size=n_pairs)
    headward = rng.random(n_pairs) < head_frac
    triples = []
    for r in range(n_rel):
        sel = np.nonzero(rels == r)[0]
        if not len(sel):
            continue
        ph, pt = proj_h(r), proj_t(r)                     # [nE, dp] each
        # tail-ward: anchor h, target P_h[h]+v, candidates over P_t;
        # head-ward: anchor t, target P_t[t]−v, candidates over P_h
        for hw, p_anc, p_cand, s in ((False, ph, pt, 1.0),
                                     (True, pt, ph, -1.0)):
            ssel = sel[headward[sel] == hw]
            if not len(ssel):
                continue
            a = anchors[ssel]
            target = p_anc[a] + s * trans[r][None, :]     # [c, dp]
            p2 = np.sum(p_cand ** 2, axis=1)[None, :]
            d2 = (np.sum(target ** 2, 1, keepdims=True)
                  - 2.0 * target @ p_cand.T + p2)         # [c, nE]
            nearest = np.argpartition(d2, per_pair, axis=1)[:, :per_pair]
            for i, ai in enumerate(a):
                for cand in nearest[i]:
                    if hw:
                        triples.append((cand, ai, r))     # cand = head
                    else:
                        triples.append((ai, cand, r))     # cand = tail
    triples = np.asarray(triples, dtype=np.int32)
    if noise > 0:
        n_noise = int(len(triples) * noise)
        noise_t = np.stack([
            rng.integers(0, n_ent, n_noise),
            rng.integers(0, n_ent, n_noise),
            rng.integers(0, n_rel, n_noise),
        ], axis=1).astype(np.int32)
        triples = np.concatenate([triples, noise_t], axis=0)
    triples = _dedup(triples)
    train, valid, test = _split(triples, n_valid, n_test, rng)
    ds = Dataset(n_ent=n_ent, n_rel=n_rel, train=train, valid=valid,
                 test=test)
    return (ds, hidden) if with_params else ds


def fb15k237_like(seed: int = 0) -> Dataset:
    """FB15K-237-shaped random KG (14541 entities, 237 relations, ~272k/17.5k/
    20.5k split) for throughput benchmarking at the real dataset's scale."""
    return random_kg(n_ent=14541, n_rel=237, n_triples=272115,
                     n_valid=17535, n_test=20466, seed=seed)


def wn18rr_like(seed: int = 0) -> Dataset:
    """WN18RR-shaped random KG (40943 entities, 11 relations)."""
    return random_kg(n_ent=40943, n_rel=11, n_triples=86835,
                     n_valid=3034, n_test=3134, seed=seed)


def fb15k_like(seed: int = 0) -> Dataset:
    """FB15K-shaped random KG (14951 entities, 1345 relations)."""
    return random_kg(n_ent=14951, n_rel=1345, n_triples=483142,
                     n_valid=50000, n_test=59071, seed=seed)


def dbpedia_like(n_ent: int = 4_000_000, n_rel: int = 600,
                 n_triples: int = 10_000_000, seed: int = 0) -> Dataset:
    """DBpedia-scale KG for the edge-partitioned multi-host config
    (BASELINE.md config #5). Generated in streaming chunks to bound memory."""
    rng = np.random.default_rng(seed)
    parts = []
    remaining = n_triples + 20000
    chunk = 2_000_000
    while remaining > 0:
        k = min(chunk, remaining)
        h = rng.integers(0, n_ent, size=k, dtype=np.int64)
        t = rng.integers(0, n_ent, size=k, dtype=np.int64)
        r = rng.integers(0, n_rel, size=k, dtype=np.int64)
        parts.append(np.stack([h, t, r], axis=1).astype(np.int32))
        remaining -= k
    triples = _dedup(np.concatenate(parts, axis=0))
    train, valid, test = _split(triples, 10000, 10000, rng)
    return Dataset(n_ent=n_ent, n_rel=n_rel, train=train, valid=valid, test=test)
