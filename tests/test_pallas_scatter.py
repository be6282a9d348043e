"""Sorted-run wide-row scatter kernel (ops/pallas_scatter.py): exactness in
interpret mode against a sorted-order NumPy oracle and the XLA scatter.
Hardware throughput numbers live in BASELINE.md (measured 2.0–2.8× XLA at
TransR's 20 000-wide rows on v5e; narrow rows are a recorded dead end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.ops.pallas_scatter import scatter_add_rows_sorted


def oracle(table, ids, delta):
    out = np.asarray(table).copy()
    for i in np.argsort(np.asarray(ids), kind="stable"):
        if ids[i] < table.shape[0]:
            out[ids[i]] += np.asarray(delta)[i]
    return out


@pytest.mark.parametrize("R,W,N", [(37, 256, 200), (11, 128, 5),
                                   (64, 384, 1), (16, 200, 64)])
def test_scatter_kernel_matches_oracle(R, W, N):
    """Duplicates sum in sorted order; sentinel ids (≥ R) discarded;
    unaligned widths (200) take the pad-and-slice path."""
    rng = np.random.default_rng(R + N)
    table = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R + 1, size=N), jnp.int32)
    delta = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)
    out = scatter_add_rows_sorted(table, ids, delta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), oracle(table, ids, delta),
                               rtol=1e-6, atol=1e-6)


def test_scatter_kernel_all_sentinel_is_noop():
    table = jnp.ones((9, 128), jnp.float32)
    ids = jnp.full((17,), 9, jnp.int32)
    delta = jnp.full((17, 128), 5.0, jnp.float32)
    out = scatter_add_rows_sorted(table, ids, delta, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table))


def test_scatter_kernel_heavy_duplicates():
    """One hot row taking most of the stream (a long run) plus singles."""
    rng = np.random.default_rng(3)
    R, W, N = 8, 128, 100
    table = jnp.zeros((R, W), jnp.float32)
    ids = np.full(N, 2, np.int32)
    ids[::10] = rng.integers(0, R, size=len(ids[::10]))
    ids = jnp.asarray(ids)
    delta = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)
    out = scatter_add_rows_sorted(table, ids, delta, interpret=True)
    ref = jnp.zeros((R, W)).at[ids].add(delta)     # order-free check vs XLA
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_optim_routes_wide_rows(monkeypatch):
    """train.optim width-gates the kernel: CPU backend keeps XLA; the env
    kill-switch works."""
    from openkeonspark_tpu.train import optim
    table = jnp.zeros((600, 8), jnp.float32)
    assert not optim._use_wide_kernel(table)       # narrow
    wide = jnp.zeros((600, 4096), jnp.float32)
    assert not optim._use_wide_kernel(wide)        # cpu backend in tests
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert optim._use_wide_kernel(wide)
    monkeypatch.setenv("OKST_NO_WIDE_SCATTER", "1")
    assert not optim._use_wide_kernel(wide)
