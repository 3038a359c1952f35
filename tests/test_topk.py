"""exact_top_k_chunked must be BIT-IDENTICAL to jax.lax.top_k — values,
indices, order, tie resolution — for every shape/chunking, including
adversarial ties (few distinct values), -inf entries, all-equal rows, and
non-divisible chunk splits. It backs the detector's exact selection stage
(ref semantics: nets/ssd_common.py:504-589), so any divergence is a
silent mAP change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.ops.math import exact_top_k_chunked


def assert_same(x, k, num_chunks):
    v1, i1 = jax.lax.top_k(x, k)
    v2, i2 = exact_top_k_chunked(x, k, num_chunks)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("num_chunks", [1, 2, 5, 8, 13])
@pytest.mark.parametrize(
    "n,k",
    [(2125, 200), (997, 100), (50, 50), (1000, 1), (21250, 200)],
)
def test_matches_lax_top_k_random(n, k, num_chunks):
    rng = np.random.default_rng(n * 1000 + k + num_chunks)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    assert_same(x, k, num_chunks)


@pytest.mark.parametrize("num_chunks", [4, 7])
def test_adversarial_ties(num_chunks):
    # few distinct values -> ties everywhere, incl. across chunk boundaries;
    # lax.top_k breaks ties toward the smallest index
    rng = np.random.default_rng(0)
    for distinct in (1, 2, 5):
        x = jnp.asarray(
            rng.choice(rng.normal(size=distinct), size=3000), jnp.float32
        )
        assert_same(x, 250, num_chunks)


def test_neg_inf_and_masked_zeros():
    # detection scores: masked candidates are exactly 0.0, plus -inf rows
    rng = np.random.default_rng(1)
    x = np.where(rng.random(4000) < 0.9, 0.0, rng.random(4000)).astype(
        np.float32
    )
    x[100:150] = -np.inf
    assert_same(jnp.asarray(x), 300, 8)
    # fewer finite entries than k: pads/-inf must resolve like lax.top_k
    y = np.full(1000, -np.inf, np.float32)
    y[::97] = rng.random(y[::97].shape).astype(np.float32)
    assert_same(jnp.asarray(y), 64, 8)


def test_batched_detection_shape():
    # the detector's [B, C-1, N] selection shape
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.choice(rng.normal(size=6), size=(2, 20, 2125)), jnp.float32
    )
    assert_same(x, 200, 5)


def test_fallback_when_chunking_cannot_shrink():
    # n < num_chunks * k -> plain top_k path
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=100), jnp.float32)
    assert_same(x, 64, 8)


def test_jit_and_grad_safety():
    # jits cleanly; values path is differentiable like top_k's values
    x = jnp.asarray(np.random.default_rng(4).normal(size=2048), jnp.float32)
    f = jax.jit(lambda q: exact_top_k_chunked(q, 128, 8)[0].sum())
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert int(np.asarray((g != 0).sum())) == 128
