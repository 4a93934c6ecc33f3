"""Pallas kernel tests (interpret mode on CPU; same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.ops.pallas import corrupt_onehot_pallas
from iterative_inference_segm_tpu.ops.corruption import corrupt_onehot


def test_pallas_corruption_simplex_and_shape():
    labels = jax.random.randint(jax.random.PRNGKey(0), (2, 24, 32), 0, 11)
    out = corrupt_onehot_pallas(labels, jax.random.PRNGKey(1), n_classes=11, sigma=1.0)
    assert out.shape == (2, 24, 32, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)
    assert np.asarray(out).min() >= 0


def test_pallas_corruption_sigma_zero_matches_oracle_exactly():
    # With sigma=0 no randomness is involved: the kernel must agree with the
    # pure-jax oracle bit-for-bit (up to f32 softmax rounding).
    labels = jax.random.randint(jax.random.PRNGKey(2), (1, 16, 16), 0, 5)
    a = corrupt_onehot_pallas(labels, jax.random.PRNGKey(3), n_classes=5, sigma=0.0)
    b = corrupt_onehot(labels, jax.random.PRNGKey(4), n_classes=5, sigma=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_pallas_corruption_void_rows_uniform():
    # void labels (>= n_classes) produce a zero one-hot -> softmax of pure
    # noise; with sigma=0 that is the uniform distribution.
    labels = jnp.full((1, 8, 8), 7, jnp.int32)  # void for n_classes=4
    out = corrupt_onehot_pallas(labels, jax.random.PRNGKey(0), n_classes=4, sigma=0.0)
    np.testing.assert_allclose(np.asarray(out), 0.25, rtol=1e-5)


def test_pallas_corruption_noise_statistics():
    # The Box-Muller noise must match N(0, sigma) statistics: compare the
    # pre-softmax logit spread against the oracle's across a large sample.
    labels = jnp.zeros((4, 64, 64), jnp.int32)
    sigma = 0.7
    a = corrupt_onehot_pallas(labels, jax.random.PRNGKey(5), n_classes=11, sigma=sigma)
    b = corrupt_onehot(labels, jax.random.PRNGKey(6), n_classes=11, sigma=sigma)
    # compare distributional summaries of the output maps
    av, bv = np.asarray(a), np.asarray(b)
    assert abs(av.mean() - bv.mean()) < 5e-3
    assert abs(av.std() - bv.std()) < 5e-3
    # argmax agreement rate with the clean label must match too
    agree_a = (av.argmax(-1) == 0).mean()
    agree_b = (bv.argmax(-1) == 0).mean()
    assert abs(agree_a - agree_b) < 0.03


def test_pallas_corruption_deterministic_in_key():
    labels = jax.random.randint(jax.random.PRNGKey(0), (1, 16, 16), 0, 3)
    a = corrupt_onehot_pallas(labels, jax.random.PRNGKey(9), n_classes=3, sigma=1.0)
    b = corrupt_onehot_pallas(labels, jax.random.PRNGKey(9), n_classes=3, sigma=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = corrupt_onehot_pallas(labels, jax.random.PRNGKey(10), n_classes=3, sigma=1.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_pallas_corruption_nonaligned_size():
    # 30*17 pixels is not a multiple of the 512-pixel tile: padding path.
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, 30, 17), 0, 6)
    out = corrupt_onehot_pallas(labels, jax.random.PRNGKey(2), n_classes=6, sigma=0.5)
    assert out.shape == (1, 30, 17, 6)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_pallas_corrupt_probs_simplex_and_stats():
    from iterative_inference_segm_tpu.ops.pallas import corrupt_probs_pallas
    from iterative_inference_segm_tpu.ops.corruption import corrupt_probs

    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 7)), -1)
    a = corrupt_probs_pallas(probs, jax.random.PRNGKey(1), sigma=0.8)
    assert a.shape == probs.shape
    np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0, rtol=1e-4)
    b = corrupt_probs(probs, jax.random.PRNGKey(2), sigma=0.8)
    assert abs(float(a.std()) - float(b.std())) < 1e-2


def test_pallas_corrupt_probs_sigma_zero_is_softmax():
    from iterative_inference_segm_tpu.ops.pallas import corrupt_probs_pallas

    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 5)), -1)
    out = corrupt_probs_pallas(probs, jax.random.PRNGKey(1), sigma=0.0)
    expected = jax.nn.softmax(probs, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6)
