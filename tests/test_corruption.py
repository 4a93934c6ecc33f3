"""Corruption op tests: simplex preservation, statistics, void handling."""

import numpy as np
import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.ops import corrupt_onehot, one_hot_probs
from iterative_inference_segm_tpu.ops.corruption import corrupt_probs


def test_one_hot_void_rows_are_zero():
    labels = jnp.asarray([[0, 2, 3]])  # 3 == void for n_classes=3
    oh = np.asarray(one_hot_probs(labels, 3))
    np.testing.assert_array_equal(oh[0, 0], [1, 0, 0])
    np.testing.assert_array_equal(oh[0, 2], [0, 0, 0])


def test_corrupt_onehot_stays_on_simplex():
    labels = jax.random.randint(jax.random.PRNGKey(0), (2, 8, 8), 0, 5)
    out = corrupt_onehot(labels, jax.random.PRNGKey(1), n_classes=5, sigma=2.0)
    s = np.asarray(out.sum(-1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    assert np.asarray(out).min() >= 0


def test_corrupt_onehot_sigma_zero_is_softmax_onehot():
    labels = jnp.asarray([[[1]]])
    out = np.asarray(corrupt_onehot(labels, jax.random.PRNGKey(0), n_classes=3, sigma=0.0))
    expected = np.exp([0, 1, 0]) / np.exp([0, 1, 0]).sum()
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_corrupt_onehot_noise_level_monotone():
    # Larger sigma must (on average) push mass further from the clean one-hot.
    labels = jax.random.randint(jax.random.PRNGKey(0), (4, 16, 16), 0, 11)
    clean = np.asarray(corrupt_onehot(labels, jax.random.PRNGKey(1), n_classes=11, sigma=0.0))
    deviations = []
    for sigma in (0.1, 0.5, 2.0):
        noisy = np.asarray(corrupt_onehot(labels, jax.random.PRNGKey(1), n_classes=11, sigma=sigma))
        deviations.append(np.abs(noisy - clean).mean())
    assert deviations[0] < deviations[1] < deviations[2]


def test_corrupt_onehot_argmax_mostly_preserved_small_sigma():
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 11)
    out = corrupt_onehot(labels, jax.random.PRNGKey(3), n_classes=11, sigma=0.2)
    agree = (np.argmax(np.asarray(out), -1) == np.asarray(labels)).mean()
    assert agree > 0.99


def test_corrupt_probs_simplex():
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 5)), -1)
    out = corrupt_probs(probs, jax.random.PRNGKey(1), sigma=1.0)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_corrupt_deterministic_in_key():
    labels = jax.random.randint(jax.random.PRNGKey(0), (1, 4, 4), 0, 3)
    a = corrupt_onehot(labels, jax.random.PRNGKey(7), n_classes=3, sigma=1.0)
    b = corrupt_onehot(labels, jax.random.PRNGKey(7), n_classes=3, sigma=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
