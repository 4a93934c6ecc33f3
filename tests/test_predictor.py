"""Predictor (serving API) tests: chunking, padding, npz loading."""

import numpy as np
import jax
import pytest

import dataclasses

from iterative_inference_segm_tpu.data.config_datasets import CAMVID
from iterative_inference_segm_tpu.inference import Predictor
from iterative_inference_segm_tpu.models import init_fcn8, init_dae
from iterative_inference_segm_tpu.utils.checkpoint import save_npz

TINY = dataclasses.replace(CAMVID, n_classes=4, void_label=4, height=48, width=64)


@pytest.fixture(scope="module")
def params():
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=4, fc_channels=16)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=4, h_specs={"pool4": 512})
    return fcn, dae


def test_predict_fcn_only(params):
    fcn, _ = params
    p = Predictor(fcn, dataset=TINY, batch_size=2, num_steps=0)
    imgs = np.random.default_rng(0).random((3, 48, 64, 3)).astype(np.float32)
    labels = p.predict(imgs)
    assert labels.shape == (3, 48, 64)
    assert labels.dtype == np.int32
    assert labels.min() >= 0 and labels.max() < 4


def test_predict_with_refinement_and_probs(params):
    fcn, dae = params
    p = Predictor(fcn, dae, dataset=TINY, batch_size=2, num_steps=2, eps=0.1)
    imgs = np.random.default_rng(1).random((2, 48, 64, 3)).astype(np.float32)
    labels, probs = p.predict(imgs, return_probs=True)
    assert probs.shape == (2, 48, 64, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_array_equal(labels, probs.argmax(-1))


def test_predict_chunking_matches_single_shot(params):
    fcn, dae = params
    imgs = np.random.default_rng(2).random((5, 48, 64, 3)).astype(np.float32)
    small = Predictor(fcn, dae, dataset=TINY, batch_size=2, num_steps=1)
    big = Predictor(fcn, dae, dataset=TINY, batch_size=5, num_steps=1)
    np.testing.assert_array_equal(small.predict(imgs), big.predict(imgs))


def test_predictor_from_npz(tmp_path, params):
    fcn, dae = params
    save_npz(tmp_path / "fcn.npz", jax.device_get(fcn))
    save_npz(tmp_path / "dae.npz", jax.device_get(dae))
    p = Predictor.from_npz(
        str(tmp_path / "fcn.npz"), str(tmp_path / "dae.npz"),
        dataset=TINY, fc_channels=16, batch_size=2, num_steps=1,
    )
    imgs = np.random.default_rng(3).random((2, 48, 64, 3)).astype(np.float32)
    direct = Predictor(fcn, dae, dataset=TINY, batch_size=2, num_steps=1)
    np.testing.assert_array_equal(p.predict(imgs), direct.predict(imgs))
