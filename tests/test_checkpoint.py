"""Checkpoint round-trips: npz flat export/import + orbax pytrees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_inference_segm_tpu.models import init_fcn8
from iterative_inference_segm_tpu.utils.checkpoint import (
    save_npz,
    load_npz,
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)
from iterative_inference_segm_tpu.utils.experiment import build_experiment_name, MetricLogger


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path):
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    path = tmp_path / "p.npz"
    save_npz(path, jax.device_get(params))
    restored = load_npz(path, params)
    _tree_equal(params, restored)


def test_npz_shape_mismatch_raises(tmp_path):
    params = {"a": {"w": jnp.ones((2, 2))}}
    save_npz(tmp_path / "p.npz", params)
    bad_template = {"a": {"w": jnp.ones((3, 3))}}
    with pytest.raises(ValueError):
        load_npz(tmp_path / "p.npz", bad_template)


def test_npz_missing_key_raises(tmp_path):
    save_npz(tmp_path / "p.npz", {"a": {"w": jnp.ones((2,))}})
    with pytest.raises(KeyError):
        load_npz(tmp_path / "p.npz", {"a": {"w": jnp.ones((2,)), "b": jnp.ones((1,))}})


def test_orbax_roundtrip(tmp_path):
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    save_checkpoint(tmp_path, 7, params)
    assert latest_step(tmp_path) == 7
    restored = restore_checkpoint(tmp_path, 7, jax.tree.map(np.zeros_like, params))
    _tree_equal(params, restored)


def test_latest_step_empty(tmp_path):
    assert latest_step(tmp_path / "nope") is None


def test_build_experiment_name_deterministic():
    a = build_experiment_name("fcn8", lr=1e-3, dataset="camvid", sigma=0.5)
    b = build_experiment_name("fcn8", sigma=0.5, dataset="camvid", lr=1e-3)
    assert a == b
    assert "lr=0.001" in a and "dataset=camvid" in a


def test_metric_logger_roundtrip(tmp_path):
    ml = MetricLogger(tmp_path)
    ml.log(0, loss=1.5, note="hello")
    ml.log(1, loss=jnp.float32(0.5))
    recs = ml.read()
    assert len(recs) == 2
    assert recs[0]["loss"] == 1.5
    assert recs[1]["loss"] == 0.5
