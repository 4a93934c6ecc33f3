"""Accuracy gate (VERDICT r2 weak #5): a CPU-runnable trained-pair
regression that FAILS if a change silently erodes the refinement gain.

The perf gate (bench.py --check) pins throughput; nothing else in the suite
pinned trained-model accuracy — the oracle-denoiser test guards the engine
contract, not the capability. This test runs a shrunk version of the
canonical demo protocol (scripts/demo_synthetic.py, ARCHITECTURE.md
"Accuracy demonstration"): train an UNDER-trained FCN-8 on the synthetic
structured scenes, train the flagship DAE on its raw outputs (natural
corruption, sigma=0), search (eps, K) on val with the half engine, and
require the refined test mIoU to beat the FCN baseline by a margin.

Calibration (2026-08-17, CPU, fixed seeds): FCN 0.378 -> refined 0.501,
delta +0.123. The gate asserts delta >= 0.05 — under half the measured
gain, far above noise, and any real regression of the capability (corrupted
tail math, broken conditioning, softmax/dtype bugs) lands well below it.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_inference_segm_tpu.data.config_datasets import CAMVID
from iterative_inference_segm_tpu.data.pipeline import normalize_image
from iterative_inference_segm_tpu.data.synthetic import synthetic_batches
from iterative_inference_segm_tpu.inference.fused import make_half_refiner
from iterative_inference_segm_tpu.inference.search import grid_search_eps_k_half
from iterative_inference_segm_tpu.models import fcn8_apply
from iterative_inference_segm_tpu.ops.metrics import confusion_matrix, metrics_from_confusion
from iterative_inference_segm_tpu.train import TrainConfig, train_fcn8, train_dae

GATE_DELTA_MIOU = 0.05


@pytest.fixture(scope="module")
def trained_pair():
    cfg = dataclasses.replace(CAMVID, train_crop=(64, 80))
    hw = dict(height=64, width=96)

    def data(n, seed):
        return list(synthetic_batches(cfg=cfg, batch_size=8, num_batches=n, seed=seed, **hw))

    train, val, test = data(10, 0), data(2, 500), data(2, 900)
    rf = train_fcn8(
        dataset=cfg, train_data=train, val_data=val,
        tcfg=TrainConfig(max_epochs=3, patience=100, seed=0), fc_channels=48,
    )
    rd = train_dae(
        fcn_params=rf["params"], dataset=cfg, train_data=train, val_data=val,
        tcfg=TrainConfig(max_epochs=10, patience=100, seed=0),
        h_taps=("pool4",), sigma=0.0, from_gt=False,
        dae_depth=3, dae_stem_pool=1, dae_widths=(8, 16, 32),
    )
    return cfg, rf["params"], rd["params"], val, test


def _norm(cfg, batches):
    return [(np.asarray(normalize_image(jnp.asarray(i), cfg)), l) for i, l in batches]


def test_refinement_gain_gate(trained_pair):
    cfg, fcn, dae, val, test = trained_pair
    res = grid_search_eps_k_half(
        fcn8_apply, fcn, dae, _norm(cfg, val),
        n_classes=cfg.n_classes, eps_grid=[0.2, 0.5, 1.0], k_max=4, depth=3,
    )
    refine = make_half_refiner(
        fcn8_apply, fcn, dae, eps=res["best_eps"], num_steps=res["best_k"], depth=3,
    )
    cm0 = cmk = None
    for im, lab in _norm(cfg, test):
        y0, yk = refine(jnp.asarray(im))
        c0 = confusion_matrix(jnp.argmax(y0, -1), jnp.asarray(lab), n_classes=cfg.n_classes)
        ck = confusion_matrix(jnp.argmax(yk, -1), jnp.asarray(lab), n_classes=cfg.n_classes)
        cm0 = c0 if cm0 is None else cm0 + c0
        cmk = ck if cmk is None else cmk + ck
    miou0 = float(metrics_from_confusion(cm0).mean_iou)
    miouk = float(metrics_from_confusion(cmk).mean_iou)
    delta = miouk - miou0
    assert delta >= GATE_DELTA_MIOU, (
        f"ACCURACY GATE FAILED: refinement gain {delta:+.4f} mIoU "
        f"({miou0:.4f} -> {miouk:.4f}) below the {GATE_DELTA_MIOU} floor — "
        "a change eroded the trained refinement capability "
        "(calibrated at +0.123; see module docstring)"
    )


def test_refinement_gain_gate_general_engine(trained_pair):
    """The semantics-faithful general engine must ALSO clear the gate with
    the same trained pair (guards against half-engine-only regressions of
    dae_apply / refinement_scan)."""
    from iterative_inference_segm_tpu.inference import make_refiner
    from iterative_inference_segm_tpu.models import dae_apply

    cfg, fcn, dae, val, test = trained_pair
    refine = make_refiner(
        fcn8_apply, dae_apply, fcn, dae, eps=0.5, num_steps=2,
        dae_kwargs={"depth": 3},
    )
    cm0 = cmk = None
    for im, lab in _norm(cfg, test):
        y0, yk = refine(jnp.asarray(im))
        c0 = confusion_matrix(jnp.argmax(y0, -1), jnp.asarray(lab), n_classes=cfg.n_classes)
        ck = confusion_matrix(jnp.argmax(yk, -1), jnp.asarray(lab), n_classes=cfg.n_classes)
        cm0 = c0 if cm0 is None else cm0 + c0
        cmk = ck if cmk is None else cmk + ck
    miou0 = float(metrics_from_confusion(cm0).mean_iou)
    miouk = float(metrics_from_confusion(cmk).mean_iou)
    assert miouk - miou0 >= GATE_DELTA_MIOU, (
        f"general-engine gain {miouk - miou0:+.4f} below {GATE_DELTA_MIOU} "
        f"({miou0:.4f} -> {miouk:.4f})"
    )
