#!/usr/bin/env python
"""Why does augment=True slow the FULL train step far beyond the cost of
the augmentation itself? (tools/aug_probe.py: crop+flip alone is ~0.03
ms/img at b64, but train_bench.py measured the augmented FCN step at
crop-128 b64 3.3x slower than pre-cropped — ~1.8 ms/img of slowdown.)

Hypothesis: XLA fuses the crop gather (and the full-frame normalize
feeding it) into consumers instead of materializing the cropped batch
once, so the gather logic re-executes per consumer read. Test: insert
``jax.lax.optimization_barrier`` after augmentation to force a clean
materialization boundary, and compare:

  (a) augment in-graph, as shipped
  (b) augment in-graph + optimization_barrier on (images, labels)
  (c) no augment (pre-cropped inputs) — the floor
  (d) augment with STATIC offsets (oy=ox=0, no flip draw) — isolates
      dynamic-index cost from crop-shape plumbing

Chained timing per CLAUDE.md. Usage: python tools/aug_step_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from iterative_inference_segm_tpu.data import pipeline
from iterative_inference_segm_tpu.data.config_datasets import CAMVID
from iterative_inference_segm_tpu.models import init_fcn8
from iterative_inference_segm_tpu.train.loop import TrainConfig, make_optimizer
from iterative_inference_segm_tpu.train.train_fcn8 import make_fcn8_train_step


def timed(step_fn, params, opt0, images, labels, iters, label, batch):
    out = step_fn(params, opt0, images, labels, jax.random.PRNGKey(0))
    jax.device_get(out[2])
    t0 = time.perf_counter()
    p_, o_, acc = params, opt0, None
    for i in range(iters):
        p_, o_, loss = step_fn(p_, o_, images, labels, jax.random.fold_in(jax.random.PRNGKey(1), i))
        acc = loss if acc is None else acc + loss
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / iters
    print(f"{label:<44s} {batch / per:8.1f} img/s  {per * 1e3 / batch:8.4f} ms/img", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    cfg = dataclasses.replace(CAMVID, train_crop=(args.crop, args.crop))
    tcfg = TrainConfig(learning_rate=1e-3, compute_dtype=jnp.bfloat16)
    tx = make_optimizer(tcfg)
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=cfg.n_classes)
    opt0 = tx.init(params)

    rng = np.random.default_rng(0)
    full_i = jnp.asarray(rng.random((args.batch, 360, 480, 3), np.float32))
    full_l = jnp.asarray(rng.integers(0, cfg.n_classes, (args.batch, 360, 480)).astype(np.int32))
    crop_i = full_i[:, : args.crop, : args.crop, :]
    crop_l = full_l[:, : args.crop, : args.crop]

    orig = pipeline.random_crop_and_flip

    def barrier_aug(key, image, labels, *, crop):
        img, lab = orig(key, image, labels, crop=crop)
        return jax.lax.optimization_barrier((img, lab))

    def static_aug(key, image, labels, *, crop):
        ch, cw = crop
        return image[:, :ch, :cw, :], labels[:, :ch, :cw]

    def build(aug_impl):
        pipeline.random_crop_and_flip = aug_impl
        try:
            # train_fcn8 imported the symbol at module load: patch there too
            import iterative_inference_segm_tpu.train.train_fcn8 as tf

            saved = tf.random_crop_and_flip
            tf.random_crop_and_flip = aug_impl
            step, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=True)
            tf.random_crop_and_flip = saved
            return step
        finally:
            pipeline.random_crop_and_flip = orig

    step_plain, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=True)
    step_barrier = build(barrier_aug)
    step_static = build(static_aug)
    step_noaug, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=False)

    b, it = args.batch, args.iters
    timed(step_plain, params, opt0, full_i, full_l, it, "(a) augment, as shipped", b)
    timed(step_barrier, params, opt0, full_i, full_l, it, "(b) augment + optimization_barrier", b)
    timed(step_static, params, opt0, full_i, full_l, it, "(d) static-offset crop (slice, no RNG)", b)
    timed(step_noaug, params, opt0, crop_i, crop_l, it, "(c) no augment (pre-cropped floor)", b)


if __name__ == "__main__":
    main()
