#!/usr/bin/env python
"""Clean A/B of the augmentation materialization barrier inside the FULL
FCN-8 train step (follow-up to tools/aug_probe.py and the 2026-08-18
warm-up discovery).

HISTORY / WARNING: the first version of this probe (and every
single-timing-pass train measurement before it) was confounded by a
per-process ramp: the first timed cell of a fresh process runs ~3-4x slow
on this relay (~150-400 img/s where the same program later in the process
hits 1300+), and one warm-up execution does not clear it. That artifact
manufactured the entire "in-graph augmentation is 3x" story AND the old
135-170 vs 433-438 img/s contradiction in ARCHITECTURE.md. This version
times best-of-3 chained loops per cell (order-independent) and patches
the augmentation implementation through TRACE time (jax.jit resolves the
module global at first call, not at step-construction time — the first
version restored the patch before tracing, so its variants (b)/(d) were
silently identical to (a)).

Cells:
  (a) augment, as shipped (pipeline.random_crop_and_flip, incl. whatever
      barrier policy ships)
  (b) augment, barrier stripped (monkeypatched no-barrier clone)
  (c) no augment (pre-cropped inputs) — the floor
Usage: python tools/aug_step_probe.py [--crop 128] [--batch 64]
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from iterative_inference_segm_tpu.data.config_datasets import CAMVID
from iterative_inference_segm_tpu.models import init_fcn8
from iterative_inference_segm_tpu.train.loop import TrainConfig, make_optimizer
from iterative_inference_segm_tpu.train.train_fcn8 import make_fcn8_train_step

tf_mod = importlib.import_module("iterative_inference_segm_tpu.train.train_fcn8")


def no_barrier_crop_and_flip(key, image, labels, *, crop):
    """The shipped algorithm minus the trailing optimization_barrier."""
    b, h, w, _ = image.shape
    ch, cw = crop
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - ch + 1)
    ox = jax.random.randint(jax.random.fold_in(k_off, 1), (b,), 0, w - cw + 1)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))

    def one(img, lab, oy, ox, fl):
        img_c = jax.lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, img.shape[-1]))
        lab_c = jax.lax.dynamic_slice(lab, (oy, ox), (ch, cw))
        img_c = jnp.where(fl, img_c[:, ::-1, :], img_c)
        lab_c = jnp.where(fl, lab_c[:, ::-1], lab_c)
        return img_c, lab_c

    return jax.vmap(one)(image, labels, oy, ox, flip)


def timed(step_fn, params, opt0, images, labels, iters, label, batch, *, aug_impl=None):
    """Compile (with aug_impl patched through TRACE time if given), then
    time best-of-3 chained loops."""
    saved = tf_mod.random_crop_and_flip
    if aug_impl is not None:
        tf_mod.random_crop_and_flip = aug_impl
    try:
        out = step_fn(params, opt0, images, labels, jax.random.PRNGKey(0))  # traces HERE
        jax.device_get(out[2])
    finally:
        tf_mod.random_crop_and_flip = saved
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p_, o_, acc = params, opt0, None
        for i in range(iters):
            p_, o_, loss = step_fn(p_, o_, images, labels, jax.random.fold_in(jax.random.PRNGKey(1), i))
            acc = loss if acc is None else acc + loss
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<44s} {batch / best:8.1f} img/s  {best * 1e3 / batch:8.4f} ms/img", flush=True)


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

    # separate jit objects so each traces its own program
    step_a, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=True)
    step_b, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=True)
    step_c, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=False)

    b, it = args.batch, args.iters
    timed(step_a, params, opt0, full_i, full_l, it, "(a) augment, as shipped", b)
    timed(step_b, params, opt0, full_i, full_l, it, "(b) augment, barrier stripped", b,
          aug_impl=no_barrier_crop_and_flip)
    timed(step_c, params, opt0, crop_i, crop_l, it, "(c) no augment (pre-cropped floor)", b)


if __name__ == "__main__":
    main()
