#!/usr/bin/env python
"""Op-order/implementation A/B for in-graph augmentation at LARGE batch.

The r5 roofline sweep (TRAIN_HISTORY.jsonl) showed the "<2% augmentation
cost" result from b64 does NOT hold at b128: FCN-8 crop-128 runs 1611
img/s pre-cropped but 1193 with in-graph augmentation (-26%). The shipped
step order (train_fcn8.py train_core) is

    normalize(FULL 360x480 frame) -> per-sample crop/flip -> fwd/bwd

which normalizes 10.5x more pixels than survive the crop and materializes
a full-frame f32 intermediate per step. Since normalize is an elementwise
affine it commutes bit-exactly with crop and flip, so the order is pure
implementation freedom. This probe times the FULL FCN-8 train step
(fwd+bwd+adam, bf16) under five variants, best-of-3 chained loops
(the only sanctioned timing — see tools/train_bench.py):

  (a) shipped        : normalize full -> vmapped dynamic_slice crop -> flip
  (b) crop-first     : vmapped dynamic_slice crop/flip -> normalize crop
  (c) gather-fused   : crop-first, one 2-D advanced-index gather with the
                       flip folded into the column indices (no where on data)
  (d) separable      : crop-first, row take_along_axis (reads only ch/H of
                       the frame) then column take_along_axis with folded flip
  (e) pre-cropped    : augment=False floor (normalize still in-graph)

All augmenting variants consume the SAME rng stream and draw the same
offsets/flips, so their sampled batches are identical; (a)/(b) are
bit-identical programs up to op order.

Usage (real TPU, idle host):
    python tools/aug_order_probe.py --batch 128 --crop 128 [--iters 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from iterative_inference_segm_tpu.data.config_datasets import CAMVID
from iterative_inference_segm_tpu.data.pipeline import normalize_image
from iterative_inference_segm_tpu.models import init_fcn8
from iterative_inference_segm_tpu.models.fcn8 import fcn8_logits
from iterative_inference_segm_tpu.ops.losses import masked_crossentropy
from iterative_inference_segm_tpu.train.loop import TrainConfig, make_optimizer


def draw(key, b, h, w, ch, cw):
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - ch + 1)
    ox = jax.random.randint(jax.random.fold_in(k_off, 1), (b,), 0, w - cw + 1)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    return oy, ox, flip


def crop_dynslice(image, labels, oy, ox, flip, ch, cw):
    def one(img, lab, oy, ox, fl):
        img_c = jax.lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, img.shape[-1]))
        lab_c = jax.lax.dynamic_slice(lab, (oy, ox), (ch, cw))
        img_c = jnp.where(fl, img_c[:, ::-1, :], img_c)
        lab_c = jnp.where(fl, lab_c[:, ::-1], lab_c)
        return img_c, lab_c

    return jax.vmap(one)(image, labels, oy, ox, flip)


def crop_gather2d(image, labels, oy, ox, flip, ch, cw):
    b = image.shape[0]
    rows = oy[:, None] + jnp.arange(ch)[None, :]
    cols = ox[:, None] + jnp.arange(cw)[None, :]
    cols = jnp.where(flip[:, None], cols[:, ::-1], cols)  # flip folded into indices
    bidx = jnp.arange(b)[:, None, None]
    img_c = image[bidx, rows[:, :, None], cols[:, None, :], :]
    lab_c = labels[bidx, rows[:, :, None], cols[:, None, :]]
    return img_c, lab_c


def crop_separable(image, labels, oy, ox, flip, ch, cw):
    rows = oy[:, None] + jnp.arange(ch)[None, :]
    cols = ox[:, None] + jnp.arange(cw)[None, :]
    cols = jnp.where(flip[:, None], cols[:, ::-1], cols)
    img_r = jnp.take_along_axis(image, rows[:, :, None, None], axis=1)
    img_c = jnp.take_along_axis(img_r, cols[:, None, :, None], axis=2)
    lab_r = jnp.take_along_axis(labels, rows[:, :, None], axis=1)
    lab_c = jnp.take_along_axis(lab_r, cols[:, None, :], axis=2)
    return img_c, lab_c


def make_step(cfg, tcfg, tx, *, order, crop_impl):
    """order: 'norm_first' | 'crop_first' | 'none' (pre-cropped input)."""
    ch, cw = cfg.train_crop

    def loss_fn(params, images, labels, rng):
        # mirrors train_fcn8.make_fcn8_train_step's loss_fn exactly
        logits_rng, _ = jax.random.split(rng)
        logits = fcn8_logits(
            params, images, dropout_rng=logits_rng, compute_dtype=tcfg.compute_dtype
        )
        loss = masked_crossentropy(logits, labels, n_classes=cfg.n_classes)
        return loss, logits

    def step(params, opt_state, images, labels, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        if order == "none":
            images = normalize_image(images, cfg)
        else:
            b, h, w, _ = images.shape
            oy, ox, flip = draw(aug_rng, b, h, w, ch, cw)
            if order == "norm_first":
                images = normalize_image(images, cfg)
                images, labels = crop_impl(images, labels, oy, ox, flip, ch, cw)
            else:
                images, labels = crop_impl(images, labels, oy, ox, flip, ch, cw)
                images = normalize_image(images, cfg)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, drop_rng
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), new_opt, loss

    return jax.jit(step)


def timed(step_fn, params, opt0, images, labels, iters, label, batch):
    out = step_fn(params, opt0, images, labels, jax.random.PRNGKey(0))
    jax.device_get(out[2])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p_, o_, acc = params, opt0, None
        for i in range(iters):
            p_, o_, loss = step_fn(
                p_, o_, images, labels, jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
            acc = loss if acc is None else acc + loss
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<44s} {batch / best:8.1f} img/s  {best * 1e3 / batch:8.4f} ms/img",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--cpu", action="store_true", help="tiny-shape CPU smoke")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = dataclasses.replace(CAMVID, train_crop=(args.crop, args.crop))
    tcfg = TrainConfig(learning_rate=1e-3, compute_dtype=jnp.bfloat16)
    tx = make_optimizer(tcfg)
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=cfg.n_classes)
    opt0 = tx.init(params)

    rng = np.random.default_rng(0)
    full_i = jnp.asarray(
        rng.random((args.batch, args.height, args.width, 3), np.float32)
    )
    full_l = jnp.asarray(
        rng.integers(0, cfg.n_classes, (args.batch, args.height, args.width))
        .astype(np.int32)
    )
    crop_i = full_i[:, : args.crop, : args.crop, :]
    crop_l = full_l[:, : args.crop, : args.crop]

    b, it = args.batch, args.iters
    cells = [
        ("(a) normalize-full -> dynslice crop (shipped)", "norm_first", crop_dynslice,
         full_i, full_l),
        ("(b) dynslice crop -> normalize crop", "crop_first", crop_dynslice,
         full_i, full_l),
        ("(c) 2-D gather crop, folded flip", "crop_first", crop_gather2d,
         full_i, full_l),
        ("(d) separable take_along_axis, folded flip", "crop_first", crop_separable,
         full_i, full_l),
        ("(e) pre-cropped floor", "none", None, crop_i, crop_l),
    ]
    for label, order, impl, im, lb in cells:
        step = make_step(cfg, tcfg, tx, order=order, crop_impl=impl)
        timed(step, params, opt0, im, lb, it, label, b)


if __name__ == "__main__":
    main()
