#!/usr/bin/env python
"""Itemize the FCN-8 train step: where do the non-MXU milliseconds go?

The r5 roofline sweep (TRAIN_HISTORY.jsonl) put the FCN-8 train step at
18-29% MXU while the inference backbone runs at 79% — VERDICT r4 #2 asks
which term is floor-bound before attacking. This probe times, at the same
(batch, crop), best-of-3 chained loops (see tools/train_bench.py for why):

  (1) fwd loss only            — forward + masked CE, no grad
  (2) value_and_grad           — fwd+bwd, no optimizer
  (3) full step                — fwd+bwd+adam (the shipped program)
  (4) fwd, no dropout          — isolates the dropout mask cost
  (5) max-pool grad microbench — grad of sum(max_pool(x)) at the VGG
      pool1 shape via (a) reduce_window's native SelectAndScatter VJP and
      (b) a mask-based recompute VJP, to test the classic TPU suspicion
      that pool-backward dominates conv-net bwd passes on XLA:TPU

(1)-(3) nest, so (2)-(1) ~ bwd cost and (3)-(2) ~ optimizer cost. Inputs
are pre-cropped (augment=False) to keep augmentation out of the split —
tools/aug_order_probe.py owns that axis.

Usage (real TPU, idle host):
    python tools/train_itemize_probe.py --batch 128 --crop 128
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


def timed(fn, args_, iters, label, batch, scalar_of):
    """Time best-of-3 chained loops; a per-iteration scalar accumulates
    on-device and ONE device_get syncs the block (executions serialize on
    the single core, so the accumulator pattern is the sanctioned timing —
    tools/train_bench.py)."""
    out = fn(*args_)
    jax.device_get(scalar_of(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = scalar_of(fn(*args_))
            acc = s if acc is None else acc + s
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<40s} {batch / best:9.1f} img/s  {best * 1e3 / batch:8.4f} ms/img",
          flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    cfg = dataclasses.replace(CAMVID, train_crop=(args.crop, args.crop))
    tcfg = TrainConfig(learning_rate=1e-3, compute_dtype=jnp.bfloat16)
    tx = make_optimizer(tcfg)
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=cfg.n_classes)
    opt0 = tx.init(params)

    rng = np.random.default_rng(0)
    images = normalize_image(
        jnp.asarray(rng.random((args.batch, args.crop, args.crop, 3), np.float32)), cfg
    )
    labels = jnp.asarray(
        rng.integers(0, cfg.n_classes, (args.batch, args.crop, args.crop))
        .astype(np.int32)
    )

    def loss_fn(params, images, labels, drop_rng):
        logits = fcn8_logits(
            params, images, dropout_rng=drop_rng, compute_dtype=tcfg.compute_dtype
        )
        return masked_crossentropy(logits, labels, n_classes=cfg.n_classes)

    @jax.jit
    def fwd(params, images, labels, rng):
        return loss_fn(params, images, labels, rng)

    @jax.jit
    def fwd_nodrop(params, images, labels):
        logits = fcn8_logits(
            params, images, dropout_rng=None, compute_dtype=tcfg.compute_dtype
        )
        return masked_crossentropy(logits, labels, n_classes=cfg.n_classes)

    @jax.jit
    def vag(params, images, labels, rng):
        return jax.value_and_grad(loss_fn)(params, images, labels, rng)

    @jax.jit
    def step(params, opt_state, images, labels, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    b, it = args.batch, args.iters
    key = jax.random.PRNGKey(1)

    t_fwd = timed(fwd, (params, images, labels, key), it, "(1) fwd loss", b,
                  lambda out: out)
    t_vag = timed(vag, (params, images, labels, key), it,
                  "(2) fwd+bwd (value_and_grad)", b, lambda out: out[0])
    t_step = timed(step, (params, opt0, images, labels, key), it,
                   "(3) full step (fwd+bwd+adam)", b, lambda out: out[2])
    timed(fwd_nodrop, (params, images, labels), it, "(4) fwd, no dropout", b,
          lambda out: out)

    print(f"\nbwd ~= (2)-(1) = {(t_vag - t_fwd) * 1e3 / b:.4f} ms/img "
          f"({(t_vag - t_fwd) / t_step:.0%} of step)")
    print(f"opt ~= (3)-(2) = {(t_step - t_vag) * 1e3 / b:.4f} ms/img "
          f"({(t_step - t_vag) / t_step:.0%} of step)\n")

    # --- (5) pool-backward microbench at the heaviest pool shape (pool1:
    # b x crop x crop x 64 -> /2). reduce_window grad lowers to
    # SelectAndScatter; the mask VJP recomputes the max and scatters by
    # comparison (ties get the full gradient at every argmax site, like
    # Theano/caffe — acceptable for probing the op cost).
    x = jnp.asarray(
        rng.random((args.batch, args.crop, args.crop, 64), np.float32), jnp.bfloat16
    )

    def pool_rw(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    @jax.custom_vjp
    def pool_mask(x):
        return pool_rw(x)

    def pool_mask_fwd(x):
        y = pool_rw(x)
        return y, (x, y)

    def pool_mask_bwd(res, g):
        x, y = res
        up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        gup = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2)
        return (jnp.where(x == up, gup, 0).astype(x.dtype),)

    pool_mask.defvjp(pool_mask_fwd, pool_mask_bwd)

    @jax.jit
    def g_rw(x):
        return jax.grad(lambda x: pool_rw(x).astype(jnp.float32).sum())(x)

    @jax.jit
    def g_mask(x):
        return jax.grad(lambda x: pool_mask(x).astype(jnp.float32).sum())(x)

    for label, fn in (("(5a) pool grad: SelectAndScatter", g_rw),
                      ("(5b) pool grad: mask recompute", g_mask)):
        timed(fn, (x,), it, label, b,
              lambda out: out[0, 0, 0, 0].astype(jnp.float32))


if __name__ == "__main__":
    main()
