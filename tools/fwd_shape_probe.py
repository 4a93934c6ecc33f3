#!/usr/bin/env python
"""Locate the train-forward MXU gap: shape or context?

The r5 itemization (tools/train_itemize_probe.py) found the train step's
FORWARD runs at ~29 TF/s effective (15% MXU) at both train crops
(crop-128 b128: 0.40 ms/img; crop-224 b64: 1.28 ms/img) while the bench's
inference forward at 360x480 b128 runs at ~160 TF/s (79%). Naive FLOP
scaling says crop-224 fwd should cost ~0.28 ms/img. Candidate causes:

  (A) crop GEOMETRY: 224x224 / 128x128 tile worse than 360x480 through
      XLA's conv lowerings (e.g. fc6's 7x7 SAME kernel on a 7x7 pool5 map);
  (B) BATCH: b64 vs b128;
  (C) train-step CONTEXT: something about fcn8_logits / the loss composition
      (f32 full-res score materialization, dropout plumbing) that the pure
      inference apply avoids.

This probe times, with the sanctioned chained best-of-3 harness, the PURE
inference forward (fcn8_apply, probs bf16, no dropout) across a shape grid,
plus fcn8_logits (the train forward entry, no loss) at the train shapes.
If (A): pure apply is slow at crops too. If (C): apply fast, logits slow.

Usage (real TPU, idle host):
    python tools/fwd_shape_probe.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from iterative_inference_segm_tpu.models import init_fcn8
from iterative_inference_segm_tpu.models.fcn8 import fcn8_apply, fcn8_logits


def timed(fn, params, x, iters, label, batch, flops_per_img=None):
    out = fn(params, x)
    jax.device_get(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            o = fn(params, x)
            acc = o if acc is None else acc + o
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    ms = best * 1e3 / batch
    tf = f"  {flops_per_img * batch / best / 1e12:6.1f} TF/s" if flops_per_img else ""
    print(f"{label:<40s} {batch / best:8.1f} img/s  {ms:8.4f} ms/img{tf}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cpu", action="store_true", help="tiny-shape CPU smoke")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    params = init_fcn8(jax.random.PRNGKey(0), n_classes=11)
    rng = np.random.default_rng(0)

    # VGG+fc backbone flops scale ~linearly in pixels: ~150 GF/img at
    # 360x480 (ARCHITECTURE north-star record) -> GF/px ~ 150/172800.
    gf_px = 150e9 / (360 * 480)

    def apply_fwd(p_, x_):
        probs, _ = fcn8_apply(p_, x_, compute_dtype=jnp.bfloat16,
                              probs_dtype=jnp.bfloat16)
        return jnp.sum(probs[..., 0].astype(jnp.float32))

    def logits_fwd(p_, x_):
        return jnp.sum(fcn8_logits(p_, x_, compute_dtype=jnp.bfloat16)[..., 0])

    grid = [] if args.cpu else [
        ("apply 360x480 b128 (bench shape)", apply_fwd, 128, 360, 480),
        ("apply 224x224 b64  (train shape)", apply_fwd, 64, 224, 224),
        ("apply 224x224 b128", apply_fwd, 128, 224, 224),
        ("apply 128x128 b128 (train shape)", apply_fwd, 128, 128, 128),
        ("apply 256x256 b128", apply_fwd, 128, 256, 256),
        ("logits 224x224 b64 (train entry)", logits_fwd, 64, 224, 224),
        ("logits 128x128 b128", logits_fwd, 128, 128, 128),
    ]
    if args.cpu:
        grid = [("apply 32x32 b2 cpu-smoke", apply_fwd, 2, 32, 32),
                ("logits 32x32 b2 cpu-smoke", logits_fwd, 2, 32, 32)]

    for label, fwd, b, h, w in grid:
        x = jnp.asarray(rng.random((b, h, w, 3), np.float32))
        fn = jax.jit(fwd)
        timed(fn, params, x, args.iters, label, b, flops_per_img=gf_px * h * w)


if __name__ == "__main__":
    main()
