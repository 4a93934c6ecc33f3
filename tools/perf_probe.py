#!/usr/bin/env python
"""Component-level TPU timing probe: where does the pipeline's time go?

Times (via chained executions + one scalar device_get, since
block_until_ready does not block through the axon relay):
  - FCN-8 forward alone (bf16), several batch sizes
  - DAE forward alone on precomputed (y0, h)
  - K-step refinement scan alone on precomputed (y0, h)
  - full pipeline

Usage: python tools/perf_probe.py [--batches 4 8 16] [--steps 5] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, args, iters, label, images_per_iter):
    # warmup/compile
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        s = fn(*args)
        acc = s if acc is None else acc + s
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / iters
    print(
        f"{label:<42s} {per * 1e3:8.2f} ms/iter  {per / images_per_iter * 1e3:7.2f} ms/img  "
        f"{images_per_iter / per:8.1f} img/s",
        flush=True,
    )
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[4, 8, 16])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = p.parse_args()

    from iterative_inference_segm_tpu.models import (
        init_fcn8, fcn8_apply, init_dae, dae_apply,
    )
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS
    from iterative_inference_segm_tpu.inference.iterative import refinement_scan

    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=11)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=11, h_specs={"pool4": DAE_H_CHANNELS["pool4"]})

    @jax.jit
    def fcn_fwd(fcn, x):
        probs, _ = fcn8_apply(fcn, x, compute_dtype=cd)
        return jnp.sum(probs[..., 0], dtype=jnp.float32)

    @jax.jit
    def fcn_feats(fcn, x):
        return fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd)

    @jax.jit
    def dae_fwd(dae, y0, h):
        return jnp.sum(dae_apply(dae, y0, h, compute_dtype=cd)[..., 0], dtype=jnp.float32)

    @jax.jit
    def scan_only(dae, y0, h):
        dae_fn = lambda y: dae_apply(dae, y, h, compute_dtype=cd)
        yk = refinement_scan(dae_fn, y0, eps=0.1, num_steps=args.steps, mode="score")
        return jnp.sum(yk[..., 0], dtype=jnp.float32)

    @jax.jit
    def full(fcn, dae, x):
        y0, h = fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd)
        dae_fn = lambda y: dae_apply(dae, y, h, compute_dtype=cd)
        yk = refinement_scan(dae_fn, y0, eps=0.1, num_steps=args.steps, mode="score")
        return jnp.sum(yk[..., 0], dtype=jnp.float32)

    for b in args.batches:
        print(f"== batch {b}  {args.height}x{args.width}  {args.dtype} ==", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (b, args.height, args.width, 3), jnp.float32)
        t_fcn = timed(fcn_fwd, (fcn, x), args.iters, "FCN-8 forward", b)
        y0, h = fcn_feats(fcn, x)
        y0 = jax.device_put(y0)
        t_dae = timed(dae_fwd, (dae, y0, h), args.iters, "DAE forward (1 step)", b)
        t_scan = timed(scan_only, (dae, y0, h), args.iters, f"refinement scan ({args.steps} steps)", b)
        t_full = timed(full, (fcn, dae, x), args.iters, f"full pipeline (FCN + {args.steps} steps)", b)
        print(
            f"   sum check: fcn {t_fcn*1e3:.1f} + scan {t_scan*1e3:.1f} = "
            f"{(t_fcn+t_scan)*1e3:.1f} vs full {t_full*1e3:.1f} ms", flush=True,
        )


if __name__ == "__main__":
    main()
