#!/usr/bin/env python
"""Compare refinement engines on the TPU at the bench config.

Variants: full-tail general engine (round-1 flagship), septail general
engine, septail phase-major fused engine (round-2 candidate). Params are
passed as jit ARGUMENTS (closures would bake ~0.5GB of weights into the
compile request and the axon relay rejects it with HTTP 413).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--depth", type=int, default=3)
    args = p.parse_args()

    from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply, init_dae, dae_apply
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS, dae_core
    from iterative_inference_segm_tpu.inference.iterative import refinement_scan
    from iterative_inference_segm_tpu.inference.fused import fused_refinement_scan

    B, H, W, C = args.batch, 360, 480, 11
    cd = jnp.bfloat16
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C)
    hs = {"pool4": DAE_H_CHANNELS["pool4"]}
    dae_full = init_dae(jax.random.PRNGKey(1), n_classes=C, h_specs=hs,
                        depth=args.depth, stem_pool=1, tail="full")
    dae_sep = init_dae(jax.random.PRNGKey(1), n_classes=C, h_specs=hs,
                       depth=args.depth, stem_pool=1, tail="sep")
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 3), jnp.float32)

    def general(fcn_p, dae_p, x):
        y0, h = fcn8_apply(fcn_p, x, return_features=("pool4",), compute_dtype=cd)
        dae_fn = lambda y: dae_apply(dae_p, y, h, depth=args.depth, compute_dtype=cd)
        yk = refinement_scan(dae_fn, y0, eps=0.1, num_steps=args.steps, mode="score")
        return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32)

    def fused(fcn_p, dae_p, x, state_dtype):
        y0, h = fcn8_apply(fcn_p, x, return_features=("pool4",), compute_dtype=cd)
        core_fn = lambda yp: dae_core(dae_p, yp.astype(cd), h, depth=args.depth, stem_pool=1)
        yk = fused_refinement_scan(dae_p, core_fn, y0, eps=0.1,
                                   num_steps=args.steps, state_dtype=state_dtype)
        return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32)

    def bench(fn, dae_p, label):
        jf = jax.jit(fn)
        jax.device_get(jf(fcn, dae_p, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                s = jf(fcn, dae_p, x)
                acc = s if acc is None else acc + s
            jax.device_get(acc)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{label:<44s} {best * 1e3:8.2f} ms/iter {best / B * 1e3:7.4f} ms/img "
              f"-> {B / best:7.1f} img/s", flush=True)

    K = args.steps
    bench(general, dae_full, f"full tail, general engine (K={K})")
    bench(general, dae_sep, f"sep tail, general engine (K={K})")
    bench(lambda f, d, x: fused(f, d, x, jnp.bfloat16), dae_sep, f"sep tail, FUSED bf16 state (K={K})")
    bench(lambda f, d, x: fused(f, d, x, jnp.float32), dae_sep, f"sep tail, FUSED f32 state (K={K})")


if __name__ == "__main__":
    main()
