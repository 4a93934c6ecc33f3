#!/usr/bin/env python
"""Pipeline-level probes: scan unroll, bf16 carry, and backbone block costs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

B, H, W, C = 128, 360, 480, 11


def timed(fn, args, label, iters=8):
    jf = jax.jit(fn)
    jax.device_get(jf(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = jf(*args)
            acc = s if acc is None else acc + s
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<52s} {best * 1e3:8.2f} ms/iter {best / B * 1e3:7.4f} ms/img", flush=True)
    return best


def main():
    from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply, init_dae, dae_apply
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS
    from iterative_inference_segm_tpu.inference.iterative import refinement_scan

    cd = jnp.bfloat16
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=C,
                   h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 3), jnp.float32)

    def pipe(fcn_p, dae_p, x, *, unroll=1, bf16_carry=False, steps=5):
        y0, h = fcn8_apply(fcn_p, x, return_features=("pool4",), compute_dtype=cd)
        out_dtype = cd if bf16_carry else jnp.float32
        dae_fn = lambda y: dae_apply(dae_p, y, h, depth=3, compute_dtype=cd, out_dtype=out_dtype)
        y0s = y0.astype(out_dtype)
        yk = refinement_scan(dae_fn, y0s, eps=jnp.asarray(0.1, out_dtype),
                             num_steps=steps, mode="score", unroll=unroll)
        return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32)

    import functools
    timed(functools.partial(pipe, unroll=1), (fcn, dae, x), "K=5 unroll=1 f32 carry (current)")
    timed(functools.partial(pipe, unroll=5), (fcn, dae, x), "K=5 unroll=5 f32 carry")
    timed(functools.partial(pipe, unroll=1, bf16_carry=True), (fcn, dae, x), "K=5 unroll=1 bf16 carry")
    timed(functools.partial(pipe, unroll=5, bf16_carry=True), (fcn, dae, x), "K=5 unroll=5 bf16 carry")

    # backbone block prefixes (differential): bf16
    from iterative_inference_segm_tpu.models.fcn8 import _VGG
    from iterative_inference_segm_tpu.ops.conv import conv2d, max_pool

    def prefix(n):
        def f(params, x):
            h = x.astype(cd)
            for item in _VGG[:n]:
                if item == "P":
                    h = max_pool(h, window=2, stride=2, ceil_mode=True)
                else:
                    p = params[item[0]]
                    h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
            return jnp.sum(h.astype(jnp.float32))
        return f

    marks = [(2, "conv1_1..1_2"), (3, "+pool1"), (5, "+conv2_x"), (9, "+conv3_x+pools"),
             (13, "+conv4_x"), (17, "+conv5_x+pool5")]
    prev = 0.0
    for n, lbl in marks:
        t = timed(prefix(n), (fcn, x), f"VGG prefix {n:2d} ({lbl})")
        print(f"    stage marginal: {(t - prev) / B * 1e3:7.4f} ms/img", flush=True)
        prev = t

    def fc_part(params, x):
        h = x.astype(cd)
        for item in _VGG:
            if item == "P":
                h = max_pool(h, window=2, stride=2, ceil_mode=True)
            else:
                p = params[item[0]]
                h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        p = params["fc6"]
        h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        p = params["fc7"]
        h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        return jnp.sum(h.astype(jnp.float32))

    t = timed(fc_part, (fcn, x), "VGG + fc6 + fc7")
    print(f"    fc6+fc7 marginal: {(t - prev) / B * 1e3:7.4f} ms/img", flush=True)


if __name__ == "__main__":
    main()
