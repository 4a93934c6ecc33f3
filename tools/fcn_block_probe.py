#!/usr/bin/env python
"""Per-block FCN-8 timing: truncate the forward after each stage."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.models.fcn8 import _VGG, init_fcn8
from iterative_inference_segm_tpu.ops.conv import conv2d, max_pool

B, H, W = 32, 360, 480
ITERS = 10


def timed(f, args, label):
    jf = jax.jit(f)
    jax.device_get(jf(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(ITERS):
        s = jf(*args)
        acc = s if acc is None else acc + s
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / ITERS
    print(f"{label:<28s} {per * 1e3:8.2f} ms/iter  {per / B * 1e3:6.2f} ms/img", flush=True)
    return per


def main():
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=11)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)

    def prefix_fn(n_stages):
        def f(params, x):
            h = x.astype(jnp.bfloat16)
            pool = 0
            for item in _VGG[:n_stages]:
                if item == "P":
                    pool += 1
                    h = max_pool(h)
                else:
                    p = params[item[0]]
                    h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
            return jnp.sum(h.astype(jnp.float32)[..., 0])
        return f

    marks = {3: "block1", 6: "block2", 10: "block3", 14: "block4", 18: "block5"}
    prev = 0.0
    for n, name in marks.items():
        t = timed(prefix_fn(n), (params, x), f"through {name}")
        print(f"    delta {name}: {(t - prev) * 1e3:.2f} ms/iter", flush=True)
        prev = t

    def with_fc(params, x):
        h = x.astype(jnp.bfloat16)
        for item in _VGG:
            if item == "P":
                h = max_pool(h)
            else:
                p = params[item[0]]
                h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        p = params["fc6"]
        h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        p = params["fc7"]
        h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
        return jnp.sum(h.astype(jnp.float32)[..., 0])

    t = timed(with_fc, (params, x), "through fc7")
    print(f"    delta fc6+fc7: {(t - prev) * 1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
