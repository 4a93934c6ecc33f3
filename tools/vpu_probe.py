#!/usr/bin/env python
"""Probe VPU throughput + Mosaic op support for the fused-tail kernel design.

Measures chained vreg-FMA throughput on (R, C, W)-layout blocks (classes on
sublanes) and compiles/runs the exact op patterns the refine-tail kernel
needs: sublane-dim reduce (softmax), sublane-slice broadcast, lane shifts via
concat, per-channel (C,1) broadcasts.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, W = 36, 11, 240
NH = 5
B = 32


def timed(f, args, label, iters=30):
    out = jax.device_get(f(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        s = jnp.sum(f(*args)[0, 0].astype(jnp.float32))
        acc = s if acc is None else acc + s
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / iters
    print(f"{label:<52s} {per * 1e3:8.3f} ms/iter {per / B * 1e3:8.4f} ms/img-eq", flush=True)
    return out


def fma_kernel(x_ref, w_ref, o_ref, *, n_fma):
    x = x_ref[:].astype(jnp.float32)
    acc = x
    for i in range(n_fma):
        acc = acc + x * w_ref[i % 8, 0]
    o_ref[:] = acc.astype(x_ref.dtype)


def make_fma(n_fma, dtype):
    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            functools.partial(fma_kernel, n_fma=n_fma),
            out_shape=jax.ShapeDtypeStruct((B * NH, R, C, W), dtype),
            grid=(B * NH,),
            in_specs=[
                pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )(x, w)

    return f


def pattern_kernel(x_ref, k_ref, o_ref):
    """All the op patterns the tail kernel needs, in one kernel."""
    x = x_ref[0].astype(jnp.float32)  # (R, C, W)
    # per-channel broadcast: (C, 1) against (R, C, W)
    kc = k_ref[0]  # (C, 1) f32
    a = x * kc
    # lane shift via concat (u-1 and u+1 with zero edges)
    zeros = jnp.zeros((R, C, 1), jnp.float32)
    left = jnp.concatenate([zeros, a[:, :, :-1]], axis=2)
    right = jnp.concatenate([a[:, :, 1:], zeros], axis=2)
    # row shift (untiled dim)
    up = jnp.concatenate([a[1:], jnp.zeros((1, C, W), jnp.float32)], axis=0)
    s = a + 0.5 * left + 0.25 * right + 0.125 * up
    # sublane-slice broadcast: one channel against all
    s = s + s[:, 3:4, :] * 0.01
    # softmax over the sublane (class) dim
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    r = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = r.astype(o_ref.dtype)


def run_patterns(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, R, C, W), dtype)
    k = jnp.linspace(0.5, 1.5, C, dtype=jnp.float32).reshape(1, C, 1)

    @jax.jit
    def f(x, k):
        return pl.pallas_call(
            pattern_kernel,
            out_shape=jax.ShapeDtypeStruct((B, R, C, W), dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )(x, k)

    try:
        out = timed(f, (x, k), f"pattern kernel ({dtype.__name__})")
        print(f"  patterns OK, sum-to-one err {abs(np.asarray(out, np.float32).sum(2).mean() - 1):.2e}"
              if False else "  patterns OK", flush=True)
    except Exception as e:
        print(f"  pattern kernel FAILED ({dtype.__name__}): {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    w = jnp.linspace(0.9, 1.1, 8, dtype=jnp.float32).reshape(8, 1)
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jax.random.normal(jax.random.PRNGKey(0), (B * NH, R, C, W), dtype)
        base = None
        for n in (2, 26, 50):
            f = make_fma(n, dtype)
            try:
                jax.device_get(f(x, w))
            except Exception as e:
                print(f"fma n={n} {dtype.__name__} FAILED: {str(e)[:200]}", flush=True)
                continue
            t0 = time.perf_counter()
            acc = None
            for _ in range(30):
                s = jnp.sum(f(x, w)[0, 0].astype(jnp.float32))
                acc = s if acc is None else acc + s
            jax.device_get(acc)
            per = (time.perf_counter() - t0) / 30
            print(f"fma chain n={n:3d} {dtype.__name__:9s} {per * 1e3:8.3f} ms/iter", flush=True)
            if base is None:
                base = (n, per)
            else:
                dn = n - base[0]
                dt = per - base[1]
                vregs = B * NH * R * ((C + 15) // 16 * 16 if dtype == jnp.bfloat16 else (C + 7) // 8 * 8) * (
                    (W + 127) // 128 * 128
                ) / (1024 if dtype == jnp.float32 else 2048)
                # vreg-FMAs per marginal op = blocks * vregs-per-block
                rate = dn * vregs / dt / 1e9 if dt > 0 else float("inf")
                print(f"   marginal: {dt / dn * 1e6 / (B * NH):8.3f} us/pass/block  ~{rate:.1f} Gvreg-FMA/s", flush=True)
    run_patterns(jnp.bfloat16)
    run_patterns(jnp.float32)


if __name__ == "__main__":
    main()
