#!/usr/bin/env python
"""Decompose fused vs NHWC refinement-step costs with relay-proof timing.

Methodology: every candidate fn runs LOOP times inside ONE jitted fori_loop
(single dispatch, single device_get). Cross-iteration CSE is defeated by
perturbing the input with acc*1e-38 each iteration (one extra elementwise
pass, uniform across all rows — subtract the 'baseline' row to compare).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from iterative_inference_segm_tpu.inference.fused import septail_phase_logits

B, C, Hh, Wh = 128, 11, 180, 240
LOOP = 10


def timed(fn, x, extra, label):
    """fn(x_perturbed, *extra) -> scalar f32; x is the perturbation carrier."""

    @jax.jit
    def run(x, extra):
        def body(i, acc):
            xp = x + (acc * jnp.float32(1e-38)).astype(x.dtype)
            return acc + fn(xp, *extra)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jax.device_get(run(x, extra))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(x, extra))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<54s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def red(v):
    return jnp.sum(v.astype(jnp.float32))


def main():
    from iterative_inference_segm_tpu.models.dae import init_dae, DAE_H_CHANNELS, dae_core
    from iterative_inference_segm_tpu.ops.conv import conv2d, conv_transpose2d, avg_pool

    dt = jnp.bfloat16
    params = init_dae(jax.random.PRNGKey(0), n_classes=C,
                      h_specs={"pool4": DAE_H_CHANNELS["pool4"]},
                      depth=3, stem_pool=1, tail="sep")
    params_full = init_dae(jax.random.PRNGKey(0), n_classes=C,
                           h_specs={"pool4": DAE_H_CHANNELS["pool4"]},
                           depth=3, stem_pool=1, tail="full")
    tail_p = {k: params[k] for k in ("up_stem_dw", "score_input_dw", "mix")}
    tail_p = jax.tree.map(lambda a: a.astype(dt), tail_p)

    y_ph = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (B, 2, 2, C, Hh, Wh)), 3
    ).astype(dt)
    s_cl = jax.random.normal(jax.random.PRNGKey(2), (B, C, Hh, Wh), dt)
    y_nhwc = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (B, 2 * Hh, 2 * Wh, C)), -1
    ).astype(dt)
    s_nhwc = jax.random.normal(jax.random.PRNGKey(2), (B, Hh, Wh, C), dt)

    # baseline: the perturb-add + reduce alone (subtract from everything)
    timed(lambda y: red(y), y_ph, (), "baseline: perturb+reduce phase state")
    timed(lambda y: red(y), y_nhwc, (), "baseline: perturb+reduce NHWC state")

    timed(lambda y, s, p: red(septail_phase_logits(p, s, y)), y_ph, (s_cl, tail_p),
          "phase septail logits")

    def phase_tail_full(y, s, p):
        logits = septail_phase_logits(p, s, y).astype(jnp.float32)
        r = jax.nn.softmax(logits, 3).astype(dt)
        y_new = y - jnp.bfloat16(0.1) * (y - r)
        pool = jnp.mean(y_new.astype(jnp.float32), (1, 2)).astype(dt)
        return red(y_new) + red(jnp.transpose(pool, (0, 2, 3, 1)))

    timed(phase_tail_full, y_ph, (s_cl, tail_p), "phase tail+softmax+update+pool+T")

    # NHWC current flagship tail (full CxC), bf16 state
    w_up = params_full["up_stem1"]["w"].astype(dt)
    w_si = params_full["score_input"]["w"].astype(dt)
    b_si = params_full["score_input"]["b"].astype(dt)

    def nhwc_tail(y, s):
        u = conv_transpose2d(s, w_up, stride=2)
        r = jax.nn.softmax((u + conv2d(y, w_si, b_si)).astype(jnp.float32), -1).astype(dt)
        y_new = y - jnp.bfloat16(0.1) * (y - r)
        pool = avg_pool(y_new, window=2, stride=2)
        return red(y_new) + red(pool)

    timed(nhwc_tail, y_nhwc, (s_nhwc,), "NHWC tail full-CxC +update+pool (r1)")

    # NHWC septail (grouped convs)
    from iterative_inference_segm_tpu.models.dae import dae_septail_logits

    def nhwc_septail(y, s, p):
        logits = dae_septail_logits(p, s, y)
        r = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(dt)
        y_new = y - jnp.bfloat16(0.1) * (y - r)
        pool = avg_pool(y_new, window=2, stride=2)
        return red(y_new) + red(pool)

    timed(nhwc_septail, y_nhwc, (s_nhwc, tail_p), "NHWC septail grouped-conv +update+pool")

    # mid-res core alone (NHWC)
    h = {"pool4": jax.random.normal(jax.random.PRNGKey(3), (B, 23, 30, 512), dt)}
    yp_nhwc = jax.random.normal(jax.random.PRNGKey(4), (B, Hh, Wh, C), dt)
    timed(lambda yp, p, hh: red(dae_core(p, yp, hh, depth=3, stem_pool=1)),
          yp_nhwc, (params, h), "dae_core mid-res (NHWC)")

    # pure layout conversions
    timed(lambda y: red(jnp.mean(y.astype(jnp.float32), (1, 2))), y_ph, (),
          "phase pool only")
    timed(lambda s: red(jnp.transpose(s, (0, 3, 1, 2))), s_nhwc, (),
          "s NHWC -> CL transpose")


if __name__ == "__main__":
    main()
