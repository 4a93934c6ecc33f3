#!/usr/bin/env python
"""End-to-end SERVING throughput: packed dataset -> native C++ input runtime
-> host->device transfer -> flagship refinement pipeline, sustained.

``bench.py`` measures on-device compute with a device-resident batch (the
driver metric). This tool measures the FULL serving path the framework ships
(SURVEY.md §4.5 — the reference's equivalent is the ``dataset_loaders``
threaded prefetch feeding per-batch ``theano.function`` calls):

    mmap'd IIST1 file -> native decode/normalize worker threads
    (native/input_runtime.cc) -> ``device_prefetch`` (data/prefetch.py)
    -> jitted FCN-8 + K-step half-engine refinement -> on-device accumulator.

Two wire modes are measured (``NativeDataset.batches(raw=...)``):
  f32  host normalizes; f32 images + i32 labels cross the link (the
       reference's layout — dataset_loaders ships normalized float batches)
  u8   raw uint8 bytes cross the link (4x fewer); normalize_image(
       input_scale=255) runs inside the jitted pipeline on-device — the
       TPU-first layout

Reported stages (img/s):
  producer   native C++ batch production alone (no device work) — host ceiling
  transfer   device_put alone (host->device path; through the axon relay this
             measures the TUNNEL, on a real deployment it is PCIe/DMA)
  compute    device compute alone, batch resident (bench.py's quantity)
  e2e        the full overlapped pipeline over the whole dataset

All timings sync by ONE jax.device_get of a chained on-device accumulator
(block_until_ready does not block through the relay — CLAUDE.md).

Usage: python tools/serve_bench.py [--batch 128] [--num-batches 6] [...]

Keep --num-batches >= 4 for quotable numbers: with fewer, fixed per-epoch
costs (worker spawn, first-touch faults, relay queue pauses) dominate every
stage and the readings are overhead, not throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--num-batches", type=int, default=6)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--epochs", type=int, default=3, help="timed passes over the dataset")
    p.add_argument("--n-threads", type=int, default=8)
    p.add_argument("--prefetch-depth", type=int, default=2)
    p.add_argument("--wire", choices=["f32", "u8", "both"], default="both")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from iterative_inference_segm_tpu.data.config_datasets import CAMVID
    from iterative_inference_segm_tpu.data.native_loader import NativeDataset, pack_dataset
    from iterative_inference_segm_tpu.data.pipeline import normalize_image
    from iterative_inference_segm_tpu.data.prefetch import device_prefetch
    from iterative_inference_segm_tpu.inference.fused import flagship_forward_fn
    from iterative_inference_segm_tpu.models import init_fcn8
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS, init_dae

    B, H, W = args.batch, args.height, args.width
    n = B * args.num_batches
    cfg = CAMVID

    # --- pack a synthetic CamVid-shaped dataset (uint8 images + labels) ---
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n, H, W, 3), np.uint8)
    labels = rng.integers(0, cfg.n_classes, (n, H, W)).astype(np.int32)
    tmp = tempfile.NamedTemporaryFile(suffix=".iist", delete=False)
    path = tmp.name
    tmp.close()
    t0 = time.perf_counter()
    pack_dataset(path, images, labels, cfg)
    print(f"packed {n} images ({os.path.getsize(path) / 1e6:.0f} MB) "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)
    del images, labels

    ds = NativeDataset(path)
    try:

        def epoch_batches(raw: bool):
            return ds.batches(
                B, shuffle=False, drop_last=True, n_threads=args.n_threads, raw=raw
            )

        # --- flagship pipeline (parity config: fc4096, pool encoder, stem1/d3,
        #     folded tail — the bench.py default) ---
        n_classes = cfg.n_classes
        fcn_params = init_fcn8(jax.random.PRNGKey(0), n_classes=n_classes)
        dae_params = init_dae(
            jax.random.PRNGKey(1), n_classes=n_classes,
            h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1,
        )
        # the ONE shared pipeline definition (inference/fused.py) — identical to
        # what bench.py's default run and __graft_entry__.entry() measure
        flagship = flagship_forward_fn(num_steps=args.steps, depth=3)

        def refine(fcn_params, dae_params, x):
            _, y_k = flagship(fcn_params, dae_params, x)
            return jnp.sum(jnp.argmax(y_k, axis=-1), dtype=jnp.int32)

        @jax.jit
        def pipeline_f32(fcn_params, dae_params, x):
            return refine(fcn_params, dae_params, x)

        @jax.jit
        def pipeline_u8(fcn_params, dae_params, x_u8):
            # the u8 wire mode's on-device ingest: bytes -> normalized f32
            x = normalize_image(x_u8, cfg, input_scale=255.0)
            return refine(fcn_params, dae_params, x)

        # compile + warm both
        jax.device_get(pipeline_f32(fcn_params, dae_params, jnp.zeros((B, H, W, 3), jnp.float32)))
        jax.device_get(pipeline_u8(fcn_params, dae_params, jnp.zeros((B, H, W, 3), jnp.uint8)))

        results = {}
        modes = ["f32", "u8"] if args.wire == "both" else [args.wire]

        # --- compute alone, batch resident (bench.py's quantity; f32 ingest) ---
        xr = jax.device_put(
            np.ascontiguousarray(next(iter(epoch_batches(raw=False)))[0])
        )
        jax.device_get(pipeline_f32(fcn_params, dae_params, xr))
        t0 = time.perf_counter()
        acc = None
        iters = max(args.num_batches * args.epochs, 8)
        for _ in range(iters):
            s = pipeline_f32(fcn_params, dae_params, xr)
            acc = s if acc is None else acc + s
        jax.device_get(acc)
        results["compute"] = iters * B / (time.perf_counter() - t0)
        print(f"compute (resident batch): {results['compute']:.1f} img/s", flush=True)
        del xr

        for mode in modes:
            raw = mode == "u8"
            pipeline = pipeline_u8 if raw else pipeline_f32

            # --- native producer alone ---
            for rep in range(2):  # rep 0 warms the page cache
                t0 = time.perf_counter()
                nb = 0
                for _img, _lab in epoch_batches(raw):
                    nb += 1
                dt = time.perf_counter() - t0
            results[f"producer_{mode}"] = nb * B / dt
            print(f"[{mode}] producer (native C++ x{args.n_threads} threads): "
                  f"{results[f'producer_{mode}']:.1f} img/s", flush=True)

            # --- transfer alone (device_put each batch, tiny reduce) ---
            tiny = jax.jit(lambda x: jnp.sum(x[0, 0, 0]).astype(jnp.float32))
            host_batches = [img.copy() for img, _ in epoch_batches(raw)]
            jax.device_get(tiny(jax.device_put(host_batches[0])))
            t0 = time.perf_counter()
            acc = None
            for img in host_batches:
                s = tiny(jax.device_put(img))
                acc = s if acc is None else acc + s
            jax.device_get(acc)
            dt = time.perf_counter() - t0
            results[f"transfer_{mode}"] = len(host_batches) * B / dt
            gbs = len(host_batches) * host_batches[0].nbytes / dt / 1e9
            print(f"[{mode}] transfer (device_put): "
                  f"{results[f'transfer_{mode}']:.1f} img/s ({gbs:.2f} GB/s)", flush=True)
            del host_batches

            # --- full overlapped e2e serving ---
            best = 0.0
            for _ in range(args.epochs):
                t0 = time.perf_counter()
                acc = None
                nb = 0
                for img, _ in device_prefetch(epoch_batches(raw), depth=args.prefetch_depth):
                    s = pipeline(fcn_params, dae_params, img)
                    acc = s if acc is None else acc + s
                    nb += 1
                jax.device_get(acc)
                dt = time.perf_counter() - t0
                best = max(best, nb * B / dt)
            results[f"e2e_{mode}"] = best
            print(f"[{mode}] e2e serving (native -> prefetch -> pipeline): "
                  f"{best:.1f} img/s", flush=True)

        results = {k: round(v, 1) for k, v in results.items()}
        print(json.dumps(results))
        return 0
    finally:
        # always reclaim the synthetic .iist, even if the bench body raises
        ds.close()
        os.unlink(path)


if __name__ == "__main__":
    sys.exit(main())
