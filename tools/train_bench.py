#!/usr/bin/env python
"""Training-path roofline probe (VERDICT r3 missing #3): batch/crop sweep,
augmentation itemization, and train-step MXU% for both training workloads
(FCN-8 and DAE), CamVid shapes, on the real TPU.

Methodology (the ONLY sanctioned way to time through the relay — CLAUDE.md):
iterations are chained inside the timed region (params/opt_state of step i
feed step i+1 and the losses accumulate on-device), then ONE device_get.
Host-side per-step loops time dispatch, not execution — through this
relay ``block_until_ready`` does not block.

The sweep resolved ARCHITECTURE's old 135-170 vs 433-438 contradiction:
the hidden variable was measurement WARM-UP, not the program. The first
timed cell of every fresh process runs ~3-4x slow on this relay (one
warm-up execution does not clear it; the ramp takes a few seconds of
actual execution), so single-pass timings penalized whichever cell ran
first — 135-170 were cold first-cell readings, 433+ were warmed ones.
``timed()`` therefore takes best-of-3 chained loops (order-independent).
With warmed timing, in-graph augmentation (full 360x480 frames in,
normalize + random crop + flip on-chip) costs <2% vs pre-cropped inputs
at b64 (tools/aug_step_probe.py), and no materialization barrier helps.

FLOPs come from XLA's own cost model: the SAME train step is lowered and
compiled for CPU in a subprocess (the TPU relay does not expose
cost_analysis) at a small batch and scaled linearly — convolution/matmul
FLOPs are exactly linear in batch; the only batch-independent term is the
optimizer update (<1% of a VGG16 fwd+bwd at these shapes).
MXU% = flops / (seconds * 197e12)  [v5e bf16 peak, ARCHITECTURE convention].

Usage (real TPU):
    python tools/train_bench.py --batches 32,64,128 --crops 224
    python tools/train_bench.py --donate          # donation A/B, chained
    python tools/train_bench.py --isolate ...     # one subprocess per cell
Prints one JSON line per (workload, batch, crop, augment) cell.

--isolate exists because an OOM POISONS the process: once a cell exhausts
HBM, later cells in the same process can spuriously report
RESOURCE_EXHAUSTED too (the relay does not reliably reclaim after a failed
allocation burst). Sweeps that may cross the HBM boundary must run each
(batch, crop, augment) cell in its own process — --isolate does exactly
that, re-invoking this script per cell and streaming the JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FLOPS_PROBE_BATCH = 4
V5E_BF16_PEAK = 197e12


def build_steps(args, crop, *, augment: bool):
    """(step_fn, state, extra_args) per workload; shared by timing and the
    CPU flops probe so both lower the identical program."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from iterative_inference_segm_tpu.data.config_datasets import CAMVID
    from iterative_inference_segm_tpu.models import init_fcn8
    from iterative_inference_segm_tpu.models.dae import init_dae, DAE_H_CHANNELS
    from iterative_inference_segm_tpu.train.loop import TrainConfig, make_optimizer
    from iterative_inference_segm_tpu.train.train_fcn8 import make_fcn8_train_step
    from iterative_inference_segm_tpu.train.train_dae import make_dae_train_step

    cfg = dataclasses.replace(CAMVID, train_crop=(crop, crop))
    tcfg = TrainConfig(
        learning_rate=1e-3,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        remat=args.remat,
    )
    tx = make_optimizer(tcfg)
    return cfg, tcfg, tx, init_fcn8, init_dae, DAE_H_CHANNELS, \
        make_fcn8_train_step, make_dae_train_step


def make_cells(args, batch, crop, augment):
    """Returns [(label, step_fn, state, extra_args)] for the two workloads.

    With augment=True the step receives full 360x480 frames and crops/flips
    in-graph (the training-loop configuration); with augment=False it
    receives pre-cropped frames — the difference isolates the in-graph
    augmentation + full-frame-normalize cost.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    (cfg, tcfg, tx, init_fcn8, init_dae, DAE_H_CHANNELS,
     make_fcn8_train_step, make_dae_train_step) = build_steps(args, crop, augment=augment)

    h, w = (args.height, args.width) if augment else (crop, crop)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, h, w, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.n_classes, (batch, h, w)).astype(np.int32))

    cells = []
    fcn_params = init_fcn8(jax.random.PRNGKey(0), n_classes=cfg.n_classes)
    fcn_step, _ = make_fcn8_train_step(cfg, tcfg, tx, augment=augment)
    if args.donate:
        base_step = fcn_step  # bind BEFORE rebinding fcn_step (self-capture)
        fcn_step = jax.jit(
            lambda p, o, x, y, r: base_step(p, o, x, y, r), donate_argnums=(0, 1)
        )
    cells.append((
        "FCN-8", fcn_step, (fcn_params, tx.init(fcn_params)), (images, labels),
    ))

    if not args.donate:  # donation A/B only re-measures the FCN step
        dae_params = init_dae(
            jax.random.PRNGKey(1), n_classes=cfg.n_classes,
            h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1,
        )
        dae_step, _ = make_dae_train_step(
            cfg, tcfg, tx, h_taps=("pool4",), sigma=1.0, from_gt=True,
            dae_depth=3, augment=augment,
        )
        cells.append((
            "DAE(stem1,d3)",
            lambda p, o, f, im, lb, r: dae_step(p, o, f, im, lb, r),
            (dae_params, tx.init(dae_params)), (fcn_params, images, labels),
        ))
    return cells


def flops_probe(args):
    """Internal mode: force CPU, compile each cell at FLOPS_PROBE_BATCH,
    print {label: flops} as one JSON line."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    out = {}
    for crop in args.crops:
        for augment in _augment_settings(args):
            for label, step, state, extra in make_cells(args, FLOPS_PROBE_BATCH, crop, augment):
                params, opt_state = state
                lowered = jax.jit(step).lower(
                    params, opt_state, *extra, jax.random.PRNGKey(0)
                )
                fl = lowered.compile().cost_analysis()["flops"]
                out[f"{label}|{crop}|aug={int(augment)}"] = float(fl)
    print("FLOPS_JSON " + json.dumps(out), flush=True)


def _augment_settings(args):
    if args.donate or args.augment == "on":
        return [True]
    if args.augment == "off":
        return [False]
    return [True, False]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="32")
    p.add_argument("--crops", type=str, default="224")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--donate", action="store_true",
                   help="A/B buffer donation on the FCN step (chained timing)")
    p.add_argument("--no-flops", action="store_true",
                   help="skip the CPU cost-analysis subprocess (no MXU%%)")
    p.add_argument("--augment", choices=["both", "on", "off"], default="both",
                   help="which augmentation settings to sweep (donate forces 'on')")
    p.add_argument("--isolate", action="store_true",
                   help="run each (batch, crop, augment) cell in its own "
                        "subprocess — REQUIRED for sweeps that may OOM (see docstring)")
    p.add_argument("--no-history", action="store_true",
                   help="skip appending measurement lines to TRAIN_HISTORY.jsonl "
                        "(VERDICT r4 weak #2: sweeps must leave a durable artifact)")
    p.add_argument("--_flops-probe", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args()
    args.batches = [int(b) for b in args.batches.split(",")]
    args.crops = [int(c) for c in args.crops.split(",")]

    if getattr(args, "_flops_probe"):
        flops_probe(args)
        return

    if args.isolate:
        flops_env = dict(os.environ)
        if not args.no_flops:
            cmd = [sys.executable, os.path.abspath(__file__), "--_flops-probe",
                   "--crops", ",".join(map(str, args.crops)), "--dtype", args.dtype,
                   "--augment", args.augment,
                   "--height", str(args.height), "--width", str(args.width)]
            if args.remat:
                cmd.append("--remat")
            if args.donate:
                cmd.append("--donate")
            res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
            line = next((l for l in res.stdout.splitlines()
                         if l.startswith("FLOPS_JSON ")), None)
            if line is not None:
                flops_env["TRAIN_BENCH_FLOPS_JSON"] = json.dumps({
                    k: v / FLOPS_PROBE_BATCH
                    for k, v in json.loads(line[len("FLOPS_JSON "):]).items()
                })
        for crop in args.crops:
            for augment in _augment_settings(args):
                for batch in args.batches:
                    cmd = [sys.executable, os.path.abspath(__file__),
                           "--batches", str(batch), "--crops", str(crop),
                           "--augment", "on" if augment else "off",
                           "--iters", str(args.iters), "--dtype", args.dtype,
                           "--height", str(args.height), "--width", str(args.width)]
                    if args.remat:
                        cmd.append("--remat")
                    if args.donate:
                        cmd.append("--donate")
                    if args.no_flops:
                        cmd.append("--no-flops")
                    if args.no_history:
                        cmd.append("--no-history")
                    r = subprocess.run(cmd, timeout=3600, env=flops_env)
                    if r.returncode:
                        print(json.dumps({
                            "metric": f"cell FAILED (crop {crop}, batch={batch}, "
                                      f"augment={augment}, remat={args.remat})",
                            "value": None, "rc": r.returncode,
                        }), flush=True)
        return

    # an --isolate parent computes flops ONCE and hands them down via env
    flops_per_img = json.loads(os.environ.get("TRAIN_BENCH_FLOPS_JSON", "{}"))
    if not flops_per_img and not args.no_flops:
        cmd = [sys.executable, os.path.abspath(__file__), "--_flops-probe",
               "--crops", ",".join(map(str, args.crops)), "--dtype", args.dtype,
               "--augment", args.augment,
               "--height", str(args.height), "--width", str(args.width)]
        if args.remat:
            cmd.append("--remat")
        if args.donate:
            cmd.append("--donate")
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        line = next((l for l in res.stdout.splitlines() if l.startswith("FLOPS_JSON ")), None)
        if line is None:
            print(f"flops probe failed: {res.stderr[-500:]}", file=sys.stderr)
        else:
            flops_per_img = {
                k: v / FLOPS_PROBE_BATCH for k, v in json.loads(line[len("FLOPS_JSON "):]).items()
            }

    import jax

    def record(rec):
        # Durable artifact for every measured cell (VERDICT r4 weak #2: the
        # r4 sweep's numbers survived only in comments/commit messages).
        print(json.dumps(rec), flush=True)
        if not args.no_history:
            hist = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "TRAIN_HISTORY.jsonl",
            )
            with open(hist, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def timed(step_fn, state, extra_args, label, batch, crop, augment):
        # BEST-OF-3 repeats of the chained loop: the first seconds of TPU
        # execution in a fresh process run ~3-4x slow (a relay/chip ramp
        # measured 2026-08-18 — the first timed cell of EVERY process sat
        # at ~150-400 img/s while identical programs timed later in the
        # same process hit 1300+; one warm-up exec is NOT enough). A single
        # timing pass systematically penalizes whichever cell runs first —
        # this was the entire "augmentation is slow" artifact and the old
        # 135-170 vs 433-438 contradiction. min-of-3 is order-independent.
        params, opt_state = state
        out = step_fn(params, opt_state, *extra_args, jax.random.PRNGKey(0))  # compile
        jax.device_get(out[2])  # first exec done before the timed region
        # donated buffers invalidate the originals: chain from the outputs
        p_, o_ = (out[0], out[1]) if args.donate else (params, opt_state)
        per = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for i in range(args.iters):
                p_, o_, loss = step_fn(p_, o_, *extra_args, jax.random.fold_in(jax.random.PRNGKey(1), i))
                acc = loss if acc is None else acc + loss
            jax.device_get(acc)
            per = min(per, (time.perf_counter() - t0) / args.iters)
        rec = {
            "metric": f"train images/sec/chip ({label}, crop {crop}, {args.dtype}, "
                      f"batch={batch}, augment={augment}"
                      + (", donate" if args.donate else "")
                      + (", remat" if args.remat else "") + ")",
            "value": round(batch / per, 2),
            "unit": "images/sec/chip",
            "ms_per_img": round(1e3 * per / batch, 4),
        }
        key = f"{label}|{crop}|aug={int(augment)}"
        if key in flops_per_img:
            fl = flops_per_img[key]
            rec["gflops_per_img"] = round(fl / 1e9, 2)
            rec["mxu_pct"] = round(100.0 * fl * batch / (per * V5E_BF16_PEAK), 1)
        record(rec)

    for crop in args.crops:
        for augment in _augment_settings(args):
            for batch in args.batches:
                # OOM can fire at input device_put inside make_cells, not
                # just inside the step — cover the whole cell.
                try:
                    for label, step, state, extra in make_cells(args, batch, crop, augment):
                        timed(step, state, extra, label, batch, crop, augment)
                except jax.errors.JaxRuntimeError as e:
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    # HBM cell boundary is itself a measurement: record
                    # it and keep sweeping (remat moves the boundary)
                    record({
                        "metric": f"train OOM (crop {crop}, "
                                  f"{args.dtype}, batch={batch}, "
                                  f"augment={augment}, "
                                  f"remat={args.remat})",
                        "value": None, "unit": "images/sec/chip",
                        "oom": True,
                    })


if __name__ == "__main__":
    main()
