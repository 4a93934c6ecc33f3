"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference is single-GPU (SURVEY.md §3.4), so this axis — like SP and TP
— is a rebuild extension: the fourth parallelism axis the framework ships
(DP/SP/TP/PP). It targets the deployment where the FCN-8 + DAE pair does
not fit (or should not sit) on one chip: each pipeline stage holds one
contiguous slice of the network, microbatches stream through the stages,
and inter-stage activations ride ICI via ``lax.ppermute``.

TPU-native formulation — no NCCL send/recv loops, no per-stage processes:

* ONE SPMD program over a ``'stage'`` mesh axis (``jax.shard_map``). Each
  device picks its stage's computation with ``lax.switch`` on
  ``lax.axis_index('stage')`` (heterogeneous stages) or by slicing its own
  shard of stage-stacked params (``make_gpipe_stacked`` — homogeneous
  stages, true per-stage parameter residency).
* The GPipe schedule is a single ``lax.scan`` over T = M + S - 1 ticks
  (M microbatches, S stages). Per tick every stage runs once and hands its
  output wire to the next stage with one ``ppermute`` — the classic bubble
  of (S-1)/T idle ticks, amortized by M.
* The backward pass needs no second schedule: ``jax.grad`` of the whole
  pipelined function reverse-pipelines automatically, because the
  transpose of ``ppermute`` is the inverse ``ppermute`` and the transpose
  of ``lax.scan`` runs ticks backwards. Training through a pipeline is
  ``jax.grad(pipeline_loss)`` — tested equal to the sequential gradient in
  tests/test_pp.py.
* Emitted results stay sharded: the last stage's outputs are returned via
  an ``out_specs`` entry over the stage axis, so collecting them costs no
  collective (callers slice the last stage's shard).

Wire-format contract: every stage consumes and produces the SAME pytree
structure/shapes (the "wire") — SPMD programs cannot permute
shape-heterogeneous buffers. Heterogeneous boundaries are expressed as a
superset wire (unused fields pass through as zeros); the flagship split
below carries {image, y0, h-taps, yK} and each stage fills its part. The
passthrough fields cost ppermute bandwidth — acceptable here because the
wire is dominated by the class maps, and ICI is not the bottleneck at
CNN activation sizes.

Composes with DP: build the mesh with both axes, e.g.
``make_mesh(('data', 'stage'), (2, 2))``, pass ``batch_axis='data'``, and
shard the microbatch batch dim over 'data' as usual.

Reference semantics: none to mirror — ``[ref: SURVEY.md §3.4]`` records the
reference has no multi-device path at all; the pipeline split of the
flagship (FCN-8 forward | K-step pooled refinement + rectification) follows
the model's own two-subnetwork structure (fcn8_build | buildDAE + the
iterative_inference loop, SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def split_microbatches(tree, num_microbatches: int):
    """Leaves (B, ...) -> (M, B/M, ...). B must divide evenly."""

    def split(a):
        b = a.shape[0]
        if b % num_microbatches:
            raise ValueError(
                f"batch {b} not divisible by num_microbatches {num_microbatches}"
            )
        return a.reshape((num_microbatches, b // num_microbatches) + a.shape[1:])

    return jax.tree.map(split, tree)


def merge_microbatches(tree):
    """Inverse of ``split_microbatches``: (M, Bm, ...) -> (M*Bm, ...)."""
    return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), tree)


def _wire_specs(wires, batch_axis: str | None, *, stage_axis: str | None = None):
    """Per-leaf PartitionSpecs for (M, Bm, ...) wire leaves.

    Input wires: ``P(None, batch_axis)`` (microbatch dim unsharded, the
    per-microbatch batch dim over the DP axis when composing). With
    ``stage_axis`` set, specs for the EMITTED stream — one extra leading
    singleton stage dim over the pipeline axis: ``P(stage, None, batch)``.
    """

    def spec(a):
        if jnp.ndim(a) < 2:
            raise ValueError(
                f"wire leaves need a (microbatch, batch, ...) layout; got rank {jnp.ndim(a)}"
            )
        if stage_axis is None:
            return P(None, batch_axis)
        return P(stage_axis, None, batch_axis)

    return jax.tree.map(spec, wires)


def _gpipe_spmd(
    run_stage: Callable,
    wires,
    *,
    stage_axis: str,
    num_stages: int,
    num_microbatches: int,
):
    """The per-device GPipe schedule (runs inside shard_map).

    ``run_stage(wire) -> wire`` already dispatches on this device's stage
    (switch or local-params closure). ``wires``: (M, Bm, ...) leaves.
    Returns the per-device emit stream with a leading singleton stage dim,
    (1, T, Bm, ...), for an out_spec over ``stage_axis``.
    """
    s = num_stages
    m = num_microbatches
    t_total = m + s - 1
    idx = lax.axis_index(stage_axis)

    def pad(a):
        if t_total == m:
            return a
        z = jnp.zeros((t_total - m,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, z], axis=0)

    stream = jax.tree.map(pad, wires)
    zero_wire = jax.tree.map(lambda a: jnp.zeros(a.shape[1:], a.dtype), wires)

    perm = [(i, i + 1) for i in range(s - 1)]

    def tick(carry, inp):
        # stage 0 reads the next microbatch from the stream; every other
        # stage reads the wire ppermuted from its predecessor last tick
        wire_in = jax.tree.map(
            lambda a, b: jnp.where(idx == 0, a, b), inp, carry
        )
        out = run_stage(wire_in)
        if perm:
            nxt = jax.tree.map(lambda a: lax.ppermute(a, stage_axis, perm), out)
        else:
            nxt = out
        return nxt, out

    _, emits = lax.scan(tick, zero_wire, stream)
    return jax.tree.map(lambda a: a[None], emits)


def _collect_last_stage(stacked, *, num_stages: int, num_microbatches: int):
    """(S, T, Bm, ...) -> the last stage's M valid emits (ticks S-1..T-1)."""
    s = num_stages
    return jax.tree.map(
        lambda a: a[s - 1, s - 1 : s - 1 + num_microbatches], stacked
    )


def make_gpipe(
    stage_fns: Sequence[Callable],
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    batch_axis: str | None = None,
) -> Callable:
    """Heterogeneous-stage pipeline: ``pipeline(stage_params, wires) -> wires``.

    ``stage_fns[i](stage_params[i], wire) -> wire`` — all stages share the
    wire pytree format. ``stage_params`` is a tuple of per-stage pytrees,
    replicated across the mesh (``lax.switch`` traces every branch on every
    device, so heterogeneous params cannot be stage-resident; use
    ``make_gpipe_stacked`` for homogeneous stages when per-stage parameter
    residency is the point). ``wires`` leaves are (M, Bm, ...), the
    microbatch batch dim optionally sharded over ``batch_axis`` (DP×PP).
    Returns wires of the same layout holding the last stage's outputs.
    """
    num_stages = mesh.shape[stage_axis]
    if len(stage_fns) != num_stages:
        raise ValueError(
            f"{len(stage_fns)} stage fns for a {num_stages}-wide '{stage_axis}' axis"
        )

    def pipeline(stage_params, wires):
        m = jax.tree.leaves(wires)[0].shape[0]

        def spmd(stage_params, wires):
            def run_stage(wire):
                branches = [
                    lambda w, i=i: stage_fns[i](stage_params[i], w)
                    for i in range(num_stages)
                ]
                return lax.switch(lax.axis_index(stage_axis), branches, wire)

            return _gpipe_spmd(
                run_stage,
                wires,
                stage_axis=stage_axis,
                num_stages=num_stages,
                num_microbatches=m,
            )

        stacked = shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(), _wire_specs(wires, batch_axis)),
            out_specs=_wire_specs(wires, batch_axis, stage_axis=stage_axis),
            check_vma=False,
        )(stage_params, wires)
        return _collect_last_stage(
            stacked, num_stages=num_stages, num_microbatches=m
        )

    return pipeline


def make_gpipe_stacked(
    stage_fn: Callable,
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    batch_axis: str | None = None,
) -> Callable:
    """Homogeneous-stage pipeline with per-stage parameter residency.

    ``stage_fn(params_i, wire) -> wire`` is ONE function; ``stage_params``
    leaves carry a leading stage dim (S, ...) and are sharded over
    ``stage_axis`` — each device materializes only its own stage's slice
    (the memory split that makes PP worth running: a model too big for one
    chip's HBM lives S-ways sharded). The scan-over-layers dual: where
    ``lax.scan`` runs stacked layers in time on one chip, this runs them in
    space across chips with microbatches in flight.
    """
    num_stages = mesh.shape[stage_axis]

    def pipeline(stage_params, wires):
        m = jax.tree.leaves(wires)[0].shape[0]
        for leaf in jax.tree.leaves(stage_params):
            if leaf.shape[0] != num_stages:
                raise ValueError(
                    f"stacked stage params need leading dim {num_stages}; got {leaf.shape}"
                )

        def spmd(stage_params, wires):
            local = jax.tree.map(lambda a: a[0], stage_params)

            def run_stage(wire):
                return stage_fn(local, wire)

            return _gpipe_spmd(
                run_stage,
                wires,
                stage_axis=stage_axis,
                num_stages=num_stages,
                num_microbatches=m,
            )

        stacked = shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(stage_axis), _wire_specs(wires, batch_axis)),
            out_specs=_wire_specs(wires, batch_axis, stage_axis=stage_axis),
            check_vma=False,
        )(stage_params, wires)
        return _collect_last_stage(
            stacked, num_stages=num_stages, num_microbatches=m
        )

    return pipeline


def make_pp_flagship(
    mesh: Mesh,
    *,
    eps: float,
    num_steps: int,
    h_taps: tuple[str, ...] = ("pool4",),
    depth: int = 3,
    compute_dtype=jnp.bfloat16,
    state_dtype=None,
    encoder: str = "pool",
    mode: str = "score",
    fold_tail: bool | None = None,
    stage_axis: str = "stage",
    batch_axis: str | None = None,
    fcn_apply: Callable | None = None,
) -> Callable:
    """The flagship pipeline split 2-ways: FCN-8 forward | pooled refinement.

    Stage 0 runs the FCN-8 forward (class probabilities + conditioning
    taps); stage 1 runs the K-step pooled-scale refinement and the full-res
    rectification via the SAME ``halfres_refine`` path every other surface
    uses (inference/fused.py) — the pipelined numerics are the sequential
    flagship's numerics by construction (tested in tests/test_pp.py).

    Returns ``forward(fcn_params, dae_params, images) -> (y0, y_k)`` where
    ``images`` is (M, Bm, H, W, 3) — microbatches streaming through the two
    stages (``split_microbatches`` to build). The ``stage_axis`` mesh axis
    must have size 2 (the model's natural two-subnetwork split); compose
    with DP over ``batch_axis``.
    """
    if mesh.shape[stage_axis] != 2:
        raise ValueError(
            f"the flagship pipeline has 2 stages; mesh axis '{stage_axis}' "
            f"has size {mesh.shape[stage_axis]}"
        )
    if fcn_apply is None:
        from iterative_inference_segm_tpu.models.fcn8 import fcn8_apply as fcn_apply

    from iterative_inference_segm_tpu.inference.fused import halfres_refine

    probs_dtype = state_dtype or compute_dtype

    def stage0(fcn_params, wire):
        y0, h = fcn_apply(
            fcn_params,
            wire["x"],
            return_features=h_taps,
            compute_dtype=compute_dtype,
            probs_dtype=probs_dtype,
        )
        return {**wire, "y0": y0, "h": h}

    def stage1(dae_params, wire):
        in_hw = (wire["x"].shape[1], wire["x"].shape[2])
        y_k = halfres_refine(
            dae_params,
            wire["y0"],
            wire["h"],
            in_hw,
            eps=eps,
            num_steps=num_steps,
            depth=depth,
            compute_dtype=compute_dtype,
            state_dtype=state_dtype,
            encoder=encoder,
            mode=mode,
            fold_tail=fold_tail,
        )
        return {**wire, "yk": y_k}

    pipeline = make_gpipe(
        (stage0, stage1), mesh, stage_axis=stage_axis, batch_axis=batch_axis
    )

    def forward(fcn_params, dae_params, images):
        if images.ndim != 5:
            raise ValueError(
                f"images must be (M, Bm, H, W, 3) microbatches; got {images.shape}"
            )
        mb = images[0]
        y0_s, h_s = jax.eval_shape(
            lambda p, x: fcn_apply(
                p,
                x,
                return_features=h_taps,
                compute_dtype=compute_dtype,
                probs_dtype=probs_dtype,
            ),
            fcn_params,
            mb,
        )
        m = images.shape[0]

        def zeros_mb(s):
            return jnp.zeros((m,) + s.shape, s.dtype)

        wires = {
            "x": images,
            "y0": zeros_mb(y0_s),
            "h": jax.tree.map(zeros_mb, h_s),
            "yk": zeros_mb(y0_s),
        }
        out = pipeline((fcn_params, dae_params), wires)
        return out["y0"], out["yk"]

    return forward
