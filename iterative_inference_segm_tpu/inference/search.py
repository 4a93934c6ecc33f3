"""(eps, K) hyperparameter search on the validation split.

Rebuild of ``[ref: iterative_inference_valid.py]`` (SURVEY.md §4.4): grid
search over step size eps and step count K on the validation set; the best
pair is then used on test.

TPU-first: instead of re-running the loop per (eps, K) pair like the
reference, we run ONE K_max-step trajectory per eps (``refine_with_trajectory``)
and score every prefix K <= K_max from the stacked iterates — scoring all K
values costs one run. eps is a traced scalar, so all eps values share a
single compiled program.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iterative_inference_segm_tpu.inference.iterative import refine_with_trajectory
from iterative_inference_segm_tpu.ops.metrics import confusion_matrix, metrics_from_confusion


def grid_search_eps_k(
    fcn_apply: Callable,
    dae_apply: Callable,
    fcn_params,
    dae_params,
    batches: Iterable[tuple[np.ndarray, np.ndarray]],
    *,
    n_classes: int,
    eps_grid: Sequence[float],
    k_max: int,
    h_taps: tuple[str, ...] = ("pool4",),
    mode: str = "score",
    renorm: str = "none",
    dae_kwargs: dict | None = None,
) -> dict:
    """Evaluate mIoU for every (eps in eps_grid, K in 0..k_max) on ``batches``.

    Returns {'best_eps', 'best_k', 'best_miou', 'miou': (n_eps, k_max+1) array}.
    ``batches`` yields (images NHWC, labels BHW); it is re-iterated per eps,
    so pass a list (validation sets are small: CamVid val = 101 images).
    """
    batches = list(batches)
    dae_kwargs = dict(dae_kwargs or {})

    @jax.jit
    def trajectory_cms(eps: jax.Array, x: jax.Array, labels: jax.Array) -> jax.Array:
        y0, h = fcn_apply(fcn_params, x, return_features=h_taps)
        dae_fn = lambda y: dae_apply(dae_params, y, h, **dae_kwargs)
        traj = refine_with_trajectory(
            dae_fn, y0, eps=eps, num_steps=k_max, mode=mode, renorm=renorm
        )
        preds = jnp.argmax(traj, axis=-1)  # (K+1, B, H, W)
        return jax.vmap(
            lambda p: confusion_matrix(p, labels, n_classes=n_classes)
        )(preds)  # (K+1, C, C)

    miou = np.zeros((len(eps_grid), k_max + 1), dtype=np.float64)
    for ei, eps in enumerate(eps_grid):
        cms = None
        for x, labels in batches:
            c = trajectory_cms(jnp.asarray(eps, jnp.float32), jnp.asarray(x), jnp.asarray(labels))
            cms = c if cms is None else cms + c
        cms = jax.device_get(cms)
        for k in range(k_max + 1):
            miou[ei, k] = float(metrics_from_confusion(jnp.asarray(cms[k])).mean_iou)

    best_flat = int(np.argmax(miou))
    best_ei, best_k = divmod(best_flat, k_max + 1)
    return {
        "best_eps": float(eps_grid[best_ei]),
        "best_k": int(best_k),
        "best_miou": float(miou[best_ei, best_k]),
        "miou": miou,
    }
