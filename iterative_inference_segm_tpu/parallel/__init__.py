"""Parallelism: device meshes, shardings, data-parallel step transforms.

The reference is single-process single-GPU (SURVEY.md §3.4); the rebuild's
one first-class parallelism axis is data parallelism over a ``jax.sharding``
mesh, with gradient reductions compiled by XLA onto ICI. Optional spatial
(H/W) sharding is provided for the batched-refinement configs.
"""

from iterative_inference_segm_tpu.parallel.mesh import make_mesh, local_device_count
from iterative_inference_segm_tpu.parallel.sharding import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
