"""Pallas TPU kernels for the hot fused ops (north star, BASELINE.json:5).

The reference's native tier is Theano-generated CUDA + cuDNN (SURVEY.md
§3.3); on TPU, XLA already saturates the MXU for the dense convs, so Pallas
is applied where *fusion* wins: ops that would otherwise materialize
intermediates in HBM (one-hot maps, noise tensors, softmax logits).
"""

from iterative_inference_segm_tpu.ops.pallas.corruption_kernel import (
    corrupt_onehot_pallas,
    corrupt_probs_pallas,
)
