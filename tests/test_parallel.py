"""Data-parallel tests on the faked 8-device CPU mesh (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply, init_dae, dae_apply
from iterative_inference_segm_tpu.models.fcn8 import fcn8_logits
from iterative_inference_segm_tpu.ops.losses import masked_crossentropy
from iterative_inference_segm_tpu.parallel import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)

C = 4


def test_make_mesh_all_devices(cpu_devices):
    mesh = make_mesh(("data",))
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_make_mesh_2d(cpu_devices):
    mesh = make_mesh(("data", "space"), (4, 2))
    assert mesh.devices.shape == (4, 2)


def test_shard_batch_puts_batch_axis(cpu_devices):
    mesh = make_mesh(("data",))
    x = np.zeros((8, 4, 4, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec in (P("data"), P("data", None, None, None))


def test_dp_forward_matches_single_device(cpu_devices):
    mesh = make_mesh(("data",))
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 64, 3))

    ref, _ = jax.jit(lambda p, xx: fcn8_apply(p, xx))(params, x)

    params_r = replicate(mesh, params)
    x_s = jax.device_put(x, batch_sharding(mesh, 4))
    out, _ = jax.jit(lambda p, xx: fcn8_apply(p, xx))(params_r, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_dp_gradients_match_single_device(cpu_devices):
    """Batch-sharded loss gradient == single-device gradient (XLA inserts the
    cross-device psum; this is the correctness contract of the DP path)."""
    mesh = make_mesh(("data",))
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 64, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8, 48, 64), 0, C)

    def loss_fn(p, xx, ll):
        return masked_crossentropy(fcn8_logits(p, xx), ll, n_classes=C)

    g_ref = jax.jit(jax.grad(loss_fn))(params, x, labels)

    params_r = replicate(mesh, params)
    x_s = jax.device_put(x, batch_sharding(mesh, 4))
    l_s = jax.device_put(labels, batch_sharding(mesh, 3))
    g_dp = jax.jit(jax.grad(loss_fn))(params_r, x_s, l_s)

    ref_leaves = jax.tree.leaves(g_ref)
    dp_leaves = jax.tree.leaves(g_dp)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5)


def test_dp_refinement_batch_sharded(cpu_devices):
    """Config 3/5-style batched refinement with the batch over the mesh."""
    from iterative_inference_segm_tpu.inference import make_refiner

    mesh = make_mesh(("data",))
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=C, h_specs={"pool4": 512})
    refine = make_refiner(
        fcn8_apply, dae_apply, replicate(mesh, fcn), replicate(mesh, dae),
        eps=0.1, num_steps=2, h_taps=("pool4",),
    )
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (8, 48, 64, 3)),
        batch_sharding(mesh, 4),
    )
    y0, yk = refine(x)
    assert yk.shape == (8, 48, 64, C)
    # output keeps the batch sharding (no accidental gather to one device)
    assert y0.sharding.spec in (P("data"), P("data", None, None, None))


def test_spatial_sharding_forward(cpu_devices):
    """Optional H-axis (spatial) sharding: forward must still be correct.
    XLA handles halo exchange for convs on sharded spatial dims."""
    mesh = make_mesh(("data", "space"), (4, 2))
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 64, 3))
    ref, _ = jax.jit(lambda p, xx: fcn8_apply(p, xx))(params, x)
    params_r = replicate(mesh, params)
    x_s = jax.device_put(x, batch_sharding(mesh, 4, spatial_axis="space"))
    out, _ = jax.jit(lambda p, xx: fcn8_apply(p, xx))(params_r, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
