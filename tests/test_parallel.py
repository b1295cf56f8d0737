"""Mesh construction, distributed helpers, pod-mesh layout (CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.parallel.distributed import init_distributed, make_pod_mesh
from petr_tpu.parallel.mesh import constrain, make_mesh, shard_batch


def test_make_mesh_factorizations():
    # default = pure DP (reference recipe: batch 1/device -> data=n)
    m = make_mesh(8)
    assert m.devices.shape == (8, 1)
    assert m.axis_names == ("data", "model")
    m2 = make_mesh(8, data=4)
    assert m2.devices.shape == (4, 2)
    m3 = make_mesh(8, model=4)
    assert m3.devices.shape == (2, 4)
    m4 = make_mesh(1)
    assert m4.devices.shape == (1, 1)


def test_constrain_noop_outside_mesh():
    x = jnp.ones((4, 8))
    y = constrain(x, ("data", None))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_constrain_inside_mesh():
    mesh = make_mesh(8)

    @jax.jit
    def f(x):
        return constrain(x, ("data", "model", None)) * 2

    with jax.set_mesh(mesh):
        x = jnp.ones((2, 8, 4))
        y = f(x)
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(8, data=2)  # batch dim 2 must divide the data axis
    batch = {"a": jnp.arange(16.0).reshape(2, 8), "b": jnp.zeros((2, 3, 4))}
    out = shard_batch(batch, mesh)
    for v in out.values():
        assert v.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")), v.ndim
        )


def test_init_distributed_single_process_noop():
    init_distributed()  # must not raise without coordinator env


def test_pod_mesh_local_model_axis():
    mesh = make_pod_mesh(model_parallel=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")


@pytest.mark.slow
def test_grad_accum_composes_with_sharded_train_step():
    """grad_accum's (B,...)->(A, B/A,...) interleaved micro-batch split must
    compile and run when the batch axis is sharded over the data mesh axis
    (the reshape crosses shard boundaries; XLA inserts the resharding)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from petr_tpu.parallel.mesh import replicate
    from petr_tpu.train.train_step import create_train_state, make_train_step
    from tests.test_losses_train import tiny_batch, tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    batch = tiny_batch(B=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)

    mesh = make_mesh(8, model=4)  # (data=2, model=4)
    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        rng = jax.device_put(jax.random.PRNGKey(1), NamedSharding(mesh, P()))
        step = jax.jit(
            make_train_step(cfg),
            in_shardings=(
                jax.tree.map(
                    lambda _: NamedSharding(mesh, P()), jax.eval_shape(lambda s: s, state)
                ),
                {k: NamedSharding(mesh, P("data")) for k in batch},
                NamedSharding(mesh, P()),
            ),
        )
        new_state, metrics = step(state, sharded, rng)
        jax.block_until_ready(new_state.params)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
