"""Selective remat (model.remat_scope) is value-preserving and validated."""

import numpy as np
import jax
import pytest

import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.train import create_train_state, make_train_step


@pytest.mark.slow
def test_remat_scope_value_preserving():
    losses = []
    for scope in ("all", "backbone", "decoder"):
        cfg = get_config("tiny_debug", [f"model.remat_scope={scope}"])
        b = ge._batch(2, 6, *cfg.data.image_size, cfg.data.max_gt, seed=0)
        state = create_train_state(cfg, jax.random.PRNGKey(0), 10, b)
        step = jax.jit(make_train_step(cfg))
        _, m = step(state, b, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert max(losses) - min(losses) < 1e-4, losses


def test_remat_scope_validation():
    cfg = get_config("tiny_debug", ["model.remat_scope=bogus"])
    b = ge._batch(1, 6, *cfg.data.image_size, cfg.data.max_gt, seed=0)
    with pytest.raises(ValueError, match="remat_scope"):
        create_train_state(cfg, jax.random.PRNGKey(0), 10, b)
