"""NaN-forensics machinery (petr_tpu/train/forensics.py): snapshot
round-trip, subtree damage accounting, and the capture_intermediates
dissection that names the first nonfinite module."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from petr_tpu.train.forensics import (
    first_nonfinite_intermediates,
    load_snapshot,
    nonfinite_by_subtree,
    save_snapshot,
)


def test_snapshot_roundtrip(tmp_path):
    class S:  # minimal TrainState-shaped object
        params = {"a": {"w": np.ones((2, 2), np.float32)}}
        opt_state = ({"m": np.zeros(3, np.float32)},)

    path = save_snapshot(str(tmp_path), S(), 42, {"cfg": True},
                         loader_args={"batch_size": 2, "seed": 0})
    snap = load_snapshot(path)
    assert snap["step"] == 42 and snap["loader_args"]["batch_size"] == 2
    np.testing.assert_array_equal(snap["params"]["a"]["w"], np.ones((2, 2)))


def test_nonfinite_by_subtree():
    tree = {
        "backbone": {"w": np.array([1.0, np.nan, np.inf])},
        "head": {"w": np.ones(4)},
    }
    out = nonfinite_by_subtree(tree)
    assert out == {"backbone": 2}


def test_first_nonfinite_intermediates_names_the_culprit():
    class Inner(nn.Module):
        @nn.compact
        def __call__(self, x):
            # div-by-zero style blowup inside this specific module
            return x / jnp.zeros_like(x)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, name="ok")(x)
            x = Inner(name="boom")(x)
            return nn.Dense(2, name="after")(x)

    net = Net()
    x = jnp.ones((3, 4))
    variables = net.init(jax.random.PRNGKey(0), x)
    _, bad = first_nonfinite_intermediates(net, variables, x)
    paths = [b[0] for b in bad]
    assert any("boom" in p for p in paths), paths
    assert not any(p.endswith("ok/__call__/0") for p in paths), paths
