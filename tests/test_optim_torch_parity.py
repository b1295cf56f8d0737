"""Optimizer-step torch parity: one AdamW step with the reference recipe
(mmcv grad clip max_norm=35 over TRAINABLE params only, backbone lr x0.1,
decoupled weight decay 0.01) must produce identical updates to torch.

Locks in two semantics that are easy to get wrong:
  * frozen params (requires_grad=False in the reference: BN stats + r50 BN
    affine) are excluded from the global clip norm — a huge gradient on a
    frozen leaf must not change the clip factor;
  * torch AdamW's decoupled decay p -= lr*wd*p == optax.adamw's
    add_decayed_weights before lr scaling.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from petr_tpu.configs.config import OptimConfig
from petr_tpu.train.optim import build_optimizer, make_lr_schedule


def test_adamw_step_matches_torch_with_frozen_exclusion():
    rng = np.random.RandomState(0)
    w1 = rng.randn(4, 8).astype(np.float32)   # backbone conv kernel (lr x0.1)
    s = rng.randn(8).astype(np.float32)       # backbone bn scale (frozen)
    b = rng.randn(8).astype(np.float32)       # backbone bn bias (frozen)
    m = rng.randn(8).astype(np.float32)       # bn mean (frozen stat)
    v = np.abs(rng.randn(8)).astype(np.float32)  # bn var (frozen stat)
    w2 = rng.randn(8, 3).astype(np.float32)   # head kernel (main)
    b2 = rng.randn(3).astype(np.float32)      # head bias (main)

    g1 = rng.randn(4, 8).astype(np.float32) * 30  # big: clip engages
    g2 = rng.randn(8, 3).astype(np.float32) * 30
    gb2 = rng.randn(3).astype(np.float32) * 30
    huge = np.full((8,), 1e6, np.float32)  # frozen grads must not affect clip

    params = {
        "backbone": {"conv": {"kernel": w1},
                     "bn": {"scale": s, "bias": b, "mean": m, "var": v}},
        "head": {"fc": {"kernel": w2, "bias": b2}},
    }
    grads = {
        "backbone": {"conv": {"kernel": g1},
                     "bn": {"scale": huge, "bias": huge, "mean": huge, "var": huge}},
        "head": {"fc": {"kernel": g2, "bias": gb2}},
    }

    cfg = OptimConfig(lr=2e-4, warmup_iters=500, warmup_ratio=1 / 3,
                      weight_decay=0.01, grad_clip_norm=35.0,
                      backbone_lr_mult=0.1)
    tx = build_optimizer(cfg, 1000, params, freeze_backbone_bn_affine=True)
    state = tx.init(jax.tree.map(jnp.asarray, params))
    updates, _ = tx.update(
        jax.tree.map(jnp.asarray, grads), state, jax.tree.map(jnp.asarray, params)
    )
    new = optax.apply_updates(jax.tree.map(jnp.asarray, params), updates)

    # ---- torch reference
    lr0 = float(make_lr_schedule(cfg, 1000)(0))
    tw1 = torch.tensor(w1, requires_grad=True)
    tw2 = torch.tensor(w2, requires_grad=True)
    tb2 = torch.tensor(b2, requires_grad=True)
    tw1.grad = torch.tensor(g1)
    tw2.grad = torch.tensor(g2)
    tb2.grad = torch.tensor(gb2)
    total = torch.nn.utils.clip_grad_norm_([tw1, tw2, tb2], 35.0)
    assert float(total) > 35.0  # clip actually engaged
    opt = torch.optim.AdamW(
        [{"params": [tw1], "lr": lr0 * 0.1},
         {"params": [tw2, tb2], "lr": lr0}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01,
    )
    opt.step()

    np.testing.assert_allclose(
        np.asarray(new["backbone"]["conv"]["kernel"]), tw1.detach().numpy(),
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(new["head"]["fc"]["kernel"]), tw2.detach().numpy(),
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(new["head"]["fc"]["bias"]), tb2.detach().numpy(),
        rtol=1e-5, atol=1e-8,
    )
    # frozen leaves untouched despite huge grads
    for leaf, orig in (("scale", s), ("bias", b), ("mean", m), ("var", v)):
        np.testing.assert_array_equal(np.asarray(new["backbone"]["bn"][leaf]), orig)
