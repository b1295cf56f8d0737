"""Set loss + end-to-end train step on a tiny detector (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.configs.config import (
    BackboneConfig,
    DataConfig,
    ExperimentConfig,
    HeadConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from petr_tpu.train.losses import petr_set_loss
from petr_tpu.train.optim import make_lr_schedule, param_labels
from petr_tpu.train.train_step import create_train_state, make_eval_step, make_train_step
from tests.test_heads import make_cams


def tiny_config():
    return ExperimentConfig(
        name="tiny",
        model=ModelConfig(
            backbone=BackboneConfig(
                kind="resnet", spec="r50", out_indices=(3,), dcn_stages=(),
                with_fpn=False,
            ),
            head=HeadConfig(
                num_query=24, embed_dim=32, num_layers=2, num_heads=4,
                ffn_dim=64, depth_num=8, dropout_rate=0.0,
            ),
            use_grid_mask=False,
            compute_dtype="float32",
        ),
        data=DataConfig(image_size=(64, 128), max_gt=8),
        train=TrainConfig(optim=OptimConfig(warmup_iters=2)),
    )


def tiny_batch(B=1, N=2, H=64, W=128, G=8, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(B, N, H, W, 3).astype(np.float32)
    img2lidar = make_cams(B, N, seed)
    img_hw = np.full((B, N, 2), [H, W], np.float32)
    gt_boxes = np.concatenate(
        [
            rng.uniform(-30, 30, (B, G, 2)),
            rng.uniform(-3, 1, (B, G, 1)),
            rng.uniform(1, 4, (B, G, 3)),
            rng.uniform(-np.pi, np.pi, (B, G, 1)),
            rng.uniform(-2, 2, (B, G, 2)),
        ],
        -1,
    ).astype(np.float32)
    gt_labels = rng.randint(0, 10, (B, G)).astype(np.int32)
    gt_valid = np.zeros((B, G), np.bool_)
    gt_valid[:, :5] = True
    return {
        "images": jnp.asarray(images),
        "img2lidar": jnp.asarray(img2lidar),
        "img_hw": jnp.asarray(img_hw),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
    }


def fake_outputs(B, Q, G, gt_boxes, gt_labels, gt_valid, L=2, perfect=False, seed=0):
    from petr_tpu.ops.boxes import encode_bbox

    rng = np.random.RandomState(seed)
    logits = np.full((L, B, Q, 10), -8.0, np.float32)
    codes = rng.randn(L, B, Q, 10).astype(np.float32)
    if perfect:
        gt_codes = np.asarray(encode_bbox(gt_boxes))
        for l in range(L):
            for b in range(B):
                for g in range(G):
                    if gt_valid[b, g]:
                        codes[l, b, g] = gt_codes[b, g]
                        logits[l, b, g, gt_labels[b, g]] = 8.0
    return {"cls_logits": jnp.asarray(logits), "bbox_codes": jnp.asarray(codes)}


def test_perfect_predictions_near_zero_loss():
    b = tiny_batch()
    B, G = 1, 8
    out = fake_outputs(
        B, 24, G, np.asarray(b["gt_boxes"]), np.asarray(b["gt_labels"]),
        np.asarray(b["gt_valid"]), perfect=True,
    )
    total, losses = petr_set_loss(out, b["gt_boxes"], b["gt_labels"], b["gt_valid"])
    assert float(losses["loss_bbox"]) < 1e-3
    assert float(losses["loss_cls"]) < 0.05
    assert float(losses["num_pos"]) == 5


def test_random_predictions_positive_loss():
    b = tiny_batch()
    out = fake_outputs(
        1, 24, 8, np.asarray(b["gt_boxes"]), np.asarray(b["gt_labels"]),
        np.asarray(b["gt_valid"]), perfect=False,
    )
    total, losses = petr_set_loss(out, b["gt_boxes"], b["gt_labels"], b["gt_valid"])
    assert float(total) > 1.0
    assert np.isfinite(float(total))
    # per-layer keys present
    assert "d0.loss_cls" in losses and "loss_cls" in losses


def test_zero_gt_finite_loss():
    b = tiny_batch()
    valid = jnp.zeros_like(b["gt_valid"])
    out = fake_outputs(
        1, 24, 8, np.asarray(b["gt_boxes"]), np.asarray(b["gt_labels"]),
        np.zeros((1, 8), bool),
    )
    total, losses = petr_set_loss(out, b["gt_boxes"], b["gt_labels"], valid)
    assert np.isfinite(float(total))


def test_lr_schedule():
    cfg = OptimConfig(lr=2e-4, warmup_iters=500, warmup_ratio=1 / 3, min_lr_ratio=1e-3)
    s = make_lr_schedule(cfg, 10000)
    assert float(s(0)) == pytest.approx(2e-4 / 3, rel=1e-5)
    assert float(s(500)) == pytest.approx(2e-4, rel=0.05)
    assert float(s(10000)) == pytest.approx(2e-7, rel=1e-3)
    # monotone decrease after warmup
    vals = [float(s(i)) for i in range(600, 10000, 1000)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


@pytest.mark.slow
def test_train_step_reduces_loss_and_masks_frozen_stats():
    cfg = tiny_config()
    batch = tiny_batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)

    labels = param_labels(state.params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    assert any(v == "frozen" for _, v in flat)
    assert any(v == "backbone" for _, v in flat)

    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    p0_stat = np.asarray(state.params["backbone"]["stem_bn"]["mean"]).copy()

    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # frozen BN stats untouched
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["stem_bn"]["mean"]), p0_stat
    )


def test_accumulate_grads_exact_math():
    """accumulate_grads == average of per-micro grads, per-micro rng streams,
    interleaved [i::accum] micro-batch assignment — checked exactly against an
    analytic toy grad_fn (the full detector can't be compared across separate
    compilations: the Hungarian matcher flips near-tied assignments on fp
    reassociation noise)."""
    from petr_tpu.train.train_step import accumulate_grads

    params = {"w": jnp.asarray([1.0, -2.0, 0.5]), "b": jnp.asarray(0.3)}

    def grad_fn(p, batch, rng):
        # per-micro normalization (mean over the micro-batch) + rng-dependent
        # term so the fold_in(rng, i) schedule is actually checked
        x, y = batch["x"], batch["y"]
        noise = jax.random.normal(rng, ())

        def loss(p):
            pred = x @ p["w"] + p["b"] + noise * 0.1
            total = jnp.mean((pred - y) ** 2)
            return total, {"mse": total}

        (t, l), g = jax.value_and_grad(loss, has_aux=True)(p)
        return t, l, g, {}

    rng0 = np.random.RandomState(0)
    batch = {"x": jnp.asarray(rng0.randn(6, 3).astype(np.float32)),
             "y": jnp.asarray(rng0.randn(6).astype(np.float32))}
    rng = jax.random.PRNGKey(7)

    total, losses, grads, _ = jax.jit(
        lambda p, b, r: accumulate_grads(grad_fn, p, b, r, 3)
    )(params, batch, rng)

    ts, gs = [], []
    for i in range(3):
        mb = jax.tree.map(lambda x: x[i::3], batch)
        t, _, g, _s = grad_fn(params, mb, jax.random.fold_in(rng, i))
        ts.append(float(t))
        gs.append(g)
    g_exp = jax.tree.map(lambda *a: sum(a) / 3, *gs)

    assert float(total) == pytest.approx(np.mean(ts), rel=1e-6)
    assert float(losses["mse"]) == pytest.approx(np.mean(ts), rel=1e-6)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(grads[k]), np.asarray(g_exp[k]), rtol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        accumulate_grads(grad_fn, params, batch, rng, 4)


def test_bn_batch_mode_tracks_running_stats_and_eval_invariance():
    """bn_mode="batch" (mmcv norm_eval=False): the train step EMAs each
    step's batch moments into the stored bn mean/var params (momentum 0.1,
    updated even on skipped steps — torch updates stats in forward), and
    eval-time models read them FROZEN — so eval is per-sample independent
    (batch-size invariant; the streaming feature cache stays exact)."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(
            cfg.model.backbone, bn_mode="batch")))
    batch = tiny_batch(B=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)

    def bn_stats(params):
        bn = params["backbone"]["stem_bn"]
        return np.asarray(bn["mean"]), np.asarray(bn["var"])

    m0, v0 = bn_stats(state.params)
    np.testing.assert_allclose(m0, 0.0)
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    state, _ = step(state, batch, rng)
    m1, v1 = bn_stats(state.params)
    assert not np.allclose(m1, m0)  # stats moved toward batch moments
    # EMA with momentum 0.1 from (0, 1): after one step,
    # m1 = 0.1 * batch_mean, v1 = 0.9 + 0.1 * batch_var
    batch_mean = m1 / 0.1
    batch_var = (v1 - 0.9) / 0.1
    # converge the EMA on the same batch; running -> batch moments
    for _ in range(60):
        state, _ = step(state, batch, rng)
    m_end, v_end = bn_stats(state.params)
    np.testing.assert_allclose(m_end, batch_mean, rtol=0.15, atol=0.05)
    np.testing.assert_allclose(v_end, batch_var, rtol=0.15, atol=0.05)

    # eval (frozen EMA stats): per-sample independent => batch-size invariant
    eval_step = jax.jit(make_eval_step(cfg))
    det2 = jax.device_get(eval_step(state.params, {k: jnp.asarray(v) for k, v in batch.items()}))
    one = {k: jnp.asarray(v[:1]) for k, v in batch.items()}
    det1 = jax.device_get(eval_step(state.params, one))
    np.testing.assert_allclose(det1["boxes"][0], det2["boxes"][0], atol=1e-5)
    np.testing.assert_allclose(det1["scores"][0], det2["scores"][0], atol=1e-5)


@pytest.mark.slow
def test_grad_accum_detector_end_to_end():
    """grad_accum=2 on the real detector: runs under jit, per-step loss equals
    the mean of the per-micro losses, params actually update. (Gradient values
    can't be compared exactly across compilations — matcher near-ties.)"""
    import dataclasses

    from petr_tpu.train.train_step import make_grad_fn

    cfg = tiny_config()
    cfg2 = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    batch = tiny_batch(B=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)
    rng = jax.random.PRNGKey(1)

    new_state, metrics = jax.jit(make_train_step(cfg2))(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    grad_fn = make_grad_fn(cfg)
    step_rng = jax.random.fold_in(rng, state.step)
    ts = [
        float(grad_fn(state.params, jax.tree.map(lambda x: x[i::2], batch),
                      jax.random.fold_in(step_rng, i))[0])
        for i in range(2)
    ]
    assert float(metrics["loss"]) == pytest.approx(np.mean(ts), rel=1e-4)

    # params moved
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params))
    assert max(moved) > 0


@pytest.mark.slow
def test_eval_step_shapes():
    cfg = tiny_config()
    batch = tiny_batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)
    ev = jax.jit(make_eval_step(cfg))
    det = ev(state.params, batch)
    k = min(cfg.max_det, 24 * 10)  # capped at Q * num_classes
    assert det["boxes"].shape == (1, k, 9)
    assert det["scores"].shape == (1, k)
    assert det["labels"].shape == (1, k)


def test_bn_affine_freezing_labels():
    """r50 configs freeze backbone BN scale/bias (reference norm_cfg
    requires_grad=False, petr_r50dcn_gridmask_p4.py:37); VoVNet configs train
    them (plain nn.BatchNorm2d affine)."""
    cfg = tiny_config()
    batch = tiny_batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)

    frozen = param_labels(state.params, freeze_backbone_bn_affine=True)
    trained = param_labels(state.params, freeze_backbone_bn_affine=False)

    def find(tree, pred):
        out = []
        for path, v in jax.tree_util.tree_leaves_with_path(tree):
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            if pred(keys):
                out.append((keys, v))
        return out

    bn_scale = lambda keys: keys[0] == "backbone" and keys[-1] == "scale" and any(
        "bn" in k for k in keys
    )
    assert find(frozen, bn_scale) and all(v == "frozen" for _, v in find(frozen, bn_scale))
    assert all(v == "backbone" for _, v in find(trained, bn_scale))
    # conv kernels keep training either way
    kernels = lambda keys: keys[0] == "backbone" and keys[-1] == "kernel"
    assert all(v == "backbone" for _, v in find(frozen, kernels))
    # the registered r50 presets set the flag; vovnet presets do not
    from petr_tpu.configs import get_config

    assert not get_config("petr_r50_p4_1408x512").model.backbone.train_bn_affine
    assert get_config("petr_vov_p4_800x320").model.backbone.train_bn_affine


def test_nonfinite_gradients_skip_the_update():
    """mmcv Fp16OptimizerHook parity: a step whose gradients contain
    inf/NaN must leave params and optimizer state untouched (step still
    advances) instead of NaN-poisoning the parameters forever."""
    import dataclasses

    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state, make_train_step

    cfg = get_config("tiny_debug")
    H, W = cfg.data.image_size
    batch = ge._batch(1, 6, H, W, cfg.data.max_gt)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 10, batch)
    step_fn = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)

    bad = dict(batch)
    bad["images"] = jnp.asarray(batch["images"]).at[0, 0, 0, 0, 0].set(jnp.nan)
    new_state, m = step_fn(state, bad, rng)
    assert int(m["skipped"]) == 1 and int(m["grad_nonfinite"]) > 0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step) + 1

    ok_state, m2 = step_fn(state, batch, rng)
    assert int(m2["skipped"]) == 0
    # a clean step DOES change params
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(ok_state.params))
    )
    assert changed


def test_skipped_step_advances_lr_schedule_only():
    """mmcv LR hooks tick every iteration, even overflow-skipped ones, while
    torch Adam's per-param step count only advances on applied updates. The
    skip path must therefore advance ScaleByScheduleState counts but keep
    Adam moments/counts (and params) untouched."""
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state, make_train_step

    cfg = get_config("tiny_debug")
    H, W = cfg.data.image_size
    batch = ge._batch(1, 6, H, W, cfg.data.max_gt)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 10, batch)
    step_fn = jax.jit(make_train_step(cfg))

    bad = dict(batch)
    bad["images"] = jnp.asarray(batch["images"]).at[0, 0, 0, 0, 0].set(jnp.nan)
    new_state, m = step_fn(state, bad, jax.random.PRNGKey(1))
    assert int(m["skipped"]) == 1

    def counts(opt_state, sched_only):
        out = []

        def walk(node):
            if hasattr(node, "_fields"):
                if node._fields == ("count",):
                    out.append(int(node.count))
                    return
                if not sched_only and "count" in node._fields:
                    out.append(int(node.count))
                for f in node._fields:
                    if f != "count":
                        walk(getattr(node, f))
            elif isinstance(node, (list, tuple)):
                for c in node:
                    walk(c)
            elif isinstance(node, dict):
                for c in node.values():
                    walk(c)

        walk(opt_state)
        return out

    sched_before = counts(jax.device_get(state.opt_state), sched_only=True)
    sched_after = counts(jax.device_get(new_state.opt_state), sched_only=True)
    assert sched_before and all(c == 0 for c in sched_before)
    # LR-schedule counts advanced across the skip (LR keeps annealing)
    assert all(c == 1 for c in sched_after)
    # Adam bias-correction counts did NOT advance
    adam_after = counts(jax.device_get(new_state.opt_state), sched_only=False)
    n_sched = len(sched_after)
    assert sum(adam_after) == n_sched  # only the schedule counts are nonzero


def test_bn_tracked_var_is_bessel_corrected():
    """torch BN tracks the UNBIASED variance in running_var while
    normalizing with the biased one — both sides must match (advisor,
    round 4)."""
    from petr_tpu.models.layers import FrozenBatchNorm

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
    bn = FrozenBatchNorm(use_batch_stats=True)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, newvars = bn.apply(variables, x, mutable=["batch_stats"])
    n = 2 * 4 * 4
    xf = np.asarray(x).reshape(-1, 3)
    np.testing.assert_allclose(
        np.asarray(newvars["batch_stats"]["mean"]), xf.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(newvars["batch_stats"]["var"]), xf.var(0, ddof=1),
        rtol=1e-5)
    # normalization itself uses the BIASED variance (torch semantics)
    expect = (xf - xf.mean(0)) / np.sqrt(xf.var(0, ddof=0) + 1e-5)
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, 3), expect, rtol=1e-4, atol=1e-5)


def test_combine_bn_moments_parallel_variance_exact():
    """The shard/micro-batch moment combine must recover the WHOLE-batch
    moments exactly (a plain mean of vars drops the between-shard mean
    variance)."""
    from petr_tpu.train.train_step import _combine_bn_moments

    rng = np.random.RandomState(1)
    data = rng.randn(4, 100, 3).astype(np.float32)  # 4 shards x 100 x C
    stats = {"bb": {"bn": {
        "mean": jnp.asarray(data.mean(axis=1)),          # (4, C) stacked
        "var": jnp.asarray(data.var(axis=1)),            # biased per shard
    }}}
    out = _combine_bn_moments(stats, lambda v: jnp.mean(v, axis=0))
    whole = data.reshape(-1, 3)
    np.testing.assert_allclose(
        np.asarray(out["bb"]["bn"]["mean"]), whole.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["bb"]["bn"]["var"]), whole.var(0), rtol=1e-5)


def test_bn_momentum_config_reaches_the_ema():
    """BackboneConfig.bn_momentum (default 0.1 = torch parity) controls the
    running-stats EMA: after one step from (0, 1) init,
    mean = momentum * batch_mean."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(
            cfg.model.backbone, bn_mode="batch", bn_momentum=0.5)))
    batch = tiny_batch(B=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    m1 = np.asarray(state.params["backbone"]["stem_bn"]["mean"])

    cfg01 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(
            cfg.model.backbone, bn_mode="batch", bn_momentum=0.1)))
    state01 = create_train_state(cfg01, jax.random.PRNGKey(0), 100, batch)
    step01 = jax.jit(make_train_step(cfg01))
    state01, _ = step01(state01, batch, jax.random.PRNGKey(1))
    m1_01 = np.asarray(state01.params["backbone"]["stem_bn"]["mean"])
    # same batch moments, different momentum: 0.5/0.1 = 5x the first EMA step
    np.testing.assert_allclose(m1, 5.0 * m1_01, rtol=1e-4, atol=1e-6)


def test_estimate_bn_stats_single_batch_identity():
    """Precise-BN estimation over ONE batch must write exactly that batch's
    emitted moments into the stored mean/var params (the n=1 combine is the
    identity), leaving all non-BN params untouched."""
    import dataclasses

    from petr_tpu.models.detector import PETRDetector
    from petr_tpu.train.bn_warmup import estimate_bn_stats

    cfg = tiny_config()
    batch = tiny_batch(B=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 10, batch)
    params = state.params

    new_params = estimate_bn_stats(cfg, params, [batch])

    mcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(cfg.model.backbone,
                                                bn_mode="batch"))
    model = PETRDetector(mcfg, deterministic=True)
    _, newvars = model.apply(
        {"params": params}, batch["images"], batch["img2lidar"],
        batch["img_hw"], timestamp=None, mutable=["batch_stats"])
    emitted = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            newvars["batch_stats"])
    }
    assert emitted  # the tiny r50 backbone has BN layers
    changed = 0
    for p, v in jax.tree_util.tree_leaves_with_path(new_params):
        ks = jax.tree_util.keystr(p)
        if ks in emitted:
            # atol 1e-4: the E[x^2] - mean^2 combine loses fp32 bits to
            # cancellation on near-zero-variance channels (harmless vs the
            # BN eps of 1e-5)
            np.testing.assert_allclose(np.asarray(v), emitted[ks],
                                       rtol=1e-3, atol=1e-4)
            changed += 1
        else:
            old = {jax.tree_util.keystr(q): w
                   for q, w in jax.tree_util.tree_leaves_with_path(params)}[ks]
            np.testing.assert_array_equal(np.asarray(v), np.asarray(old))
    assert changed == len(emitted)
