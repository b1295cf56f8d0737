"""Jittable train / eval steps over the PETR detector.

The step is a pure function of (state, batch, rng): forward in bf16 with
fp32 loss islands, device-side Hungarian matching, AdamW update with
global-norm clipping. Under a mesh, gradient reduction happens implicitly via
pjit shardings (data-parallel batch axis); the only explicit collective is
the optional pmean of loss normalizers (handled inside petr_set_loss).

Batch dict contract (all statically shaped):
    images     (B, N, H, W, 3) float32, normalized
    img2lidar  (B, N, 4, 4)    float32
    img_hw     (B, N, 2)       float32 valid (h, w) before padding
    gt_boxes   (B, G, 9)       float32, gravity-center z
    gt_labels  (B, G)          int32
    gt_valid   (B, G)          bool
    timestamp  (B, N)          float32 (v2 only; zeros otherwise)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from petr_tpu.configs.config import ExperimentConfig
from petr_tpu.models.detector import PETRDetector
from petr_tpu.ops.nms_free import nms_free_decode
from petr_tpu.train.losses import petr_set_loss
from petr_tpu.train.optim import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(
    cfg: ExperimentConfig, rng: jax.Array, total_steps: int, sample_batch: Dict[str, jax.Array]
) -> TrainState:
    model = PETRDetector(cfg.model, deterministic=True)
    extra = {}
    if cfg.model.head.kind == "depthr":
        extra = dict(
            gt_boxes=sample_batch["gt_boxes"], gt_valid=sample_batch["gt_valid"],
            lidar2img=sample_batch["lidar2img"],
        )
    variables = model.init(
        rng,
        sample_batch["images"],
        sample_batch["img2lidar"],
        sample_batch["img_hw"],
        timestamp=sample_batch.get("timestamp"),
        **extra,
    )
    params = variables["params"]
    tx = build_optimizer(
        cfg.train.optim, total_steps, params,
        freeze_backbone_bn_affine=not cfg.model.backbone.train_bn_affine,
    )
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def make_grad_fn(cfg: ExperimentConfig, axis_name: Optional[str] = None):
    """(params, batch, rng) -> (total, losses, grads, bn_stats).

    Factored out of make_train_step so gradient accumulation can scan it over
    micro-batches (and tests can call it to cross-check the accumulated path).
    ``bn_stats`` is the "batch_stats" collection (this step's batch moments
    from any bn_mode="batch" backbone; {} for frozen-BN models) — the train
    step EMAs it into the stored mean/var params (mmcv norm_eval=False).
    """
    model = PETRDetector(cfg.model, deterministic=False)
    ocfg = cfg.train.optim

    def grad_fn(params, batch: Dict[str, jax.Array], rng: jax.Array):
        gm_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            extra = {}
            if cfg.model.head.kind == "depthr":
                extra = dict(
                    gt_boxes=batch["gt_boxes"], gt_valid=batch["gt_valid"],
                    lidar2img=batch["lidar2img"],
                )
            outputs, newvars = model.apply(
                {"params": params},
                batch["images"],
                batch["img2lidar"],
                batch["img_hw"],
                timestamp=batch.get("timestamp"),
                grid_mask_rng=gm_rng,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
                **extra,
            )
            total, losses = petr_set_loss(
                outputs,
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                num_classes=cfg.model.head.num_classes,
                cls_weight=ocfg.cls_weight,
                bbox_weight=ocfg.bbox_weight,
                code_weights=ocfg.code_weights,
                sync_cls_avg_factor=ocfg.sync_cls_avg_factor,
                axis_name=axis_name,
            )
            stats = newvars.get("batch_stats", {})
            return total, (losses, stats)

        (total, (losses, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return total, losses, grads, stats

    return grad_fn


def accumulate_grads(grad_fn, params, batch: Dict[str, jax.Array], rng: jax.Array, accum: int):
    """Gradient accumulation over `accum` sequential micro-batches (lax.scan).

    mmcv GradientCumulativeOptimizerHook semantics: each micro-batch is
    normalized by its own avg_factor inside grad_fn, gradients are averaged
    over the micro-batches, one optimizer update per step. Micro-batch i takes
    samples [i::accum] (interleaved) so each device's data-parallel shard
    contributes equally to every micro-batch. Micro-batch i gets
    fold_in(rng, i) as its rng.

    Returns (mean total, per-loss means, averaged grads).
    """
    bsz = jax.tree.leaves(batch)[0].shape[0]
    if bsz % accum != 0:
        raise ValueError(f"batch size {bsz} not divisible by grad_accum={accum}")

    def split(x):
        return jnp.moveaxis(x.reshape((x.shape[0] // accum, accum) + x.shape[1:]), 1, 0)

    micro_batches = jax.tree.map(split, batch)

    def body(grads_acc, xs):
        i, mb = xs
        t, l, g, s = grad_fn(params, mb, jax.random.fold_in(rng, i))
        return jax.tree.map(jnp.add, grads_acc, g), (t, l, s)

    zeros = jax.tree.map(jnp.zeros_like, params)
    grads_sum, (totals, losses_stacked, stats_stacked) = jax.lax.scan(
        body, zeros, (jnp.arange(accum), micro_batches)
    )
    grads = jax.tree.map(lambda g: g / accum, grads_sum)
    # bn batch moments: exact whole-batch combine over the stacked
    # micro-batches (a plain mean of vars would underestimate by the
    # variance of the micro-batch means)
    stats = _combine_bn_moments(stats_stacked, lambda x: jnp.mean(x, axis=0))
    return (
        jnp.mean(totals),
        jax.tree.map(lambda x: jnp.mean(x, axis=0), losses_stacked),
        grads,
        stats,
    )


def _combine_bn_moments(stats: Any, reduce_fn) -> Any:
    """Combine per-shard BN batch moments into whole-batch moments.

    ``stats`` is a "batch_stats" tree whose BN modules emit sibling
    ``mean``/``var`` leaves; ``reduce_fn`` averages a leaf over the shard
    dimension (a ``pmean`` across replicas, or ``.mean(0)`` over stacked
    micro-batches). Equal-size shards, parallel-variance identity:
        mean = avg(mean_i);  var = avg(var_i + mean_i^2) - mean^2
    — exact for the biased variance; the leaves carry the Bessel-corrected
    one (torch running_var semantics), making this exact to O(1/n) with n
    the per-shard element count (B*H*W — thousands).
    """
    leaves = jax.tree_util.tree_leaves_with_path(stats)
    if not leaves:
        return stats
    flat = {jax.tree_util.keystr(p): v for p, v in leaves}
    out = {}
    for ks, v in flat.items():
        if not ks.endswith("['mean']"):
            continue
        parent = ks[: -len("['mean']")]
        m = reduce_fn(v)
        out[ks] = m
        out[parent + "['var']"] = jnp.maximum(
            reduce_fn(flat[parent + "['var']"] + v ** 2) - m ** 2, 0.0
        )
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: out.get(jax.tree_util.keystr(p), leaf), stats
    )


def _advance_schedule_counts(new_opt: Any, old_opt: Any) -> Any:
    """Rebuild ``old_opt`` with LR-schedule counts taken from ``new_opt``.

    A schedule state (optax ScaleByScheduleState and equivalents) is a
    namedtuple whose ONLY field is ``count`` — that count must follow the
    iteration number even across overflow-skipped steps (mmcv LR hooks tick
    every iteration). Adam's ScaleByAdamState also carries a ``count`` (bias
    correction), but alongside mu/nu — torch's Adam step counter does NOT
    advance on skipped steps, so multi-field states are kept from old_opt.
    """
    if hasattr(old_opt, "_fields"):
        if old_opt._fields == ("count",):
            return new_opt
        return type(old_opt)(*(
            _advance_schedule_counts(n, o) for n, o in zip(new_opt, old_opt)
        ))
    if isinstance(old_opt, (list, tuple)):
        return type(old_opt)(
            _advance_schedule_counts(n, o) for n, o in zip(new_opt, old_opt)
        )
    if isinstance(old_opt, dict):
        return {k: _advance_schedule_counts(new_opt[k], old_opt[k]) for k in old_opt}
    return old_opt


def _ema_bn_stats(params: Any, stats: Any, momentum: float = 0.1) -> Any:
    """EMA this step's batch moments into the stored bn mean/var params.

    The "batch_stats" collection tree mirrors the param tree's module paths
    (same FrozenBatchNorm submodules emit both), so a path-keyed merge is
    exact. torch/mmcv BN semantics: running = (1 - momentum) * running +
    momentum * batch, updated on EVERY forward — including optimizer-skipped
    iterations.
    """
    leaves = jax.tree_util.tree_leaves_with_path(stats)
    if not leaves:
        return params
    flat = {jax.tree_util.keystr(p): v for p, v in leaves}

    def upd(path, leaf):
        v = flat.get(jax.tree_util.keystr(path))
        if v is None:
            return leaf
        return (1.0 - momentum) * leaf + momentum * v

    return jax.tree_util.tree_map_with_path(upd, params)


def make_train_step(cfg: ExperimentConfig, axis_name: Optional[str] = None):
    grad_fn = make_grad_fn(cfg, axis_name)
    accum = cfg.train.grad_accum

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        if accum <= 1:
            total, losses, grads, bn_stats = grad_fn(
                state.params, batch, jax.random.fold_in(step_rng, 0)
            )
        else:
            total, losses, grads, bn_stats = accumulate_grads(
                grad_fn, state.params, batch, step_rng, accum
            )

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            total = jax.lax.pmean(total, axis_name)
            # bn batch moments must be combined like grads — replicas EMAing
            # their LOCAL moments into replicated params would silently
            # diverge. Exact global-batch moments via the parallel-variance
            # identity (not a plain pmean of vars, which drops the
            # between-shard mean variance).
            bn_stats = _combine_bn_moments(
                bn_stats, lambda v: jax.lax.pmean(v, axis_name)
            )
        # divergence diagnostics (cheap reductions; note the losses are
        # nan_to_num'd for reference parity, so a blown-up run shows
        # loss=0.0 — grad_norm/nonfinite make the cause visible)
        gnorm = optax.global_norm(grads)
        nonfinite = sum(
            jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        )
        # Overflow-step rejection (reference parity: mmcv Fp16OptimizerHook
        # skips the update when gradients contain inf/NaN — `has_overflow`
        # -> no optimizer step — which is how the fp16 recipe survives
        # transient spikes). Without this, ONE poisoned backward pass
        # (e.g. an activation-magnitude transient) NaNs the parameters
        # forever. The step counter still advances (mmcv iteration count
        # does too).
        ok = nonfinite == 0
        candidate = state.apply_gradients(grads)
        # On a skipped step, revert params and Adam moments/bias-correction
        # counts, but ADVANCE the LR-schedule counts: mmcv's iteration-based
        # LR hooks still tick on overflow-skipped iterations (the hook runs
        # per iteration, Fp16OptimizerHook only skips optimizer.step()), so
        # the schedule must track state.step, not the number of applied
        # updates.
        fallback = state.replace(
            opt_state=_advance_schedule_counts(candidate.opt_state, state.opt_state)
        )
        new_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old),
            candidate.replace(step=state.step), fallback,
        ).replace(step=state.step + 1)
        # BN running-stats EMA applies regardless of `ok` (torch updates
        # running stats in forward, before/independent of optimizer.step)
        new_state = new_state.replace(
            params=_ema_bn_stats(new_state.params, bn_stats,
                                 momentum=cfg.model.backbone.bn_momentum)
        )
        metrics = {"loss": total, **losses,
                   "grad_norm": gnorm,
                   "grad_nonfinite": nonfinite.astype(jnp.int32),
                   "skipped": (~ok).astype(jnp.int32)}
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ExperimentConfig, quant_scales=None):
    """Jittable decode step. ``quant_scales``: a "quant" collection (from
    petr_tpu.quant.calibrate_detector) enabling the int8 PTQ backbone —
    cfg.model.backbone.quant must be "int8" in that case."""
    from petr_tpu.configs.config import eval_model_config

    model = PETRDetector(eval_model_config(cfg.model), deterministic=True)

    def eval_step(params, batch: Dict[str, jax.Array]):
        extra = {}
        if cfg.model.head.kind == "depthr":
            # GT-depth oracle: the reference passes GT boxes at test time too
            # (depthr3d.py:306-311)
            extra = dict(
                gt_boxes=batch["gt_boxes"], gt_valid=batch["gt_valid"],
                lidar2img=batch["lidar2img"],
            )
        variables = {"params": params}
        if quant_scales is not None:
            variables["quant"] = quant_scales
        outputs = model.apply(
            variables,
            batch["images"],
            batch["img2lidar"],
            batch["img_hw"],
            timestamp=batch.get("timestamp"),
            **extra,
        )
        # decode the final layer per sample
        decode = jax.vmap(
            lambda cl, co: nms_free_decode(
                cl,
                co,
                max_num=cfg.max_det,
                num_classes=cfg.model.head.num_classes,
                post_center_range=cfg.post_center_range,
                score_threshold=cfg.score_threshold,
            )
        )
        return decode(outputs["cls_logits"][-1], outputs["bbox_codes"][-1])

    return eval_step
