"""Train-step decomposition at flagship batch-4 (ROOFLINE.md §6).

Breaks the measured ms/step into: forward(+loss), backward (by subtraction),
matcher+loss on precomputed head outputs, optimizer update, and the remat
recompute premium (step(remat) - step(no-remat)). Same chained-scan/host-read
protocol as the other roofline tools.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_train.py \
        [config] [--batch 4]
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

K_CHAIN = 8


def timed_chain(run_once, iters=3):
    """run_once() must force a host value; returns ms per call."""
    run_once()  # compile + warmup
    run_once()
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state, make_train_step
    from petr_tpu.train.losses import petr_set_loss
    from petr_tpu.train.train_step import make_grad_fn

    name = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "petr_vov_p4_800x320"
    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 4
    cfg = get_config(name)
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(B, N, H, W, cfg.data.max_gt,
                      with_ts=cfg.data.num_frames > 1)
    rng = jax.random.PRNGKey(1)
    results = {}

    # ---- full step at each remat setting --------------------------------
    for label, over in (("remat=all", {}),
                        ("remat_scope=decoder", {"remat_scope": "decoder"}),
                        ("remat=False", {"remat": False})):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **over))
        try:
            state = create_train_state(c, jax.random.PRNGKey(0), 1000, batch)
            step = jax.jit(make_train_step(c), donate_argnums=(0,))

            def run():
                nonlocal state
                for _ in range(K_CHAIN):
                    state, m = step(state, batch, rng)
                return float(m["loss"])

            ms = timed_chain(run) / K_CHAIN
            results[label] = ms
            print(f"train step [{label:20s}]: {ms:7.1f} ms/step "
                  f"({B/ms*1e3:.2f} samples/s)", flush=True)
            del state
        except Exception as e:
            print(f"train step [{label}]: failed ({type(e).__name__}: "
                  f"{str(e)[:100]})", flush=True)

    # ---- forward+loss only (training mode, no grad) ---------------------
    grad_cfg = cfg
    gfn = make_grad_fn(grad_cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1000, batch)
    params = state.params
    from petr_tpu.models import PETRDetector

    model = PETRDetector(cfg.model, deterministic=False)
    ocfg = cfg.train.optim

    @jax.jit
    def fwd_loss(params, batch, rng):
        gm_rng, drop_rng = jax.random.split(rng)
        outputs = model.apply(
            {"params": params}, batch["images"], batch["img2lidar"],
            batch["img_hw"], timestamp=batch.get("timestamp"),
            grid_mask_rng=gm_rng, rngs={"dropout": drop_rng},
        )
        total, _ = petr_set_loss(
            outputs, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
            num_classes=cfg.model.head.num_classes, cls_weight=ocfg.cls_weight,
            bbox_weight=ocfg.bbox_weight, code_weights=ocfg.code_weights,
            sync_cls_avg_factor=ocfg.sync_cls_avg_factor,
        )
        return total

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    ms_fwd = timed_chain(lambda: float(fwd_loss(params, jb, rng)))
    print(f"forward+loss (train mode):      {ms_fwd:7.1f} ms", flush=True)
    results["fwd+loss"] = ms_fwd

    # ---- matcher+loss on precomputed outputs ----------------------------
    @jax.jit
    def head_outputs(params, batch, rng):
        gm_rng, drop_rng = jax.random.split(rng)
        return model.apply(
            {"params": params}, batch["images"], batch["img2lidar"],
            batch["img_hw"], timestamp=batch.get("timestamp"),
            grid_mask_rng=gm_rng, rngs={"dropout": drop_rng},
        )

    outs = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                        head_outputs(params, jb, rng))

    @jax.jit
    def loss_only(outs, batch):
        total, _ = petr_set_loss(
            outs, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
            num_classes=cfg.model.head.num_classes, cls_weight=ocfg.cls_weight,
            bbox_weight=ocfg.bbox_weight, code_weights=ocfg.code_weights,
            sync_cls_avg_factor=ocfg.sync_cls_avg_factor,
        )
        return total

    ms_loss = timed_chain(lambda: float(loss_only(outs, jb)))
    print(f"matcher+loss (on outputs):      {ms_loss:7.1f} ms", flush=True)
    results["matcher+loss"] = ms_loss

    # ---- optimizer update alone -----------------------------------------
    @jax.jit
    def opt_only(state, grads):
        new = state.apply_gradients(grads)
        return new, jax.tree.leaves(new.params)[0].ravel()[0]

    grads = jax.tree.map(lambda p: p * 1e-8, params)

    def run_opt():
        nonlocal state
        for _ in range(K_CHAIN):
            state, v = opt_only(state, grads)
        return float(v)

    ms_opt = timed_chain(run_opt) / K_CHAIN
    print(f"optimizer (AdamW+clip+labels):  {ms_opt:7.1f} ms", flush=True)
    results["optimizer"] = ms_opt

    # ---- decomposition ---------------------------------------------------
    if "remat=all" in results and "remat=False" in results:
        print(f"\nremat recompute premium: "
              f"{results['remat=all'] - results['remat=False']:+.1f} ms/step "
              f"({100*(results['remat=all']-results['remat=False'])/results['remat=all']:.0f}% "
              "of the remat step)", flush=True)
    base = results.get("remat=False", results.get("remat=all"))
    bwd = base - ms_fwd - ms_opt
    print(f"decomposition (no-remat step {base:.1f} ms): fwd+loss {ms_fwd:.1f} "
          f"(of which matcher+loss {ms_loss:.1f}) | backward {bwd:.1f} "
          f"| optimizer {ms_opt:.1f}", flush=True)
    print(f"bwd/fwd ratio: {bwd / max(ms_fwd - ms_loss, 1e-9):.2f} "
          "(2.0 = textbook)", flush=True)


if __name__ == "__main__":
    main()
