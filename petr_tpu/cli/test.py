"""Evaluation CLI (reference `tools/test.py` capability).

    python -m petr_tpu.cli.test --config petr_vov_p4_800x320 \
        --infos data/nuscenes_infos_val.pkl --data-root data/nuscenes \
        --ckpt work_dirs/petr_vov/ckpts/step_00001234 [--out results.json]

Runs NMS-free decoding over the val split and computes nuScenes mAP/NDS with
the built-in evaluator; optionally dumps a results json (nuScenes submission
schema) for the official devkit.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--infos", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--out", default=None, help="dump detections json")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument(
        "--fuse-conv-bn", action="store_true",
        help="fold frozen BN into conv kernels before inference "
        "(reference tools/test.py --fuse-conv-bn)",
    )
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
        help="dotted config overrides, e.g. max_det=500 model.use_flash_attention=False",
    )
    p.add_argument(
        "--quant-scales", default=None, metavar="NPZ",
        help="int8 PTQ serving: activation-scale .npz from petr_tpu.cli.quantize",
    )
    p.add_argument(
        "--tta", default="none", choices=("none", "identity", "hflip"),
        help="test-time augmentation (reference MultiScaleFlipAug3D + "
        "petr3d.aug_test feature averaging, petr3d.py:239-247): stacks aug "
        "variants on an aug axis, features are averaged before the head "
        "with the FIRST variant's geometry (the reference's img_metas[0] "
        "semantics). 'identity' duplicates (a consistency no-op), 'hflip' "
        "adds a horizontally mirrored variant",
    )
    p.add_argument(
        "--classes", default=None, metavar="A,B,...",
        help="restrict metric scoring to these classes (devkit semantics "
        "score ALL classes, counting no-GT classes as AP 0 — pass the "
        "present subset on restricted synthetic data)",
    )
    p.add_argument(
        "--streaming", action="store_true",
        help="PETRv2 streaming eval: scene-ordered, backbone on the 6 new "
        "views per frame, previous-frame features cached "
        "(petr_tpu.serve.StreamingPETRv2). The previous frame is the actual "
        "previous keyframe instead of the offline mid-sweep pick.",
    )
    return p.parse_args()


def apply_tta(images, mode: str):
    """(B, N, H, W, C) -> (B, A, N, H, W, C) aug stack for the detector's
    feature-averaging TTA axis (reference `petr3d.py:239-247`)."""
    import numpy as np

    if mode == "none":
        return images
    if mode == "identity":
        aug = images
    elif mode == "hflip":
        aug = images[..., ::-1, :]  # mirror W; per-channel norm commutes
    else:
        raise ValueError(mode)
    return np.stack([images, aug], axis=1)


def run_streaming_inference(cfg, params, ds, quant_scales=None):
    """Scene-ordered streaming inference over the val infos.

    Uses each sample's own ego-aligned sweep record for the previous
    keyframe's matrices (`NuScenesDataset.streaming_sample`); the feature
    cache resets at scene boundaries (detected by sweep-path mismatch).
    """
    from petr_tpu.metrics.nuscenes import boxes_from_arrays
    from petr_tpu.serve import StreamingPETRv2

    if cfg.data.num_frames < 2:
        raise SystemExit("--streaming needs a 2-frame (petrv2) config")
    order = list(range(len(ds.infos)))
    if ds.infos and "scene_token" in ds.infos[0]:
        order.sort(key=lambda i: (
            str(ds.infos[i]["scene_token"]), float(ds.infos[i]["timestamp"])))
    runner = StreamingPETRv2(cfg, params, decode=True, quant_scales=quant_scales)
    preds = {}
    prev_info = None
    t0 = time.time()
    n_cached = 0
    for i in order:
        smp = ds.streaming_sample(i, prev_info)
        if not smp["cached"]:
            runner.reset()
            if smp.get("prev_images") is not None:
                # scene start with a stored sweep: prime the cache with the
                # sweep's views so the frame matches the full 12-view eval
                runner.prime(smp["prev_images"][None])
        else:
            n_cached += 1
        det = jax.device_get(runner.step(
            smp["images"][None], smp["img2lidar"][None],
            smp["img_hw"][None], smp["timestamp"][None],
        ))
        preds[smp["token"]] = boxes_from_arrays(
            smp["token"], det["boxes"][0], det["scores"][0],
            det["labels"][0], det["valid"][0], info=ds.infos[i],
        )
        prev_info = ds.infos[i]
    wall = time.time() - t0
    print(f"streaming: {n_cached}/{len(order)} frames served from the feature cache")
    return preds, len(order), wall


def main():
    args = parse_args()
    from petr_tpu.configs import get_config
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.metrics.nuscenes import (
        boxes_from_arrays,
        evaluate_detections,
    )
    from petr_tpu.train import create_train_state, make_eval_step
    from petr_tpu.train.checkpoint import load_params

    cfg = get_config(args.config, args.overrides)
    ds = NuScenesDataset.from_pkl(
        args.infos, cfg.data, training=False, data_root=args.data_root
    )
    if args.max_samples:
        ds.infos = ds.infos[: args.max_samples]
    loader = Loader(ds, args.batch_size, shuffle=False, drop_last=False)

    sample = next(iter(loader.epoch(0)))
    jb = {k: jnp.asarray(v) for k, v in sample.items() if k != "tokens"}
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, jb)
    params = state.params
    if args.ckpt:
        params = load_params(args.ckpt, params)
    if args.fuse_conv_bn:
        from petr_tpu.utils.fuse import fold_frozen_bn

        params = jax.tree.map(jnp.asarray, fold_frozen_bn(params))

    if args.quant_scales:
        import dataclasses

        from petr_tpu.quant import load_scales

        qcfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(cfg.model.backbone, quant="int8"),
            ),
        )
        eval_step = jax.jit(make_eval_step(qcfg, load_scales(args.quant_scales)))
    else:
        eval_step = jax.jit(make_eval_step(cfg))

    preds, gts = {}, {}
    if args.streaming:
        scales = None
        if args.quant_scales:
            from petr_tpu.quant import load_scales

            scales = load_scales(args.quant_scales)
        preds, n, wall = run_streaming_inference(cfg, params, ds, quant_scales=scales)
    else:
        t0 = time.time()
        n = 0
        info_by_token = {info["token"]: info for info in ds.infos}
        for batch in loader.epoch(0):
            tokens = batch.pop("tokens")
            batch["images"] = apply_tta(batch["images"], args.tta)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            det = jax.device_get(eval_step(params, jb))
            for i, tok in enumerate(tokens):
                preds[tok] = boxes_from_arrays(
                    tok, det["boxes"][i], det["scores"][i], det["labels"][i],
                    det["valid"][i], info=info_by_token.get(tok),
                )
            n += len(tokens)
        wall = time.time() - t0
    print(f"inference: {n} samples in {wall:.1f}s ({n / wall:.2f} samples/s)")

    from petr_tpu.metrics.nuscenes import ground_truth_from_infos

    gts = ground_truth_from_infos(ds.infos)
    if args.classes:
        results = evaluate_detections(gts, preds, classes=tuple(args.classes.split(",")))
    else:
        results = evaluate_detections(gts, preds)
    for k, v in sorted(results.items()):
        print(f"{k}: {v:.4f}")

    if args.out:
        # official submission schema: GLOBAL-frame boxes (upstream mmdet3d
        # lidar_nusc_box_to_global; see petr_tpu/metrics/submission.py)
        from petr_tpu.metrics.submission import build_submission

        sub = build_submission(preds, ds.infos)
        with open(args.out, "w") as f:
            json.dump(sub, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
