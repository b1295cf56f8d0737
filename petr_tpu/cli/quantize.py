"""Calibrate int8 PTQ activation scales for a trained model.

    python -m petr_tpu.cli.quantize --config petr_vov_p4_800x320 \
        --infos data/nuscenes_infos_val.pkl --data-root data/nuscenes \
        --ckpt work_dirs/petr_vov/ckpts/step_N --out scales.npz \
        [--num-batches 32]

Runs calibration batches through the model recording per-conv activation
ranges, then writes the scale tree consumed by
``cli.test --quant-scales`` / ``cli.benchmark --quant-scales``.
``--synthetic`` calibrates on random data (smoke tests / benchmarking only —
real deployments should calibrate on real frames).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--infos", default=None)
    p.add_argument("--data-root", default="")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--num-batches", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--synthetic", action="store_true",
                   help="calibrate on random inputs (no dataset needed)")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import sys

    sys.path.insert(0, "/root/repo")
    from petr_tpu.configs import get_config
    from petr_tpu.quant import calibrate_detector, save_scales
    from petr_tpu.train import create_train_state
    from petr_tpu.train.checkpoint import load_params

    cfg = get_config(args.config, args.overrides)

    if args.synthetic or not args.infos:
        import __graft_entry__ as ge

        N = cfg.data.num_views * cfg.data.num_frames
        H, W = cfg.data.image_size
        batches = [
            ge._batch(args.batch_size, N, H, W, cfg.data.max_gt,
                      with_ts=cfg.data.num_frames > 1, seed=s)
            for s in range(min(args.num_batches, 8))
        ]
    else:
        from petr_tpu.data import Loader, NuScenesDataset

        ds = NuScenesDataset.from_pkl(
            args.infos, cfg.data, training=False, data_root=args.data_root
        )
        loader = Loader(ds, args.batch_size, shuffle=False, drop_last=False)
        batches = []
        for batch in loader.epoch(0):
            batch.pop("tokens", None)
            batches.append({k: jnp.asarray(v) for k, v in batch.items()})
            if len(batches) >= args.num_batches:
                break

    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, batches[0])
    params = state.params
    if args.ckpt:
        params = load_params(args.ckpt, params)

    scales = calibrate_detector(cfg, params, batches)
    save_scales(args.out, scales)
    n = len(jax.tree.leaves(scales))
    print(f"calibrated {n} activation scales over {len(batches)} batches -> {args.out}")


if __name__ == "__main__":
    main()
