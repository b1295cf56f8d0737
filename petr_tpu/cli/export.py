"""Export an AOT serving artifact (StableHLO) for deployment.

    python -m petr_tpu.cli.export --config petr_vov_p4_800x320 \
        --ckpt work_dirs/petr_vov/ckpts/step_N --out petr_vov.petrx \
        [--batch-size 1] [--embed-params] [--quant-scales scales.npz] \
        [--platforms tpu]

The artifact replays on any machine with jax (no petr_tpu model code
needed): see petr_tpu/serve/export.py::load_artifact. With
``--embed-params`` the checkpoint weights are baked in (self-contained
single file); otherwise the server passes the parameter pytree at call
time. Reference analog: `tools/misc/publish_model.py` (weights-only
publishing) — this additionally ships the compiled computation.
"""

from __future__ import annotations

import argparse

import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None, help="checkpoint dir (omit: random init, smoke only)")
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--embed-params", action="store_true")
    p.add_argument("--quant-scales", default=None, metavar="NPZ")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend)")
    p.add_argument("--streaming", action="store_true",
                   help="export the streaming pair (feature extractor + "
                   "head+decode) for a 2-frame config; replay with "
                   "petr_tpu.serve.StreamingArtifactRunner")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import sys

    sys.path.insert(0, "/root/repo")
    import dataclasses

    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.serve import export_serving, save_artifact
    from petr_tpu.train import create_train_state
    from petr_tpu.train.checkpoint import load_params

    cfg = get_config(args.config, args.overrides)
    quant_scales = None
    if args.quant_scales:
        from petr_tpu.quant import load_scales

        quant_scales = load_scales(args.quant_scales)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(cfg.model.backbone, quant="int8"),
            ),
        )

    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(1, N, H, W, cfg.data.max_gt, with_ts=cfg.data.num_frames > 1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, batch)
    params = state.params
    if args.ckpt:
        params = load_params(args.ckpt, params)

    if args.streaming:
        from petr_tpu.serve import export_streaming, save_streaming_artifact

        exported_pair = export_streaming(
            cfg, params, batch_size=args.batch_size, quant_scales=quant_scales,
            embed_params=args.embed_params, platforms=args.platforms,
        )
        save_streaming_artifact(
            args.out, exported_pair, cfg,
            batch_size=args.batch_size, embed_params=args.embed_params,
        )
        exported = exported_pair[0]
    else:
        exported = export_serving(
            cfg,
            params,
            batch_size=args.batch_size,
            quant_scales=quant_scales,
            embed_params=args.embed_params,
            platforms=args.platforms,
        )
        save_artifact(
            args.out, exported, cfg,
            batch_size=args.batch_size, embed_params=args.embed_params,
        )
    import os

    mb = os.path.getsize(args.out) / 1e6
    print(
        f"exported {cfg.name} (batch {args.batch_size}, platforms "
        f"{list(exported.platforms)}, embed_params={args.embed_params}) "
        f"-> {args.out} ({mb:.1f} MB)"
    )


if __name__ == "__main__":
    main()
