"""Convert a reference (torch) PETR checkpoint into petr_tpu params.

    python -m petr_tpu.cli.convert --config petr_vov_p4_800x320 \
        --torch-ckpt petr_vovnet_gridmask_p4_800x320.pth --out work_dirs/imported

Covers the reference's model_converters CLI surface (e.g.
`tools/model_converters/regnet2mmdet.py` — key remappers run as scripts)
for the direction this framework needs: released torch checkpoints ->
petr_tpu param trees, saved as an orbax params-only checkpoint consumable
by `cli.train --load-from` / `cli.test --ckpt`.
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--torch-ckpt", required=True, help=".pth state dict")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--verbose", action="store_true", help="print unmatched keys")
    p.add_argument("--allow-partial", action="store_true",
                   help="accept partial coverage (e.g. backbone-only ckpts)")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import orbax.checkpoint as ocp

    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state
    from petr_tpu.utils.torch_convert import convert_state_dict, load_torch_state_dict

    cfg = get_config(args.config, args.overrides)
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(1, N, H, W, cfg.data.max_gt, with_ts=cfg.data.num_frames > 1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, batch)

    sd = load_torch_state_dict(args.torch_ckpt)
    params, stats = convert_state_dict(
        sd, state.params,
        shared_branches=cfg.model.head.shared_branches,
        verbose=args.verbose,
    )
    print(f"matched {stats['matched']} / skipped {stats['skipped']} reference "
          f"keys; {stats['unfilled']} target leaves unfilled")
    if stats["unfilled"] and not args.allow_partial:
        raise SystemExit(
            f"{stats['unfilled']} target leaves not covered by the torch "
            "checkpoint — pass --allow-partial for backbone-only imports"
        )

    out = os.path.abspath(args.out)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, {"params": params}, force=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
