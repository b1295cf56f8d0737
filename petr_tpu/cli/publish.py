"""Publish a trained checkpoint: params only, sha256-tagged filename.

    python -m petr_tpu.cli.publish --ckpt work_dirs/x/ckpts/step_N --out petr_vov.pkl

Reference parity: `tools/model_converters/publish_model.py:16-27` strips the
optimizer state and appends a sha256 tag to the filename.
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output path (tag inserted before ext)")
    return p.parse_args()


def main():
    args = parse_args()
    from petr_tpu.utils.publish import publish_checkpoint

    final = publish_checkpoint(args.ckpt, args.out)
    print(f"published {final}")


if __name__ == "__main__":
    main()
