"""Print a resolved experiment config (reference `tools/misc/print_config.py`).

    python -m petr_tpu.cli.print_config --config petr_vov_p4_800x320
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--list", action="store_true")
    args = p.parse_args()

    from petr_tpu.configs import get_config, list_configs

    if args.list or not args.config:
        for name in list_configs():
            print(name)
        return
    cfg = get_config(args.config)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
