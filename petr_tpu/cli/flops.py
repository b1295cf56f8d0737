"""Model complexity report (reference `tools/analysis_tools/get_flops.py`).

    python -m petr_tpu.cli.flops --config petr_vov_p4_800x320

Reports parameter count and XLA-analyzed FLOPs/bytes for the jitted forward.
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="petr_vov_p4_800x320")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
        help="dotted config overrides",
    )
    args = p.parse_args()

    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector

    cfg = get_config(args.config, args.overrides)
    model = PETRDetector(cfg.model, deterministic=True)
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(1, N, H, W, 8, with_ts=cfg.data.num_frames > 1)

    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"],
            timestamp=batch.get("timestamp"),
        )
    )
    n_params = sum(int(v.size) for v in jax.tree.leaves(variables["params"]))

    def fwd(params):
        return model.apply(
            {"params": params}, batch["images"], batch["img2lidar"], batch["img_hw"],
            timestamp=batch.get("timestamp"),
        )

    lowered = jax.jit(fwd).lower(variables["params"])
    flops = None
    mem = {}
    try:
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops")
        ma = compiled.memory_analysis()
        if ma is not None:
            # compiled HBM footprint (beyond the reference's FLOPs report)
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
    except Exception as e:  # cost/memory analysis is backend-dependent
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "config": args.config,
                "params_m": round(n_params / 1e6, 2),
                "forward_gflops": round(flops / 1e9, 1) if flops else None,
                "input": f"{N}x{H}x{W}",
                **mem,
            }
        )
    )


if __name__ == "__main__":
    main()
