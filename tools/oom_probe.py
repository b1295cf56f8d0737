"""Bisect the r50dcn train-step compile host-OOM (round 3: ~130 GB RSS).

Measures per-stage host cost of building the synth_small_r50dcn train step:
trace+lower (platform-independent; runs on CPU), textual module size, and —
when on the TPU backend — the compile itself. Sweeps the suspect features:

    python tools/oom_probe.py --flash 1 --remat 1 [--dcn xla|pallas]
        [--stage lower|compile] [--batch 4]

Run under `ulimit -v` so a blow-up dies with MemoryError instead of taking
the host down. Peak RSS is read from ru_maxrss.
"""

from __future__ import annotations

import argparse
import resource
import sys
import time


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="synth_small_r50dcn")
    p.add_argument("--flash", type=int, default=1)
    p.add_argument("--remat", type=int, default=1)
    p.add_argument("--remat-scope", default=None)
    p.add_argument("--dcn", default=None, choices=[None, "xla", "pallas"])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 320))
    p.add_argument("--stage", default="lower", choices=["lower", "compile"])
    p.add_argument("--export-tpu", action="store_true",
                   help="lower for the TPU platform via jax.export from a "
                   "CPU process (runs Mosaic lowering of the Pallas kernels "
                   "locally without needing the chip)")
    args = p.parse_args()

    if args.dcn:
        import os

        os.environ["PETR_TPU_DCN_IMPL"] = args.dcn

    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state, make_train_step

    H, W = args.image_hw
    overrides = [f"model.use_flash_attention={bool(args.flash)}",
                 f"model.remat={bool(args.remat)}"]
    if args.remat_scope:
        overrides.append(f"model.remat_scope={args.remat_scope}")
    cfg = get_config(args.config, overrides)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_size=(H, W),
                                      final_dim=(H, W), src_hw=(H, W)))
    batch = ge._batch(args.batch, 6, H, W, cfg.data.max_gt)
    print(f"[{rss_gb():.1f} GB] built batch; backend={jax.default_backend()}",
          flush=True)

    t0 = time.time()
    if args.export_tpu and args.dcn == "pallas":
        # init EXECUTES the forward on the host backend, where the Pallas
        # kernel can't run — init under the XLA impl (same param tree),
        # then restore the requested impl for the export trace.
        import os

        os.environ["PETR_TPU_DCN_IMPL"] = "xla"
        state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)
        os.environ["PETR_TPU_DCN_IMPL"] = args.dcn
    else:
        state = create_train_state(cfg, jax.random.PRNGKey(0), 100, batch)
    print(f"[{rss_gb():.1f} GB] init params ({time.time()-t0:.0f}s)", flush=True)

    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    if args.export_tpu:
        from jax import export as jexport

        t0 = time.time()
        exported = jexport.export(step, platforms=["tpu"])(
            state, batch, jax.random.PRNGKey(1))
        txt = exported.mlir_module()
        print(f"[{rss_gb():.1f} GB] exported for TPU; module "
              f"{len(txt)/1e6:.1f} MB ({time.time()-t0:.0f}s)", flush=True)
        print("OK", flush=True)
        return
    t0 = time.time()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    print(f"[{rss_gb():.1f} GB] lowered ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    txt = lowered.as_text()
    print(f"[{rss_gb():.1f} GB] module text: {len(txt)/1e6:.1f} MB "
          f"({time.time()-t0:.0f}s)", flush=True)
    del txt
    if args.stage == "compile":
        t0 = time.time()
        compiled = lowered.compile()
        print(f"[{rss_gb():.1f} GB] compiled ({time.time()-t0:.0f}s)", flush=True)
        del compiled
    print("OK", flush=True)


if __name__ == "__main__":
    main()
