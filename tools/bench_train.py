"""Training-step throughput vs batch size on the real chip.

Steps are chained through the optimizer state (true data dependence), so one
host read at the end forces the whole chain — RTT amortized over K steps.
"""

import sys
import time

import jax

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.train import create_train_state, make_train_step

K = 10


def main():
    import dataclasses

    name = sys.argv[1] if len(sys.argv) > 1 else "petr_vov_p4_800x320"
    cfg = get_config(name)
    if "--no-remat" in sys.argv:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=False)
        )
        print("remat disabled", flush=True)
    if "--remat-scope" in sys.argv:
        scope = sys.argv[sys.argv.index("--remat-scope") + 1]
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_scope=scope)
        )
        print(f"remat scope: {scope}", flush=True)
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch_sizes = (1, 2, 4, 8)
    if "--batches" in sys.argv:
        batch_sizes = tuple(
            int(b) for b in sys.argv[sys.argv.index("--batches") + 1].split(",")
        )
    json_path = None  # driver-visible artifact: one line for the LAST batch
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    for B in batch_sizes:
        try:
            batches = [
                ge._batch(B, N, H, W, cfg.data.max_gt, with_ts=cfg.data.num_frames > 1, seed=s)
                for s in range(4)
            ]
            state = create_train_state(cfg, jax.random.PRNGKey(0), 1000, batches[0])
            step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
            rng = jax.random.PRNGKey(1)

            def run_chain():
                nonlocal state
                for i in range(K):
                    state, m = step(state, batches[i % len(batches)], rng)
                return float(m["loss"])  # forces the chain

            run_chain()  # compile + warmup
            run_chain()
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                run_chain()
            dt = (time.perf_counter() - t0) / (iters * K)

            # Canonical train-step flops (fwd+bwd+remat recompute+optimizer):
            # unoptimized lowering with the Pallas flash VJP swapped for its
            # XLA-attention equivalent (identical math — Pallas refuses CPU
            # lowering from an axon process and its interior flops are
            # invisible to cost analysis). Scaled by grad_accum because XLA
            # counts the accumulation scan body once.
            from petr_tpu.utils.mfu import lowered_flops, mfu_fields

            cfg_nf = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, use_flash_attention=False)
            )
            flops = lowered_flops(make_train_step(cfg_nf), state, batches[0], rng)
            mfu = ""
            if flops:
                f = mfu_fields(flops * cfg.train.grad_accum / B, B / dt)
                mfu = (f"  {f.get('model_gflops', 0):7.1f} GF/sample"
                       f"  {f.get('achieved_tflops', 0):6.2f} TF/s"
                       f"  mfu {f.get('mfu_pct', float('nan')):4.1f}%")
            print(
                f"batch {B}: {dt*1e3:7.1f} ms/step  {B/dt:6.2f} samples/s/chip{mfu}",
                flush=True,
            )
            if json_path:
                import json

                f = mfu_fields(flops * cfg.train.grad_accum / B, B / dt) if flops else {}
                with open(json_path, "w") as fh:
                    fh.write(json.dumps({
                        "metric": f"{name}_train_step", "value": round(B / dt, 3),
                        "unit": "samples/s/chip", "batch": B,
                        "ms_per_step": round(dt * 1e3, 2),
                        "remat": cfg.model.remat,
                        "remat_scope": cfg.model.remat_scope,
                        **{k: f[k] for k in ("model_gflops", "achieved_tflops",
                                             "mfu_pct") if k in f},
                    }) + "\n")
            del state, batches
        except Exception as e:  # OOM at large batch
            print(f"batch {B}: failed ({type(e).__name__}: {str(e)[:120]})", flush=True)
            break


if __name__ == "__main__":
    main()
