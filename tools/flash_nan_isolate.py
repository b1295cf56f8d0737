"""Isolate the TPU-only backward NaN from the saved bad step.

Computes grads of the exact diverging (params, batch, rng) under:
  1. flash=True,  Mosaic-compiled kernel  (expected: NaN — reproduces)
  2. flash=True,  interpret mode          (CPU-identical semantics)
  3. flash=False, XLA attention           (no Pallas at all)

If (1) is NaN while (2)/(3) are finite, the Mosaic compilation of the
flash VJP is the culprit and the dissection continues inside the kernel.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/flash_nan_isolate.py \
        --snapshot .../healthy_step_*.pkl --bad .../bad_step.pkl
"""

import argparse
import dataclasses
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", required=True)
    p.add_argument("--bad", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from petr_tpu.train.forensics import load_snapshot, nonfinite_by_subtree
    from petr_tpu.train.train_step import make_grad_fn

    snap = load_snapshot(args.snapshot)
    cfg = snap["cfg"]
    bad = pickle.load(open(args.bad, "rb"))
    params = jax.tree.map(jnp.asarray, bad["params"])
    jb = {k: jnp.asarray(v) for k, v in bad["batch"].items()}
    rng = jax.random.PRNGKey(snap["loader_args"]["seed"] + 1)
    step_rng = jax.random.fold_in(jax.random.fold_in(rng, bad["step"]), 0)

    def run(tag, flash, interpret=False):
        import petr_tpu.ops.pallas.cross_attention as fca

        orig = fca._maybe_interpret
        if interpret:
            fca._maybe_interpret = lambda i: True
        try:
            c = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, use_flash_attention=flash)
            )
            gfn = jax.jit(make_grad_fn(c))
            total, losses, grads, _ = gfn(params, jb, step_rng)
            g = jax.device_get(grads)
            nf = nonfinite_by_subtree(g)
            print(f"{tag}: loss={float(total):.4f} nonfinite={nf or 0}", flush=True)
            return g
        finally:
            fca._maybe_interpret = orig

    g_mosaic = run("flash+mosaic   ", flash=True)
    run("flash+interpret", flash=True, interpret=True)
    run("xla attention  ", flash=False)

    # name the worst leaves of the mosaic run
    flat = jax.tree_util.tree_flatten_with_path(g_mosaic)[0]
    rows = [(jax.tree_util.keystr(pth), int((~np.isfinite(np.asarray(v))).sum()), v.size)
            for pth, v in flat]
    rows = [r for r in rows if r[1]]
    for r in sorted(rows, key=lambda r: -r[1] / max(r[2], 1))[:15]:
        print("  ", r, flush=True)


if __name__ == "__main__":
    main()
