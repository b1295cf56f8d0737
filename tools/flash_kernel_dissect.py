"""Standalone flash-kernel backward repro from a saved bad step.

Extracts the real per-layer cross-attention inputs (q/k/v projections) at
the diverging step, then runs ONLY the flash fwd+bwd on them (dO = ones)
on the current backend, printing nonfinite counts for dq/dk/dv and the
intermediate lse/out. A standalone NaN here gives a minutes-fast repro to
iterate the kernel on; a clean result means the NaN needs the exact
upstream cotangents (instrument the full backward instead).

    PYTHONPATH=... python tools/flash_kernel_dissect.py \
        --snapshot .../healthy_step_X.pkl --bad .../bad_step.pkl
"""

import argparse
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

    from petr_tpu.models import PETRDetector
    from petr_tpu.train.forensics import load_snapshot

    snap = load_snapshot(args.snapshot)
    cfg = snap["cfg"]
    bad = pickle.load(open(args.bad, "rb"))
    params = jax.tree.map(jnp.asarray, bad["params"])
    jb = {k: jnp.asarray(v) for k, v in bad["batch"].items()}
    rng = jax.random.PRNGKey(snap["loader_args"]["seed"] + 1)
    step_rng = jax.random.fold_in(jax.random.fold_in(rng, bad["step"]), 0)
    gm_rng, drop_rng = jax.random.split(step_rng)

    model = PETRDetector(cfg.model, deterministic=False)

    def capture(params):
        _, mods = model.apply(
            {"params": params}, jb["images"], jb["img2lidar"], jb["img_hw"],
            timestamp=jb.get("timestamp"), grid_mask_rng=gm_rng,
            rngs={"dropout": drop_rng}, capture_intermediates=True,
        )
        inter = mods["intermediates"]
        picked = {}

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,))
            elif isinstance(node, (tuple, list)):
                for i, v in enumerate(node):
                    walk(v, path + (str(i),))
            else:
                p = "/".join(path)
                if "cross_attn" in p and any(
                    f"{n}_proj" in p for n in ("q", "k", "v")
                ):
                    picked[p] = node

        walk(inter, ())
        return picked

    projs = jax.jit(capture)(params)
    print("captured:", sorted(projs), flush=True)

    from petr_tpu.ops.pallas.cross_attention import (
        _flash_backward_impl,
        _flash_forward,
        _pad_to,
    )

    H = cfg.model.head.num_heads
    layers = sorted({p.rsplit("/", 3)[0] for p in projs})
    for lay in layers:
        def get(n):
            key = [p for p in projs if p.startswith(f"{lay}/{n}_proj")][0]
            x = projs[key]
            B, L, C = x.shape
            return jnp.transpose(x.reshape(B, L, H, C // H), (0, 2, 1, 3))

        q, k, v = get("q"), get("k"), get("v")
        out, lse = _flash_forward(q, k, v, None, dropout_rate=0.1,
                                  dropout_seed=jnp.int32(123))
        B, Hh, Q, D = q.shape
        L = k.shape[2]
        do = jnp.ones_like(out)
        delta = (do.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
        mask = _pad_to(jnp.zeros((B, L), jnp.int32), 1, 512, value=1)
        dq, dk, dv = _flash_backward_impl(
            _pad_to(q, 2, 128), _pad_to(k, 2, 512), _pad_to(v, 2, 512),
            mask, _pad_to(do, 2, 128), _pad_to(delta, 2, 128),
            _pad_to(lse, 2, 128, value=1e30), jnp.int32(123),
            block_k=512, interpret=False, dropout_rate=0.1,
        )
        stats = {
            "q_absmax": float(jnp.abs(q).max()),
            "k_absmax": float(jnp.abs(k).max()),
            "s_est": float(jnp.abs(q).max() * jnp.abs(k).max() * D / np.sqrt(D)),
            "lse_absmax": float(jnp.abs(lse).max()),
            "out_nonfinite": int((~jnp.isfinite(out)).sum()),
            "lse_nonfinite": int((~jnp.isfinite(lse)).sum()),
            "dq_nonfinite": int((~jnp.isfinite(dq)).sum()),
            "dk_nonfinite": int((~jnp.isfinite(dk)).sum()),
            "dv_nonfinite": int((~jnp.isfinite(dv)).sum()),
        }
        print(lay, stats, flush=True)


if __name__ == "__main__":
    main()
