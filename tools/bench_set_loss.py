"""Focused set-loss bench: device Hungarian + focal/L1 over all decoder
layers at the flagship matching shape, forward AND forward+grad.

ROOFLINE.md §6 measured matcher+set-loss as the single largest non-GEMM
block of the train step (~25-30% of the no-remat batch-4 step). The round-5
lever is the vectorized row-reduction warm start in ops/matcher.py
(`lap_solve`): ~90% of GT rows skip the sequential augmenting search, which
is the block's real cost on TPU (lock-step `lax.while_loop` iterations
under the (layers x batch) vmap, not FLOPs).

    python tools/bench_set_loss.py            # chained-scan protocol,
    # host-value read per iteration (relay-safe), prints ms/call
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import petr_tpu  # noqa: F401  (persistent compile cache)
from petr_tpu.train.losses import petr_set_loss

L, B, Q, C, G = 6, 4, 900, 10, 128


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    outputs = {
        "cls_logits": jnp.asarray(rng.randn(L, B, Q, C).astype(np.float32)),
        "bbox_codes": jnp.asarray(rng.randn(L, B, Q, 10).astype(np.float32)),
    }
    gt_boxes = np.concatenate(
        [
            rng.uniform(-30, 30, (B, G, 2)),
            rng.uniform(-3, 1, (B, G, 1)),
            rng.uniform(1, 4, (B, G, 3)),
            rng.uniform(-np.pi, np.pi, (B, G, 1)),
            rng.uniform(-2, 2, (B, G, 2)),
        ],
        -1,
    ).astype(np.float32)
    gt_labels = rng.randint(0, C, (B, G)).astype(np.int32)
    gt_valid = np.ones((B, G), np.bool_)
    return outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid)


def chain(fn, n_iter, *args):
    """Chain n_iter dependent calls in a lax.scan (amortizes relay RTT)."""

    def body(carry, _):
        outputs, gb, gl, gv = args
        outs = {
            "cls_logits": outputs["cls_logits"] + carry * 1e-9,
            "bbox_codes": outputs["bbox_codes"],
        }
        val = fn(outs, gb, gl, gv)
        return val, None

    def run(*a):
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return out

    return jax.jit(run)


def main():
    outputs, gb, gl, gv = make_inputs()

    def loss_only(outs, gb, gl, gv):
        total, _ = petr_set_loss(outs, gb, gl, gv)
        return total

    def loss_grad(outs, gb, gl, gv):
        def f(codes):
            total, _ = petr_set_loss(
                {"cls_logits": outs["cls_logits"], "bbox_codes": codes},
                gb, gl, gv)
            return total

        val, g = jax.value_and_grad(f)(outs["bbox_codes"])
        return val + g.sum() * 1e-9

    n_iter = 16
    for name, fn in (("fwd", loss_only), ("fwd+grad", loss_grad)):
        run = chain(fn, n_iter, outputs, gb, gl, gv)
        float(run())  # compile + warmup (host value read)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run())
            times.append((time.perf_counter() - t0) / n_iter * 1000)
        best = min(times)
        print(f"set_loss {name}: {best:.2f} ms/call "
              f"(L={L} B={B} Q={Q} G={G}; chained x{n_iter}, best of 5)",
              flush=True)


if __name__ == "__main__":
    main()
