"""Per-stage TPU timing of the flagship forward (backbone / neck / head).

Uses the same RTT-amortized scan-chain protocol as bench.py: chain K
invocations inside one jit with a data-dependent carry, read one host value.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector
from petr_tpu.models.vovnet import VoVNet
from petr_tpu.models.fpn import CPFPN

SCAN_LEN = 20


def timed(fn, *args, iters=5):
    jfn = jax.jit(fn)
    float(jfn(*args))  # compile + warmup
    float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jfn(*args))
    dt = (time.perf_counter() - t0) / (iters * SCAN_LEN)
    return dt * 1e3


def chain(body):
    def fn(*args):
        def step(carry, _):
            return body(carry, *args), None

        carry, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    return fn


def main():
    cfg = get_config(sys.argv[1] if len(sys.argv) > 1 else "petr_vov_p4_800x320")
    model = PETRDetector(cfg.model, deterministic=True)
    B, N, H, W = 1, 6, *cfg.data.image_size
    batch = ge._batch(B, N, H, W, 8)
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"]
    )
    params = variables["params"]

    def full(carry, params, batch):
        out = model.apply(
            {"params": params},
            batch["images"] + carry * 1e-12,
            batch["img2lidar"],
            batch["img_hw"],
        )
        return out["cls_logits"].sum().astype(jnp.float32)

    print(f"full forward      : {timed(chain(full), params, batch):8.2f} ms", flush=True)

    dtype = jnp.dtype(cfg.model.compute_dtype)
    if cfg.model.backbone.kind == "resnet":
        from petr_tpu.models.resnet import ResNet

        bb = ResNet(
            depth=int(cfg.model.backbone.spec[1:]),  # "r50" -> 50 (detector.py:60)
            out_indices=cfg.model.backbone.out_indices,
            dcn_stages=cfg.model.backbone.dcn_stages,
            remat_stages=False,
            dtype=dtype,
        )
    else:
        bb = VoVNet(
            spec=cfg.model.backbone.spec,
            out_indices=cfg.model.backbone.out_indices,
            remat=cfg.model.remat,
            dtype=dtype,
        )
    imgs = batch["images"].reshape(B * N, H, W, 3).astype(dtype)

    def bb_only(carry, p, imgs):
        outs = bb.apply({"params": p}, imgs + carry.astype(dtype))
        return sum(o.sum() for o in outs).astype(jnp.float32)

    print(
        f"backbone only     : {timed(chain(bb_only), params['backbone'], imgs):8.2f} ms",
        flush=True,
    )

    feats = jax.jit(lambda p, im: bb.apply({"params": p}, im))(params["backbone"], imgs)
    print("feat shapes       :", [tuple(f.shape) for f in feats], flush=True)

    neck = CPFPN(
        out_channels=cfg.model.backbone.fpn_out_channels,
        num_outs=cfg.model.backbone.fpn_num_outs,
        dtype=dtype,
    )

    def neck_only(carry, p, feats):
        outs = neck.apply({"params": p}, tuple(f + carry.astype(dtype) for f in feats))
        return sum(o.sum() for o in outs).astype(jnp.float32)

    print(
        f"neck only         : {timed(chain(neck_only), params['neck'], feats):8.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
