"""PETRv2 (temporal) end-to-end: loader -> detector -> train step (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.configs.config import (
    BackboneConfig,
    DataConfig,
    ExperimentConfig,
    HeadConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from petr_tpu.data import Loader, NuScenesDataset
from petr_tpu.train import create_train_state, make_eval_step, make_train_step
from tests.test_data import make_synth_infos


def v2_tiny_config():
    return ExperimentConfig(
        name="v2tiny",
        model=ModelConfig(
            backbone=BackboneConfig(kind="vovnet", spec="V-39-eSE", out_indices=(2, 3)),
            head=HeadConfig(
                kind="petrv2", num_query=16, embed_dim=32, num_layers=2,
                num_heads=4, ffn_dim=64, depth_num=4,
                with_fpe=True, with_time=True, with_multi_reg=True,
                shared_branches=False,
            ),
            use_grid_mask=False,
            compute_dtype="float32",
        ),
        data=DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8, num_frames=2),
        train=TrainConfig(optim=OptimConfig(warmup_iters=2, code_weights=(1.0,) * 10)),
    )


@pytest.mark.slow
def test_petrv2_train_and_eval(tmp_path):
    cfg = v2_tiny_config()
    infos = make_synth_infos(tmp_path, n=2, n_prev=4)
    ds = NuScenesDataset(infos, cfg.data, training=True, src_hw=(90, 160), sweep_range=(0, 3))
    loader = Loader(ds, 1, num_threads=1)
    batch = next(iter(loader.epoch(0)))
    batch.pop("tokens")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    assert jb["images"].shape[1] == 12  # two frames x six cams
    assert jb["timestamp"].shape == (1, 12)

    state = create_train_state(cfg, jax.random.PRNGKey(0), 10, jb)
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    ev = jax.jit(make_eval_step(cfg))
    det = ev(state.params, jb)
    assert np.isfinite(np.asarray(det["boxes"])).all()


@pytest.mark.slow
def test_depthr_train_step(tmp_path):
    cfg = ExperimentConfig(
        name="depthr_tiny",
        model=ModelConfig(
            backbone=BackboneConfig(kind="resnet", spec="r50", out_indices=(3,), with_fpn=False),
            head=HeadConfig(kind="depthr", num_query=12, embed_dim=32, num_layers=2,
                            num_heads=4, ffn_dim=64, depth_num=4),
            use_grid_mask=False,
            compute_dtype="float32",
        ),
        data=DataConfig(image_size=(64, 128), final_dim=(64, 128), max_gt=8),
        train=TrainConfig(optim=OptimConfig(warmup_iters=2)),
    )
    infos = make_synth_infos(tmp_path, n=2)
    ds = NuScenesDataset(infos, cfg.data, training=True, src_hw=(90, 160))
    # re-render bigger synthetic images for the 64x128 target
    import numpy as np
    from PIL import Image

    for info in infos:
        for cam in info["cams"].values():
            Image.fromarray(
                np.random.RandomState(0).randint(0, 255, (160, 320, 3), dtype=np.uint8).astype(np.uint8)
            ).save(cam["data_path"])
    ds.src_hw = (160, 320)
    loader = Loader(ds, 1, num_threads=1)
    batch = next(iter(loader.epoch(0)))
    batch.pop("tokens")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), 10, jb)
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_v2_zero_timestamps_finite():
    """Degenerate (all-zero) timestamps must not produce inf velocities
    (dt clamp; the real pipeline pads empty sweeps with a mean offset)."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector

    cfg = get_config("petrv2_vov_p4_800x320")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            backbone=dataclasses.replace(cfg.model.backbone, spec="V-39-eSE"),
        ),
        data=dataclasses.replace(cfg.data, image_size=(64, 160)),
    )
    model = PETRDetector(cfg.model, deterministic=True)
    B, N, H, W = 1, 12, *cfg.data.image_size
    batch = ge._batch(B, N, H, W, 4, with_ts=True)
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"],
        timestamp=batch["timestamp"],
    )
    out = model.apply(
        variables, batch["images"], batch["img2lidar"], batch["img_hw"],
        timestamp=jnp.zeros((B, N)),
    )
    assert np.isfinite(np.asarray(out["bbox_codes"], np.float32)).all()
    assert np.isfinite(np.asarray(out["cls_logits"], np.float32)).all()
