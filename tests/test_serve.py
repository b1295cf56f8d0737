"""AOT serving export (petr_tpu/serve/export.py) + micro-batching server.

Serving is a petr_tpu capability addition (the reference's tools/test.py is
an offline evaluator; tools/misc/publish_model.py ships weights only).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector
from petr_tpu.serve import (
    InferenceServer,
    export_serving,
    load_artifact,
    make_serving_fn,
    save_artifact,
    serving_input_spec,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny_debug")
    B, N, H, W = 1, 6, *cfg.data.image_size
    batch = ge._batch(B, N, H, W, 4)
    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"]
    )["params"]
    return cfg, params, batch


def _inputs(batch):
    return batch["images"], batch["img2lidar"], batch["img_hw"]


def test_serving_fn_matches_eval_step(tiny):
    cfg, params, batch = tiny
    fn = make_serving_fn(cfg)
    out = fn(params, *_inputs(batch))
    assert set(out) == {"boxes", "scores", "labels", "valid"}
    assert out["boxes"].shape == (1, cfg.max_det, 9)
    assert bool(jnp.all(jnp.isfinite(out["boxes"])))


def test_export_roundtrip_external_params(tiny, tmp_path):
    cfg, params, batch = tiny
    ref = make_serving_fn(cfg)(params, *_inputs(batch))
    exported = export_serving(cfg, params, batch_size=1)
    path = str(tmp_path / "model.petrx")
    save_artifact(path, exported, cfg, batch_size=1, embed_params=False)
    call, meta = load_artifact(path)
    assert meta["config"] == cfg.name and not meta["embed_params"]
    out = call(params, *_inputs(batch))
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]), rtol=1e-3, atol=1e-3
    )
    # top-k order is recompilation-dependent where scores tie; compare boxes
    # only at gap-separated ranks
    s = np.asarray(ref["scores"][0])
    gap = np.ones_like(s, bool)
    gap[1:] &= (s[:-1] - s[1:]) > 1e-5
    gap[:-1] &= (s[:-1] - s[1:]) > 1e-5
    np.testing.assert_allclose(
        np.asarray(out["boxes"])[0][gap], np.asarray(ref["boxes"])[0][gap],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(out["labels"])[0][gap], np.asarray(ref["labels"])[0][gap]
    )


def test_export_roundtrip_embedded_params(tiny, tmp_path):
    cfg, params, batch = tiny
    ref = make_serving_fn(cfg)(params, *_inputs(batch))
    exported = export_serving(cfg, params, batch_size=1, embed_params=True)
    path = str(tmp_path / "model_embed.petrx")
    save_artifact(path, exported, cfg, batch_size=1, embed_params=True)
    call, meta = load_artifact(path)
    assert meta["embed_params"]
    out = call(*_inputs(batch))  # no params needed
    np.testing.assert_allclose(
        np.asarray(out["scores"], np.float32),
        np.asarray(ref["scores"], np.float32),
        rtol=1e-3, atol=1e-3,
    )


def test_export_rejects_depthr():
    cfg = get_config("depthr_r50_c5_512x1408_gtdepth")
    with pytest.raises(NotImplementedError):
        make_serving_fn(cfg)


def test_serving_spec_includes_timestamp_for_v2():
    cfg = get_config("petrv2_vov_p4_800x320")
    spec = serving_input_spec(cfg, 2)
    assert "timestamp" in spec
    assert spec["images"].shape[0] == 2
    assert spec["images"].shape[1] == cfg.data.num_views * cfg.data.num_frames


def test_server_batches_and_matches_direct(tiny):
    cfg, params, batch = tiny
    BATCH = 4
    fn = jax.jit(make_serving_fn(cfg))

    # distinct samples; direct reference at the server's batch size
    samples = []
    for s in range(5):  # 5 requests -> one full batch of 4 + one padded
        b = ge._batch(1, 6, *cfg.data.image_size, 4, seed=s)
        samples.append({k: np.asarray(b[k])[0] for k in ("images", "img2lidar", "img_hw")})

    with InferenceServer(
        lambda *a: fn(params, *a), batch_size=BATCH, max_delay_ms=200.0
    ) as srv:
        futs = [srv.submit(s) for s in samples]
        outs = [f.result(timeout=120) for f in futs]

    for s, out in zip(samples, outs):
        stacked = tuple(
            np.broadcast_to(s[k], (BATCH,) + s[k].shape)
            for k in ("images", "img2lidar", "img_hw")
        )
        ref = jax.device_get(fn(params, *stacked))
        np.testing.assert_allclose(
            out["scores"], ref["scores"][0], rtol=2e-5, atol=2e-5
        )
        assert out["boxes"].shape == (cfg.max_det, 9)


def test_server_propagates_errors(tiny):
    cfg, params, batch = tiny

    def boom(*a):
        raise RuntimeError("kaboom")

    with InferenceServer(boom, batch_size=2, max_delay_ms=1.0) as srv:
        sample = {k: np.asarray(batch[k])[0] for k in ("images", "img2lidar", "img_hw")}
        fut = srv.submit(sample)
        with pytest.raises(RuntimeError, match="kaboom"):
            fut.result(timeout=30)

    with pytest.raises(RuntimeError):
        srv.submit(sample)  # closed


def test_server_rejects_missing_keys(tiny):
    cfg, params, batch = tiny
    with InferenceServer(lambda *a: None, batch_size=1) as srv:
        with pytest.raises(KeyError):
            srv.submit({"images": np.zeros((6, 8, 8, 3))})
