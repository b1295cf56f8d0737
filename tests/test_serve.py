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


# --- streaming artifacts ------------------------------------------------------

def test_streaming_export_roundtrip(tmp_path):
    """Streaming artifact replay == StreamingPETRv2 decode, frame by frame."""
    from petr_tpu.models.detector import PETRFeatureNet  # noqa: F401 (API)
    from petr_tpu.serve import (
        StreamingArtifactRunner,
        StreamingPETRv2,
        export_streaming,
        save_streaming_artifact,
        self_padded_timestamp,
    )
    from tests.test_petrv2_e2e import v2_tiny_config

    cfg = v2_tiny_config()
    H, W = cfg.data.image_size
    B, N6 = 1, 6
    rng = np.random.default_rng(7)
    img_a = rng.standard_normal((B, N6, H, W, 3)).astype(np.float32)
    img_b = rng.standard_normal((B, N6, H, W, 3)).astype(np.float32)
    i2l = np.tile(np.eye(4, dtype=np.float32), (B, 2 * N6, 1, 1))
    hw = np.tile(np.array([H, W], np.float32), (B, 2 * N6, 1))
    ts = self_padded_timestamp(np.zeros((B, N6), np.float32)).astype(np.float32)

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), np.concatenate([img_a, img_a], 1), i2l, hw,
        timestamp=ts,
    )["params"]

    ref = StreamingPETRv2(cfg, params, decode=True)
    r0 = jax.device_get(ref.step(img_a, i2l, hw, ts))
    r1 = jax.device_get(ref.step(img_b, i2l, hw, ts))

    pair = export_streaming(cfg, params, batch_size=1, embed_params=True)
    path = str(tmp_path / "stream.petrx")
    save_streaming_artifact(path, pair, cfg, batch_size=1, embed_params=True)

    run = StreamingArtifactRunner(path)
    a0 = jax.device_get(run.step(img_a, i2l, hw, ts))
    a1 = jax.device_get(run.step(img_b, i2l, hw, ts))
    for r, a in ((r0, a0), (r1, a1)):
        np.testing.assert_allclose(a["scores"], r["scores"], rtol=1e-4, atol=1e-4)
        # The artifact is a separate XLA compilation: the untrained model's
        # scores are near-tied (focal prior), so top-k row ORDER is arbitrary
        # across compilations. Compare the detection SET: every artifact box
        # row must match some in-process row and vice versa.
        rb = np.asarray(r["boxes"]).reshape(-1, r["boxes"].shape[-1])
        ab = np.asarray(a["boxes"]).reshape(-1, a["boxes"].shape[-1])
        d = np.abs(ab[:, None, :] - rb[None, :, :]).max(-1)
        assert d.min(axis=1).max() < 1e-3, "artifact box not in reference set"
        assert d.min(axis=0).max() < 1e-3, "reference box not in artifact set"

    # external-params artifact requires params at load
    pair2 = export_streaming(cfg, params, batch_size=1, embed_params=False)
    path2 = str(tmp_path / "stream_ext.petrx")
    save_streaming_artifact(path2, pair2, cfg, batch_size=1, embed_params=False)
    with pytest.raises(ValueError, match="params"):
        StreamingArtifactRunner(path2)
    run2 = StreamingArtifactRunner(path2, params=params)
    b0 = jax.device_get(run2.step(img_a, i2l, hw, ts))
    np.testing.assert_allclose(b0["boxes"], r0["boxes"], rtol=1e-4, atol=1e-4)
