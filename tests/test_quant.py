"""Post-training int8 quantization (petr_tpu/quant + ConvBNReLU quant modes).

The reference has no quantized path (fp16 serving only); this is a petr_tpu
capability addition for TPU serving (int8 MXU = 2x bf16 peak).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector
from petr_tpu.models.layers import ConvBNReLU
from petr_tpu.quant import calibrate, calibrate_detector, load_scales, save_scales


def _conv_setup(rng_seed=0, quant="none"):
    rng = np.random.RandomState(rng_seed)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    m = ConvBNReLU(24, 3, quant=quant)
    return m, x


def test_calib_mode_preserves_numerics_and_records_amax():
    ref_m, x = _conv_setup()
    params = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = ref_m.apply({"params": params}, x)

    calib_m = ConvBNReLU(24, 3, quant="calib")
    y_c, upd = calib_m.apply({"params": params}, x, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_ref), rtol=0, atol=0)
    amax = float(upd["quant"]["act_amax"])
    assert amax == pytest.approx(float(jnp.max(jnp.abs(x))))


def test_calib_accumulates_running_max():
    m = ConvBNReLU(8, 3, quant="calib")
    x1 = jnp.full((1, 4, 4, 4), 2.0)
    x2 = jnp.full((1, 4, 4, 4), -5.0)
    params = m.init(jax.random.PRNGKey(0), x1)["params"]
    _, upd = m.apply({"params": params}, x1, mutable=["quant"])
    _, upd = m.apply({"params": params, "quant": upd["quant"]}, x2, mutable=["quant"])
    assert float(upd["quant"]["act_amax"]) == pytest.approx(5.0)
    # order-independent: larger batch first
    _, upd2 = m.apply({"params": params}, x2, mutable=["quant"])
    _, upd2 = m.apply({"params": params, "quant": upd2["quant"]}, x1, mutable=["quant"])
    assert float(upd2["quant"]["act_amax"]) == pytest.approx(5.0)


def test_int8_conv_close_to_fp32():
    ref_m, x = _conv_setup()
    params = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = ref_m.apply({"params": params}, x)
    _, upd = ConvBNReLU(24, 3, quant="calib").apply(
        {"params": params}, x, mutable=["quant"]
    )
    y_q = ConvBNReLU(24, 3, quant="int8").apply(
        {"params": params, "quant": upd["quant"]}, x
    )
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel


def test_int8_param_tree_matches_fp32():
    ref_m, x = _conv_setup()
    p_ref = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    q_m = ConvBNReLU(24, 3, quant="int8")
    variables = q_m.init(jax.random.PRNGKey(0), x)
    p_q = variables["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_q)
    assert "quant" in variables  # act_amax variable exists at init


def test_int8_respects_stride_and_no_relu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    for stride, relu in ((2, True), (1, False)):
        ref_m = ConvBNReLU(8, 3, stride, relu=relu)
        params = ref_m.init(jax.random.PRNGKey(0), x)["params"]
        y_ref = ref_m.apply({"params": params}, x)
        _, upd = ConvBNReLU(8, 3, stride, relu=relu, quant="calib").apply(
            {"params": params}, x, mutable=["quant"]
        )
        y_q = ConvBNReLU(8, 3, stride, relu=relu, quant="int8").apply(
            {"params": params, "quant": upd["quant"]}, x
        )
        assert y_q.shape == y_ref.shape
        rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 0.05, (stride, relu, rel)


@pytest.mark.slow
def test_detector_int8_e2e(tmp_path):
    import __graft_entry__ as ge

    cfg = get_config("tiny_debug")
    B, N, H, W = 1, 6, *cfg.data.image_size
    batches = [ge._batch(B, N, H, W, 4, seed=s) for s in range(2)]
    b0 = batches[0]

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), b0["images"], b0["img2lidar"], b0["img_hw"]
    )["params"]
    y_ref = model.apply({"params": params}, b0["images"], b0["img2lidar"], b0["img_hw"])

    scales = calibrate_detector(cfg, params, batches)
    path = str(tmp_path / "scales.npz")
    save_scales(path, scales)
    scales = load_scales(path)

    qcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(cfg.model.backbone, quant="int8")
    )
    qmodel = PETRDetector(qcfg, deterministic=True)
    y_q = qmodel.apply(
        {"params": params, "quant": scales},
        b0["images"], b0["img2lidar"], b0["img_hw"],
    )
    for k in ("cls_logits", "bbox_codes"):
        r = y_ref[k].astype(jnp.float32)
        q = y_q[k].astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(q)))
        rel = float(jnp.linalg.norm(q - r) / jnp.linalg.norm(r))
        assert rel < 0.05, (k, rel)


def test_resnet_quant_rejected():
    cfg = get_config("petr_r50_c5_1408x512")
    qcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(cfg.model.backbone, quant="int8")
    )
    model = PETRDetector(qcfg, deterministic=True)
    x = jnp.zeros((1, 6, 32, 32, 3))
    mats = jnp.broadcast_to(jnp.eye(4), (1, 6, 4, 4))
    hw = jnp.full((1, 6, 2), 32.0)
    with pytest.raises(NotImplementedError):
        model.init(jax.random.PRNGKey(0), x, mats, hw)
