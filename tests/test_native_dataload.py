"""Native C++ data-loader vs the PIL reference path."""

import io

import numpy as np
import pytest
from PIL import Image

from petr_tpu.data import native
from petr_tpu.data.transforms import IdaParams, apply_ida, normalize_image, pad_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native dataload library not built"
)


def make_jpeg(h, w, seed=0):
    rng = np.random.RandomState(seed)
    # smooth image so JPEG loss doesn't dominate the comparison
    base = rng.rand(h // 8 + 1, w // 8 + 1, 3) * 255
    img = np.asarray(
        Image.fromarray(base.astype(np.uint8)).resize((w, h), Image.BILINEAR)
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.mark.parametrize("flip", [False, True])
def test_native_matches_pil_path(flip):
    jpeg = make_jpeg(90, 160)
    mean, std = (103.53, 116.28, 123.675), (57.375, 57.12, 58.395)
    p = IdaParams(0.5, (80, 45), (0, 13, 80, 45), flip, 0.0)

    out = native.process_images(
        [jpeg], resize_wh=p.resize_dims, crop=p.crop, flip=p.flip,
        out_hw=(32, 80), mean=mean, std=std, to_bgr=True,
    )[0]

    pil = Image.open(io.BytesIO(jpeg))
    pil = apply_ida(pil, p)
    arr = np.asarray(pil, np.float32)[..., ::-1]  # RGB -> BGR
    want = pad_image(normalize_image(arr, mean, std), (32, 80))

    assert out.shape == want.shape
    # bicubic fp32 vs PIL's fixed-point intermediate: allow small pixel noise
    err = np.abs(out - want)
    assert np.median(err) < 0.05, np.median(err)
    assert (err < 0.25).mean() > 0.99, err.max()


def test_native_batch_parallel():
    jpegs = [make_jpeg(90, 160, seed=s) for s in range(12)]
    out = native.process_images(
        jpegs, resize_wh=(80, 45), crop=(0, 13, 80, 45), flip=False,
        out_hw=(32, 80), mean=(0, 0, 0), std=(1, 1, 1), n_threads=4,
    )
    assert out.shape == (12, 32, 80, 3)
    # images differ
    assert not np.allclose(out[0], out[1])


def test_native_bad_jpeg_raises():
    with pytest.raises(RuntimeError):
        native.process_images(
            [b"not a jpeg"], resize_wh=(10, 10), crop=(0, 0, 10, 10), flip=False,
            out_hw=(10, 10), mean=(0, 0, 0), std=(1, 1, 1),
        )
