"""3D box codec — the 10-dim normalized layout used for regression/matching.

Behavioral reference: `projects/mmdet3d_plugin/core/bbox/util.py:38-87`
(sty61010/PETR). The interleaved layout is load-bearing:

    raw box   : (cx, cy, cz, w, l, h, yaw[, vx, vy])          (9-dim)
    normalized: (cx, cy, log w, log l, cz, log h, sin yaw, cos yaw[, vx, vy])

Note cz sits at index 4 of the normalized code, not index 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_bbox(boxes: jax.Array) -> jax.Array:
    """Raw 7/9-dim boxes -> 8/10-dim normalized regression targets."""
    cx = boxes[..., 0:1]
    cy = boxes[..., 1:2]
    cz = boxes[..., 2:3]
    w = jnp.log(boxes[..., 3:4])
    l = jnp.log(boxes[..., 4:5])
    h = jnp.log(boxes[..., 5:6])
    yaw = boxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(yaw), jnp.cos(yaw)]
    if boxes.shape[-1] > 7:
        parts += [boxes[..., 7:8], boxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def decode_bbox(codes: jax.Array) -> jax.Array:
    """8/10-dim normalized codes -> raw 7/9-dim boxes."""
    yaw = jnp.arctan2(codes[..., 6:7], codes[..., 7:8])
    cx = codes[..., 0:1]
    cy = codes[..., 1:2]
    cz = codes[..., 4:5]
    w = jnp.exp(codes[..., 2:3])
    l = jnp.exp(codes[..., 3:4])
    h = jnp.exp(codes[..., 5:6])
    parts = [cx, cy, cz, w, l, h, yaw]
    if codes.shape[-1] > 8:
        parts += [codes[..., 8:9], codes[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def points_img2cam(points: jax.Array, cam2img: jax.Array) -> jax.Array:
    """Unproject 2.5D image points (u, v, depth) to camera-frame 3D.

    Behavioral reference: `core/bbox/util.py:4-35` — homogeneous
    (u*d, v*d, d, 1) through the inverse of the 4x4-padded intrinsic matrix.

    Args:
        points: (..., 3) as (x_img, y_img, depth).
        cam2img: camera intrinsics, (3, 3), (3, 4) or (4, 4).
    Returns:
        (..., 3) camera-frame points.
    """
    d = points[..., 2:3]
    homo = jnp.concatenate(
        [points[..., :2] * d, d, jnp.ones_like(d)], axis=-1
    )  # (..., 4)
    pad = jnp.eye(4, dtype=jnp.float32)
    pad = pad.at[: cam2img.shape[0], : cam2img.shape[1]].set(
        cam2img.astype(jnp.float32)
    )
    # TPU matmuls default to reduced precision; intrinsics have O(1e2-1e3)
    # entries, so the inverse and the projection must run at full fp32.
    with jax.default_matmul_precision("highest"):
        out = homo.astype(jnp.float32) @ jnp.linalg.inv(pad).T
    return out[..., :3].astype(points.dtype)


def gravity_center_boxes(boxes_bottom: jax.Array) -> jax.Array:
    """Bottom-center-z boxes -> gravity-center-z (z += h/2).

    nuScenes GT ships bottom-center z; training targets use gravity center
    (`petr_head.py:691-693` builds GT as cat(gravity_center, dims, yaw, v)).
    """
    z = boxes_bottom[..., 2:3] + boxes_bottom[..., 5:6] * 0.5
    return jnp.concatenate([boxes_bottom[..., :2], z, boxes_bottom[..., 3:]], axis=-1)


def box_corners(boxes: jax.Array) -> jax.Array:
    """8 corners of gravity-center boxes, (..., 8, 3).

    Convention (mmdet3d 0.17 LiDAR boxes): at yaw=0 dim w spans x and l spans
    y; yaw rotates about +z. Corner order is the (x, y, z) sign lattice
    (---, --+, -+-, ..., +++) in box-local frame.
    """
    w = boxes[..., 3:4]
    l = boxes[..., 4:5]
    h = boxes[..., 5:6]
    yaw = boxes[..., 6]
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5) for sz in (-0.5, 0.5)],
        jnp.float32,
    )  # (8, 3)
    local = signs[None] * jnp.stack([w, l, h], axis=-1).reshape(*boxes.shape[:-1], 1, 3)
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    x = local[..., 0] * c - local[..., 1] * s
    y = local[..., 0] * s + local[..., 1] * c
    rotated = jnp.stack([x, y, local[..., 2]], axis=-1)
    return rotated + boxes[..., None, :3]


def bottom_center_boxes(boxes_gravity: jax.Array) -> jax.Array:
    """Gravity-center-z boxes -> bottom-center-z (z -= h/2), as emitted at
    decode time (`petr_head.py:746`)."""
    z = boxes_gravity[..., 2:3] - boxes_gravity[..., 5:6] * 0.5
    return jnp.concatenate([boxes_gravity[..., :2], z, boxes_gravity[..., 3:]], axis=-1)
