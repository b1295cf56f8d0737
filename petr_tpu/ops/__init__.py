from petr_tpu.ops.geometry import (
    inverse_sigmoid,
    pos2posemb3d,
    depth_bins,
    frustum_coords,
    backproject_frustum,
    position_coords_3d,
    sine_posemb_2d_multiview,
)
from petr_tpu.ops.boxes import (
    encode_bbox,
    decode_bbox,
    gravity_center_boxes,
    bottom_center_boxes,
    points_img2cam,
)
from petr_tpu.ops.losses import (
    sigmoid_focal_loss,
    weighted_l1_loss,
    focal_loss_cost,
    bbox_l1_cost,
)
from petr_tpu.ops.matcher import hungarian_match, lap_solve
from petr_tpu.ops.nms_free import nms_free_decode
