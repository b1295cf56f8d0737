from petr_tpu.data.transforms import (
    sample_ida_params,
    apply_ida,
    compose_lidar2img,
    bev_rotate_scale,
    normalize_image,
    pad_image,
)
from petr_tpu.data.dataset import NuScenesDataset, Loader, collate_batch
from petr_tpu.data.synthetic import generate_synthetic_scenes
