"""Post-training int8 quantization (PTQ) for serving.

The reference stack serves fp16 (`Fp16OptimizerHook`, auto_fp16 gating —
`projects/configs/petr/petr_r50dcn_gridmask_p4.py:250`); it has no
quantized path. On TPU the MXU's int8 throughput is 2x bf16, so petr_tpu
adds an opt-in PTQ mode for the backbone convs (the FLOPs bulk):

    from petr_tpu.quant import calibrate_detector, save_scales, load_scales

    scales = calibrate_detector(cfg, model_apply_batches)   # "calib" pass
    out = model_int8.apply({"params": params, "quant": scales}, *inputs)

Scales live in a separate flax collection ("quant"); checkpoints and the
param tree are untouched. See models/layers.py::ConvBNReLU for the kernel
dataflow (per-output-channel weight scales with BN folded, per-tensor
activation scale, int32 accumulation, dequant+BN-shift+ReLU epilogue).

Measured (v5e, VoVNet-99 stage4 dataflow): 1.20x over bf16 — the VPU
requant between convs eats part of the MXU's 2x; see
tools/bench_int8_stage.py.
"""

from petr_tpu.quant.ptq import (
    calibrate,
    calibrate_detector,
    load_scales,
    save_scales,
)

__all__ = ["calibrate", "calibrate_detector", "save_scales", "load_scales"]
