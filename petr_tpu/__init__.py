"""petr_tpu — a TPU-native multi-view 3D perception engine.

A from-scratch JAX/XLA/Pallas re-design of the PETR/PETRv2 capability set
(multi-view camera 3D object detection on nuScenes): camera backbones + FPN,
3D position embeddings from frustum back-projection, DETR-style decoder with
object queries, Hungarian set matching, NMS-free decoding, temporal (v2)
modeling, and pjit sharding over TPU meshes.

Reference behavior studied from sty61010/PETR (see SURVEY.md); the
implementation here is an independent TPU-first design.
"""

__version__ = "0.1.0"
