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

import os as _os

# Persistent XLA compilation cache: first compiles of the big train/eval
# graphs take minutes (remote compile); cache them across processes. TPU
# only — CPU AOT artifacts are machine-feature-specific (a cached artifact
# from a different compile host can SIGILL) and CPU compiles are fast anyway.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/jax_petr_tpu")
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    try:  # apply even if jax was imported before petr_tpu
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
