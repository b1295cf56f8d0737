"""Production serving: AOT export (StableHLO artifacts) + micro-batching server.

The reference serves by loading a torch checkpoint into Python and running
`tools/test.py`-style inference; it has no ahead-of-time compiled serving
artifact. petr_tpu adds one, the TPU-native way: `jax.export` serializes the
jitted forward+decode step to a portable StableHLO module that a serving
binary replays without Python model code (and, with ``embed_params=True``,
without a checkpoint).
"""

from petr_tpu.serve.export import (
    StreamingArtifactRunner,
    export_serving,
    export_streaming,
    load_artifact,
    make_serving_fn,
    save_artifact,
    save_streaming_artifact,
    serving_input_spec,
    streaming_input_spec,
)
from petr_tpu.serve.server import InferenceServer
from petr_tpu.serve.streaming import StreamingPETRv2, self_padded_timestamp

__all__ = [
    "export_serving",
    "export_streaming",
    "load_artifact",
    "make_serving_fn",
    "save_artifact",
    "save_streaming_artifact",
    "serving_input_spec",
    "streaming_input_spec",
    "InferenceServer",
    "StreamingArtifactRunner",
    "StreamingPETRv2",
    "self_padded_timestamp",
]
