"""Frame/image layer (SURVEY.md §1 L4 rebuilt as a batched jit pipeline)."""

from color_modem_tpu.frame.pipeline import (  # noqa: F401
    decode_block,
    encode_block,
    make_pipeline,
    roundtrip_block,
)
