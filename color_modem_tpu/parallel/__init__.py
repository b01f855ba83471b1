"""Parallelism layer: mesh builders, halo-exchange collectives, sharded
pipelines (SURVEY.md §2.4/§2.5/§5.7/§5.8 — all new vs the reference)."""

from color_modem_tpu.parallel.halo import (  # noqa: F401
    crop_halo,
    halo_extend,
    halo_extend_lines,
)
from color_modem_tpu.parallel.mesh import (  # noqa: F401
    FRAME_AXIS,
    LINE_AXIS,
    composite_sharding,
    init_distributed,
    make_mesh,
    pad_to_multiple,
    rgb_sharding,
)
from color_modem_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_hop_audio_pipeline,
    make_sharded_hop_pipeline,
    make_sharded_interlaced_pipeline,
    make_sharded_palplus_pipeline,
    make_sharded_pipeline,
    make_sharded_rf_sound_pipeline,
    required_halo,
)
