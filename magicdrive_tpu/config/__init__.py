from .presets import (
    ModelPreset, sd15mv_rawbox_224x400, sd15mv_rawbox_272x736, tiny_debug,
    init_params,
)
