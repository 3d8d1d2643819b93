from million_tpu.models.llama import (  # noqa: F401
    ModelConfig,
    init_params,
    prefill,
    decode_step,
    PRESETS,
)
