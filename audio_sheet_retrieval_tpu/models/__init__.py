"""Model zoo: twin conv encoders + CCA head, OMR U-Nets, checkpoint import."""

from audio_sheet_retrieval_tpu.models.configs import (  # noqa: F401
    MODEL_REGISTRY,
    ModelConfig,
    get_model_config,
)
