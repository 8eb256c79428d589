"""papc_tpu.models — the model zoo (classification, segmentation,
detection)."""

from papc_tpu.models.registry import ModelSpec, init_model

__all__ = ["init_model", "ModelSpec"]
