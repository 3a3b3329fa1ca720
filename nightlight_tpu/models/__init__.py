"""Named pipeline presets (the framework's model-zoo analog)."""

from nightlight_tpu.models.presets import build_command_seq, build_preprocess_seq  # noqa: F401
