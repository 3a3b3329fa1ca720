"""Shared utilities: log plumbing and formatting helpers."""

from nightlight_tpu.utils.logging import MultiWriter, auto_fill  # noqa: F401
