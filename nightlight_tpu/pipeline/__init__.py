"""Operator/job layer: the JSON job DSL (operator `type` tags compatible
with the reference), the execution context, and the promise scheduler that
overlaps host I/O with device compute."""

# Importing the operator modules registers every operator type.
from nightlight_tpu.pipeline import operators  # noqa: F401
from nightlight_tpu.pipeline import ops_pre  # noqa: F401
from nightlight_tpu.pipeline import ops_ref  # noqa: F401
from nightlight_tpu.pipeline import ops_post  # noqa: F401
from nightlight_tpu.pipeline import ops_stack  # noqa: F401
from nightlight_tpu.pipeline import ops_rgb  # noqa: F401
from nightlight_tpu.pipeline import ops_hsl  # noqa: F401
from nightlight_tpu.pipeline import ops_stretch  # noqa: F401

from nightlight_tpu.pipeline.context import Context  # noqa: F401
from nightlight_tpu.pipeline.operators import (  # noqa: F401
    Operator,
    OpSequence,
    OpLoad,
    OpLoadMany,
    OpSave,
    get_operator_factory,
    materialize_all,
    op_from_dict,
)
