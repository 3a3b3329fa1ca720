"""Operator schema export for the web UI.

The reference hand-maintains 39 Blockly block definitions mirroring every
operator (reference: web/js/blocks.js); here the palette is generated from
the operator registry itself, so the UI can never drift from the engine.
"""

from __future__ import annotations

from nightlight_tpu.pipeline.operators import _operator_factories

# Toolbox categories of the reference UI (web/js/toolbox.js).
CATEGORIES = {
    "file": ["load", "loadMany", "save"],
    "pre": ["calibrate", "badPixel", "debayer", "debandHoriz", "debandVert",
            "scaleOffset", "bin", "backExtract", "starDetect"],
    "ref": ["selectRef", "filter", "exportStats"],
    "post": ["matchHist", "align"],
    "stack": ["stack", "stackBatches"],
    "rgb": ["rgbCombine", "rgbBalance", "rgbToHSLuv", "hsluvToRGB"],
    "hsl": ["hslApplyLum", "hslScaleOffsetChannel", "hslNeutralizeBackground",
            "hslSaturationGamma", "hslSelectiveSaturation", "hslRotateHue",
            "hslSCNR", "hslMidtones", "hslGamma", "hslGammaPP",
            "HSLUnsharpMask", "hslScaleBlack", "hslStretch"],
    "stretch": ["normRange", "stretch", "midtones", "gamma", "gammaPP",
                "scaleBlack", "gaussianBlur", "unsharpMask"],
    "seq": ["seq"],
}


def operator_schema() -> dict:
    """JSON-serializable description of every registered operator."""
    ops = {}
    for t, cls in sorted(_operator_factories.items()):
        params = []
        for field, (json_name, default) in cls.PARAMS.items():
            if hasattr(default, "to_dict"):
                default = default.to_dict()
            kind = "number"
            if isinstance(default, bool):
                kind = "bool"
            elif isinstance(default, str) or default is None:
                kind = "string" if not isinstance(default, (int, float)) else kind
            if isinstance(default, (list, dict)):
                kind = "json"
            params.append({"name": json_name, "default": default, "kind": kind})
        doc = (cls.__doc__ or "").strip().split("\n")[0]
        ops[t] = {"params": params, "doc": doc}
    return {"categories": CATEGORIES, "operators": ops}
