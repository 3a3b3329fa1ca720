"""Web editor contract tests (VERDICT r3 item 8).

This image has no JS engine (no node/deno/quickjs), so app.js cannot be
executed in CI. The editor is schema-driven by construction — the palette,
defaults, sliders, and dropdowns all come from /api/v1/schema — which
leaves exactly three drift risks, each pinned here statically:

1. the schema FIELD NAMES app.js dereferences (SCHEMA.categories,
   operators[t].params/.doc, p.name/.default/.range/.enum/.kind) must be
   exactly what serve/schema.py emits;
2. the HARDCODED strings in app.js — special-cased op types ("seq",
   "stackBatches", the "perBatch" nesting key), REST endpoints, element
   ids — must exist in the registry / REST routes / index.html;
3. the CODEGEN: a palette click builds defaultOp(t) = {type, **defaults}
   and POSTs the tree to /api/v1/job. defaultOp is a five-line pure
   mapping of the schema, mirrored here in Python: for EVERY registered
   operator the generated dict must decode through op_from_dict and
   round-trip to_dict — the same contract the reference pins through its
   Blockly codegen (web/js/codegen.js:1-203).
"""

from __future__ import annotations

import json
import os
import re

import pytest

WEB = os.path.join(os.path.dirname(__file__), "..", "nightlight_tpu", "serve", "web")


@pytest.fixture(scope="module")
def app_js() -> str:
    with open(os.path.join(WEB, "js", "app.js")) as f:
        return f.read()


@pytest.fixture(scope="module")
def index_html() -> str:
    with open(os.path.join(WEB, "index.html")) as f:
        return f.read()


@pytest.fixture(scope="module")
def schema() -> dict:
    from nightlight_tpu.serve.schema import operator_schema

    # round-trip through JSON: the UI sees the serialized form
    return json.loads(json.dumps(operator_schema()))


def _default_op(schema: dict, t: str) -> dict:
    """Python mirror of app.js defaultOp(type) (app.js:37-44)."""
    op = {"type": t}
    for p in schema["operators"][t]["params"]:
        op[p["name"]] = p["default"]
    if t == "seq":
        op["steps"] = []
    if t == "stackBatches":
        op["perBatch"] = {"type": "seq", "steps": []}
    return op


class TestSchemaFieldContract:
    def test_top_level_fields(self, app_js, schema):
        """Every SCHEMA.<field> dereference in app.js exists in the emitted
        schema."""
        for field in set(re.findall(r"SCHEMA\.(\w+)", app_js)):
            assert field in schema, f"app.js uses SCHEMA.{field}, schema lacks it"

    def test_operator_entry_fields(self, app_js, schema):
        ops = schema["operators"]
        assert ops, "empty operator schema"
        for field in set(re.findall(r"SCHEMA\.operators\[\w+\]\??\.(\w+)", app_js)):
            for t, entry in ops.items():
                assert field in entry, f"operators[{t}] lacks .{field}"

    def test_param_fields_used_by_inspector(self, schema):
        """app.js reads p.name/p.default always, p.range/p.enum/p.kind
        conditionally; name and default must exist on every param, and the
        conditional fields must carry the shapes the widgets index into
        (range -> [lo, hi, step]; enum -> [[label, value], ...])."""
        for t, entry in schema["operators"].items():
            for p in entry["params"]:
                assert "name" in p and "default" in p, (t, p)
                if "range" in p:
                    assert len(p["range"]) == 3, (t, p)
                if "enum" in p:
                    assert all(len(pair) == 2 for pair in p["enum"]), (t, p)

    def test_every_palette_type_has_an_operator(self, schema):
        """renderPalette skips unknown types silently (app.js:68); a
        category entry without a registered operator would vanish from the
        palette with no error — fail loudly here instead."""
        for cat, types in schema["categories"].items():
            for t in types:
                assert t in schema["operators"], f"category {cat} lists unregistered {t}"


class TestHardcodedStrings:
    def test_special_cased_types_are_registered(self, app_js):
        from nightlight_tpu.pipeline.operators import get_operator_factory

        # the nesting rules special-case these two types by string
        for t in ("seq", "stackBatches"):
            assert f'"{t}"' in app_js
            assert get_operator_factory(t) is not None

    def test_perbatch_key_matches_serialization(self):
        from nightlight_tpu.pipeline.ops_stack import OpStackBatches

        assert "perBatch" in OpStackBatches().to_dict()

    def test_endpoints_exist_in_rest_server(self, app_js):
        import inspect

        from nightlight_tpu.serve import rest

        src = inspect.getsource(rest)
        for ep in set(re.findall(r"fetch\(\"(/api/v1/\w+)\"", app_js)):
            assert ep in src, f"app.js calls {ep}, rest.py does not route it"

    def test_element_ids_exist_in_index_html(self, app_js, index_html):
        for el_id in set(re.findall(r'\$\("(\w+)"\)', app_js)):
            assert f'id="{el_id}"' in index_html, f"app.js uses #{el_id}"


class TestCodegen:
    def test_default_op_decodes_for_every_type(self, schema):
        """Palette click -> defaultOp -> POST: the generated dict for EVERY
        schema type must decode through the registry and round-trip."""
        from nightlight_tpu.pipeline.operators import op_from_dict

        for t in schema["operators"]:
            d = _default_op(schema, t)
            op = op_from_dict(json.loads(json.dumps(d)))
            back = op.to_dict()
            assert back["type"] == t
            # every schema param survives the round trip under its name
            for p in schema["operators"][t]["params"]:
                assert p["name"] in back, (t, p["name"])

    def test_default_job_tree_decodes(self, schema):
        """A nested tree like the editor builds (stackBatches with a
        perBatch seq of defaults) decodes as one job."""
        from nightlight_tpu.pipeline.operators import op_from_dict

        job = {"type": "seq", "steps": [_default_op(schema, "loadMany"),
                                        _default_op(schema, "stackBatches"),
                                        _default_op(schema, "save")]}
        job["steps"][1]["perBatch"]["steps"] = [_default_op(schema, "stack")]
        root = op_from_dict(json.loads(json.dumps(job)))
        assert root.to_dict()["steps"][1]["perBatch"]["steps"][0]["type"] == "stack"
