"""Regenerate docs/JOBS.md from the live operator registry."""

import json

import nightlight_tpu.pipeline  # noqa: F401 - registers all operators
from nightlight_tpu.serve.schema import operator_schema


def main() -> None:
    schema = operator_schema()
    lines = [
        "# JSON job DSL reference",
        "",
        "A job is a JSON operator tree executed by `nightlight-tpu run -job file.json`",
        "or `POST /api/v1/job`. Operator `type` tags and field names are compatible",
        "with the reference implementation's job format (its Blockly UI and REST API",
        "contract). This table is generated from the live operator registry",
        "(`python -m scripts.gen_docs` regenerates it).",
        "",
    ]
    for cat, types in schema["categories"].items():
        lines.append(f"## {cat}")
        lines.append("")
        lines.append("| type | parameters (default) | description |")
        lines.append("|---|---|---|")
        for t in types:
            op = schema["operators"].get(t)
            if not op:
                continue
            params = ", ".join(
                f"`{p['name']}`={json.dumps(p['default'])}" for p in op["params"]) or "—"
            extra = ""
            if t == "seq":
                extra = " `steps`=[...]"
            if t == "stackBatches":
                params = "`perBatch`={seq}"
            lines.append(f"| `{t}` | {params}{extra} | {op['doc']} |")
        lines.append("")
    with open("docs/JOBS.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
