"""Regenerate docs/JOBS.md (operator registry) and docs/CLI.md (flag
reference) from the live code, so the docs cannot drift from the parser or
the registry."""

import json

import nightlight_tpu.pipeline  # noqa: F401 - registers all operators
from nightlight_tpu.serve.schema import operator_schema


def gen_cli() -> None:
    # COMMANDS lives in cli.py next to main()'s dispatch (single source of
    # truth; tests assert the dispatch handles every key), so this table
    # cannot drift from the parser (ADVICE r4).
    from nightlight_tpu.cli import COMMANDS, build_parser

    parser = build_parser()
    cmds = "|".join(COMMANDS)
    lines = [
        "# CLI reference",
        "",
        f"`nightlight-tpu [-flag value ...] ({cmds}) img0.fits ... imgn.fits`",
        "",
        "Flag names, defaults, and per-command default resolution follow the reference",
        "CLI (`cmd/nightlight/main.go:49-166,236-273`) so existing scripts port",
        "unchanged; `-trace`/`-shard` replace the Go pprof flags with the TPU analogs.",
        "This file is generated from the live argparse parser",
        "(`python -m scripts.gen_docs` regenerates it).",
        "",
        "## Commands",
        "",
        "| command | effect |",
        "|---|---|",
    ]
    lines += [f"| `{name}` | {desc} |" for name, desc in COMMANDS.items()]
    lines += [
        "",
        "Per-command defaults: `stats` disables bad-pixel rejection and histogram",
        "normalization; `stack` resolves `-normHist` auto to location+scale and",
        "`-starBpSig` auto to 5; `rgb`/`lrgb` disable both (matching the reference's",
        "`main.go:236-273` resolution).",
        "",
        "## Flags",
        "",
        "| flag | type | default | description |",
        "|---|---|---|---|",
    ]
    for act in parser._actions:  # noqa: SLF001 - introspecting our own parser
        if not act.option_strings:
            continue
        name = act.option_strings[0]
        if name in ("-h", "--help"):
            continue
        typ = ("bool" if act.const is True else
               {int: "int", float: "float"}.get(act.type, "str"))
        default = "" if act.const is True else json.dumps(act.default)
        doc = (act.help or "").replace("%%", "%").replace("|", "\\|")
        lines.append(f"| `{name}` | {typ} | `{default}` | {doc} |")
    lines.append("")
    with open("docs/CLI.md", "w") as f:
        f.write("\n".join(lines))


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
    gen_cli()


if __name__ == "__main__":
    main()
