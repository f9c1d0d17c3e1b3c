"""Generate docs/cli-reference.md from the live argparse tree.

Equivalent of the reference's hand-maintained docs/cli-reference.md (311
lines for the typer CLI); here the document is GENERATED so it cannot drift
from the parser. Regenerate with `make docs` or
`python scripts/gen_cli_reference.py`.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepchopper_tpu.cli import build_parser  # noqa: E402


def _fmt_default(action: argparse.Action) -> str:
    if action.default is None or action.default is argparse.SUPPRESS:
        return ""
    if isinstance(action.default, bool):
        return "" if action.default is False else "`True`"
    return f"`{action.default}`"


def _action_rows(parser: argparse.ArgumentParser) -> tuple[list[str], list[str]]:
    """Returns (positional rows, option rows) as markdown table lines."""
    pos, opt = [], []
    for a in parser._actions:
        if isinstance(a, (argparse._HelpAction, argparse._SubParsersAction)):
            continue
        help_text = (a.help or "").replace("|", "\\|")
        if a.option_strings:
            flags = ", ".join(f"`{s}`" for s in a.option_strings)
            metavar = ""
            if a.nargs != 0 and not isinstance(
                a, (argparse._StoreTrueAction, argparse._StoreFalseAction)
            ):
                metavar = f" `{(a.metavar or a.dest).upper()}`"
            opt.append(f"| {flags}{metavar} | {_fmt_default(a)} | {help_text} |")
        else:
            name = a.metavar or a.dest
            n = {None: "", "+": " (one or more)", "*": " (zero or more)", "?": " (optional)"}.get(
                a.nargs, ""
            )
            pos.append(f"| `{name}`{n} | {help_text} |")
    return pos, opt


def _emit(parser: argparse.ArgumentParser, prog: str, level: int, out: list[str]) -> None:
    subactions = [a for a in parser._actions if isinstance(a, argparse._SubParsersAction)]
    pos, opt = _action_rows(parser)
    if level > 0:
        out.append(f"{'#' * min(level + 1, 4)} `{prog}`\n")
        if parser.description:
            out.append(parser.description.strip() + "\n")
        if pos:
            out.append("| Argument | Description |\n|---|---|")
            out.extend(pos)
            out.append("")
        if opt:
            out.append("| Option | Default | Description |\n|---|---|---|")
            out.extend(opt)
            out.append("")
    for sa in subactions:
        # argparse aliases one parser object under several names; dedupe.
        seen: dict[int, str] = {}
        helps = {ca.dest: ca.help for ca in sa._choices_actions}
        for name, sub in sa.choices.items():
            if id(sub) in seen:
                continue
            seen[id(sub)] = name
            if level == 0 and helps.get(name):
                sub.description = sub.description or helps[name]
            _emit(sub, f"{prog} {name}", level + 1, out)


def main() -> int:
    parser = build_parser()
    out: list[str] = [
        "# CLI reference",
        "",
        "_Generated from the argparse tree by `scripts/gen_cli_reference.py` — do not edit by hand._",
        "",
        "Invoke as `deepchopper <command>` (or `python -m deepchopper_tpu.cli <command>`).",
        "Flag semantics mirror the reference CLI (reference: deepchopper/cli.py:66-257 and",
        "src/bin/predict.rs:19-78 for the chop flag set).",
        "",
    ]
    _emit(parser, "deepchopper", 0, out)
    dest = Path(__file__).resolve().parent.parent / "docs" / "cli-reference.md"
    dest.write_text("\n".join(out).rstrip() + "\n")
    print(f"wrote {dest} ({len(out)} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
