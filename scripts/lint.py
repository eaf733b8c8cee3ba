#!/usr/bin/env python
"""Dependency-free format gate (the reference CI enforces clang-format;
this env has no ruff/black, so the equivalent gate is this script —
Makefile `format` / `format-check` targets, mirroring reference
Makefile:48-52).

Checks every tracked .py file for: syntax errors, tabs in indentation,
trailing whitespace, CRLF line endings, missing final newline, and
leftover debugger hooks. `--fix` rewrites the mechanical ones
(whitespace/newlines); the rest are reported.
"""

from __future__ import annotations

import argparse
import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEBUGGER_TOKENS = ("pdb." + "set_trace(", "breakpoint" + "()")  # split so this file passes its own gate


def tracked_py_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files", "*.py"], cwd=REPO, capture_output=True, text=True, check=True
    )
    return [REPO / line for line in out.stdout.splitlines() if line]


def check_file(path: Path, fix: bool) -> list[str]:
    problems: list[str] = []
    raw = path.read_bytes()
    text = raw.decode("utf-8")

    try:
        ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    lines = text.split("\n")
    changed = False
    for i, line in enumerate(lines, 1):
        if "\r" in line:
            problems.append(f"{path}:{i}: CRLF line ending")
            if fix:
                lines[i - 1] = line.replace("\r", "")
                changed = True
        stripped = line.rstrip("\r")
        if stripped != stripped.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
            if fix:
                lines[i - 1] = lines[i - 1].rstrip()
                changed = True
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            problems.append(f"{path}:{i}: tab in indentation")
        for tok in DEBUGGER_TOKENS:
            if tok in line and not line.lstrip().startswith("#"):
                problems.append(f"{path}:{i}: leftover debugger call {tok!r}")

    if text and not text.endswith("\n"):
        problems.append(f"{path}: missing final newline")
        if fix:
            changed = True
    if fix and changed:
        body = "\n".join(lines)
        if body and not body.endswith("\n"):
            body += "\n"
        path.write_bytes(body.encode("utf-8"))
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fix", action="store_true", help="rewrite mechanical issues in place")
    ap.add_argument("paths", nargs="*", help="files to check (default: all tracked .py)")
    args = ap.parse_args()

    files = [Path(p) for p in args.paths] if args.paths else tracked_py_files()
    all_problems: list[str] = []
    for f in files:
        all_problems += check_file(f, args.fix)

    if args.fix:
        # re-check after fixing; only non-mechanical problems remain
        all_problems = []
        for f in files:
            all_problems += check_file(f, fix=False)

    for p in all_problems:
        print(p)
    print(f"checked {len(files)} files: {'FAIL' if all_problems else 'ok'}", file=sys.stderr)
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
