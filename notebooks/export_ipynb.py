#!/usr/bin/env python
"""Export the jupytext py:percent notebook sources to .ipynb.

jupytext is not installed in this image, so this is a minimal converter
for the `# %%` / `# %% [markdown]` cell convention the two notebook
sources use. Run from the repo root or notebooks/:

    python notebooks/export_ipynb.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat as nbf


def parse_percent(src: str):
    """Split py:percent source into (kind, text) cells."""
    cells = []
    kind, lines = None, []

    def flush():
        if kind is None:
            return
        text = "\n".join(lines).strip("\n")
        if text:
            cells.append((kind, text))

    for line in src.splitlines():
        stripped = line.strip()
        if stripped.startswith("# %%"):
            flush()
            kind = "markdown" if "[markdown]" in stripped else "code"
            lines = []
        elif kind is None:
            continue  # preamble before the first cell marker
        else:
            if kind == "markdown":
                lines.append(line.removeprefix("# ").removeprefix("#"))
            else:
                lines.append(line)
    flush()
    return cells


def convert(py_path: Path) -> Path:
    cells = parse_percent(py_path.read_text())
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    for kind, text in cells:
        if kind == "markdown":
            nb.cells.append(nbf.v4.new_markdown_cell(text))
        else:
            nb.cells.append(nbf.v4.new_code_cell(text))
    out = py_path.with_suffix(".ipynb")
    nbf.write(nb, out)
    return out


if __name__ == "__main__":
    here = Path(__file__).resolve().parent
    targets = sorted(p for p in here.glob("*.py") if p.name != "export_ipynb.py")
    for t in targets:
        if not t.exists():
            sys.exit(f"missing notebook source: {t}")
        print(f"wrote {convert(t)}")
