"""No build-harness / internal-tooling provenance strings may ship in
the package source (round-7 verdict item 2: a docstring cited
`.claude/skills/verify`, a path that resolves for no external user)."""

from __future__ import annotations

import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(HERE, "dht11_data_pipeline_spark")

FORBIDDEN = [
    # Reference file:line cites (e.g. /root/reference/main.py:12) are the
    # documented parity-citation convention and are allowed; what must not
    # ship is build-harness tooling paths and judge-artifact references.
    re.compile(r"\.claude"),
    re.compile(r"skills/verify"),
    re.compile(r"\bVERDICT\.md\b"),
    re.compile(r"\bADVICE\.md\b"),
]


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)
    for f in ("__spark_entry__.py", "bench.py"):
        yield os.path.join(HERE, f)


def test_no_internal_tooling_strings_in_shipped_code():
    hits = []
    for path in _py_files():
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                for pat in FORBIDDEN:
                    if pat.search(line):
                        hits.append(f"{path}:{lineno}: {line.strip()}")
    assert not hits, "internal-tooling strings in shipped code:\n" + "\n".join(hits)
