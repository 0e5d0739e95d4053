"""Calling-code-file discovery (reference: /root/reference/jorvik/utils/paths.py:30-49).

The lineage log records which code file produced each write; that file is
the bottom-most stack frame that is neither library code (site-packages)
nor the test runner itself.
"""

from __future__ import annotations

import inspect

_EXCLUDED_MARKERS = (
    "site-packages",
    "dist-packages",
    "/pytest",
    "_pytest",
    "pyspark",
    "jorvik_spark",  # never attribute lineage to engine internals
)


def get_codefile_path() -> str:
    """Best-effort path of the user code file driving the current call."""
    for frame in reversed(inspect.stack()):
        fn = frame.filename
        if fn.startswith("<"):  # <string>, <stdin>
            continue
        if any(m in fn for m in _EXCLUDED_MARKERS):
            continue
        return fn
    return "unknown"
