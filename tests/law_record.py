"""Measured-value recording hook for law tests.

``tools_laws.py`` (the per-round LAWS_r{N}.json gate) runs the
rows-only queries' law tests with ``SPARK_GRAFT_LAW_RECORD`` pointing
at a JSON-lines file; quantitative law tests call :func:`record` with
the value they measured and the bound they asserted, so the round
artifact carries law → measured → bound → pass rather than a bare
pytest verdict. Outside that harness (normal pytest runs) the env var
is unset and record() is a no-op — tests stay self-contained.
"""

from __future__ import annotations

import json
import os


def record(law: str, value, bound, query: str | None = None) -> None:
    """Append one measured-law line when the harness asked for it."""
    path = os.environ.get("SPARK_GRAFT_LAW_RECORD")
    if not path:
        return
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(
            json.dumps(
                {"law": law, "value": value, "bound": bound, "query": query}
            )
            + "\n"
        )
