"""Single source of truth for the repo's query counts (VERDICT r6 #8:
the README/SURVEY figures were hand-edited twice in round 6 — emit
them from the registry instead).

Prints one JSON line:
    {"queries": N, "exact_oracles": E, "rows_only": R,
     "rows_only_names": [...]}

tests/test_registry.py::test_doc_counts_match_registry asserts that
the specific count claims in README.md and SURVEY.md §5.3 carry these
numbers, so any drift fails the suite until the docs are regenerated
from this output.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhir2sql_spark import registry  # noqa: E402


def counts() -> dict:
    registry.load_all()
    n = len(registry.QUERIES)
    e = len(registry.ORACLE)
    rows_only = sorted(set(registry.QUERIES) - set(registry.ORACLE))
    return {
        "queries": n,
        "exact_oracles": e,
        "rows_only": n - e,
        "rows_only_names": rows_only,
    }


if __name__ == "__main__":
    print(json.dumps(counts(), sort_keys=True))
