"""Driver-facing query registry.

Each query is a named (Spark callable, DuckDB oracle SQL) pair running
the engine's operators (SURVEY.md §2) against the driver testdata
tables (TESTDATA.md). Queries without an oracle are genuinely
non-SQL-expressible (hash-seeded sketches) and get rows-only checks.
"""

from __future__ import annotations

from .analytics_gate import ORACLES as _GATE_ORACLES
from .analytics_gate import QUERIES as _GATE_QUERIES
from .core import ORACLES as _CORE_ORACLES
from .core import QUERIES as _CORE_QUERIES
from .extensions import ORACLES as _EXT_ORACLES
from .extensions import QUERIES as _EXT_QUERIES
from .llm_ops import ORACLES as _LLM_ORACLES
from .llm_ops import QUERIES as _LLM_QUERIES
from .pipeline import ORACLES as _PIPE_ORACLES
from .pipeline import QUERIES as _PIPE_QUERIES

QUERIES = {
    **_CORE_QUERIES,
    **_PIPE_QUERIES,
    **_GATE_QUERIES,
    **_EXT_QUERIES,
    **_LLM_QUERIES,
}
ORACLES = {
    **_CORE_ORACLES,
    **_PIPE_ORACLES,
    **_GATE_ORACLES,
    **_EXT_ORACLES,
    **_LLM_ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]
