"""LLM-data-pipeline extension queries (SURVEY.md §7.4) — filled in
alongside the extensions package. Registry populated incrementally."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
