"""North-star LLM-pipeline operators (SURVEY.md §2.C) — filled in in M4."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
