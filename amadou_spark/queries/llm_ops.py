"""LLM-data-pipeline operators as declared queries (SURVEY.md §2.2 B08-B10
plus the north-star extensions) — filled in incrementally."""

from __future__ import annotations
