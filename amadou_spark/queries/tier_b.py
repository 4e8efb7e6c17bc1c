"""Tier B declared queries (SURVEY.md §2.2 B01-B07) — filled in incrementally."""

from __future__ import annotations
