"""B8 — LLM-data-pipeline extension queries (filled in milestone 3)."""

from __future__ import annotations

from . import Registry

Q = Registry()
