"""B7 — reference-parity LLM pipeline queries (filled in milestone 2)."""

from __future__ import annotations

from . import Registry

Q = Registry()
