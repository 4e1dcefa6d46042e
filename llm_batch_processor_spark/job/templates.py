"""Row-scoped prompt template rendering (reference A4/A5).

The reference renders ERB with bindings ``texts`` (symbol-keyed hash)
and ``images`` (``lib/job_processor.rb:111-135``). Here templates are
Jinja2 with the same two bindings; ``texts`` is a plain dict so both
``{{ texts['content'] }}`` and ``{{ texts.content }}`` work, and
expressions like ``{{ texts | length }}`` cover the reference's
"arbitrary expression" usage (``spec/job_processor_spec.rb:121``
uses ``texts.keys.length``).

Rendering runs inside the inference pandas_udf (Python is already on
the data path there); templates compile once per executor.
"""

from __future__ import annotations

from typing import Any

import jinja2

_ENV = jinja2.Environment(undefined=jinja2.Undefined, autoescape=False)


class RowTemplate:
    """A compiled template rendered per record with texts/images bindings."""

    def __init__(self, source: str):
        self.source = source
        self._tmpl = _ENV.from_string(source)

    def render(self, texts: dict[str, str] | None, images: list[str] | None) -> str:
        return self._tmpl.render(texts=texts or {}, images=images or [])

    def __getstate__(self) -> dict[str, Any]:
        return {"source": self.source}

    def __setstate__(self, state: dict[str, Any]) -> None:
        self.__init__(state["source"])
