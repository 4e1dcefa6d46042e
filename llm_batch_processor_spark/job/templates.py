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

ERB sources are accepted directly: every template the reference ships
or specs (`docs/example/**/*.erb`, `spec/*_spec.rb`) uses only
``<%= texts[:label] %>`` interpolation plus ``texts.keys.length``
(`spec/job_processor_spec.rb:121`), so ``erb_to_jinja`` translates
that expression subset mechanically and ``RowTemplate`` applies it
whenever the source contains an ERB output tag. Arbitrary Ruby inside
``<% ... %>`` control tags remains out of scope (documented cut —
none of the reference's templates use them).
"""

from __future__ import annotations

import re
from typing import Any

import jinja2

# finalize: Ruby ERB renders nil as "" (lib/job_processor.rb template
# path — `<%= texts[:content] %>` of a missing/nil key interpolates
# empty); Jinja2's default would print the string "None" for a None
# binding, silently corrupting every prompt built from a NULL text
# (r6 NULL-corpus parity audit). Undefined already renders "".
_ENV = jinja2.Environment(
    undefined=jinja2.Undefined,
    autoescape=False,
    finalize=lambda v: "" if v is None else v,
)

_ERB_OUT = re.compile(r"<%=\s*(.*?)\s*%>", re.S)


def _ruby_expr_to_jinja(expr: str) -> str:
    # texts[:label] (symbol key) -> texts['label']
    expr = re.sub(r"texts\[\s*:(\w+)\s*\]", r"texts['\1']", expr)
    # hash.keys.length / array.length / hash.size -> |length filter
    expr = re.sub(r"\.keys\.(?:length|size|count)\b", "|length", expr)
    expr = re.sub(r"\.(?:length|size)\b", "|length", expr)
    return expr


def erb_to_jinja(source: str) -> str:
    """Translate the reference's ERB interpolation subset to Jinja2."""
    return _ERB_OUT.sub(
        lambda m: "{{ " + _ruby_expr_to_jinja(m.group(1)) + " }}", source
    )


class RowTemplate:
    """A compiled template rendered per record with texts/images bindings."""

    def __init__(self, source: str):
        self.source = source
        jinja_source = erb_to_jinja(source) if "<%=" in source else source
        self._tmpl = _ENV.from_string(jinja_source)

    def render(self, texts: dict[str, str] | None, images: list[str] | None) -> str:
        return self._tmpl.render(texts=texts or {}, images=images or [])

    def __getstate__(self) -> dict[str, Any]:
        return {"source": self.source}

    def __setstate__(self, state: dict[str, Any]) -> None:
        self.__init__(state["source"])
