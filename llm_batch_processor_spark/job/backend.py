"""Chat-completion backends (reference A7).

``ChatBackend`` is the injectable seam the reference's own tests rely
on (they stub ``OpenAI::Client``, ``spec/job_processor_spec.rb:79-94``);
``MockChatBackend`` is the deterministic equivalent used by pytest and
the driver-oracle query ``llm_map_mock``.

``OpenAIChatBackend`` speaks the OpenAI-compatible ``/chat/completions``
protocol with the reference's endpoint normalization (a trailing
``/v1`` is accepted and stripped — ``lib/job_processor.rb:59``, pinned
by ``spec/job_processor_spec.rb:149-172``) and 240 s default timeout
(``lib/job_processor.rb:64``).

Backends must be picklable: they ship to executors inside the inference
pandas_udf. Network clients are created lazily per worker process.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Protocol

Message = dict[str, Any]  # {"role": ..., "content": str | [content parts]}


class ChatBackend(Protocol):
    def chat(
        self,
        messages: list[Message],
        model: str,
        params: dict[str, Any],
        response_format: dict[str, Any] | None,
        timeout: float,
    ) -> str:
        """Return choices[0].message.content (or '' when absent)."""
        ...


def _content_text(content: Any) -> str:
    """Extract the text part of a plain-string or multimodal content."""
    if isinstance(content, str):
        return content
    if isinstance(content, list):  # multimodal: [{type: text}, {type: image_url}...]
        return " ".join(
            p.get("text", "") for p in content if isinstance(p, dict) and p.get("type") == "text"
        )
    return ""


class MockChatBackend:
    """Deterministic offline backend.

    Response = ``<think>...</think>`` + a pure function of the user
    prompt:  ``MOCK <md5(prompt)[:8]>`` — SQL-replicable (DuckDB
    ``md5()``), so oracle checks can cover the whole pipeline. JSON
    mode returns a JSON object embedding the same digest. An optional
    ``fail_marker`` raises on prompts containing it (error-routing
    tests, reference A3).
    """

    def __init__(self, fail_marker: str | None = None, think: bool = True):
        self.fail_marker = fail_marker
        self.think = think

    def chat(self, messages, model, params, response_format, timeout):
        user = next((m for m in reversed(messages) if m["role"] == "user"), None)
        prompt = _content_text(user["content"]) if user else ""
        if self.fail_marker and self.fail_marker in prompt:
            raise RuntimeError(f"mock backend failure for prompt: {prompt[:50]}")
        digest = hashlib.md5(prompt.encode("utf-8")).hexdigest()[:8]
        think = "<think>mock reasoning</think>\n" if self.think else ""
        if response_format is not None:
            return f'{think}{{"digest": "{digest}"}}'
        return f"{think}MOCK {digest}"


class IntrospectingBackend:
    """Diagnostic backend: encodes the request it saw into the response
    as JSON. Backends execute on workers, so request observation must
    travel through the data plane — the same reason the reference's
    tests assert on the stubbed client's received payload
    (spec/json_mode_spec.rb:350-370)."""

    def chat(self, messages, model, params, response_format, timeout):
        content = messages[-1]["content"]
        return json.dumps(
            {
                "roles": [m["role"] for m in messages],
                "content_kind": "parts" if isinstance(content, list) else "str",
                "n_parts": len(content) if isinstance(content, list) else 1,
                "has_rf": response_format is not None,
                "params": params,
                "model": model,
            }
        )


class RateLimitedError(Exception):
    """HTTP 429 from the endpoint; carries the server's Retry-After
    hint (seconds, 0.0 when absent/unparseable) so the retry loop can
    wait it out instead of hammering a throttled endpoint — the
    behavior a rate-limited 100 TB batch run needs from every one of
    its thousands of concurrent workers. The reference delegates this
    to its client library (ruby-openai retries 429 internally);
    here the bounded retry lives in the pipeline (_call_one), so the
    hint must travel with the exception."""

    def __init__(self, message: str, retry_after: float = 0.0):
        super().__init__(message)
        self.retry_after = retry_after


class OpenAIChatBackend:
    """OpenAI-compatible HTTP backend (requests; lazy per-worker session)."""

    def __init__(self, endpoint: str, api_key: str | None = None):
        # reference parity: accept ".../v1" and normalize (job_processor.rb:59)
        ep = endpoint.rstrip("/")
        if ep.endswith("/v1"):
            ep = ep[: -len("/v1")]
        self.endpoint = ep
        self.api_key = api_key
        self._session = None  # lazy; not pickled

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_session"] = None
        return d

    def _sess(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def chat(self, messages, model, params, response_format, timeout):
        payload: dict[str, Any] = {"model": model, "messages": messages, **(params or {})}
        if response_format is not None:
            payload["response_format"] = response_format
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        resp = self._sess().post(
            f"{self.endpoint}/v1/chat/completions",
            data=json.dumps(payload),
            headers=headers,
            timeout=timeout,
        )
        if resp.status_code == 429:
            try:
                ra = float(resp.headers.get("Retry-After", "0"))
            except ValueError:
                ra = 0.0  # HTTP-date form (rare) — treat as no hint
            raise RateLimitedError(
                f"429 rate limited (Retry-After: {ra or 'none'})",
                retry_after=max(ra, 0.0),
            )
        resp.raise_for_status()
        body = resp.json()
        choices = body.get("choices") or []
        if not choices:
            return ""
        return (choices[0].get("message") or {}).get("content") or ""
