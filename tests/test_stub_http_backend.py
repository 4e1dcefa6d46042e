"""Offline stub-HTTP-server tier for ``OpenAIChatBackend`` (VERDICT r7
item 1): drives the REAL ``requests`` code path (job/backend.py) that
the env-gated live tier leaves unexecuted in CI — through a loopback
``ThreadingHTTPServer`` whose per-test script controls status codes,
latencies and bodies, and which records every request it receives.

Reference pins mirrored here:
- ``/v1`` endpoint-suffix strip — ``lib/job_processor.rb:59``
  (``sub(/\\/v1\\/?$/, '')``), pinned by
  ``spec/job_processor_spec.rb:149-172`` ("removes trailing /v1 from
  endpoint"); the wire-level consequence is that BOTH endpoint forms
  hit ``/v1/chat/completions`` exactly once, never ``/v1/v1/...``.
- request payload shape (model + messages + params merged top-level,
  response_format only when JSON mode) — ``lib/job_processor.rb:150-178``,
  ``spec/json_mode_spec.rb`` asserts on the stubbed client's received
  parameters; here the assertion is on the actual HTTP body.
- empty/absent choices default to ``''`` — ``lib/job_processor.rb:173``
  (``dig(...) || ''``).
- per-record error routing keeps the job alive (A3) — errors (timeout,
  HTTP 500 after bounded retries) land in ``errors()``, good records
  in ``ok()`` — ``spec/bin_job_spec.rb:128-137``.

The llm_map e2e tests execute the backend inside Spark Python workers
(separate processes); the loopback server lives in the pytest process,
so request recording is cross-process-safe by construction (it happens
server-side)."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from llm_batch_processor_spark.job.backend import OpenAIChatBackend
from llm_batch_processor_spark.job.pipeline import RECORD_SCHEMA, llm_map
from llm_batch_processor_spark.job.spec import JobSpec


class _State:
    """Shared, lock-guarded recorder + per-test response script."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests: list[dict] = []
        # script(body_dict, n_prior_requests_for_same_prompt) ->
        #   (status:int, payload:dict, delay_s:float)
        self.script = lambda body, n_prior: (200, _ok("stub"), 0.0)
        # concurrency observation point (streaming backpressure tests):
        # how many requests were in flight simultaneously, max
        self.inflight = 0
        self.max_inflight = 0

    def reset(self, script):
        with self.lock:
            self.requests.clear()
            self.script = script
            self.inflight = 0
            self.max_inflight = 0

    def enter(self):
        with self.lock:
            self.inflight += 1
            self.max_inflight = max(self.max_inflight, self.inflight)

    def leave(self):
        with self.lock:
            self.inflight -= 1

    def record(self, path, headers, body) -> int:
        with self.lock:
            prompt = _user_prompt(body)
            n_prior = sum(1 for r in self.requests if r["prompt"] == prompt)
            self.requests.append(
                {
                    "path": path,
                    "auth": headers.get("Authorization"),
                    "content_type": headers.get("Content-Type"),
                    "body": body,
                    "prompt": prompt,
                }
            )
            return n_prior

    def snapshot(self) -> list[dict]:
        with self.lock:
            return list(self.requests)


def _ok(content) -> dict:
    return {"choices": [{"message": {"role": "assistant", "content": content}}]}


def _user_prompt(body: dict) -> str:
    for m in reversed(body.get("messages", [])):
        if m.get("role") == "user":
            c = m.get("content")
            if isinstance(c, list):  # multimodal parts
                return " ".join(
                    p.get("text", "") for p in c if p.get("type") == "text"
                )
            return c
    return ""


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 - http.server API
            length = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(length) or b"{}")
            n_prior = state.record(self.path, self.headers, body)
            with state.lock:
                script = state.script
            state.enter()
            try:
                # scripts return (status, payload, delay) or, for the
                # 429/Retry-After pins, (status, payload, delay, headers)
                scripted = script(body, n_prior)
                status, payload, delay = scripted[:3]
                extra_headers = scripted[3] if len(scripted) > 3 else {}
                if delay:
                    time.sleep(delay)
            finally:
                state.leave()
            data = json.dumps(payload).encode()
            try:
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                for k, v in extra_headers.items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(data)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client timed out and hung up — expected in the timeout test

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    return Handler


@pytest.fixture(scope="module")
def stub():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield state, base
    server.shutdown()
    server.server_close()


def _spec(endpoint: str, **over) -> JobSpec:
    base = dict(
        id="stub-http",
        erb_source="Say: {{ texts['input'] }}",
        backend_endpoint=endpoint,
        model="m-stub",
        output_label="resp",
        max_retries=0,
        request_timeout=10.0,
    )
    base.update(over)
    return JobSpec.from_dict(base)


def _records(spark, rows):
    return spark.createDataFrame(rows, RECORD_SCHEMA)


# --------------------------------------------------------------------------
# direct backend.chat — wire shape without Spark in the way
# --------------------------------------------------------------------------


def test_v1_suffix_stripped_and_path_is_v1_chat_completions(stub):
    """Both endpoint spellings must produce exactly /v1/chat/completions
    (job_processor.rb:59; spec/job_processor_spec.rb:149-172)."""
    state, base = stub
    for endpoint in (base, base + "/v1", base + "/v1/"):
        state.reset(lambda body, n: (200, _ok("pong"), 0.0))
        out = OpenAIChatBackend(endpoint).chat(
            [{"role": "user", "content": "ping"}], "m", {}, None, 5.0
        )
        reqs = state.snapshot()
        assert out == "pong"
        assert [r["path"] for r in reqs] == ["/v1/chat/completions"], endpoint


def test_payload_shape_params_merge_and_response_format(stub):
    state, base = stub
    state.reset(lambda body, n: (200, _ok("x"), 0.0))
    backend = OpenAIChatBackend(base)
    backend.chat(
        [
            {"role": "system", "content": "be terse"},
            {"role": "user", "content": "hello"},
        ],
        "m-42",
        {"temperature": 0.5, "max_tokens": 7},
        {"type": "json_object"},
        5.0,
    )
    (req,) = state.snapshot()
    body = req["body"]
    assert body["model"] == "m-42"
    assert [m["role"] for m in body["messages"]] == ["system", "user"]
    assert body["messages"][1]["content"] == "hello"
    # params merge at the TOP level of the payload (job_processor.rb:150-160)
    assert body["temperature"] == 0.5 and body["max_tokens"] == 7
    assert body["response_format"] == {"type": "json_object"}
    assert req["content_type"] == "application/json"
    assert req["auth"] is None  # no api key -> no Authorization header


def test_response_format_absent_when_not_json_mode_and_auth_header(stub):
    state, base = stub
    state.reset(lambda body, n: (200, _ok("x"), 0.0))
    OpenAIChatBackend(base, api_key="sk-test").chat(
        [{"role": "user", "content": "hello"}], "m", {}, None, 5.0
    )
    (req,) = state.snapshot()
    assert "response_format" not in req["body"]
    assert req["auth"] == "Bearer sk-test"


def test_empty_choices_and_null_content_default_to_empty_string(stub):
    """choices [] / missing content -> '' (job_processor.rb:173 dig||'')."""
    state, base = stub
    backend = OpenAIChatBackend(base)
    state.reset(lambda body, n: (200, {"choices": []}, 0.0))
    assert backend.chat([{"role": "user", "content": "a"}], "m", {}, None, 5.0) == ""
    state.reset(
        lambda body, n: (200, {"choices": [{"message": {"content": None}}]}, 0.0)
    )
    assert backend.chat([{"role": "user", "content": "b"}], "m", {}, None, 5.0) == ""


def test_http_500_raises_for_status(stub):
    state, base = stub
    state.reset(lambda body, n: (500, {"error": "boom"}, 0.0))
    with pytest.raises(Exception, match="500"):
        OpenAIChatBackend(base).chat(
            [{"role": "user", "content": "x"}], "m", {}, None, 5.0
        )


# --------------------------------------------------------------------------
# llm_map end-to-end through the REAL requests path (Spark workers ->
# loopback HTTP): retry budget, dead-letter routing, timeout
# --------------------------------------------------------------------------


def test_llm_map_e2e_success_and_think_strip(spark, stub):
    state, base = stub
    state.reset(
        lambda body, n: (
            200,
            _ok(f"<think>hidden</think>ECHO {_user_prompt(body)}"),
            0.0,
        )
    )
    res = llm_map(
        _records(spark, [("a", {"input": "one"}, []), ("b", {"input": "two"}, [])]),
        _spec(base),
        OpenAIChatBackend(base),
    )
    out = {r["id"]: r["texts"]["resp"] for r in res.ok().collect()}
    assert out == {"a": "ECHO Say: one", "b": "ECHO Say: two"}
    # one request per record, no retries on success
    assert len(state.snapshot()) == 2


def test_llm_map_bounded_retry_then_dead_letter_on_500(spark, stub):
    """A permanently-500 backend consumes exactly max_retries+1 attempts
    per record and routes the record to errors() — the job survives."""
    state, base = stub

    def script(body, n_prior):
        if "fail" in _user_prompt(body):
            return (500, {"error": "boom"}, 0.0)
        return (200, _ok("fine"), 0.0)

    state.reset(script)
    res = llm_map(
        _records(
            spark, [("ok1", {"input": "good"}, []), ("bad", {"input": "fail"}, [])]
        ),
        _spec(base, max_retries=2),
        OpenAIChatBackend(base),
    )
    # ONE action: ok()/errors() are separate plans, and each action
    # re-executes the inference UDF (exactly why production jobs write
    # res.df once and split from the sink) — two collects would double
    # every request count this test pins
    rows = res.df.collect()
    ok = [r for r in rows if r["error"] is None]
    errs = [r for r in rows if r["error"] is not None]
    assert [r["id"] for r in ok] == ["ok1"]
    assert len(errs) == 1 and errs[0]["id"] == "bad"
    assert "500" in errs[0]["error"]
    by_prompt = {}
    for r in state.snapshot():
        by_prompt[r["prompt"]] = by_prompt.get(r["prompt"], 0) + 1
    assert by_prompt == {"Say: good": 1, "Say: fail": 3}  # 1 + max_retries


def test_llm_map_retry_recovers_after_transient_500(spark, stub):
    state, base = stub
    # first attempt for each prompt fails, the retry succeeds
    state.reset(
        lambda body, n_prior: (500, {}, 0.0)
        if n_prior == 0
        else (200, _ok("recovered"), 0.0)
    )
    res = llm_map(
        _records(spark, [("a", {"input": "flaky"}, [])]),
        _spec(base, max_retries=1),
        OpenAIChatBackend(base),
    )
    rows = res.df.collect()  # one action — see the retry-count test
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["texts"]["resp"] == "recovered"
    assert len(state.snapshot()) == 2


def test_llm_map_timeout_routes_to_dead_letter(spark, stub):
    """A hung backend trips the per-request timeout; the record
    dead-letters instead of wedging the job (240 s default mirrored at
    job_processor.rb:64 — shrunk here to keep the test fast)."""
    state, base = stub
    state.reset(lambda body, n: (200, _ok("too late"), 3.0))
    res = llm_map(
        _records(spark, [("slow", {"input": "zzz"}, [])]),
        _spec(base, request_timeout=0.5, max_retries=0),
        OpenAIChatBackend(base),
    )
    errs = res.errors().collect()
    assert len(errs) == 1 and errs[0]["id"] == "slow"
    assert "Timeout" in errs[0]["error"] or "timed out" in errs[0]["error"]


# --------------------------------------------------------------------------
# batch-path concurrency behavior (VERDICT r8 item 4): the streaming twin
# has a backpressure pin (test_streaming.py); these pin the BATCH path's
# ThreadPoolExecutor-per-Arrow-batch (job/pipeline.py llm_map `infer`)
# --------------------------------------------------------------------------


def test_llm_map_batch_requests_overlap_to_concurrency(spark, stub):
    """With an injected per-request latency, 8 records at concurrency 4
    in ONE partition must actually overlap: the server observes >= 2
    (and <= conc) simultaneous requests, and the wall time lands near
    ceil(rows/conc) * latency, far under the serial rows * latency.
    This is the throughput contract a 100 TB batch run buys with
    spec.concurrency — without real overlap, a 1000-executor job is
    serialized per worker and the endpoint sits idle."""
    state, base = stub
    latency = 0.5
    state.reset(lambda body, n: (200, _ok("k"), latency))
    rows = [(f"r{i}", {"input": f"p{i}"}, []) for i in range(8)]
    res = llm_map(
        # coalesce(1): a single Arrow batch, so ONE executor pool of
        # max_workers=conc serves all 8 rows — the observable unit
        _records(spark, rows).coalesce(1),
        _spec(base, concurrency=4),
        OpenAIChatBackend(base),
    )
    t0 = time.time()
    out = res.df.collect()
    wall = time.time() - t0
    assert len(out) == 8 and all(r["error"] is None for r in out)
    assert len(state.snapshot()) == 8
    # overlap floor: at least one moment with 2+ requests in flight;
    # backpressure ceiling: never more than spec.concurrency
    assert 2 <= state.max_inflight <= 4, state.max_inflight
    # ideal wall is ceil(8/4)*0.5 = 1.0 s of latency; serial is 4.0 s.
    # The bound leaves ~2 s for Spark scheduling but stays decisively
    # below serial.
    assert wall >= 2 * latency  # can't beat two waves of latency
    assert wall < 8 * latency - 0.5, f"no overlap: wall={wall:.2f}s"


def test_backend_raises_typed_rate_limit_with_retry_after(stub):
    state, base = stub
    state.reset(
        lambda body, n: (429, {"error": "slow down"}, 0.0,
                         {"Retry-After": "0.4"})
    )
    from llm_batch_processor_spark.job.backend import RateLimitedError

    be = OpenAIChatBackend(base)
    with pytest.raises(RateLimitedError) as exc:
        be.chat([{"role": "user", "content": "x"}], "m", {}, None, 5.0)
    assert exc.value.retry_after == pytest.approx(0.4)
    # absent header -> 0.0 hint (fast retry), still typed
    state.reset(lambda body, n: (429, {"error": "slow down"}, 0.0))
    with pytest.raises(RateLimitedError) as exc2:
        be.chat([{"role": "user", "content": "x"}], "m", {}, None, 5.0)
    assert exc2.value.retry_after == 0.0


def test_llm_map_429_retry_after_honored_within_budget(spark, stub):
    """Two 429s with Retry-After: 0.4 then a 200: with max_retries=2
    the record recovers, the server sees exactly 3 attempts, and the
    wall time includes BOTH waits (>= 0.8 s) — the polite-backoff
    contract a throttled endpoint imposes on every worker."""
    state, base = stub
    state.reset(
        lambda body, n_prior: (429, {}, 0.0, {"Retry-After": "0.4"})
        if n_prior < 2
        else (200, _ok("after backoff"), 0.0)
    )
    t0 = time.time()
    res = llm_map(
        _records(spark, [("a", {"input": "throttled"}, [])]),
        _spec(base, max_retries=2),
        OpenAIChatBackend(base),
    )
    rows = res.df.collect()
    wall = time.time() - t0
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["texts"]["resp"] == "after backoff"
    assert len(state.snapshot()) == 3  # 1 + exactly the retry budget
    assert wall >= 0.8, f"Retry-After not honored: wall={wall:.2f}s"


def test_llm_map_429_exhausts_budget_to_dead_letter(spark, stub):
    """A permanently-throttled endpoint dead-letters the record after
    exactly max_retries+1 attempts with a typed error, and the final
    attempt does NOT sleep (the record is already headed to errors())."""
    state, base = stub
    state.reset(lambda body, n: (429, {}, 0.0, {"Retry-After": "0.2"}))
    t0 = time.time()
    res = llm_map(
        _records(spark, [("a", {"input": "always429"}, [])]),
        _spec(base, max_retries=1),
        OpenAIChatBackend(base),
    )
    errs = res.errors().collect()
    wall = time.time() - t0
    assert len(errs) == 1 and "RateLimitedError" in errs[0]["error"]
    assert "429" in errs[0]["error"]
    assert len(state.snapshot()) == 2  # 1 + max_retries
    # one sleep between the two attempts; none after the last
    assert wall >= 0.2
