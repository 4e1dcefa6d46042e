"""JobSpec validation parity — mirrors spec/job_processor_spec.rb:41-65,
spec/relative_path_spec.rb, spec/json_mode_spec.rb:111-274."""

from __future__ import annotations

import os

import pytest

from llm_batch_processor_spark.job.backend import OpenAIChatBackend
from llm_batch_processor_spark.job.spec import JobSpec, JobSpecError


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content, encoding="utf-8")
    return p


def _minimal_yaml(tmp_path, **extra):
    _write(tmp_path, "t.j2", "Hi {{ texts['input'] }}")
    lines = [
        "id: job1",
        "erb_filepath: t.j2",
        "backend_endpoint: http://localhost:8080",
        "model: m1",
        "output_label: out",
    ]
    for k, v in extra.items():
        lines.append(f"{k}: {v}")
    return _write(tmp_path, "job.yml", "\n".join(lines))


def test_missing_required_keys(tmp_path):
    p = _write(tmp_path, "bad.yml", "id: x\nmodel: m")
    with pytest.raises(JobSpecError, match="Missing required configuration keys"):
        JobSpec.from_yaml(str(p))
    with pytest.raises(JobSpecError, match="erb_filepath"):
        JobSpec.from_yaml(str(p))


def test_missing_job_file():
    with pytest.raises(JobSpecError, match="not found"):
        JobSpec.from_yaml("/nonexistent/job.yml")


def test_template_not_found_reports_resolved_path(tmp_path):
    p = _write(
        tmp_path,
        "job.yml",
        "id: x\nerb_filepath: missing.j2\nbackend_endpoint: e\nmodel: m\noutput_label: o",
    )
    with pytest.raises(JobSpecError) as ei:
        JobSpec.from_yaml(str(p))
    # resolved (absolute) path in the message, reference job_processor.rb:77-96
    assert str(tmp_path / "missing.j2") in str(ei.value)


def test_relative_and_parent_path_resolution(tmp_path):
    _write(tmp_path, "templates/t.j2", "x")
    _write(tmp_path, "cfg/job.yml",
           "id: x\nerb_filepath: ../templates/t.j2\n"
           "backend_endpoint: e\nmodel: m\noutput_label: o")
    spec = JobSpec.from_yaml(str(tmp_path / "cfg/job.yml"))
    assert spec.erb_filepath == str(tmp_path / "templates/t.j2")
    assert ".." not in spec.erb_filepath


def test_absolute_path_passthrough(tmp_path):
    t = _write(tmp_path, "abs.j2", "x")
    p = _write(
        tmp_path,
        "job.yml",
        f"id: x\nerb_filepath: {t}\nbackend_endpoint: e\nmodel: m\noutput_label: o",
    )
    assert JobSpec.from_yaml(str(p)).erb_filepath == str(t)


def test_response_format_precedence(tmp_path):
    # inline json_schema > json_schema_filepath > json_mode (job_processor.rb:181-205)
    schema_file = _write(tmp_path, "s.yml", "type: object\nproperties:\n  a:\n    type: string")
    _write(tmp_path, "t.j2", "x")
    base = dict(
        id="x", erb_filepath=str(tmp_path / "t.j2"), backend_endpoint="e",
        model="m", output_label="o",
    )
    s1 = JobSpec.from_dict({**base, "json_mode": True})
    assert s1.response_format() == {"type": "json_object"}

    s2 = JobSpec.from_dict({**base, "json_mode": True, "json_schema_filepath": str(schema_file)})
    rf2 = s2.response_format()
    assert rf2["type"] == "json_object" and rf2["schema"]["type"] == "object"

    inline = {"type": "object", "properties": {"b": {"type": "integer"}}}
    s3 = JobSpec.from_dict(
        {**base, "json_mode": True, "json_schema_filepath": str(schema_file),
         "json_schema": inline}
    )
    assert s3.response_format()["schema"] == inline

    s4 = JobSpec.from_dict(base)
    assert s4.response_format() is None


def test_schema_file_not_found(tmp_path):
    _write(tmp_path, "t.j2", "x")
    base = dict(
        id="x", erb_filepath=str(tmp_path / "t.j2"), backend_endpoint="e",
        model="m", output_label="o",
    )
    with pytest.raises(JobSpecError, match="JSON schema file not found"):
        JobSpec.from_dict({**base, "json_schema_filepath": str(tmp_path / "nope.yml")})


def test_endpoint_v1_normalization():
    # reference job_processor.rb:59 pinned by spec/job_processor_spec.rb:149-172
    assert OpenAIChatBackend("http://h:8080/v1").endpoint == "http://h:8080"
    assert OpenAIChatBackend("http://h:8080/v1/").endpoint == "http://h:8080"
    assert OpenAIChatBackend("http://h:8080").endpoint == "http://h:8080"
    assert OpenAIChatBackend("http://h:8080/api/v1").endpoint == "http://h:8080/api"


def test_inline_erb_source_skips_file_requirement():
    spec = JobSpec.from_dict(
        dict(id="x", erb_source="{{ texts['a'] }}", backend_endpoint="e",
             model="m", output_label="o")
    )
    assert spec.user_template_source() == "{{ texts['a'] }}"


class _FakeResp:
    def __init__(self, body):
        self._body = body
        self.status_code = 200  # the backend's 429 branch reads these
        self.headers = {}

    def raise_for_status(self):
        pass

    def json(self):
        return self._body


class _FakeSession:
    def __init__(self, body):
        self.body = body
        self.calls = []

    def post(self, url, data=None, headers=None, timeout=None):
        self.calls.append({"url": url, "data": data, "headers": headers, "timeout": timeout})
        return _FakeResp(self.body)


def test_openai_backend_request_payload_and_response_extraction():
    # mirrors spec/json_mode_spec.rb:350-370 (request payload assertion)
    import json as _json

    be = OpenAIChatBackend("http://h:8080/v1", api_key="sk-test")
    fake = _FakeSession({"choices": [{"message": {"content": "hi"}}]})
    be._session = fake
    out = be.chat(
        [{"role": "user", "content": "q"}],
        model="m1",
        params={"temperature": 0.3, "max_tokens": 5},
        response_format={"type": "json_object"},
        timeout=123.0,
    )
    assert out == "hi"
    call = fake.calls[0]
    assert call["url"] == "http://h:8080/v1/chat/completions"
    assert call["timeout"] == 123.0
    assert call["headers"]["Authorization"] == "Bearer sk-test"
    payload = _json.loads(call["data"])
    assert payload["model"] == "m1"
    assert payload["temperature"] == 0.3 and payload["max_tokens"] == 5
    assert payload["response_format"] == {"type": "json_object"}

    # empty choices -> '' (job_processor.rb:173 default)
    be2 = OpenAIChatBackend("http://h:8080")
    be2._session = _FakeSession({"choices": []})
    assert be2.chat([{"role": "user", "content": "q"}], "m", {}, None, 1.0) == ""
