"""Reference ERB templates run unmodified (A4/A5 parity).

Pins the `erb_to_jinja` translation against the exact template sources
the reference ships and specs: every `.erb` under
/root/reference/docs/example and every inline erb_content in its specs
uses only `<%= texts[:label] %>` interpolation plus
`texts.keys.length` (spec/job_processor_spec.rb:121), so those shapes
are the contract.
"""

from __future__ import annotations

from llm_batch_processor_spark.job.templates import RowTemplate, erb_to_jinja


def test_symbol_key_interpolation():
    # spec/job_processor_spec.rb:19
    t = RowTemplate("Summarize: <%= texts[:input] %>")
    assert t.render({"input": "hello"}, []) == "Summarize: hello"


def test_japanese_template_verbatim():
    # docs/example/user_prompt.erb (ends with the interpolation)
    src = "以下のテキストを要約してください：\n\n<%= texts[:content] %>"
    assert RowTemplate(src).render({"content": "本文"}, []).endswith("本文")


def test_keys_length_expression():
    # spec/job_processor_spec.rb:121
    t = RowTemplate("Input: <%= texts[:input] %>, Count: <%= texts.keys.length %>")
    assert t.render({"input": "x", "other": "y"}, []) == "Input: x, Count: 2"


def test_images_length():
    t = RowTemplate("n=<%= images.length %>")
    assert t.render({}, ["a", "b", "c"]) == "n=3"


def test_multiple_interpolations_one_line():
    t = RowTemplate("<%= texts[:a] %>-<%= texts[:b] %>")
    assert t.render({"a": "1", "b": "2"}, []) == "1-2"


def test_translation_is_pure():
    assert (
        erb_to_jinja("テキスト: <%= texts[:content] %>")
        == "テキスト: {{ texts['content'] }}"
    )


def test_jinja_sources_untouched():
    src = "Summarize: {{ texts['content'] }}"
    assert erb_to_jinja(src) == src
    assert RowTemplate(src).render({"content": "z"}, []) == "Summarize: z"


def test_missing_key_renders_empty():
    # reference ERB raises on nil.to_s? No — hash[:missing] is nil,
    # interpolating nil gives "" in ERB; Jinja Undefined also prints ""
    t = RowTemplate("v=<%= texts[:absent] %>")
    assert t.render({}, []) == "v="
