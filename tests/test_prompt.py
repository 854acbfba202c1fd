"""Chat template + tool schema tests (model: reference TestCorrectness.java:244-394)."""

import json

from jlama_tpu.prompt import (
    Function,
    Parameters,
    PromptBuilder,
    Tool,
    ToolCall,
    extract_tool_calls,
    render_chat_template,
)
from jlama_tpu.tokenizers.model import TokenizerSpec

LLAMA3_TEMPLATE = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "<|start_header_id|>{{ message['role'] }}<|end_header_id|>\n\n"
    "{{ message['content'] }}<|eot_id|>"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|start_header_id|>assistant<|end_header_id|>\n\n{% endif %}"
)

TOOL_TEMPLATE = (
    "{% if tools %}Tools: {{ tools | tojson }}\n{% endif %}"
    "{% for m in messages %}[{{ m.role }}] {{ m.content }}\n{% endfor %}"
)


def _spec(template):
    s = TokenizerSpec(model_type="BPE", vocab={})
    s.chat_template = template
    s.bos_token = "<s>"
    s.eos_token = "</s>"
    return s


def test_render_llama3_style():
    out = render_chat_template(
        LLAMA3_TEMPLATE,
        [
            {"role": "system", "content": "Be brief."},
            {"role": "user", "content": "Hi!"},
        ],
        bos_token="<|begin_of_text|>",
    )
    assert out == (
        "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
        "Be brief.<|eot_id|><|start_header_id|>user<|end_header_id|>\n\nHi!<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )


def test_prompt_builder_with_tools():
    tool = Tool.from_function(
        Function(
            name="get_weather",
            description="Get the weather",
            parameters=Parameters().add_property("city", "string", "City name"),
        )
    )
    ctx = (
        PromptBuilder(_spec(TOOL_TEMPLATE))
        .add_user("What's the weather in Paris?")
        .add_tools(tool)
        .build()
    )
    assert "get_weather" in ctx.prompt
    assert ctx.has_tools
    parsed = json.loads(ctx.prompt.split("Tools: ")[1].split("\n")[0])
    assert parsed[0]["function"]["parameters"]["required"] == ["city"]


def test_prompt_builder_no_template_degrades():
    ctx = PromptBuilder(None).add_system("sys").add_user("hello").build()
    assert "system: sys" in ctx.prompt
    assert ctx.prompt.endswith("assistant: ")


def test_extract_tool_calls_dedupes():
    tools = [Tool.from_function(Function(name="lookup"))]
    text = (
        'Sure: {"name": "lookup", "parameters": {"q": "x"}} and again '
        '{"name": "lookup", "parameters": {"q": "x"}} plus '
        '{"name": "lookup", "parameters": {"q": "y"}} '
        '{"name": "unknown_tool", "parameters": {}}'
    )
    calls = extract_tool_calls(text, tools)
    assert len(calls) == 2
    assert {c.parameters["q"] for c in calls} == {"x", "y"}
    assert all(len(c.id) == 9 for c in calls)


def test_extract_nested_function_format():
    tools = [Tool.from_function(Function(name="calc"))]
    text = '{"function": {"name": "calc", "arguments": "{\\"a\\": 1}"}}'
    calls = extract_tool_calls(text, tools)
    assert len(calls) == 1
    assert calls[0].parameters == {"a": 1}


def test_chat_loop_controls_and_exception():
    template = "{% for m in messages %}{% if m.role == 'skip' %}{% continue %}{% endif %}{{ m.content }}{% endfor %}"
    out = render_chat_template(
        template,
        [{"role": "skip", "content": "no"}, {"role": "user", "content": "yes"}],
    )
    assert out == "yes"
