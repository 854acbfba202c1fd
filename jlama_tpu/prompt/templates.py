"""HF jinja chat-template rendering + prompt builder.

cf. /root/reference/jlama-core/.../safetensors/prompt/PromptSupport.java:35-299
(jinjava rendering with messages/tools/add_generation_prompt context and a
fluent builder) and model/PromptBuilder.java (graceful degradation when a
model ships no template). Rendering uses jinja2 with the HF-dialect globals
(`raise_exception`, `tojson`, `strftime_now`).
"""

from __future__ import annotations

import datetime
import json
from dataclasses import dataclass, field
from typing import Any

import jinja2

from .tools import PromptContext, Tool, ToolCall, ToolResult


class TemplateError(RuntimeError):
    pass


def _raise_exception(msg):
    raise TemplateError(msg)


def _tojson(value, indent=None):
    return json.dumps(value, indent=indent, ensure_ascii=False)


def _strftime_now(fmt):
    return datetime.datetime.now().strftime(fmt)


def render_chat_template(
    template: str,
    messages: list[dict[str, Any]],
    *,
    tools: list[dict] | None = None,
    add_generation_prompt: bool = True,
    bos_token: str = "",
    eos_token: str = "",
    extra: dict | None = None,
) -> str:
    env = jinja2.Environment(
        loader=jinja2.BaseLoader(),
        trim_blocks=True,
        lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"],
    )
    env.filters["tojson"] = _tojson
    env.globals["raise_exception"] = _raise_exception
    env.globals["strftime_now"] = _strftime_now
    ctx = {
        "messages": messages,
        "add_generation_prompt": add_generation_prompt,
        "bos_token": bos_token,
        "eos_token": eos_token,
    }
    if tools is not None:
        ctx["tools"] = tools
    if extra:
        ctx.update(extra)
    return env.from_string(template).render(**ctx)


@dataclass
class PromptBuilder:
    """Fluent chat builder (cf. PromptSupport.Builder:187-299)."""

    spec: Any  # TokenizerSpec (duck-typed: template_for/bos_token/eos_token)
    messages: list[dict] = field(default_factory=list)
    tools: list[Tool] = field(default_factory=list)
    add_generation_prompt: bool = True

    def add_system(self, content: str) -> "PromptBuilder":
        self.messages.append({"role": "system", "content": content})
        return self

    def add_user(self, content: str) -> "PromptBuilder":
        self.messages.append({"role": "user", "content": content})
        return self

    def add_assistant(self, content: str) -> "PromptBuilder":
        self.messages.append({"role": "assistant", "content": content})
        return self

    def add_tool_call(self, call: ToolCall) -> "PromptBuilder":
        self.messages.append(
            {"role": "assistant", "tool_calls": [call.to_dict()], "content": ""}
        )
        return self

    def add_tool_result(self, result: ToolResult) -> "PromptBuilder":
        self.messages.append(
            {
                "role": "tool",
                "content": json.dumps({"result": result.result}),
                "name": result.name,
                "tool_call_id": result.tool_call_id,
            }
        )
        return self

    def add_tools(self, *tools: Tool) -> "PromptBuilder":
        self.tools.extend(tools)
        return self

    def build(self) -> PromptContext:
        template_name = "tool_use" if self.tools else "default"
        template = None
        if self.spec is not None:
            template = self.spec.template_for(template_name)
        if template is None:
            # graceful degradation (cf. model/PromptBuilder.java): plain
            # role-prefixed text
            parts = [f"{m['role']}: {m.get('content','')}" for m in self.messages]
            if self.add_generation_prompt:
                parts.append("assistant: ")
            return PromptContext("\n".join(parts), self.tools or None)
        rendered = render_chat_template(
            template,
            self.messages,
            tools=[t.to_dict() for t in self.tools] if self.tools else None,
            add_generation_prompt=self.add_generation_prompt,
            bos_token=self.spec.bos_token or "",
            eos_token=self.spec.eos_token or "",
        )
        return PromptContext(rendered, self.tools or None)
