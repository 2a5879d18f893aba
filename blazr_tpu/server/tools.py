"""OpenAI function calling: tools → system prompt, tool-call extraction.

TPU-native port of the reference tools module (src/server/tools.rs:389):
injects tool definitions as a system prompt section and extracts tool-call
JSON from generated text (finish_reason becomes "tool_calls").
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Optional

TOOLS_PREAMBLE = (
    "You have access to the following tools. To call a tool, respond with a "
    "JSON object (and nothing else) of the form "
    '{"name": "<tool_name>", "arguments": {...}}.\n\nAvailable tools:\n'
)


def tools_system_prompt(tools: list[dict]) -> str:
    """Build the tools system-prompt section (reference tools.rs builder)."""
    lines = [TOOLS_PREAMBLE]
    for t in tools:
        fn = t.get("function", t)
        name = fn.get("name", "unknown")
        desc = fn.get("description", "")
        params = fn.get("parameters", {})
        lines.append(f"- {name}: {desc}\n  parameters: {json.dumps(params)}")
    return "\n".join(lines)


_JSON_BLOCK = re.compile(r"```(?:json)?\s*(\{.*?\})\s*```", re.DOTALL)


def extract_tool_calls(text: str) -> Optional[list[dict]]:
    """Extract tool calls from generated text (reference tools.rs
    extraction): accepts a bare JSON object, a fenced ```json block, or a
    {"tool_calls": [...]} wrapper."""
    candidates = []
    stripped = text.strip()
    if stripped.startswith("{"):
        candidates.append(stripped)
    candidates += _JSON_BLOCK.findall(text)

    for cand in candidates:
        try:
            obj = json.loads(cand)
        except json.JSONDecodeError:
            continue
        calls = None
        if isinstance(obj, dict) and "tool_calls" in obj:
            calls = obj["tool_calls"]
        elif isinstance(obj, dict) and "name" in obj:
            calls = [obj]
        if not calls:
            continue
        out = []
        for c in calls:
            if not isinstance(c, dict) or "name" not in c:
                continue
            args = c.get("arguments", c.get("parameters", {}))
            if isinstance(args, dict):
                args = json.dumps(args)
            out.append({
                "id": f"call_{uuid.uuid4().hex[:24]}",
                "type": "function",
                "function": {"name": c["name"], "arguments": args},
            })
        if out:
            return out
    return None
