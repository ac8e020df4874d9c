"""LLM-adjacent text utilities, re-implemented deterministically.

The reference wraps model outputs in defensive parsing; the parsing
itself is pure logic and is reproduced here exactly:

* M9 lenient JSON extractor (``/root/reference/src/agents/base.py:112-129``,
  ``:251-272``): first ``{...}`` blob (DOTALL), ``json.loads``, else
  ``{}``; the loadable-model variant strips ``<think>…</think>`` first.
* M10 ``<think>`` reasoning splitter
  (``src/agents/orchestrator.py:206-219``): returns
  (reasoning, answer-with-tags-removed).
* M13 context-builder projection (``orchestrator.py:221-240``):
  numbered context blocks, content truncated to 800 chars.
* M12 retry-on-low-confidence (``base.py:81-96``): generic retry
  combinator — run fn, if confidence < threshold re-run once with the
  retry suffix appended to the prompt.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

_JSON_RE = re.compile(r"\{.*\}", re.DOTALL)
_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)

CONFIDENCE_RETRY_THRESHOLD = 0.5
RETRY_SUFFIX = (
    "\n\nYour previous answer was low-confidence. Re-read the input and respond "
    "again with strict JSON."
)
CONTEXT_SNIPPET_MAX = 800


def safe_json(text: str) -> dict:
    """M9: first {...} blob or {} — never raises."""
    m = _JSON_RE.search(text or "")
    if not m:
        return {}
    try:
        out = json.loads(m.group(0))
        return out if isinstance(out, dict) else {}
    except (json.JSONDecodeError, ValueError):
        return {}


def safe_json_strip_think(text: str) -> dict:
    """M9 loadable-model variant: strip <think> blocks first."""
    return safe_json(_THINK_RE.sub("", text or ""))


def split_think(text: str) -> tuple[str, str]:
    """M10: (reasoning, answer) — reasoning = concatenated think blocks."""
    text = text or ""
    reasoning = "\n".join(m.strip() for m in _THINK_RE.findall(text))
    answer = _THINK_RE.sub("", text).strip()
    return reasoning, answer


def build_context(hits: list[dict], text_key: str = "text",
                  max_chars: int = CONTEXT_SNIPPET_MAX) -> str:
    """M13: numbered blocks, each truncated to max_chars."""
    blocks = []
    for i, h in enumerate(hits, 1):
        content = (h.get(text_key) or "")[:max_chars]
        meta = h.get("meta") or {}
        tag = meta.get("chunk_type", "text")
        blocks.append(f"[{i}] ({tag}) {content}")
    return "\n\n".join(blocks)


def with_retry(run: Callable[[str], dict], prompt: str,
               threshold: float = CONFIDENCE_RETRY_THRESHOLD) -> dict:
    """M12: one self-reflection retry on low confidence.

    ``run`` maps a prompt to a result dict with a ``confidence`` key;
    retried once with RETRY_SUFFIX, keeping the better result.
    """
    first = run(prompt)
    if float(first.get("confidence", 0.0)) >= threshold:
        return first
    second = run(prompt + RETRY_SUFFIX)
    return second if float(second.get("confidence", 0.0)) >= float(
        first.get("confidence", 0.0)
    ) else first
