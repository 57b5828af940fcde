"""Caption structurizer — preprocess/n2s_by_openai.py / struct_to_natural.py
equivalents, usable offline.

The reference calls GPT-3.5 to turn natural captions into the structured
`<event& time>@<event& time>` form and back. This module provides:
- `struct_to_natural`: deterministic inverse (string surgery, no LLM)
- `natural_to_struct`: the trivial `<caption& all>` fallback the datasets use
  when no structurizer ran, plus an optional pluggable LLM callable for
  environments with an endpoint.
"""

from __future__ import annotations

from typing import Callable, List, Optional

PROMPT = (
    "Convert the natural audio caption into the structured form "
    "'<event& time>@<event& time>' where time is one of all/start/mid/end "
    "and events are atomic sound events, preserving order."
)


def natural_to_struct(caption: str,
                      llm: Optional[Callable[[str], str]] = None) -> str:
    """Natural -> structured. Without an LLM endpoint, the whole caption is a
    single all-span event — exactly what the training TSVs fall back to."""
    caption = caption.strip().rstrip(".")
    if not caption:
        return ""
    if llm is not None:
        return llm(f"{PROMPT}\n\n{caption}")
    return f"<{caption}& all>"


def struct_to_natural(struct: str) -> str:
    """'<a& all>@<b& end>' -> 'a, then b' (struct_to_natural.py semantics:
    strip markers, join events in order)."""
    events: List[str] = []
    for part in struct.split("@"):
        part = part.strip()
        if part.startswith("<"):
            part = part[1:]
        if part.endswith(">"):
            part = part[:-1]
        event = part.split("&")[0].strip()
        if event:
            events.append(event)
    if not events:
        return ""
    if len(events) == 1:
        return events[0]
    return ", then ".join(events)
