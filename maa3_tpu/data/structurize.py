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


# ---------------------------------------------------------------------------
# Deterministic heuristic structurizer (offline n2s)
# ---------------------------------------------------------------------------
#
# The reference's natural->struct direction calls GPT-3.5
# (preprocess/n2s_by_openai.py:7-35). In a zero-egress environment this
# heuristic covers the same caption patterns deterministically, following
# the reference prompt's own examples: sequential connectives split events
# over start/mid/end, simultaneous connectives share the attachment's span,
# a single event spans "all".

_SEQUENTIAL = (" followed by ", ", then ", " and then ", " then ",
               " after which ")
_SIMULTANEOUS = (" while ", " as ", " with ")


def _split_first(text: str, seps) -> Optional[tuple]:
    """Earliest occurrence of any separator: (before, sep, after) or None."""
    best = None
    for sep in seps:
        i = text.lower().find(sep)
        if i >= 0 and (best is None or i < best[0]):
            best = (i, sep)
    if best is None:
        return None
    i, sep = best
    return text[:i], sep, text[i + len(sep):]


def heuristic_natural_to_struct(caption: str) -> str:
    """Rule-based natural -> '<event& time>@...' (no LLM, deterministic).

    'train passing followed by short honks' -> '<train passing& all>@'
    '<short honks& end>'; simultaneous clauses inherit their anchor's time;
    captions with no recognized connective become one all-span event.
    """
    caption = caption.strip().rstrip(".")
    if not caption:
        return ""

    # 1. split into sequential groups
    groups: List[str] = []
    rest = caption
    while True:
        hit = _split_first(rest, _SEQUENTIAL)
        if hit is None:
            groups.append(rest)
            break
        before, _, after = hit
        groups.append(before)
        rest = after

    # 2. time tag per group (mirrors the reference prompt's examples)
    if len(groups) == 1:
        times = ["all"]
    elif len(groups) == 2:
        times = ["all", "end"]
    else:
        times = ["start"] + ["mid"] * (len(groups) - 2) + ["end"]

    # 3. within a group, simultaneous clauses share the group's time
    events: List[tuple] = []
    for group, t in zip(groups, times):
        rest = group
        while True:
            hit = _split_first(rest, _SIMULTANEOUS)
            if hit is None:
                part = rest.strip(" ,")
                if part:
                    events.append((part, t))
                break
            before, _, after = hit
            part = before.strip(" ,")
            if part:
                events.append((part, t))
            rest = after

    return "@".join(f"<{e}& {t}>" for e, t in events)
