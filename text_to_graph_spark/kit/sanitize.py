"""Label sanitization — ``'|'`` is the reserved set-delimiter.

Mirrors ``graph_extractor/src/graph_utils.py:9-10``: replace ``'|'`` with
``'_'`` and strip surrounding whitespace. Applied to every node label, node
type and edge label before any canonicalizing merge.
"""

from __future__ import annotations


def sanitize(text: str) -> str:
    return text.replace("|", "_").strip()
