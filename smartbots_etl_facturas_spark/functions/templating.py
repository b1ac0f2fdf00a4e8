"""F5/F6 — report templating helpers (oauth_gmail_notifier.py:123-144).

F5 renders {word} placeholders driver-side (the email/report is a
post-collect() action, not a dataflow op); F6's HTML→plain-text strip
is also exposed as a Column expression for in-engine use.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{(\w+)\}")


def render_template(template: str, variables: dict) -> str:
    """F5 — substitute {word} placeholders only; unknown placeholders
    and CSS-style braces ({ margin: 0 }) pass through untouched."""
    def sub(m: re.Match) -> str:
        name = m.group(1)
        return str(variables[name]) if name in variables else m.group(0)

    return _PLACEHOLDER.sub(sub, template)


def html_to_text(col: Column) -> Column:
    """F6 — <br> → newline, strip remaining tags, collapse blank
    lines (oauth_gmail_notifier.py:139-144)."""
    no_br = F.regexp_replace(col, r"(?i)<br\s*/?>", "\n")
    no_tags = F.regexp_replace(no_br, r"<[^>]+>", "")
    return F.trim(F.regexp_replace(no_tags, r"\n\s*\n+", "\n"))
