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


def mime_message(
    to_addr: Column,
    subject: Column,
    html: Column,
    from_addr: str = "reports@engine.local",
) -> Column:
    """S10 message CONSTRUCTION (the part of the email sink that IS
    dataflow): assemble a complete RFC 2822 multipart/alternative
    message — headers, deterministic content-hash boundary, text/plain
    part (the F6 strip of the HTML), text/html part — as one codegen'd
    string expression. Only the network submission (SMTP/Gmail API —
    ref oauth_gmail_notifier.py:72-121) stays out of engine scope.

    The boundary is ``=_`` + md5(html): content-derived, so the whole
    message is a pure deterministic function of its inputs (testable,
    oracle-checkable), unlike the random boundaries mail libraries
    generate.
    """
    crlf = F.lit("\r\n")
    boundary = F.concat(F.lit("=_"), F.md5(F.encode(html, "UTF-8")))
    dashes = F.concat(F.lit("--"), boundary)
    return F.concat(
        F.lit(f"From: {from_addr}"), crlf,
        F.lit("To: "), to_addr, crlf,
        F.lit("Subject: "), subject, crlf,
        F.lit("MIME-Version: 1.0"), crlf,
        F.lit('Content-Type: multipart/alternative; boundary="'),
        boundary, F.lit('"'), crlf, crlf,
        dashes, crlf,
        F.lit("Content-Type: text/plain; charset=utf-8"), crlf, crlf,
        html_to_text(html), crlf,
        dashes, crlf,
        F.lit("Content-Type: text/html; charset=utf-8"), crlf, crlf,
        html, crlf,
        dashes, F.lit("--"), crlf,
    )


def html_to_text(col: Column) -> Column:
    """F6 — <br> → newline, strip remaining tags, collapse blank
    lines (oauth_gmail_notifier.py:139-144)."""
    no_br = F.regexp_replace(col, r"(?i)<br\s*/?>", "\n")
    no_tags = F.regexp_replace(no_br, r"<[^>]+>", "")
    return F.trim(F.regexp_replace(no_tags, r"\n\s*\n+", "\n"))
