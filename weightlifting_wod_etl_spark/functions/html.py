"""HTML → text projection — OP4 of the reference.

Reference: ``strip_post_html`` (``handler.py:166-190``) parses with
BeautifulSoup and takes visible text. At scale a row-at-a-time Python parse
is the single hottest path in the pipeline, so the engine default is a
JVM-side regex strip (tags removed, source newlines preserved, common
entities decoded) — whole-stage-codegen'd, zero Python round trips. That is
semantically equivalent for WordPress-style content where block structure
is reflected in source newlines (the reference's own fixtures are).

A fidelity mode using a real parser would be a pandas_udf behind an
import-try (bs4 is not in this container); the expression path below is
the production one regardless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal entity table — the ones WordPress titles/content actually emit
# (reference replaces &#8211; explicitly, transforms.py:57)
_ENTITIES = {
    "&#8211;": "–",
    "&#8212;": "—",
    "&#8217;": "’",
    "&#8220;": "“",
    "&#8221;": "”",
    "&nbsp;": " ",
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
}


def strip_html(html: Column) -> Column:
    """Visible text of an HTML fragment: <br>/<p> → newline, tags dropped,
    entities decoded, blank-run collapse."""
    c = F.regexp_replace(html, r"(?i)<br\s*/?>", "\n")
    c = F.regexp_replace(c, r"(?i)</p\s*>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    for ent, ch in _ENTITIES.items():
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]*\n[ \t]*", "\n")  # trim around breaks
    c = F.regexp_replace(c, r"\n{2,}", "\n")  # collapse blank lines
    return F.trim(c)


def decode_entities(text: Column) -> Column:
    """Entity decode alone (titles are entity-encoded but tag-free)."""
    c = text
    for ent, ch in _ENTITIES.items():
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c
