"""Page-range expression parsing.

Semantics of ``PageRange.parse`` in the reference
(``extractpdf4j-core/.../helpers/PageRange.java:15-34``):

* ``None``/blank → ``"1"``
* ``"all"`` (case-insensitive, trimmed) → ``[-1]`` sentinel meaning all pages
* comma-separated items; each either an int or an inclusive range ``a-b``
* bad numeric tokens raise (Java ``NumberFormatException`` → ``ValueError``)
"""

from __future__ import annotations

ALL_PAGES = -1


def parse_pages(expr: str | None) -> list[int]:
    """Parse a page selection expression into a list of 1-based pages.

    Returns ``[-1]`` for "all". Mirrors PageRange.java:15-34 exactly,
    including: blank items inside the list are skipped, ranges are
    inclusive, and a descending range (e.g. "5-3") yields an empty
    expansion (Java's ``for (i=a;i<=b;i++)``).
    """
    if expr is None or not expr.strip():
        expr = "1"
    expr = expr.strip().lower()
    if expr == "all":
        return [ALL_PAGES]
    out: list[int] = []
    for part in expr.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            ab = part.split("-")
            a = int(ab[0].strip())
            b = int(ab[1].strip())
            out.extend(range(a, b + 1))
        else:
            out.append(int(part))
    return out


def is_all(pages: list[int]) -> bool:
    """True when the parsed selection means "every page" (single -1)."""
    return len(pages) == 1 and pages[0] == ALL_PAGES
