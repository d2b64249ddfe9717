"""Presentation layer (SURVEY §2.8 F12): bars, labels, color tags, table
rendering — driver-side Python over an ALREADY-SMALL collected result.

The reference draws these with Rich (bar rendering formatters.py:858-868,
color-by-threshold tags tui/widgets.py:699-718, pluralized labels through
its formatter helpers). Here the same chrome is dependency-free string
building, and the contract that keeps it honest at scale is explicit:
``render_table`` hard-caps the rows it collects (display surfaces are
O(screen), never O(data)) — every number it draws was computed by the
engine; this module only draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# ANSI SGR codes for the reference's three alert colors (tui/widgets.py
# tags [green]/[yellow]/[red]); reset always appended.
_COLORS = {"green": "\x1b[32m", "yellow": "\x1b[33m", "red": "\x1b[31m"}
_RESET = "\x1b[0m"

_BLOCKS = " ▏▎▍▌▋▊▉█"  # eighth-width bar glyphs, empty -> full


def plural(n: int, word: str, suffix: str = "s") -> str:
    """``1 file`` / ``3 files`` — the reference's count-label helper."""
    return f"{n} {word}" if n == 1 else f"{n} {word}{suffix}"


def bar(value: float, max_value: float, width: int = 20) -> str:
    """Unicode block bar of ``value/max_value``, eighth-cell resolution
    (the Rich bar's look without the dependency). Zero/negative maxima
    render empty rather than raising — a display, not a validator."""
    if max_value <= 0 or value <= 0:
        return " " * width
    frac = min(1.0, float(value) / float(max_value))
    eighths = round(frac * width * 8)
    full, rem = divmod(int(eighths), 8)
    out = "█" * full + (_BLOCKS[rem] if rem and full < width else "")
    return out.ljust(width)


def colorize(text: str, color: str | None, enabled: bool = True) -> str:
    """Wrap in an ANSI color when ``enabled`` and the color is known;
    plain text otherwise (pipes and logs stay clean)."""
    code = _COLORS.get(color or "")
    return f"{code}{text}{_RESET}" if (enabled and code) else text


def threshold_color(value: float, warn: float, alert: float) -> str:
    """The reference's traffic-light rule: green below ``warn``, yellow
    below ``alert``, red at/above ``alert``."""
    if value < warn:
        return "green"
    if value < alert:
        return "yellow"
    return "red"


def render_table(
    df: DataFrame,
    max_rows: int = 25,
    bar_col: str | None = None,
    bar_width: int = 20,
) -> str:
    """Aligned ASCII table of the frame's first ``max_rows`` rows, with an
    optional bar column drawn against that column's in-view maximum.

    Collects ``max_rows + 1`` rows ONLY (the +1 detects truncation) — the
    display cap the reference applies to every panel (O7), enforced here
    at the collect boundary so no caller can accidentally render a
    100 TB result.
    """
    rows = df.limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    rows = rows[:max_rows]
    cols = df.columns
    cells = [[("" if r[c] is None else str(r[c])) for c in cols] for r in rows]
    if bar_col is not None and rows:
        vals = [float(r[bar_col] or 0) for r in rows]
        peak = max(vals, default=0.0)
        cols = cols + [f"{bar_col}_bar"]
        for row_cells, v in zip(cells, vals):
            row_cells.append(bar(v, peak, bar_width))
    widths = [
        max(len(cols[i]), *(len(r[i]) for r in cells)) if cells else len(cols[i])
        for i in range(len(cols))
    ]
    line = "  ".join(c.ljust(w) for c, w in zip(cols, widths))
    sep = "  ".join("-" * w for w in widths)
    body = [("  ".join(r[i].ljust(widths[i]) for i in range(len(cols)))) for r in cells]
    out = [line, sep, *body]
    if truncated:
        out.append(f"... ({plural(max_rows, 'row')} shown; more exist)")
    return "\n".join(out)
