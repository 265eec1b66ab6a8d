"""Single-process oracle extractor: the reference's per-page algorithm.

This is the golden generator and unit-test subject (SURVEY.md section 5): a
pure-Python, per-turn reimplementation of the reference's canonical
``PDFColumnExtractor`` (/root/reference/A003_colored_footer.py — the tested
default per /root/reference/tests/extractor_config.py:33-45), plus the A002
and A004 classifier variants. The Spark pipeline's vectorized core must equal
this function on every fixture; the pytest golden gate compares them under
the reference's snapshot normalization
(/root/reference/pdf_extractor_protocol.py:158-193).

Thresholds are ported exactly:

* vertical-line predicate: |x2-x1| < 5 and |y2-y1| > 100 (A003:45)
* best separator line: center distance < 0.30*w, max |y2-y1| (A003:125-135)
* grid search: range(int(0.3w), int(0.7w), 10), first x with blocks strictly
  on both sides (x1 < sx and x0 > sx), else w/2 (A003:146-153)
* header: center_y < 0.15*h strict (A003:181,233; A002 same; A004 uses 0.10)
* colored footer: fill != (1,1,1) rect with y0 > 0.5*h, block bbox fully
  contained (A003:166,190,224-230)
* semantic footer: blocks with center_y > 0.95*h whose joined lowercase text
  contains a keyword, or is < 50 chars with a digit (A003:195-210)
* line grouping: after sort by (y0, x0), a new line starts when the running
  |center_y - prev_center_y| >= 10; the anchor updates to every block's
  center, i.e. consecutive-difference sessionization (A003:254-272)
* within-line order by x0, spans joined " ", lines joined "\n" (A003:274-280)
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pdf_parser_spark.payload import (
    Block,
    ParsedPage,
    PayloadError,
    TokenizeError,
    parse_payload,
)

# Keyword lists verbatim from the reference.
A003_FOOTER_KEYWORDS = [
    "page", "copyright", "©", "®", "www.", ".com", ".org",
    "all rights reserved", "confidential",
]  # /root/reference/A003_colored_footer.py:204-205
A004_FOOTER_KEYWORDS = [
    "page", "copyright", "©", "www.", ".com", ".org",
    "all rights reserved", "vision ias",
]  # /root/reference/A004_Vision_2025.py:163-164

DEFAULT_PAGE_W = 612.0
DEFAULT_PAGE_H = 792.0


@dataclass(frozen=True)
class VariantConfig:
    """Parameterization of the three heuristic classifiers.

    footer_mode:
      * "band"     — A002: center_y > footer_frac*h
        (/root/reference/A002_header_footer_2_col.py:158-176)
      * "semantic" — A003: colored-region containment OR page-level
        has_footer flag at center_y > footer_frac*h (A003:177-242)
      * "keyword"  — A004: per-block keyword/short-digit test at
        center_y > footer_frac*h (/root/reference/A004_Vision_2025.py:152-197)
    """

    name: str
    header_frac: float
    footer_frac: float
    footer_mode: str
    keywords: tuple


VARIANTS = {
    "a002": VariantConfig("a002", 0.15, 0.90, "band", ()),
    "a003": VariantConfig("a003", 0.15, 0.95, "semantic", tuple(A003_FOOTER_KEYWORDS)),
    "a004": VariantConfig("a004", 0.10, 0.95, "keyword", tuple(A004_FOOTER_KEYWORDS)),
}


def _vertical_lines(page: ParsedPage):
    """P1: vertical-line predicate (A003:42-46)."""
    return [
        (x1, y1, x2, y2)
        for (x1, y1, x2, y2) in page.lines
        if abs(x2 - x1) < 5 and abs(y2 - y1) > 100
    ]


def find_column_separator(page: ParsedPage, blocks: list) -> float:
    """O4/O5: best vertical line, else first-hit grid search, else w/2
    (A003:112-153)."""
    width = page.width
    vlines = _vertical_lines(page)
    if vlines:
        center_x = width / 2
        best, best_length = None, 0
        for x1, y1, x2, y2 in vlines:
            length = abs(y2 - y1)
            if abs((x1 + x2) / 2 - center_x) < width * 0.3 and length > best_length:
                best, best_length = (x1, y1, x2, y2), length
        if best:
            return (best[0] + best[2]) / 2

    if not blocks:
        return width / 2

    for sep_x in range(int(width * 0.3), int(width * 0.7), 10):
        left = sum(1 for b in blocks if b.x1 < sep_x)
        right = sum(1 for b in blocks if b.x0 > sep_x)
        if left > 0 and right > 0:
            return float(sep_x)
    return width / 2


def _colored_regions(page: ParsedPage):
    """P3: non-white filled rects (A003:160-171)."""
    return [
        (x0, y0, x1, y1)
        for (x0, y0, x1, y1, fill) in page.rects
        if fill and tuple(fill) != (1.0, 1.0, 1.0)
    ]


def classify_regions(
    page: ParsedPage, blocks: list, separator_x: float, variant: VariantConfig
) -> dict:
    """C1/C2/C4: 4-way region CASE (A003:177-244; A002:152-184; A004:173-197)."""
    height = page.height
    header_threshold = height * variant.header_frac
    footer_threshold = height * variant.footer_frac

    footer_regions = []
    has_footer = False
    if variant.footer_mode == "semantic":
        footer_regions = [
            r for r in _colored_regions(page) if r[1] > height * 0.5
        ]  # P4: bottom-half colored regions (A003:188-191)
        potential = [b for b in blocks if (b.y0 + b.y1) / 2 > footer_threshold]
        if potential:
            footer_text = " ".join(b.text for b in potential).lower()
            if any(k in footer_text for k in variant.keywords):
                has_footer = True
            elif len(footer_text.strip()) < 50 and any(c.isdigit() for c in footer_text):
                has_footer = True

    regions = {"header": [], "footer": [], "left_column": [], "right_column": []}
    for b in blocks:
        center_y = (b.y0 + b.y1) / 2
        center_x = (b.x0 + b.x1) / 2
        if center_y < header_threshold:
            regions["header"].append(b)
            continue
        is_footer = False
        if variant.footer_mode == "band":
            is_footer = center_y > footer_threshold
        elif variant.footer_mode == "semantic":
            in_colored = any(
                b.x0 >= fx0 and b.x1 <= fx1 and b.y0 >= fy0 and b.y1 <= fy1
                for (fx0, fy0, fx1, fy1) in footer_regions
            )  # P5 containment (A003:224-230)
            is_footer = in_colored or (has_footer and center_y > footer_threshold)
        elif variant.footer_mode == "keyword":
            if center_y > footer_threshold:
                low = b.text.lower()
                if any(k in low for k in variant.keywords):
                    is_footer = True
                elif len(b.text.strip()) < 50 and any(c.isdigit() for c in b.text):
                    is_footer = True
        if is_footer:
            regions["footer"].append(b)
        elif center_x < separator_x:
            regions["left_column"].append(b)
        else:
            regions["right_column"].append(b)
    return regions


def blocks_to_text(blocks: list) -> str:
    """O1+O2+O3: reading-order reassembly (A003:246-280).

    Sort by (y0, x0); group into lines while the consecutive center-y
    difference stays < 10 (the reference's ``current_y`` updates to *every*
    block's center — both branches of A003:262-269 — so the test reduces to
    a consecutive difference); within a line sort by x0, join " "; join
    lines with "\n"."""
    if not blocks:
        return ""
    ordered = sorted(blocks, key=lambda b: (b.y0, b.x0))
    lines, current = [], [ordered[0]]
    prev_cy = (ordered[0].y0 + ordered[0].y1) / 2
    for b in ordered[1:]:
        cy = (b.y0 + b.y1) / 2
        if abs(cy - prev_cy) < 10:
            current.append(b)
        else:
            lines.append(current)
            current = [b]
        prev_cy = cy
    lines.append(current)
    return "\n".join(
        " ".join(b.text for b in sorted(line, key=lambda b: b.x0)) for line in lines
    )


def _meta(value) -> str:
    """Canonical stringification for the MAP<STRING,STRING> metadata column."""
    return json.dumps(value, ensure_ascii=False)


def _error_layout(turn_idx: int, message: str) -> dict:
    """D1 error row: degrade, never abort (A003:328-341)."""
    return {
        "page_number": turn_idx + 1,
        "header": "",
        "footer": "",
        "left_column": "",
        "right_column": "",
        "page_width": 0.0,
        "page_height": 0.0,
        "column_separator_position": None,
        "metadata": {"error": _meta(message)},
    }


def extract_turn(
    payload: str, tool: str, turn_idx: int, variant: str = "a003"
) -> dict:
    """Extract one turn's layout — the per-page map D1 (A003:282-326).

    ``tool`` dispatches the payload kind (the analog of EXTRACTOR_MAP,
    /root/reference/tests/extractor_config.py:33-45):

    * ``page/v1`` — full layout payload, tokenized per payload.py
    * ``plain``   — raw text; handled like the reference's get_text()
      fallback: one whole-page block (612x792, size 12.0, font "Unknown")
    * anything else falls back to ``plain`` semantics
    """
    cfg = VARIANTS[variant]
    try:
        if tool == "page/v1":
            try:
                page = parse_payload(payload)
                blocks = page.blocks
            except TokenizeError as exc:
                # S3 fallback: whole-page single block (A003:94-108). The
                # fallback replaces any partially tokenized blocks; it spans
                # the real page rect, already parsed from the PAGE header.
                # Drawings survive (separate scan in the reference,
                # A003:38,53) and still drive separator/footer logic.
                page = ParsedPage(width=exc.width, height=exc.height,
                                  lines=exc.lines, rects=exc.rects)
                blocks = []
                if exc.salvaged_text.strip():
                    blocks = [
                        Block(
                            text=exc.salvaged_text.strip(),
                            x0=0.0, y0=0.0, x1=page.width, y1=page.height,
                            font_size=12.0, font_name="Unknown",
                        )
                    ]
                page.blocks = blocks
        else:
            if payload is None:
                raise PayloadError("null payload")
            page = ParsedPage(width=DEFAULT_PAGE_W, height=DEFAULT_PAGE_H)
            blocks = []
            if payload.strip():
                blocks = [
                    Block(
                        text=payload.strip(),
                        x0=0.0, y0=0.0, x1=page.width, y1=page.height,
                        font_size=12.0, font_name="Unknown",
                    )
                ]
            page.blocks = blocks

        separator_x = find_column_separator(page, blocks)
        regions = classify_regions(page, blocks, separator_x, cfg)
        n_vlines = len(_vertical_lines(page))
        n_colored = len(_colored_regions(page))
        metadata = {
            "total_text_blocks": _meta(len(blocks)),
            "header_blocks": _meta(len(regions["header"])),
            "footer_blocks": _meta(len(regions["footer"])),
            "left_column_blocks": _meta(len(regions["left_column"])),
            "right_column_blocks": _meta(len(regions["right_column"])),
            "vertical_lines_detected": _meta(n_vlines),
            "colored_footer_regions": _meta(n_colored),
            "has_footer": _meta(len(regions["footer"]) > 0),
            "page_rect": _meta([0.0, 0.0, page.width, page.height]),
        }
        return {
            "page_number": turn_idx + 1,
            "header": blocks_to_text(regions["header"]),
            "footer": blocks_to_text(regions["footer"]),
            "left_column": blocks_to_text(regions["left_column"]),
            "right_column": blocks_to_text(regions["right_column"]),
            "page_width": page.width,
            "page_height": page.height,
            "column_separator_position": separator_x,
            "metadata": metadata,
        }
    except Exception as exc:  # noqa: BLE001 — degrade per turn, never abort
        return _error_layout(turn_idx, str(exc))


def normalize_layout(layout: dict) -> dict:
    """Snapshot normalization: floats to 2dp (truthy-guarded — a 0.0 value is
    left as-is, matching the reference's quirk), metadata keys sorted,
    per-line whitespace strip
    (/root/reference/pdf_extractor_protocol.py:158-193)."""
    data = dict(layout)
    for key in ("page_width", "page_height", "column_separator_position"):
        if data.get(key):
            data[key] = round(data[key], 2)
    if data.get("metadata"):
        data["metadata"] = dict(sorted(data["metadata"].items()))
    for key in ("header", "footer", "left_column", "right_column"):
        if data.get(key):
            data[key] = "\n".join(
                line.strip() for line in data[key].split("\n")
            ).strip()
    return data
