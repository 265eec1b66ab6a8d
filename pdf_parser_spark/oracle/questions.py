"""Question-span extraction: the reference's F1 operator.

Regex span extraction with start/end offsets over a column's text, ported
from /root/reference/A004_Vision_2025.py:324-367 (pattern at :341, span
arithmetic at :346-356). Each match starts a question; the question's span
runs from the match start to the next match start (or end of text); the
captured integer is the question number. The extracted text is ``strip()``ed
but the recorded offsets are the raw span bounds, exactly as the reference
keeps ``match.start()`` positions.
"""

from __future__ import annotations

import re

QUESTION_PATTERN = re.compile(r"(?:^|\n)\s*(?:Q\.?\s*)?(\d+)[\.\)]\s+", re.MULTILINE)


def extract_questions_from_text(text: str, column: str, page_number: int) -> list:
    """Return question dicts for one column of one turn (A004:324-367)."""
    if not text:
        return []
    matches = list(QUESTION_PATTERN.finditer(text))
    questions = []
    for i, match in enumerate(matches):
        start = match.start()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        questions.append(
            {
                "question_number": int(match.group(1)),
                "question_text": text[start:end].strip(),
                "page_number": page_number,
                "column": column,
                "start_offset": start,
                "end_offset": end,
            }
        )
    return questions
