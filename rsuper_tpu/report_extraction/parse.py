"""Parse structured LLM lesion answers.

Consumes the line contract of ``prompts.LESION_EXTRACTION_SYSTEM`` —
identical to what the reference's ``interpret_output(step='type and size
multi-organ')`` parses (``report_extraction/RadGPT.py:1509-1560``) — into a
list of lesion dicts. Chain-of-thought before a closing ``</think>`` tag is
stripped first.
"""

from __future__ import annotations

import re
from typing import Dict, List

_LESION_RE = re.compile(
    r"lesion\s*\d+\s*:\s*type\s*=\s*(?P<type>.+?);\s*certainty\s*=\s*"
    r"(?P<certainty>.+?);\s*size\s*=\s*(?P<size>.+?);\s*organ\s*=\s*"
    r"(?P<organ>.+?);\s*location\s*=\s*(?P<location>.+?);\s*attenuation\s*=\s*"
    r"(?P<attenuation>.+?);"
)
_NUM_RE = re.compile(r"(\d+(?:\.\d+)?)")


def _normalize_size(raw: str) -> str:
    """'2.3 x 1.8 cm' → '23.0 x 18.0'; '17 mm' → '17.0'; 'u'/'multiple' pass."""
    raw = raw.strip().lower()
    if raw in ("u", "unknown", "multiple", "tiny", "no lesion"):
        return "multiple" if raw == "multiple" else ("tiny" if raw == "tiny" else "u")
    nums = [float(x) for x in _NUM_RE.findall(raw)]
    if not nums:
        return "u"
    if "cm" in raw and "mm" not in raw:
        nums = [n * 10.0 for n in nums]
    return " x ".join(f"{n:g}" for n in nums) if len(nums) > 1 else f"{nums[0]:g}"


def parse_lesion_answer(answer: str) -> List[Dict[str, str]]:
    """LLM answer → list of lesion dicts; [] plus the no-lesion sentinel for
    healthy reports."""
    if "</think>" in answer:
        answer = answer.split("</think>")[-1]
    low = answer.lower()
    if "no lesions mentioned" in low and "lesion 1:" not in low:
        return [{
            "type": "no lesion", "certainty": "no lesion", "size": "no lesion",
            "organ": "no lesion", "location": "no lesion",
            "attenuation": "no lesion", "no_lesion": "1",
        }]
    out = []
    for m in _LESION_RE.finditer(low):
        out.append({
            "type": m.group("type").strip(),
            "certainty": m.group("certainty").strip(),
            "size": _normalize_size(m.group("size")),
            "organ": m.group("organ").strip(),
            "location": m.group("location").strip(),
            "attenuation": m.group("attenuation").strip(),
            "no_lesion": "0",
        })
    return out
