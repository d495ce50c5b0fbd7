"""Optional vision-LLM fallback for unreadable fields (host-side HTTP).

Equivalent of the reference's GPT-4o fallback (``yolo.py:629-747``): when
local OCR can't read important fields, build a labelled collage of the
failing crops and ask a vision LLM to extract them, returning a field->value
JSON mapping. Same prompt contract (card/suit formats, exact-value rules,
omit-unreadable) and the same gating: disabled unless an API key is present.

This is deliberately NOT TPU work (SURVEY.md §2b routes it host-side); it
uses plain urllib so no SDK dependency is needed, and degrades to a no-op in
offline environments.
"""

from __future__ import annotations

import base64
import json
import os
import re
import urllib.request
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_MODEL = "gpt-4o"
API_URL = "https://api.openai.com/v1/chat/completions"

# fields worth escalating (reference yolo.py:51-59)
IMPORTANT_KEYS = (
    ["card1_rank", "card1_suit", "card2_rank", "card2_suit", "my_stack", "my_bet"]
    + [f"villian{i}_{k}" for i in range(1, 6) for k in ("name", "stack", "bet")]
    + ["total_pot", "game_id"]
)

_SYSTEM_PROMPT = (
    "You are an expert data extraction specialist. Analyze collage "
    "screenshots and extract precise information. Return ONLY valid JSON "
    "with no additional text."
)


def _user_prompt(missing_keys: Sequence[str]) -> str:
    return (
        "Analyze this image collage carefully.\n\n"
        f"EXTRACT THESE FIELDS IF VISIBLE: {', '.join(missing_keys)}\n\n"
        "FORMATTING RULES:\n"
        "- Card ranks: A, K, Q, J, T (for 10), 2-9\n"
        "- Card suits: c (clubs), d (diamonds), h (hearts), s (spades)\n"
        "- Complete cards combine rank + suit like \"As\", \"Th\"\n"
        "- Numeric values: exactly as shown (e.g. \"1.2k\", \"1500\", \"$500\")\n"
        "- Player names / game ids: exactly as shown\n"
        "- Omit any field that cannot be read clearly\n"
        "- Return ONLY a JSON object, no other text"
    )


def build_collage(
    crops: Sequence[Tuple[str, np.ndarray]], pad: int = 4, label_h: int = 18
) -> Optional[np.ndarray]:
    """Stack labelled (field_name, BGR crop) pairs into one annotated image."""
    import cv2
    from math import ceil, sqrt

    crops = [(k, c) for k, c in crops if c is not None and c.size]
    if not crops:
        return None
    cols = max(1, int(ceil(sqrt(len(crops)))))
    rows = int(ceil(len(crops) / cols))
    w_max = max(c.shape[1] for _, c in crops) + pad
    h_max = max(c.shape[0] for _, c in crops) + label_h + pad
    canvas = np.zeros((rows * h_max, cols * w_max, 3), np.uint8)
    for idx, (key, crop) in enumerate(crops):
        r, c = divmod(idx, cols)
        y, x = r * h_max, c * w_max
        canvas[y : y + crop.shape[0], x : x + crop.shape[1]] = crop
        cv2.putText(
            canvas, key, (x + 2, y + crop.shape[0] + label_h - 4),
            cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1,
        )
    return canvas


def query_vision_llm(
    collage_bgr: np.ndarray,
    missing_keys: Sequence[str],
    model: str = DEFAULT_MODEL,
    api_key: Optional[str] = None,
    timeout: float = 30.0,
) -> Dict[str, str]:
    """Send the collage to the vision LLM; returns {} when disabled/offline."""
    import cv2

    api_key = api_key or os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return {}
    ok, jpg = cv2.imencode(".jpg", collage_bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
    if not ok:
        return {}
    payload = {
        "model": model,
        "temperature": 0.0,
        "max_tokens": 1500,
        "messages": [
            {"role": "system", "content": _SYSTEM_PROMPT},
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": _user_prompt(missing_keys)},
                    {
                        "type": "image_url",
                        "image_url": {
                            "url": "data:image/jpeg;base64,"
                            + base64.b64encode(jpg.tobytes()).decode()
                        },
                    },
                ],
            },
        ],
    }
    req = urllib.request.Request(
        API_URL,
        data=json.dumps(payload).encode(),
        headers={
            "Content-Type": "application/json",
            "Authorization": f"Bearer {api_key}",
        },
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        text = body["choices"][0]["message"]["content"].strip()
    except Exception:
        return {}
    return parse_llm_json(text)


def parse_llm_json(text: str) -> Dict[str, str]:
    """Tolerant JSON extraction from an LLM response (direct or embedded)."""
    try:
        parsed = json.loads(text)
        if isinstance(parsed, dict):
            return {str(k): str(v) for k, v in parsed.items()}
    except json.JSONDecodeError:
        pass
    m = re.search(r"\{.*\}", text, re.DOTALL)
    if m:
        try:
            parsed = json.loads(m.group())
            if isinstance(parsed, dict):
                return {str(k): str(v) for k, v in parsed.items()}
        except json.JSONDecodeError:
            pass
    return {}
