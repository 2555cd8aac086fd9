"""Document-parsing quality metrics: normalized edit distance & friends.

The reference scores itself with OmniDocBench's normalized edit distance
over the ``*_nohf.md`` outputs (``tools/eval_omnidocbench.md``; published
EN 0.125 / ZH 0.160, ``assets/blog.md:419-432``). This module provides the
metric primitives so sweeps can be scored in-repo when ground truth is
available.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Edit distance, O(len(a) * len(b)) vectorized over rows."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # numpy DP: iterate rows of a, vectorize over b
    b_arr = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    js = np.arange(1, len(b) + 1, dtype=np.int64)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ch in enumerate(a, start=1):
        cur = np.empty_like(prev)
        cur[0] = i
        cost = (b_arr != ord(ch)).astype(np.int64)
        # substitution / insertion candidates are vectorizable;
        # deletion (cur[j] = cur[j-1] + 1) is a prefix-min scan:
        # cur[j] = min(j + min_{k<=j}(best[k] - k), cur[0] + j).
        best = np.minimum(prev[:-1] + cost, prev[1:] + 1)
        prefix = np.minimum.accumulate(best - js)
        cur[1:] = np.minimum(js + prefix, i + js)
        prev = cur
    return int(prev[-1])


def normalized_edit_distance(prediction: str, reference: str) -> float:
    """Levenshtein / max(len) in [0, 1]; 0 = perfect."""
    if not prediction and not reference:
        return 0.0
    denom = max(len(prediction), len(reference))
    return levenshtein(prediction, reference) / denom


_WS_RE = re.compile(r"\s+")


def normalize_markdown(text: str) -> str:
    """Light normalization before scoring: collapse whitespace, strip
    decoration that the benchmark treats as formatting noise."""
    text = re.sub(r"!\[\]\(data:image/[^)]*\)", "", text)  # inline base64 images
    text = _WS_RE.sub(" ", text)
    return text.strip()


def score_pages(
    predictions: Dict[str, str], references: Dict[str, str], normalize: bool = True
) -> Dict[str, float]:
    """Per-page + aggregate normalized edit distance.

    Returns {"overall": mean, "pages": {page_id: dist}} over the page ids
    present in both dicts.
    """
    shared = sorted(set(predictions) & set(references))
    per_page = {}
    for page in shared:
        p, r = predictions[page], references[page]
        if normalize:
            p, r = normalize_markdown(p), normalize_markdown(r)
        per_page[page] = normalized_edit_distance(p, r)
    overall = float(np.mean(list(per_page.values()))) if per_page else 0.0
    return {"overall": overall, "pages": per_page, "count": len(per_page)}
