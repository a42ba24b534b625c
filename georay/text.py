"""Text-analysis operators for training-data pipelines.

* language-ID    — n-gram/stopword heuristic: per-language stopword hit
                   ratio, argmax with deterministic lexicographic ties.
                   The STOPWORDS dict is the single source of truth —
                   georay.sqlgen generates the equivalent DuckDB lambda
                   expressions from it, so Ray and SQL never drift.
* quality score  — punctuation/digit density + mean token length
                   (georay.queries.quality_score).
* token counting — whitespace split + a BPE-ish subword estimate
                   (chars/3.2 heuristic cross-checked by tests).
* fingerprinting — winnowing (Schleimer et al. 2003): rolling k-gram
                   hashes, minimum per sliding window, rightmost-min
                   rule; shared substrings of length >= w+k-1 share a
                   fingerprint (property-tested).
"""

from __future__ import annotations

import hashlib

import numpy as np

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "ich", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"),
    "es": ("el", "la", "los", "y", "es", "una", "no", "por", "que", "para"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "men5"),
}
LANG_FALLBACK = "und"


def lang_scores(tokens: list[str]) -> dict[str, float]:
    n = max(len(tokens), 1)
    return {
        lang: sum(t in words for t in tokens) / n for lang, words in sorted(STOPWORDS.items())
    }


def guess_lang(text: str) -> str:
    tokens = text.lower().split()
    scores = lang_scores(tokens)
    best = max(scores.values())
    if best == 0.0:
        return LANG_FALLBACK
    # deterministic tie-break: lexicographically smallest language code
    for lang in sorted(scores):
        if scores[lang] == best:
            return lang
    return LANG_FALLBACK


def token_count(text: str) -> int:
    return len(text.split())


def subword_estimate(text: str) -> int:
    """BPE-ish token estimate: ~3.2 chars/token on natural text."""
    return max(1, round(len(text) / 3.2))


def _h32(data: bytes) -> int:
    """First 32 bits of md5 — any uniform hash satisfies the winnowing
    theorem; md5 specifically so the DuckDB oracle can recompute the
    identical fingerprints in SQL (r3)."""
    return int(hashlib.md5(data).hexdigest()[:8], 16)


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> list[tuple[int, int]]:
    """Winnowing fingerprints: (position, hash) of the minimum k-gram
    hash in every w-window, rightmost-min rule, de-duplicated.

    Guarantee (the winnowing theorem): any substring match of length
    >= w + k - 1 between two documents yields at least one shared
    fingerprint hash.
    """
    n = len(text)
    if n < k:
        return [(0, _h32(text.encode()))] if text else []
    hashes = [_h32(text[i : i + k].encode()) for i in range(n - k + 1)]
    if len(hashes) <= w:
        m = min(range(len(hashes)), key=lambda i: (hashes[i], -i))
        return [(m, hashes[m])]
    out: list[tuple[int, int]] = []
    last = -1
    for start in range(len(hashes) - w + 1):
        window = hashes[start : start + w]
        # rightmost minimum
        m_local = max(
            range(w), key=lambda i: (window[i] == min(window), i)
        )
        m = start + m_local
        if m != last:
            out.append((m, hashes[m]))
            last = m
    return out


def fingerprint_set(text: str, k: int = 5, w: int = 4) -> set[int]:
    return {h for _, h in winnow_fingerprints(text, k, w)}
