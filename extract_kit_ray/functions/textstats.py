"""Text analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline operators the engine adds beyond the
reference's own inventory (driver brief: "text analysis").  All functions
are deterministic pure-Python/numpy and run inside ``map_batches``; the
stopword tables and regexes are compiled once per actor
(:class:`extract_kit_ray.stages.extract_stage` pattern).
"""

from __future__ import annotations

import math
import re

from .hashing import hash64, rolling_fingerprint

# ---------------------------------------------------------------------------
# language identification (stopword + character n-gram heuristic)
# ---------------------------------------------------------------------------

# Compact, deterministic stopword profiles (public common-word lists).
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it was for on are with as his they at be "
        "this have from or had by not word but what some we can out other were "
        "all there when up use your how said an each she".split()
    ),
    "fr": frozenset(
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas vous par sur faire plus dire me on mon lui nous comme "
        "mais avec tout y aller voir bien où sans tu ou leur".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war".split()
    ),
    "es": frozenset(
        "de la que el en y a los se del las un por con no una su para es al "
        "lo como más pero sus le ya o fue este ha sí porque esta son entre "
        "cuando muy sin sobre ser tiene también me hasta hay donde".split()
    ),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_language(text: str, min_words: int = 3) -> tuple[str, float]:
    """Return (lang, confidence). ``unknown`` when no profile clears 8%
    stopword coverage or the text has fewer than ``min_words`` words."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if len(words) < min_words:
        return "unknown", 0.0
    n = len(words)
    best_lang = "unknown"
    best_score = 0.0
    for lang in sorted(_LANG_STOPWORDS):  # sorted -> deterministic tie-break
        stop = _LANG_STOPWORDS[lang]
        score = sum(1 for w in words if w in stop) / n
        if score > best_score:
            best_score = score
            best_lang = lang
    if best_score < 0.08:
        return "unknown", best_score
    return best_lang, best_score


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / repetition ratios)
# ---------------------------------------------------------------------------

_SENT_END = frozenset(".!?")
_PUNCT = frozenset(".,;:!?\"'()[]{}-")


def quality_signals(text: str) -> dict[str, float]:
    """Deterministic quality signals in the Gopher/C4 rule family
    (published data-cleaning heuristics): word stats, punctuation and
    stopword ratios, line-level repetition."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return {
            "n_chars": float(n_chars), "n_words": 0.0, "mean_word_len": 0.0,
            "stopword_ratio": 0.0, "punct_ratio": 0.0, "ends_with_punct": 0.0,
            "dup_line_ratio": 0.0, "alpha_ratio": 0.0, "quality_score": 0.0,
        }
    mean_word_len = sum(len(w) for w in words) / n_words
    lowered = [w.lower().strip("".join(_PUNCT)) for w in words]
    en_stop = _LANG_STOPWORDS["en"]
    stopword_ratio = sum(1 for w in lowered if w in en_stop) / n_words
    punct_ratio = sum(1 for c in text if c in _PUNCT) / max(1, n_chars)
    ends_with_punct = 1.0 if text.rstrip() and text.rstrip()[-1] in _SENT_END else 0.0
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    dup_line_ratio = 1.0 - (len(set(lines)) / len(lines)) if lines else 0.0
    alpha_ratio = sum(1 for c in text if c.isalpha()) / max(1, n_chars)
    # composite score in [0, 1]: each factor clamps to [0, 1]
    f_len = min(1.0, n_words / 50.0)
    f_word = 1.0 if 3.0 <= mean_word_len <= 10.0 else 0.5
    f_stop = min(1.0, stopword_ratio / 0.2)
    f_dup = 1.0 - dup_line_ratio
    quality = f_len * 0.3 + f_word * 0.2 + f_stop * 0.3 + f_dup * 0.2
    return {
        "n_chars": float(n_chars), "n_words": float(n_words),
        "mean_word_len": mean_word_len, "stopword_ratio": stopword_ratio,
        "punct_ratio": punct_ratio, "ends_with_punct": ends_with_punct,
        "dup_line_ratio": dup_line_ratio, "alpha_ratio": alpha_ratio,
        "quality_score": quality,
    }


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer in the GPT-2 style (published pattern family),
# expressed with stdlib re (no \p classes): letter runs, digit runs,
# punctuation runs, common contractions.
_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE,
)


def count_tokens_whitespace(text: str) -> int:
    """Whitespace token count — matches SQL
    ``len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))``."""
    return len(text.split())


def count_tokens_bpe(text: str) -> int:
    """Sub-word-ish token count with the BPE-style pre-tokenizer regex."""
    return len(_BPE_RE.findall(text))


def document_fingerprint(text: str, window: int = 64) -> int:
    """Rolling-hash fingerprint (signed int64 for Arrow columns)."""
    return _to_i64(rolling_fingerprint(text, window=window))


def _to_i64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def text_hash64(text: str) -> int:
    """Signed 64-bit content hash for exact-dedup keys."""
    return _to_i64(hash64(text))
