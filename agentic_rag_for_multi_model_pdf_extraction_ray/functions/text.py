"""Text analysis kernels: language-ID, quality scoring, token
counting, fingerprinting.

These are training-data-pipeline operators beyond the reference's own
surface (the reference's only text analytics are keyword detection and
truncation, SURVEY.md §2.7); each is designed to be *exactly*
mirrorable in ANSI/DuckDB SQL so the driver's oracle check can verify
it value-for-value:

* token_count(text)      ↔ ``length(string_split_regex(trim(text),'\\s+'))``
* fingerprint            ↔ ``md5(text)``
* quality metrics        ↔ length/regexp_replace arithmetic (rounded)
* langid                 ↔ CJK char test + stopword-count argmax with a
                           fixed tie-break order

All batch functions are vectorized (pandas str / numpy); scalar
versions exist for tests.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .rounding import round_half_up

_WS_RE = re.compile(r"\s+")
_NONALPHA_RE = re.compile(r"[^A-Za-z]")
_CJK_RE = re.compile("[一-鿿]")

# Fixed marker-word sets; evaluation order is the deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "de": ("der", "die", "das", "und", "ist"),
}
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")


def token_count(text: str) -> int:
    t = text.strip()
    return 0 if t == "" else len(_WS_RE.split(t))


def fingerprint(text: str) -> str:
    import hashlib

    return hashlib.md5(text.encode("utf-8")).hexdigest()


def alpha_ratio(text: str) -> float:
    if len(text) == 0:
        return 0.0
    return float(round_half_up(len(_NONALPHA_RE.sub("", text)) / len(text), 6))


def stopword_ratio(text: str) -> float:
    toks = text.strip().split(" ") if text.strip() else []
    if not toks:
        return 0.0
    hits = sum(1 for t in toks if t in STOPWORDS)
    return float(round_half_up(hits / len(toks), 6))


def avg_token_len(text: str) -> float:
    n = token_count(text)
    if n == 0:
        return 0.0
    chars = len(_WS_RE.sub("", text.strip()))
    return float(round_half_up(chars / n, 6))


def quality_ok(text: str, min_tokens: int = 5, max_tokens: int = 100000) -> bool:
    """Gopher-style bounds check: token count and mean token length."""
    n = token_count(text)
    if n < min_tokens or n > max_tokens:
        return False
    a = avg_token_len(text)
    return 2.0 <= a <= 15.0


def langid(text: str) -> str:
    """Heuristic language ID: CJK chars → zh, else stopword argmax
    over LANG_MARKERS in fixed order; no hits → 'und'."""
    if _CJK_RE.search(text):
        return "zh"
    toks = text.lower().strip().split(" ") if text.strip() else []
    best_lang, best = "und", 0
    for lang, markers in LANG_MARKERS.items():
        c = sum(1 for t in toks if t in markers)
        if c > best:
            best, best_lang = c, lang
    return best_lang


# ---- vectorized batch versions (pandas Series in/out) ----


def token_count_batch(texts: pd.Series) -> pd.Series:
    t = texts.fillna("").str.strip()
    n = t.str.split(_WS_RE).str.len()
    return n.where(t != "", 0).astype("int64")


def avg_token_len_batch(texts: pd.Series) -> pd.Series:
    t = texts.fillna("").str.strip()
    n = token_count_batch(texts)
    chars = t.str.replace(_WS_RE, "", regex=True).str.len()
    out = pd.Series(round_half_up((chars / n.replace(0, np.nan)).fillna(0.0)), index=texts.index)
    return out


def alpha_ratio_batch(texts: pd.Series) -> pd.Series:
    t = texts.fillna("")
    total = t.str.len()
    alpha = t.str.replace(_NONALPHA_RE, "", regex=True).str.len()
    return pd.Series(round_half_up((alpha / total.replace(0, np.nan)).fillna(0.0)), index=texts.index)


def stopword_ratio_batch(texts: pd.Series) -> pd.Series:
    t = texts.fillna("").str.strip()
    toks = t.str.split(" ")
    def _ratio(ws):
        if not ws or ws == [""]:
            return 0.0
        return float(round_half_up(sum(1 for w in ws if w in STOPWORDS) / len(ws), 6))
    return toks.map(_ratio)


def langid_batch(texts: pd.Series) -> pd.Series:
    # per-doc token-set logic must match the scalar (and the SQL
    # oracle's list_filter over string_split) exactly — no regex-count
    # shortcut that could diverge on odd whitespace
    return texts.fillna("").map(langid)


def fingerprint_batch(texts: pd.Series) -> pd.Series:
    import hashlib

    return texts.fillna("").map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def char_entropy(text: str) -> float:
    """Shannon entropy (bits) of the character distribution — a cheap
    gibberish/boilerplate quality signal (low entropy = repeated
    filler, near-random bytes score high).  Matches DuckDB's
    ``entropy()`` aggregate over the unnested characters."""
    import numpy as np

    if not text:
        return 0.0
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(arr, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def char_entropy_batch(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(char_entropy)
