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

The batch kernels are Arrow-native (``*_arrow`` on ``pa.Array`` /
``pa.ChunkedArray``, RE2 + utf8proc — the same regex/trim dialect as
the DuckDB oracle, measured ~3× the pandas ``.str`` versions); the
pandas ``*_batch`` wrappers delegate to them.  The Python scalars use
``re`` — identical on ASCII whitespace, which is the corpus contract
(``re``'s ``\\s`` also matches exotic Unicode whitespace; RE2/DuckDB's
does not).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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


# ---- Arrow-native batch kernels (pa.Array in / pa.Array out) ----


def _clean(arr) -> pa.Array:
    """null → "" and chunk-collapse, the shared preamble."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(np.asarray(arr, dtype=object), type=pa.string())
    return pc.coalesce(arr, pa.scalar("", type=arr.type))


def token_count_arrow(arr) -> pa.Array:
    t = pc.utf8_trim_whitespace(_clean(arr))
    n = pc.list_value_length(pc.split_pattern_regex(t, r"\s+")).cast(pa.int64())
    return pc.if_else(pc.equal(t, ""), pa.scalar(0, pa.int64()), n)


def avg_token_len_arrow(arr) -> pa.Array:
    t = pc.utf8_trim_whitespace(_clean(arr))
    n = token_count_arrow(arr).to_numpy().astype(np.float64)
    chars = pc.utf8_length(
        pc.replace_substring_regex(t, r"\s+", "")).to_numpy().astype(np.float64)
    out = np.divide(chars, n, out=np.zeros_like(n), where=n > 0)
    return pa.array(round_half_up(out, 6))


def alpha_ratio_arrow(arr) -> pa.Array:
    t = _clean(arr)
    total = pc.utf8_length(t).to_numpy().astype(np.float64)
    alpha = pc.utf8_length(
        pc.replace_substring_regex(t, "[^A-Za-z]", "")).to_numpy().astype(np.float64)
    out = np.divide(alpha, total, out=np.zeros_like(total), where=total > 0)
    return pa.array(round_half_up(out, 6))


def _space_tokens(t: pa.Array):
    """split(" ") → (flat token array, per-doc segment offsets).  Every
    doc yields ≥1 token ("" splits to [""]), so reduceat segments are
    never empty."""
    parts = pc.split_pattern(t, " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    off = parts.offsets.to_numpy()[:-1]
    return flat, off


def stopword_ratio_arrow(arr) -> pa.Array:
    t = pc.utf8_trim_whitespace(_clean(arr))
    flat, off = _space_tokens(t)
    hits = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False).astype(np.int64)
    per_doc = np.add.reduceat(hits, off) if len(hits) else np.zeros(0, np.int64)
    n = pc.list_value_length(pc.split_pattern(t, " ")).to_numpy().astype(np.float64)
    empty = pc.equal(t, "").to_numpy(zero_copy_only=False)
    out = np.where(empty, 0.0, per_doc / n)
    return pa.array(round_half_up(out, 6))


def langid_arrow(arr) -> pa.Array:
    t = _clean(arr)
    zh = pc.match_substring_regex(t, "[一-鿿]").to_numpy(zero_copy_only=False)
    low = pc.utf8_trim_whitespace(pc.utf8_lower(t))
    flat, off = _space_tokens(low)
    n = len(t)
    best = np.zeros(n, dtype=np.int64)
    best_idx = np.full(n, -1, dtype=np.int64)
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        hits = pc.is_in(flat, value_set=pa.array(LANG_MARKERS[lang])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = np.add.reduceat(hits, off) if len(hits) else np.zeros(0, np.int64)
        upd = c > best  # strict > = first-lang-wins tie-break, as scalar
        best[upd] = c[upd]
        best_idx[upd] = i
    lut = np.array(["und"] + langs, dtype=object)
    out = lut[best_idx + 1]
    out[zh] = "zh"
    return pa.array(out, type=pa.string())


# ---- pandas wrappers (delegate to the Arrow kernels) ----


def token_count_batch(texts: pd.Series) -> pd.Series:
    return pd.Series(token_count_arrow(pa.array(texts, from_pandas=True))
                     .to_numpy(), index=texts.index)


def avg_token_len_batch(texts: pd.Series) -> pd.Series:
    return pd.Series(avg_token_len_arrow(pa.array(texts, from_pandas=True))
                     .to_numpy(), index=texts.index)


def alpha_ratio_batch(texts: pd.Series) -> pd.Series:
    return pd.Series(alpha_ratio_arrow(pa.array(texts, from_pandas=True))
                     .to_numpy(), index=texts.index)


def stopword_ratio_batch(texts: pd.Series) -> pd.Series:
    return pd.Series(stopword_ratio_arrow(pa.array(texts, from_pandas=True))
                     .to_numpy(), index=texts.index)


def langid_batch(texts: pd.Series) -> pd.Series:
    return pd.Series(langid_arrow(pa.array(texts, from_pandas=True))
                     .to_numpy(zero_copy_only=False), index=texts.index)


def fingerprint_batch(texts: pd.Series) -> pd.Series:
    import hashlib

    return texts.fillna("").map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def fingerprint_arrow(arr) -> pa.Array:
    import hashlib

    t = _clean(arr)
    return pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                     for s in t.to_pylist()], type=pa.string())


def char_entropy(text: str) -> float:
    """Shannon entropy (bits) of the character distribution — a cheap
    gibberish/boilerplate quality signal (low entropy = repeated
    filler, near-random bytes score high).  Matches DuckDB's
    ``entropy()`` aggregate over the unnested characters."""
    if not text:
        return 0.0
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(arr, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def char_entropy_batch(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(char_entropy)
