"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's capability set (it has no text analytics) with
the operations a 100 TB documents pipeline needs; each is a vectorized
per-batch kernel meant for ``map_batches`` over the ``documents`` table, with
a DuckDB-expressible definition wherever possible so the driver's oracle can
verify it (__ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# --- token counting --------------------------------------------------------

def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace tokenization: number of maximal runs of non-whitespace.
    SQL-equivalent: len(regexp_split_to_array(trim(text), '\\s+')) with
    empty → 0."""
    s = texts.fillna("").str.strip()
    n = s.str.count(r"\s+") + 1
    return n.where(s != "", 0).astype("int64")


_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    """BPE-ish pre-tokenizer count: alpha runs + digit runs + single
    punctuation marks (whitespace dropped)."""
    return texts.fillna("").str.count(_BPE_RE).astype("int64")


# --- quality scoring -------------------------------------------------------

_STOPWORDS = {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"}


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Integer quality features (integers so the DuckDB oracle hash-matches
    without float jitter): n_chars, n_alpha, n_digit, n_punct, n_space,
    n_tokens."""
    s = texts.fillna("")
    return pd.DataFrame(
        {
            "n_chars": s.str.len().astype("int64"),
            "n_alpha": s.str.count(r"[A-Za-z]").astype("int64"),
            "n_digit": s.str.count(r"[0-9]").astype("int64"),
            "n_punct": s.str.count(r"[.,;:!?]").astype("int64"),
            "n_space": s.str.count(r" ").astype("int64"),
            "n_tokens": token_count(s),
        }
    )


def stopword_ratio(texts: pd.Series) -> pd.Series:
    toks = texts.fillna("").str.lower().str.findall(r"[a-z]+")
    return toks.map(lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws)))


# --- language id -----------------------------------------------------------

#: tiny per-language character-class heuristic; real deployments would load a
#: fasttext-style model in the actor __init__ — the plumbing is identical.
def lang_id(texts: pd.Series) -> pd.Series:
    """Integer-threshold comparisons (5·count > len, 5·count > 2·len) so the
    DuckDB oracle (__ray_entry__) matches bit-for-bit — ratios like 0.4 are
    not exactly representable in floats."""
    s = texts.fillna("")
    n = s.str.len().clip(lower=1)
    cjk = s.str.count(r"[一-鿿]")
    cyr = s.str.count(r"[Ѐ-ӿ]")
    lat = s.str.count(r"[A-Za-z]")
    out = pd.Series("unknown", index=s.index, dtype=object)
    out[lat * 5 > n * 2] = "en"
    out[cyr * 5 > n] = "ru"
    out[cjk * 5 > n] = "zh"
    return out


# --- fingerprinting --------------------------------------------------------

def md5_fingerprint(texts: pd.Series) -> pd.Series:
    """Exact content fingerprint; SQL oracle: md5(text)."""
    return texts.fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_fingerprint(texts: pd.Series, window: int = 16) -> pd.Series:
    """Winnowing-style document fingerprint: min rolling polynomial hash over
    ``window``-byte windows (int64). Not SQL-expressible — rows-only check."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        b = t.encode("utf-8")
        if len(b) < window:
            h = 0
            for ch in b:
                h = (h * _BASE + ch) % _MOD
            out[i] = h
            continue
        # rolling hash over all windows, take min (stable fingerprint)
        pw = pow(_BASE, window - 1, _MOD)
        h = 0
        for ch in b[:window]:
            h = (h * _BASE + ch) % _MOD
        best = h
        for j in range(window, len(b)):
            h = ((h - b[j - window] * pw) * _BASE + b[j]) % _MOD
            if h < best:
                best = h
        out[i] = best
    return pd.Series(out, index=texts.index)


# --- word n-grams ----------------------------------------------------------

def word_grams(texts: pd.Series, n: int = 8) -> pd.DataFrame:
    """All word ``n``-grams of every row, vectorized across the batch.

    One explode of the token stream, then ``n`` shifted views of the flat
    token array joined with a single vectorized ``str.cat`` — no per-row
    Python loop. Returns columns ``(row, gram)`` where ``row`` is the
    positional index into ``texts``. Rows shorter than ``n`` tokens emit
    nothing. Used by benchmark decontamination (the GPT-3/PaLM-style
    n-gram-overlap contamination check)."""
    toks = texts.fillna("").str.split(" ")
    ex = toks.reset_index(drop=True).explode()
    flat = ex.to_numpy(dtype=object)
    m = len(flat) - n + 1
    empty = pd.DataFrame({"row": pd.Series([], dtype="int64"),
                          "gram": pd.Series([], dtype="object")})
    if m <= 0:
        return empty
    row = ex.index.to_numpy().astype(np.int64)
    valid = row[:m] == row[n - 1:]
    if not valid.any():
        return empty
    base = pd.Series(flat[:m], dtype="string")
    gram = base.str.cat([pd.Series(flat[k:m + k], dtype="string")
                         for k in range(1, n)], sep=" ")
    return pd.DataFrame({"row": row[:m][valid],
                         "gram": gram.to_numpy(dtype=object)[valid]})
