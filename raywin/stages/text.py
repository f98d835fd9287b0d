"""Text analysis stages: token counting, quality scoring, language-ID,
document fingerprinting.  All vectorized pandas/numpy inside map_batches;
regexes compiled once per actor (callable-class pattern)."""

from __future__ import annotations

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "und", "das", "ist", "ein", "eine", "zu", "mit", "von"},
    "es": {"el", "la", "y", "de", "que", "en", "un", "una", "es", "por"},
}


class TextStats:
    """Adds n_chars2, n_tokens, avg_token_len, alpha_ratio, digit_ratio,
    upper_ratio, quality_score. SQL-oracle-friendly definitions:
    n_tokens = count of [A-Za-z0-9]+ runs."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"[A-Za-z0-9]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.findall(self.tok)
        n_tok = toks.str.len().astype("int64")
        tok_chars = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        n_chars = s.str.len().astype("int64")
        batch["n_chars2"] = n_chars
        batch["n_tokens"] = n_tok
        batch["avg_token_len"] = np.where(n_tok > 0, tok_chars / n_tok.clip(lower=1), np.nan)
        batch["alpha_ratio"] = np.where(
            n_chars > 0, s.str.count(r"[A-Za-z]") / n_chars.clip(lower=1), np.nan
        )
        batch["digit_ratio"] = np.where(
            n_chars > 0, s.str.count(r"[0-9]") / n_chars.clip(lower=1), np.nan
        )
        batch["upper_ratio"] = np.where(
            n_chars > 0, s.str.count(r"[A-Z]") / n_chars.clip(lower=1), np.nan
        )
        return batch


class QualityScore:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    repetition penalty (distinct-token ratio)."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"\w+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.lower().str.findall(self.tok)
        n = toks.str.len().clip(lower=1)
        distinct_ratio = toks.map(lambda ws: len(set(ws))).astype(float) / n
        length_score = (s.str.len().clip(0, 2000) / 2000.0) ** 0.5
        alpha = s.str.count(r"[A-Za-z]") / s.str.len().clip(lower=1)
        batch["quality_score"] = (0.4 * length_score + 0.4 * alpha + 0.2 * distinct_ratio).astype(
            float
        )
        return batch


class LangId:
    """N-gram/stopword-heuristic language guess over a fixed language set."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"[a-zà-ÿäöüß]+")
        self.langs = sorted(_STOPWORDS)
        self.stop = _STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch[self.text_col].fillna(""):
            words = self.tok.findall(text.lower())
            if not words:
                out.append("unknown")
                continue
            scores = {
                lang: sum(w in sw for w in words) for lang, sw in self.stop.items()
            }
            best = max(self.langs, key=lambda lang: (scores[lang], lang))
            out.append(best if scores[best] > 0 else "unknown")
        batch["lang_guess"] = out
        return batch


class Fingerprint:
    """Deterministic 64-bit document fingerprint: polynomial rolling hash of
    the normalized text (lower-cased, whitespace collapsed)."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        import re

        self.text_col = text_col
        self.out_col = out_col
        self.ws = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.int64)
        base = np.uint64(1099511628211)
        for i, text in enumerate(batch[self.text_col].fillna("")):
            norm = self.ws.sub(" ", text.strip().lower())
            h = np.uint64(14695981039346656037)
            for ch in norm.encode("utf-8"):
                with np.errstate(over="ignore"):
                    h = (h ^ np.uint64(ch)) * base
            out[i] = h.view(np.int64) if hasattr(h, "view") else np.int64(h)
        batch[self.out_col] = out
        return batch
