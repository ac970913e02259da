"""Text analysis operators: quality scoring, language-ID, token counting,
fingerprinting. Pure JVM expressions (regexp_count/split/md5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS_RE = r"\b(the|and|of|to|in|a|is|for|on|with)\b"
PUNCT_RE = r"[^A-Za-z0-9\s]"
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

LANG_WORDS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|et|les|des|est)\b",
}


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / re_tokens / stopword & punct counts / quality.

    Quality = 0.4·len + 0.4·stopword-density + 0.2·(1−punct-density),
    each component clipped to [0,1] — a simple heuristic of the
    Gopher-rules family."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    stop_hits = F.regexp_count(F.lower(t), F.lit(STOPWORDS_RE))
    punct = F.regexp_count(t, F.lit(PUNCT_RE))
    chars = F.length(t)
    quality = F.round(
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.4 * F.least(stop_hits / F.greatest(n_tokens, F.lit(1)) * 5.0,
                        F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct / F.greatest(chars, F.lit(1)) * 10.0,
                               F.lit(1.0))), 6)
    return (df.withColumn("n_tokens", n_tokens)
            .withColumn("re_tokens", F.regexp_count(t, F.lit(TOKEN_RE)))
            .withColumn("stopword_hits", stop_hits)
            .withColumn("punct_chars", punct)
            .withColumn("quality", quality))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit n-gram heuristic language-ID with deterministic
    en>de>fr tie-break."""
    lo = F.lower(F.col(text_col))
    hits = {lang: F.regexp_count(lo, F.lit(rx))
            for lang, rx in LANG_WORDS.items()}
    pred = (F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]), "en")
            .when(hits["de"] >= hits["fr"], "de").otherwise("fr"))
    out = df
    for lang, h in hits.items():
        out = out.withColumn(f"{lang}_hits", h)
    return out.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 document fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def vocab_topk(df, k: int = 50, text_col: str = "text"):
    """Corpus vocabulary build (the BPE-prep step of a training
    pipeline): whitespace tokens lowercased, global counts, top-k by
    (count desc, token). Map-side combined groupBy then a k-row
    TakeOrdered on the driver — the shuffle carries one row per distinct
    token, never per occurrence."""
    toks = (df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                        r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    return (toks.groupBy("token").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("token"))
            .limit(k))
