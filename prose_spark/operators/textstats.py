"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are expressed with native pyspark.sql.functions where possible (JVM
whole-stage codegen); the n-gram language-ID heuristic runs in a pandas
UDF (vectorized over the batch). Modeled on the reference's multilingual
operators (multilingual.go:74-201) re-derived for set-based execution.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# compact public stopword cores per language (multilingual.go:214-328 keeps
# per-language lists; these are the high-frequency subsets)
STOPWORDS = {
    "en": {"the", "a", "an", "and", "or", "but", "is", "are", "was", "were",
           "in", "on", "at", "to", "of", "for", "with", "by", "from", "that",
           "this", "it", "be", "as", "not", "have", "has", "had"},
    "es": {"el", "la", "los", "las", "un", "una", "y", "o", "pero", "es",
           "son", "en", "de", "que", "por", "con", "para", "no", "se"},
    "fr": {"le", "la", "les", "un", "une", "et", "ou", "mais", "est", "sont",
           "dans", "de", "que", "par", "avec", "pour", "ne", "pas", "se"},
    "de": {"der", "die", "das", "ein", "eine", "und", "oder", "aber", "ist",
           "sind", "in", "von", "zu", "mit", "für", "nicht", "sich", "auf"},
    "ja": {"の", "に", "は", "を", "た", "が", "で", "て", "と", "し", "れ"},
}

# characteristic character / digraph evidence (multilingual.go:158-201)
_CHAR_HINTS = {
    "es": "ñ¿¡", "de": "ßüöä", "fr": "àâçéèêëîïôùûü", "ja": "のにはをが",
}


def token_count_col(text_col: str = "text"):
    """Whitespace token count as a native expression (codegen'd)."""
    c = F.col(text_col)
    return F.when(
        F.length(F.trim(c)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(c), r"\s+")))


def add_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, all native."""
    c = F.col(text_col)
    words = F.split(F.lower(F.trim(c)), r"\s+")
    en_stop = F.array(*[F.lit(w) for w in sorted(STOPWORDS["en"])])
    n_words = token_count_col(text_col)
    return (
        df.withColumn("n_tokens", n_words)
        .withColumn("n_chars_obs", F.length(c))
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, (F.length(F.regexp_replace(c, r"\s+", "")))
                   / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(F.length(c) > 0,
                   F.length(F.regexp_replace(c, r"[\w\s]+", "")) / F.length(c)
                   ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0,
                   F.size(F.filter(words, lambda w: F.array_contains(en_stop, w)))
                   / n_words).otherwise(F.lit(0.0)),
        )
    )


def unigram_logprob_scores(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-frequency unigram log-probability score per document — the
    classic cheap perplexity proxy for training-data quality filtering
    (low mean -log2 p = repetitive/boilerplate, high = rare-token noise).

    Two-aggregate plan: (1) corpus vocab = token counts with
    ``count >= min_count`` (a COUNT THRESHOLD, not top-K — top-K tie
    selection is nondeterministic and unverifiable cross-engine);
    (2) per-doc mean of -log2(count/total) over tokens, OOV smoothed as
    count 0.5. Token explode -> broadcast vocab join -> per-doc
    aggregate. Scale note: the broadcast hint fits while the thresholded
    vocab is tens of MB (true far beyond the test scales — vocab grows
    sublinearly, ~Heaps' law); at full web scale raise ``min_count``
    with corpus size or drop the hint and let the vocab join shuffle on
    the token key like any dimension that outgrows broadcast.

    -> (key_col, n_tokens, avg_neg_log2_p)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = df.select(
        F.col(key_col), F.explode(F.split(norm, " ")).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    vocab = counts.filter(F.col("c") >= min_count)
    scored = (
        toks.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "neg_log2_p",
            -F.log2(F.coalesce(F.col("c").cast("double"), F.lit(0.5))
                    / F.col("total")),
        )
    )
    return scored.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg("neg_log2_p").alias("avg_neg_log2_p"),
    )


# GPT-2-style pretokenizer pattern, simplified to the subset RE2 (DuckDB)
# and Java regex (Spark) BOTH support — no lookahead — so the DuckDB
# oracle can compute the same counts independently
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_col(text_col: str = "text"):
    """BPE-ish token count: GPT-2 pretokenizer segments (contractions,
    letter runs, digit runs, punctuation runs, whitespace runs) counted
    natively via regexp_extract_all — the cheap budget-token estimator
    for training-data pipelines (codegen'd, no UDF)."""
    return F.when(
        F.length(F.col(text_col)) == 0, F.lit(0)
    ).otherwise(
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(BPE_ISH_PATTERN), F.lit(0)))
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 8, window: int = 4,
    out_col: str = "fingerprints", hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every k-gram of the normalized text, slide a window of ``window``
    hashes, keep each window's minimum, distinct the result. Guarantees
    any shared substring of length >= k + window - 1 produces a shared
    fingerprint — the standard near-dup/plagiarism sketch. Computed
    per-row with native higher-order functions (map-only, no shuffle).

    ``hash_fn``: 'xxhash64' (default — one JVM hash call per position,
    same selection guarantee as a Karp-Rabin rolling hash) or 'md5' —
    the portable 60-bit hash (first 15 md5 hex chars) that DuckDB
    computes identically, so the driver oracle re-runs the WHOLE
    winnowing selection (k-gram hash, window min, distinct)
    independently instead of comparing against a pinned golden."""
    if hash_fn == "md5":
        def h(e: str) -> str:
            return f"cast(conv(substring(md5({e}),1,15),16,10) as bigint)"
    else:
        def h(e: str) -> str:
            return f"xxhash64({e})"

    norm_sql = f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
    # transform(array(X), v -> ...)[0] is a let-binding: X evaluates ONCE
    # per row and the lambda reuses it — without it the k-gram hash array
    # would be recomputed inside every window (O(n*w) hash calls)
    expr = f"""
      transform(array({norm_sql}), nm ->
        CASE WHEN length(nm) < {k} THEN array({h('nm')})
        ELSE transform(
               array(transform(sequence(1, length(nm) - {k - 1}),
                               i -> {h(f'substring(nm, i, {k})')})),
               hs -> array_distinct(transform(
                       sequence(1, greatest(size(hs) - {window - 1}, 1)),
                       j -> array_min(slice(hs, j, {window})))))[0]
        END
      )[0]
    """
    return df.withColumn(out_col, F.expr(expr))


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercase text (stable across engines for oracle checks) plus a fast
    xxhash64 for join keys."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint_md5", F.md5(norm)).withColumn(
        "fingerprint_x64", F.xxhash64(norm)
    )


# characteristic letter trigrams per language (multilingual.go:47-71
# keeps per-language n-gram frequency tables; these are the high-weight
# subsets, matched against normalized text trigram frequencies)
_LANG_TRIGRAMS = {
    "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha"),
    "es": ("que", "ión", "los", "ado", "con", "est", "ara", "del"),
    "fr": ("les", "ent", "des", "que", "ait", "our", "ion", "ans"),
    "de": ("der", "ein", "ich", "und", "den", "sch", "die", "cht"),
    "ja": (),
}


def _trigram_freqs(text: str) -> dict[str, float]:
    """Letter-only trigram frequencies (multilingual.go:126-155)."""
    letters = [c for c in text.lower() if c.isalpha()]
    n = len(letters) - 2
    if n <= 0:
        return {}
    counts: dict[str, int] = {}
    for i in range(n):
        g = "".join(letters[i : i + 3])
        counts[g] = counts.get(g, 0) + 1
    return {g: c / n for g, c in counts.items()}


def _detect_lang_one(text: str) -> tuple[str, float]:
    """Stopword hits x0.1 + trigram-frequency dot product + char-evidence
    scoring (multilingual.go:74-123)."""
    if text is None or len(text) < 10:
        return "en", 0.5
    words = text.lower().split()
    grams = _trigram_freqs(text)
    scores: dict[str, float] = {}
    for lang, sw in STOPWORDS.items():
        hits = sum(1 for w in words if w in sw)
        scores[lang] = 0.1 * hits / max(len(words), 1) * 10
    for lang, tri in _LANG_TRIGRAMS.items():
        scores[lang] = scores.get(lang, 0.0) + 5.0 * sum(
            grams.get(g, 0.0) for g in tri
        )
    for lang, chars in _CHAR_HINTS.items():
        hits = sum(1 for ch in text if ch in chars)
        scores[lang] = scores.get(lang, 0.0) + 0.05 * hits
    total = sum(scores.values())
    best = max(sorted(scores), key=lambda k: scores[k])
    conf = scores[best] / total if total > 0 else 0.5
    return best, conf


_LANG_SCHEMA = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
    ]
)


@F.pandas_udf(_LANG_SCHEMA)
def detect_language(texts: pd.Series) -> pd.DataFrame:
    out = [_detect_lang_one(t) for t in texts]
    return pd.DataFrame(out, columns=["lang_pred", "lang_conf"])
