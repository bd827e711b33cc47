"""Text-analysis operators for a training-data pipeline — pure expressions.

These extend the engine beyond the reference's operator set (the reference
routes/validates CSV rows; a 100 TB corpus pipeline needs per-document
text features). Everything here is built-in-function-only — JVM-side,
whole-stage codegen — so it runs at scan speed with zero Python in the
hot path:

  * token counting (whitespace + BPE-ish regex)
  * language ID (stopword n-gram heuristic)
  * quality scoring (length / punctuation / stopword / repetition ratios)
  * document fingerprinting (normalized content hash + rolling prefix hash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists — a deterministic, dependency-free
# heuristic (real pipelines plug fasttext via a pandas UDF; see multimodal.py
# for the stub pattern)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "dans"],
    "es": ["el", "la", "de", "que", "los", "es", "un", "una", "por", "con"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "del", "non"],
    "pt": ["o", "a", "de", "que", "os", "um", "uma", "para", "com", "nao"],
}

WORD_RE = r"[A-Za-z0-9_]+"
# BPE-ish: words, numbers, or single punctuation marks — approximates a
# byte-pair tokenizer's pre-tokenization split
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: Column) -> Column:
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_token_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(BPE_RE)).cast("long")


def _stopword_hits(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def _word_hits(words_col: Column, stopwords: list[str]) -> Column:
    """Stopword hit count (with multiplicity) over a tokenized words array
    — an IN-list filter per element, no regex scan of the full text."""
    sw = list(stopwords)
    return F.size(F.filter(words_col, lambda w: w.isin(*sw)))


def _argmax_lang(scores: list[tuple[str, Column]]) -> Column:
    best = F.lit("und")
    best_n = F.lit(0)
    # left-to-right argmax, ties keep the earlier language (stable)
    for lang, n in scores:
        take = n > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return best


def language_id(c: Column) -> Column:
    """Argmax of per-language stopword hit counts over a single
    lowercase-split tokenization; 'und' (undetermined) when nothing
    matches. One projection, no UDF. (The previous implementation ran six
    full-text regex alternation scans — 5x slower than its peers at sf0.1;
    splitting once and filtering the array is one text pass total.)

    Perf caveat: as a single expression the split subtree re-evaluates per
    language — hot paths use ``with_language_id`` which stages the words
    array as a column."""
    words = F.split(F.lower(c), "[^a-z]+")
    return _argmax_lang([(lang, _word_hits(words, ws)) for lang, ws in STOPWORDS.items()])


def with_language_id(df, text_col: str, out_col: str = "lang_id"):
    """Staged language ID: tokenize once into a bound column, then six
    array filters, then the argmax over BOUND COUNT COLUMNS.

    The two-stage staging matters (r06 measurement): ``_argmax_lang``
    builds a nested CASE whose running-max subtree is DUPLICATED at every
    comparison level — fed the filter expressions directly, the 'en' hit
    count is re-evaluated ~30x per row and the expression grows past the
    codegen size limit (interpreted Project, 35 s at sf1.0 single-core).
    Staging each language's count as a column first makes the CASE
    duplicate only attribute references (free), each filter runs exactly
    once per row, and the projection codegens again."""
    df = df.withColumn("_lid_words", F.split(F.lower(F.col(text_col)), "[^a-z]+"))
    langs = list(STOPWORDS)
    for lang in langs:
        df = df.withColumn(
            f"_lid_n_{lang}", _word_hits(F.col("_lid_words"), STOPWORDS[lang])
        )
    return df.withColumn(
        out_col, _argmax_lang([(lang, F.col(f"_lid_n_{lang}")) for lang in langs])
    ).drop("_lid_words", *[f"_lid_n_{lang}" for lang in langs])


def quality_features(c: Column) -> dict[str, Column]:
    """Raw quality signals (each a Column), combinable into a score."""
    n_chars = F.length(c).cast("double")
    n_words = whitespace_token_count(c).cast("double")
    n_alpha = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double")
    n_upper = F.regexp_count(c, F.lit(r"[A-Z]")).cast("double")
    n_stop = _stopword_hits(c, STOPWORDS["en"]).cast("double")
    safe = F.greatest(n_chars, F.lit(1.0))
    safe_w = F.greatest(n_words, F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": n_chars / safe_w,
        "alpha_ratio": n_alpha / safe,
        "punct_ratio": n_punct / safe,
        "upper_ratio": n_upper / safe,
        "stopword_ratio": n_stop / safe_w,
    }


def quality_score(c: Column) -> Column:
    """[0,1] heuristic: long-enough, alphabetic, punctuation-sane,
    some stopwords, not shouting. Weights are arbitrary but fixed —
    the point is a deterministic, vectorized scoring pass."""
    f_ = quality_features(c)
    length_ok = F.least(f_["n_chars"] / F.lit(500.0), F.lit(1.0))
    alpha_ok = F.least(f_["alpha_ratio"] / F.lit(0.7), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(f_["punct_ratio"] / F.lit(0.5), F.lit(1.0))
    stop_ok = F.least(f_["stopword_ratio"] / F.lit(0.2), F.lit(1.0))
    shout_ok = F.lit(1.0) - F.least(f_["upper_ratio"] / F.lit(0.5), F.lit(1.0))
    return (
        F.lit(0.3) * length_ok
        + F.lit(0.25) * alpha_ok
        + F.lit(0.15) * punct_ok
        + F.lit(0.2) * stop_ok
        + F.lit(0.1) * shout_ok
    )


def normalize_text(c: Column) -> Column:
    """Dedup-normalization: lowercase, collapse whitespace, strip edges."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_fingerprint(c: Column) -> Column:
    """64-bit fingerprint of normalized content (exact-dup key)."""
    return F.conv(F.substring(F.sha2(normalize_text(c), 256), 1, 15), 16, 10).cast("long")


def rolling_prefix_hashes(c: Column, window: int = 64, step: int = 32, max_chunks: int = 32) -> Column:
    """Array of fixed-offset chunk hashes over the normalized text — a cheap
    document sketch. Docs differing by in-place (equal-length) edits or
    appended suffixes share most chunk hashes; edits that *shift* offsets
    invalidate downstream chunks — use minhash (fuzzy.py) for those."""
    t = normalize_text(c)
    idx = F.sequence(F.lit(0), F.lit(max_chunks - 1))
    return F.filter(
        F.transform(
            idx,
            lambda i: F.when(
                i * step + 1 <= F.length(t),
                F.xxhash64(F.substring(t, i * step + 1, window)),
            ),
        ),
        lambda h: h.isNotNull(),
    )


# ---------------- repetition signals (Gopher-style) ----------------


def with_repetition_features(df, text_col: str, round_to: int | None = 6):
    """Per-document repetition signals — the Gopher/RefinedWeb quality
    gate's core features, as one narrow JVM projection (no shuffle, no
    UDF):

      * ``n_words``         word count (lowercase alpha tokenization)
      * ``dup_word_frac``   1 - distinct/total words (word-level repetition)
      * ``top_word_frac``   share of words taken by the single most
                            frequent word
      * ``top_bigram_frac`` share of word-bigrams taken by the most
                            frequent bigram

    The words/bigrams arrays are STAGED as bound columns before the
    nested higher-order functions touch them (a HOF lambda re-evaluates
    referenced outer subexpressions per element — unstaged, the split
    would re-run O(distinct x n) times). The most-frequent scan is
    O(distinct * n) per document — right for web/doc-sized text; for
    pathological single-document gigabyte inputs explode + groupBy
    instead. ``round_to`` rounds the fractions for cross-engine hash
    stability (None keeps full doubles)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda w: w != F.lit("")
    )
    df = df.withColumn("_rep_w", words)
    n = F.size(F.col("_rep_w"))
    df = df.withColumn(
        "_rep_b",
        F.zip_with(
            F.slice(F.col("_rep_w"), F.lit(1), F.greatest(n - 1, F.lit(0))),
            F.slice(F.col("_rep_w"), F.lit(2), F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )

    def _top_frac(arr: Column) -> Column:
        total = F.size(arr)
        top = F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda d: F.size(F.filter(arr, lambda x: x == d)),
            )
        )
        return F.when(total > 0, top.cast("double") / total).otherwise(F.lit(0.0))

    def _rnd(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    dup = F.when(
        n > 0,
        (n - F.size(F.array_distinct(F.col("_rep_w")))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_words", n.cast("long"))
        .withColumn("dup_word_frac", _rnd(dup))
        .withColumn("top_word_frac", _rnd(_top_frac(F.col("_rep_w"))))
        .withColumn("top_bigram_frac", _rnd(_top_frac(F.col("_rep_b"))))
        .drop("_rep_w", "_rep_b")
    )


# ---------------- PII scrubbing ----------------
#
# Corpus-prep redaction: mask the common machine-matchable identifiers
# before training. Pure chained regexp_replace — one JVM projection, no
# UDF — and the patterns are ERE-portable so a DuckDB oracle applies the
# identical rewrites (driver query pii_scrub). This is pattern-level
# scrubbing (emails, IPv4s, long digit runs like phones/SSNs/cards), not
# NER — names and addresses need a model and are out of scope here.

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (tag, regex, replacement) — applied in order; order matters (emails
    # before digit runs so user.99@x.com does not half-mask)
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d[\d \-]{6,}\d\b", "<NUMBER>"),  # phones/SSNs/cards
]


def scrub_pii(c: Column) -> Column:
    """Mask emails, IPv4 addresses and long digit runs (phone/SSN/card
    shaped) with typed placeholder tokens."""
    out = c
    for _tag, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-tag match counts (for auditing how much a corpus was masked).
    Counted on the PROGRESSIVELY scrubbed text, mirroring scrub_pii's
    order, so an email's digits are not double-counted as a number."""
    out: dict[str, Column] = {}
    cur = c
    for tag, pat, repl in PII_PATTERNS:
        out[tag] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, repl)
    return out


# ---------------- benchmark decontamination (n-gram overlap) ----------------


def with_word_ngrams(df, text_col: str, n: int, out_col: str = "_grams"):
    """Stage the DISTINCT word n-grams of ``text_col`` as an array column
    (lowercase alpha tokenization, the corpus-wide convention). The words
    array is staged as a bound column before the gram-building HOF touches
    it (HOF lambdas re-evaluate referenced outer subexpressions per
    element). Narrow projection, no shuffle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    df = df.withColumn(
        "_ng_w",
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                 lambda w: w != F.lit("")),
    )
    nw = F.size(F.col("_ng_w"))
    # sequence(1, stop) DESCENDS when stop < 1 — guard short docs to []
    idx = F.when(nw >= n, F.sequence(F.lit(1), nw - n + 1)) \
        .otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("_ng_w"), i, n)))
    )
    return df.withColumn(out_col, grams).drop("_ng_w")


def ngram_overlap(docs, bench, n: int = 3, min_overlap: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None):
    """Benchmark decontamination (the PaLM/GPT-3 eval-overlap gate): per
    training document, count how many of its DISTINCT word n-grams appear
    anywhere in the benchmark/eval set, and flag docs at ``min_overlap``
    or more as contaminated.

    Scale shape: the benchmark side is eval data — MBs against a 100 TB
    corpus — so its distinct-gram set is built once and BROADCAST; each
    corpus partition probes it map-side (gram explode -> broadcast hash
    join, no corpus shuffle on the gram key). The only exchange is the
    per-doc count groupBy on ``id_col``. explode_outer keeps gram-less
    docs (empty/short text) in the output with n_overlap = 0.

    Returns the slim frame (id_col, n_overlap, contaminated) — anti-join
    it against the corpus to drop contaminated docs (decontaminate())."""
    bench_text_col = bench_text_col or text_col
    bgrams = (
        with_word_ngrams(bench, bench_text_col, n)
        .select(F.explode("_grams").alias("gram")).distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = (
        with_word_ngrams(docs, text_col, n)
        .select(id_col, F.explode_outer("_grams").alias("gram"))
    )
    return (
        exploded.join(F.broadcast(bgrams), "gram", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"))
        .withColumn("contaminated", F.col("n_overlap") >= F.lit(min_overlap))
    )


def decontaminate(docs, bench, n: int = 3, min_overlap: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None):
    """Drop documents contaminated by the benchmark set (ngram_overlap
    flags, then a broadcast anti-join — the contaminated id set is a
    small fraction of the corpus by construction; if an eval set ever
    flagged most of a corpus the corpus itself is the problem)."""
    flagged = ngram_overlap(docs, bench, n=n, min_overlap=min_overlap,
                            text_col=text_col, id_col=id_col,
                            bench_text_col=bench_text_col)
    bad = flagged.filter(F.col("contaminated")).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
