"""Text-analysis column functions for large-scale training-data pipelines.

Beyond-reference surface (the reference has no text ops, SURVEY.md §2.6):
token counting, quality metrics, language ID, fingerprinting — all as pure
column expressions over ``documents.text`` so they run JVM-side at full scan
speed (at 100 TB, a per-row Python UDF here would dominate the job).

Counts are integers and therefore bit-deterministic across engines — the
DuckDB oracles reproduce each formula exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-hit language-ID
#: heuristic. Deliberately small and fixed: the heuristic must be cheap,
#: deterministic, and reproducible in ANSI SQL for the oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit", "von", "auf"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty or whitespace-only
    text -> empty array).

    Whitespace padding must NOT yield phantom empty tokens: Spark's
    ``trim`` strips only ASCII spaces, so a tab/newline-padded document
    would emit ``[""]`` and inflate token counts (found by the
    chunking-geometry fuzz, tests/test_oracle_fuzz.py, r13).  Empties can
    only arise at the ENDS of the split (interior ``\\s+`` runs never
    produce them), so one plain split + an empty filter is exactly the
    strip-then-split semantics — and cheaper than the original
    regexp-strip fix, whose expression tree evaluated the
    ``regexp_replace`` twice per row (once in the emptiness check, once
    in the split branch; no CSE across CaseWhen branches — measured
    ~2.7x on token_count-dominated rows, OPTIMIZATION_r13.md)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap pre-BPE budget estimate)."""
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word-piece-like units with a regex —
    runs of letters, runs of digits, or single non-space symbols.  A stand-in
    for a real tokenizer with the same O(scan) cost profile."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")).cast(
        "bigint"
    )


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang`` (case-insensitive)."""
    toks = tokens(F.lower(text))
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.array_contains(words, t).cast("bigint"),
    )


def punct_count(text: Column) -> Column:
    """Punctuation characters (ASCII ``.,;:!?``)."""
    return F.regexp_count(text, F.lit(r"[.,;:!?]")).cast("bigint")


def digit_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[0-9]")).cast("bigint")


def quality_metrics(text: Column) -> list[Column]:
    """The per-document quality counters used for filtering decisions:
    (n_chars, n_tokens, n_stopwords_en, n_punct, n_digits) — all integers,
    so downstream ratio thresholds are computed exactly where needed."""
    return [
        F.length(text).cast("bigint").alias("n_chars"),
        token_count(text).alias("n_tokens"),
        stopword_count(text, "en").alias("n_stopwords_en"),
        punct_count(text).alias("n_punct"),
        digit_count(text).alias("n_digits"),
    ]


def lang_score(text: Column, lang: str) -> Column:
    """Stopword-hit count for one language over lowercased tokens."""
    return stopword_count(text, lang)


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits, ties and
    zero-hit texts -> 'und'.  Tie-break: first language in ``langs`` order
    with the max score (deterministic)."""
    langs = langs or list(STOPWORDS)
    scores = [lang_score(text, lg) for lg in langs]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    expr = F.lit("und")
    # fold right-to-left so earlier languages win ties
    for lg, sc in reversed(list(zip(langs, scores))):
        expr = F.when((sc == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def lang_id_table(docs, id_col: str = "doc_id", text_col: str = "text", langs=None):
    """DataFrame-level language ID: same answers as :func:`lang_id`, but via
    one codegen'd explode + conditional-sum aggregate instead of one
    interpreted ``aggregate`` fold per language per row (~3x on the scan;
    the per-row fold is the HOF-interpretation trap, see the dedup module).

    Returns (id_col, pred_lang).  Tokenless/NULL texts -> 'und'
    (explode_outer keeps them; their scores sum to 0).
    """
    from pyspark.sql import functions as _F

    from trafficbigdatasearch_spark import partitioning as _P

    langs = langs or list(STOPWORDS)
    ex = _P.spread(docs, id_col).select(
        _F.col(id_col),
        _F.explode_outer(tokens(_F.lower(_F.col(text_col)))).alias("_tok"),
    )
    aggs = [
        _F.sum(
            _F.when(_F.col("_tok").isin(STOPWORDS[lg]), 1).otherwise(0)
        ).alias(f"_s_{lg}")
        for lg in langs
    ]
    scores = ex.groupBy(id_col).agg(*aggs)
    cols = [_F.col(f"_s_{lg}") for lg in langs]
    best = _F.greatest(*cols) if len(cols) > 1 else cols[0]
    expr = _F.lit("und")
    for lg, sc in reversed(list(zip(langs, cols))):
        expr = _F.when((sc == best) & (best > 0), _F.lit(lg)).otherwise(expr)
    return scores.select(id_col, expr.alias("pred_lang"))


def normalized(text: Column) -> Column:
    """Normalization for fingerprinting: lowercase, strip all non-alphanumeric
    (unicode-aware enough for the fixture corpus)."""
    return F.regexp_replace(F.lower(text), r"[^a-z0-9]", "")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text — the exact-dedup key.
    (md5 is content-defined and engine-portable; xxhash64 would be faster but
    is Spark-specific, breaking the cross-engine oracle.)"""
    return F.md5(normalized(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles -> array<string> (distinct not applied).

    Built as ``zip_with`` over n shifted slices of the token array — pure
    Catalyst expressions, no UDF.  Texts shorter than ``n`` tokens yield a
    single shingle of the whole text, so no document is dropped silently.

    Formulation note: the obvious ``transform(sequence(0, k-n), i ->
    concat_ws(' ', slice(toks, i+1, n)))`` evaluates an interpreted
    per-element ``slice`` (an O(s) array copy each) — O(s²) per document and
    ~6× slower measured at sf0.1.  zip_with's lambda is a scalar concat, so
    the build stays O(s·n).
    """
    toks = tokens(F.lower(text))
    k = F.size(toks)
    m = F.greatest(k - n + 1, F.lit(1))
    out = F.slice(toks, 1, m)
    for j in range(1, n):
        # shorter shifted slices zip as NULL; concat_ws skips NULLs, which
        # reproduces the whole-text shingle for texts with < n tokens
        out = F.zip_with(
            out, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(k == 0, F.array(F.lit(""))).otherwise(out)


#: PII patterns for training-data scrubbing — deliberately simple,
#: deterministic regexes (an email-shaped token; a 7+-digit run with optional
#: separators) so the redaction is reproducible in ANSI SQL for the oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d[\d\-\. ]{5,}\d"


def pii_redact(text: Column) -> Column:
    """Redact email- and phone-shaped spans with fixed placeholders.  Pure
    ``regexp_replace`` — full scan speed, no UDF; emails first so their
    digit-bearing local parts don't half-match the phone pattern."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_count(text: Column) -> Column:
    """Number of redactable spans (pre-redaction) — the audit metric."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL))
        + F.regexp_count(F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), F.lit(PII_PHONE))
    ).cast("bigint")


#: Rabin-Karp rolling-hash constants: base, modulus (Mersenne 2^31-1), and
#: the token-position cap (longer documents hash their first ROLL_MAX tokens;
#: at corpus scale the prefix is as content-defining as the whole body).
ROLL_B = 1000003
ROLL_M = 2147483647
ROLL_MAX = 512


def _roll_powers() -> list[int]:
    pows, x = [], 1
    for _ in range(ROLL_MAX):
        pows.append(x)
        x = (x * ROLL_B) % ROLL_M
    return pows


def rolling_fingerprint(text: Column) -> Column:
    """Rabin-Karp polynomial fingerprint of the token stream:
    ``sum_i hash(tok_i) * B^i  mod M`` over the first ROLL_MAX tokens, with
    ``hash`` the 28-bit md5 prefix of :func:`shingle_hash`.

    The rolling structure is evaluated in closed form against a precomputed
    powers table (literal array) so both Spark and a SQL oracle compute the
    identical value without an ordered fold: each term < M < 2^31, <= 512
    terms, so the sum stays far inside int64.  Empty text -> 0.
    """
    toks = F.slice(tokens(F.lower(text)), 1, ROLL_MAX)
    hs = F.transform(toks, shingle_hash)
    pows = F.array(*[F.lit(p) for p in _roll_powers()]).cast("array<bigint>")
    terms = F.zip_with(hs, F.slice(pows, 1, F.size(hs)), lambda h, p: (h * p) % ROLL_M)
    # NULL text propagates NULL through tokens/zip_with; the oracle contract
    # (and empty text) is 0 — coalesce to match
    return F.coalesce(
        F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x) % ROLL_M,
        F.lit(0).cast("bigint"),
    )


def shingle_hash(shingle: Column) -> Column:
    """28-bit integer hash of a shingle via md5 prefix — portable across
    engines (DuckDB: ``('0x' || substr(md5(s),1,7))::BIGINT``), small enough
    that ``a*h + b`` stays in int64 for minhash's universal hashing."""
    return F.conv(F.substring(F.md5(shingle), 1, 7), 16, 10).cast("bigint")


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (fewer than ``n`` tokens ->
    empty array).  Pure higher-order expressions: the index sequence is
    guarded because Spark's ``sequence(1, 0)`` counts DOWN, not empty."""
    count = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def top_ngram(grams: Column) -> Column:
    """Struct(gram, n) of the most frequent element of a gram array, ties
    broken to the lexicographically smallest gram.

    Row-local mode: sort the array, then one fold tracks the longest run of
    equal adjacent elements — O(k log k) per document and zero shuffle, where
    the explode->groupBy formulation (the oracle's) would shuffle the whole
    corpus's gram stream.  Ascending sort + strict ``>`` makes the FIRST
    maximal run win, i.e. the smallest gram among ties, deterministically in
    any engine.  Empty array -> ('', 0)."""
    zero = F.lit(0).cast("bigint")

    def fold(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(zero + 1)
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["gram"]).alias("gram"),
        )

    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best"),
        F.lit("").alias("gram"),
    )
    out = F.aggregate(F.array_sort(grams), acc0, fold)
    return F.struct(out["gram"].alias("gram"), out["best"].alias("n"))
