"""Text-analysis operators for a training-data pipeline — all JVM-side SQL
expressions (no UDFs): language-ID heuristic, quality scoring, token counting,
document fingerprinting. Each is a narrow projection + at most one aggregation,
so they pushdown/prune cleanly and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "que", "pour", "dans"],
    "it": ["il", "di", "che", "e", "la", "per", "un", "con", "non", "del"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
    "nl": ["de", "het", "een", "van", "en", "dat", "is", "op", "te", "niet"],
}

# signature character trigrams per language — the fallback signal when
# stopwords are silent or tied (short texts, agglutinated prose, no-space CJK
# is out of scope). Overlap across languages is fine; counts differ.
TRIGRAMS = {
    "en": ["the", "he ", " th", "ing", "and", "ion", " of", "ed ", "tio", " to"],
    "es": [" de", "de ", "os ", " la", "la ", "ión", "ció", " es", "ar ", " qu"],
    "de": ["en ", "er ", "ch ", "sch", "ein", "ich", "der", "und", "ie ", " ge"],
    "fr": [" de", "es ", "de ", " le", "le ", "ent", " qu", "que", "les", "ais"],
    "it": [" di", "di ", "to ", " ch", "che", "zio", "no ", "re ", " co", "ell"],
    "pt": [" de", "de ", "ão ", "ção", " da", "da ", "em ", " em", "os ", " co"],
    "nl": ["en ", " de", "de ", "et ", "een", " ee", "van", " va", "aar", "ij "],
}


def _tokens(text_col):
    return F.split(F.trim(F.lower(text_col)), " +")


def token_counts(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (regex split on
    non-alnum boundaries and 4-char chunks — a cheap proxy for BPE length)."""
    # token array bound once per row (multi-referenced non-cheap alias stays
    # un-inlined): higher-order functions are interpreted, so every extra
    # reference would re-run the split
    staged = docs.select(
        F.col(key_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("_nchars"),
        _tokens(F.col(text_col)).alias("_toks"),
    )
    # BPE-ish: every token contributes ceil(len/4) subword units
    subwords = F.aggregate(
        F.col("_toks"),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    return staged.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        subwords.alias("n_subwords"),
        F.col("_nchars").alias("n_chars_measured"),
    )


def language_id(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Two-stage language heuristic, all codegen expressions.

    Stage 1: argmax language by stopword hits (tie-break: language code
    ascending). Stage 2 (fallback, fires when stage 1 is silent — zero hits —
    or tied between the top two): argmax by signature character-trigram
    occurrences over the lowercased text. Emits which stage decided.
    """
    # Staged projections (r06): higher-order functions are interpreted with
    # no subexpression elimination, so the old single-select form re-built
    # the trigram array per filter (7×) and re-ran lower(trim(text)) for
    # EVERY substr inside it — O(len²) per document. Each expensive value is
    # now computed once per row as a multi-referenced (hence un-collapsed)
    # alias; values are identical.
    s_raw = F.lower(F.trim(F.col(text_col)))

    def _make_tris(s):
        tri_idx = F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(1)))
        return F.transform(tri_idx, lambda i: s.substr(i, F.lit(3)))

    tris_bound = F.element_at(F.transform(F.array(s_raw), _make_tris), 1)
    staged = docs.select(
        F.col(key_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("_toks"),
        tris_bound.alias("_tris"),
    )

    toks, tris = F.col("_toks"), F.col("_tris")
    sw_scores, tri_scores = [], []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # struct sorts field-by-field: (-hits, lang) ascending ≡ argmax with
        # language-code tiebreak
        sw_scores.append(
            F.struct((-hits).alias("neg_hits"), F.lit(lang).alias("lang"), hits.alias("hits"))
        )
        tri_arr = F.array(*[F.lit(t) for t in TRIGRAMS[lang]])
        thits = F.size(F.filter(tris, lambda t: F.array_contains(tri_arr, t)))
        tri_scores.append(
            F.struct((-thits).alias("neg_hits"), F.lit(lang).alias("lang"), thits.alias("hits"))
        )
    scored = staged.select(
        "doc_id",
        F.array_sort(F.array(*sw_scores)).alias("_sw"),
        F.element_at(F.array_sort(F.array(*tri_scores)), F.lit(1)).alias("_tri"),
    )
    best = F.element_at(F.col("_sw"), F.lit(1))
    second = F.element_at(F.col("_sw"), F.lit(2))
    tri_best = F.col("_tri")
    ambiguous = (best["hits"] == 0) | (best["hits"] == second["hits"])
    return scored.select(
        "doc_id",
        F.when(ambiguous, tri_best["lang"]).otherwise(best["lang"]).alias("detected_lang"),
        best["hits"].alias("stopword_hits"),
        F.when(ambiguous, tri_best["hits"]).otherwise(F.lit(0)).alias("trigram_hits"),
        ambiguous.alias("used_trigram_fallback"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score: length, mean word
    length, punctuation ratio, stopword ratio, repetition (distinct/total
    token ratio). All ratios rounded to 6 dp for determinism."""
    t = F.col(text_col)
    # token array bound once per row (see language_id): the old form re-split
    # the text for each of the four token-derived features
    staged = docs.select(
        F.col(key_col).alias("doc_id"),
        t.alias("_t"),
        _tokens(t).alias("_toks"),
    )
    t = F.col("_t")
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    return staged.select(
        F.col("doc_id"),
        n_chars.cast("long").alias("n_chars_measured"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 6).alias("mean_word_len"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        F.round(
            F.least(n_tok / F.lit(100.0), F.lit(1.0)) * distinct_ratio, 6
        ).alias("quality"),
    )


PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
PII_URL_RE = "https?://[^ ]+"


def redact_pii(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Training-data scrubbing: mask emails, URLs and phone-like sequences.

    Pure regexp_replace chain (JVM-side); order matters — URLs first so their
    digit runs aren't half-eaten by the phone pattern.
    """
    t = F.col(text_col)
    t = F.regexp_replace(t, PII_URL_RE, "<URL>")
    t = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(key_col).alias("doc_id"),
        t.alias("redacted"),
        (F.length(F.col(text_col)) - F.length(t)).cast("long").alias("chars_redacted"),
    )


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over word n-gram shingles
    (a winnowing-style content fingerprint, stable under whitespace changes
    and portable to the DuckDB oracle)."""
    # let-bind the token array (see dedup._shingle_array): higher-order
    # functions are interpreted, so a lambda capturing the raw split()
    # re-evaluates it per element — O(tokens²) per document
    toks_raw = _tokens(F.col(text_col))

    def _fp(toks):
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0)))
        shingles = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, shingle_n), " ")
        )
        return F.array_min(F.transform(shingles, F.md5))

    fp = F.element_at(F.transform(F.array(toks_raw), _fp), 1)
    return docs.select(F.col(key_col).alias("doc_id"), fp.alias("fingerprint"))
