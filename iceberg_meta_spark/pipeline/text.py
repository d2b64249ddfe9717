"""Text-analysis kernels: language ID, quality scoring, token counting,
fingerprinting. Expression-only (split / regexp / md5 / array lambdas) —
JVM-side, no Python workers; linear per-doc work, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "fr": ("le", "les", "une"),
    "es": ("el", "los", "una"),
}


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wl, t)))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token statistics: whitespace tokens + BPE-ish regex tokens."""
    toks = _tokens(F.col("text"))
    re_toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(F.size(toks).cast("long")).alias("ws_tokens"),
        F.sum(F.size(re_toks).cast("long")).alias("re_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + bucket label (length / stopword ratio /
    mean token length), the standard pre-training corpus filter shape."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    stop = _count_in(toks, STOPWORDS).cast("long")
    no_space = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.round(stop.cast("double") / n_tokens, 4)
    )
    avg_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.round(no_space.cast("double") / n_tokens, 4)
    )
    label = (
        F.when((n_tokens >= 20) & (n_tokens <= 400) & (stop_ratio >= 0.05), F.lit("good"))
        .when(n_tokens >= 10, F.lit("ok"))
        .otherwise(F.lit("low"))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop.alias("stopword_count"),
        stop_ratio.alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
        label.alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID with deterministic tie-break (en>de>fr>es)."""
    toks = _tokens(F.col("text"))
    scores = {lang: _count_in(toks, ws).cast("long") for lang, ws in LANG_MARKERS.items()}
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("score_en"),
        de.alias("score_de"),
        fr.alias("score_fr"),
        es.alias("score_es"),
        pred.alias("pred_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-text, whitespace-normalized, head-64."""
    lower = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(lower).alias("fp_exact"),
        F.md5(F.replace(lower, F.lit(" "), F.lit(""))).alias("fp_normalized"),
        F.md5(F.substring(F.col("text"), 1, 64)).alias("fp_head"),
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    The context-window preprocessing shape: whitespace-tokenize, then emit
    windows of ``chunk_tokens`` tokens every ``stride = chunk_tokens -
    overlap`` positions (the final window may be short). Expression-only:
    split + sequence + explode + slice — pure map-side row expansion, no
    shuffle, no Python workers; each output chunk carries (doc_id,
    chunk_id, chunk_text, chunk_len).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    # Cap starts at n - overlap: a window starting past that point is fully
    # contained in its predecessor (whose coverage reaches start + overlap - 1
    # past the stride boundary) and would emit a duplicated training chunk.
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    exploded = docs.select(
        "doc_id", toks.alias("__toks"), F.explode(starts).alias("__start")
    )
    window = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        F.expr(f"(__start - 1) DIV {stride}").alias("chunk_id"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("long").alias("chunk_len"),
    )


def readability_scores(docs: DataFrame) -> DataFrame:
    """Flesch-style reading-ease per document, integer-exact — the
    educational-value / complexity signal curation filters use alongside
    the rule-based quality gates.

    All three Flesch inputs are integer counts from expressions:

    - words       — whitespace tokens;
    - sentences   — '.', '!', '?' runs (min 1 so headlines don't divide
      by zero);
    - syllables   — vowel GROUPS per word ('[aeiouy]+' runs; the classic
      dictionary-free approximation), min 1 per word.

    The score is Flesch's formula scaled to micro-points and computed
    with integer division, so it replays exactly on any engine:
    ``206_835_000 - 1_015_000·words DIV sentences - 84_600_000·syllables
    DIV words`` (original coefficients 206.835 / 1.015 / 84.6 ×1000,
    term divisions floored). Buckets follow the standard bands:
    >= 60 easy, >= 30 standard, else difficult.
    """
    toks = _tokens(F.col("text"))
    words = F.greatest(F.size(toks), F.lit(1)).cast("long")
    sentences = F.greatest(
        F.size(F.filter(F.split(F.col("text"), r"[.!?]+"), lambda s: F.length(F.trim(s)) > 0)),
        F.lit(1),
    ).cast("long")
    # vowel groups across the doc = sum over words of per-word groups;
    # computing on the whole text is identical because spaces break runs
    vowel_marked = F.regexp_replace(F.lower(F.col("text")), "[aeiouy]+", "V")
    syllables = F.greatest(
        (F.length(vowel_marked) - F.length(F.regexp_replace(vowel_marked, "V", ""))).cast("long"),
        words,  # >= 1 syllable per word
    )
    score = (
        F.lit(206_835_000)
        - F.lit(1_015) * F.expr("CAST((n_words * 1000) DIV n_sentences AS BIGINT)")
        - F.lit(84_600) * F.expr("CAST((n_syllables * 1000) DIV n_words AS BIGINT)")
    )
    base = docs.select(
        "doc_id",
        "lang",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    )
    return base.select(
        "doc_id",
        "lang",
        "n_words",
        "n_sentences",
        "n_syllables",
        score.cast("long").alias("flesch_micro"),
        F.when(score >= 60_000_000, F.lit("easy"))
        .when(score >= 30_000_000, F.lit("standard"))
        .otherwise(F.lit("difficult"))
        .alias("band"),
    )
