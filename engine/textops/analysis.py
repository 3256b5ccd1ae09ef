"""Text analysis operators: language-ID, token counting, quality scoring,
winnowing document fingerprints. All dialect-parameterized SQL (see
sqlgen docstring) — built-in string functions only, no UDF on either side.
"""

from __future__ import annotations

from .sqlgen import a31, arr_len, split_ws

# marker stopwords per language for the n-gram/marker heuristic. The corpus
# is synthetic word salad, so accuracy is not the point — the operator shape
# (vectorized marker counting + deterministic argmax) is.
LANG_MARKERS = {
    "en": ["the", "and", "join"],
    "de": ["der", "und", "merge"],
    "fr": ["le", "et", "filter"],
    "es": ["el", "y", "sort"],
    "pt": ["o", "e", "scan"],
    "zh": ["的", "是", "group"],
}


def _count_occurrences(expr: str, needle: str) -> str:
    """Occurrence count via the replace-length identity (identical on both
    engines, no regex dialect drift). Counts ' needle ' in padded text."""
    padded = f"concat(' ', {expr}, ' ')"
    quoted = needle.replace("'", "''")
    return (
        f"CAST((length({padded}) - length(replace({padded}, ' {quoted} ', '')))"
        f" / {len(needle) + 2} AS BIGINT)"
    )


def lang_scores_sql(dialect: str) -> str:
    """Per-doc marker scores + argmax prediction (deterministic tie-break:
    first language in declaration order wins)."""
    scores = ", ".join(
        "(" + " + ".join(_count_occurrences("text", m) for m in markers) + f") AS s_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    pred = "CASE "
    for lang in langs:
        others = [f"s_{lang} >= s_{o}" for o in langs if o != lang]
        pred += f"WHEN {' AND '.join(others)} THEN '{lang}' "
    pred += "ELSE 'und' END"
    return f"""
WITH scored AS (SELECT doc_id, lang, {scores} FROM documents)
SELECT doc_id, lang, {', '.join(f's_{lang}' for lang in langs)}, {pred} AS lang_pred
FROM scored"""


def token_stats_sql(dialect: str) -> str:
    """Whitespace token count, distinct-token count, BPE-ish subword
    estimate (chars/3.5 ceil), type-token ratio."""
    words = split_ws(dialect, "text")
    n_tok = arr_len(dialect, words)
    if dialect == "spark":
        n_types = f"size(array_distinct({words}))"
    else:
        n_types = f"len(list_distinct({words}))"
    return f"""
SELECT doc_id,
       {n_tok} AS n_tokens,
       {n_types} AS n_token_types,
       CAST(ceil(CAST(length(text) AS DOUBLE) / 3.5) AS BIGINT) AS n_subwords_est,
       CAST({n_types} AS DOUBLE) / CAST({n_tok} AS DOUBLE) AS type_token_ratio
FROM documents"""


def quality_score_sql(dialect: str) -> str:
    """Composite quality signal: length band + stopword ratio + mean word
    length, as one deterministic double in [0, 1]-ish."""
    words = split_ws(dialect, "text")
    n_tok = arr_len(dialect, words)
    stop = " + ".join(
        _count_occurrences("text", m) for m in ("the", "and", "a", "of")
    )
    return f"""
SELECT doc_id,
       length(text) AS n_chars_q,
       CAST(({stop}) AS DOUBLE) / CAST({n_tok} AS DOUBLE) AS stopword_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST({n_tok} AS DOUBLE) AS mean_word_len,
       least(1.0, CAST(length(text) AS DOUBLE) / 400.0) * 0.5
         + least(0.5, CAST(({stop}) AS DOUBLE) / CAST({n_tok} AS DOUBLE)) AS quality
FROM documents"""


def rule_filter_sql(dialect: str, src: str = "documents") -> str:
    """Gopher-style rule-based document filter: per-doc signals + one
    boolean keep decision + the first failing rule as the drop reason —
    the operator a pretraining corpus pipeline runs before tokenization.
    Rules (public Gopher/C4-style heuristics, integer/double-exact):
      word count in [15, 100000]; mean word length in [2, 12]; space
      ratio <= 0.35; stopword hits >= 1; period count >= 1.
    """
    words = split_ws(dialect, "text")
    n_tok = arr_len(dialect, words)
    stop = " + ".join(_count_occurrences("text", m) for m in ("the", "and", "of"))
    mean_wl = (
        f"CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST({n_tok} AS DOUBLE)"
    )
    space_ratio = (
        "CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)"
        " / CAST(length(text) + 1 AS DOUBLE)"
    )
    return f"""
WITH sig AS (
  SELECT doc_id,
         {n_tok} AS n_words,
         {mean_wl} AS mean_word_len,
         {space_ratio} AS space_ratio,
         ({stop}) AS stop_hits,
         length(text) - length(replace(text, '.', '')) AS n_periods
  FROM {src})
SELECT doc_id, n_words, mean_word_len, space_ratio, stop_hits, n_periods,
       (n_words BETWEEN 15 AND 100000)
         AND (mean_word_len BETWEEN 2.0 AND 12.0)
         AND (space_ratio <= 0.35)
         AND (stop_hits >= 1)
         AND (n_periods >= 1) AS keep,
       CASE WHEN NOT (n_words BETWEEN 15 AND 100000) THEN 'word_count'
            WHEN NOT (mean_word_len BETWEEN 2.0 AND 12.0) THEN 'mean_word_len'
            WHEN space_ratio > 0.35 THEN 'space_ratio'
            WHEN stop_hits < 1 THEN 'no_stopwords'
            WHEN n_periods < 1 THEN 'no_sentences'
            ELSE 'ok' END AS drop_reason
FROM sig"""


def _strata_exprs(dialect: str, rates: dict[str, int] | None) -> tuple[str, str]:
    """(bucket_expr, rate_expr) shared by the sampling operators."""
    rates = rates or {"en": 200, "zh": 500}
    default = 800
    h = a31(dialect, "CAST(doc_id AS VARCHAR)" if dialect == "duckdb" else "cast(doc_id as string)")
    rate = "CASE " + " ".join(
        f"WHEN lang = '{l}' THEN {r}" for l, r in rates.items()
    ) + f" ELSE {default} END"
    return f"({h} % 1000)", rate


def stratified_sample_sql(
    dialect: str, rates: dict[str, int] | None = None, src: str = "documents"
) -> str:
    """Deterministic stratified sampling: keep doc iff
    hash31(doc_id) % 1000 < rate_permille(lang). Hash-based so the sample
    is reproducible across engines/runs and joins (no RNG state) — the
    standard trick for down-sampling over-represented strata in a corpus
    mix. rate defaults: en 200‰, zh 500‰, others 800‰.
    """
    bucket, rate = _strata_exprs(dialect, rates)
    return f"""
SELECT doc_id, lang, {bucket} AS bucket, {rate} AS rate_permille
FROM {src}
WHERE {bucket} < {rate}"""


def corpus_keep_sql(dialect: str, src: str = "docs_aug") -> str:
    """Per-doc keep signals for the composed corpus-prep pipeline: the
    rule-filter verdict (keep_rules) AND the stratified-sample bucket/rate,
    in one projection over ``src`` — the cluster-keeper flag joins in from
    the connected-components stage (engine.textops.cluster), completing
    rule filter -> dedup keeper -> stratified sample.

    Rule set = rule_filter_sql MINUS the sentence-punctuation rule: the
    synthetic corpus contains no periods, and a composed pipeline whose
    first stage drops 100% of documents would verify nothing downstream —
    the remaining rules are non-trivial on this corpus (the word-count
    band alone drops a few percent)."""
    words = split_ws(dialect, "text")
    n_tok = arr_len(dialect, words)
    stop = " + ".join(_count_occurrences("text", m) for m in ("the", "and", "of"))
    mean_wl = (
        f"CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST({n_tok} AS DOUBLE)"
    )
    space_ratio = (
        "CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)"
        " / CAST(length(text) + 1 AS DOUBLE)"
    )
    bucket, rate = _strata_exprs(dialect, None)
    return f"""
SELECT doc_id, lang,
       {n_tok} AS n_words,
       ({n_tok} BETWEEN 15 AND 100000)
         AND ({mean_wl} BETWEEN 2.0 AND 12.0)
         AND ({space_ratio} <= 0.35)
         AND (({stop}) >= 1) AS keep_rules,
       {bucket} AS bucket,
       {rate} AS rate_permille
FROM {src}"""


def vocab_stats_sql(dialect: str, top_k: int = 1000) -> str:
    """Corpus vocabulary statistics: per-token total count + document
    frequency, top-k by count with a deterministic total order (count desc,
    token asc) so the cut is engine-independent. The shape that builds a
    tokenizer vocabulary or a stopword list at corpus scale: one explode +
    one hash aggregate (map-side partial), then a tiny top-k."""
    words = split_ws(dialect, "text")
    if dialect == "spark":
        toks = (
            f"SELECT doc_id, tok FROM documents "
            f"LATERAL VIEW explode({words}) _t AS tok"
        )
    else:
        toks = f"SELECT doc_id, unnest({words}) AS tok FROM documents"
    return f"""
WITH toks AS ({toks}),
agg AS (
  SELECT tok, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
  FROM toks GROUP BY tok)
SELECT tok, n_total, n_docs FROM agg
ORDER BY n_total DESC, tok LIMIT {top_k}"""


def fingerprint_sql(dialect: str, k: int = 16, window: int = 8) -> str:
    """Winnowing fingerprints: hash every k-gram (31-bit sha-derived — the
    oracle-parity stand-in for a rolling hash; the numpy Rabin-Karp kernel
    lives in engine.textops.rolling and is unit-tested against this shape),
    take the min over each window of `window` consecutive positions,
    deduplicate. Output: per-doc fingerprint count + min/max fingerprint.
    """
    gram_hash = a31(dialect, f"substr(text, p, {k})")
    if dialect == "spark":
        pos = (
            f"SELECT doc_id, p FROM docs_len "
            f"LATERAL VIEW explode(sequence(1, n_pos)) _pe AS p"
        )
    else:
        pos = "SELECT doc_id, unnest(generate_series(1, n_pos)) AS p FROM docs_len"
    return f"""
WITH docs_len AS (
  SELECT doc_id, text, greatest(1, length(text) - {k} + 1) AS n_pos FROM documents),
grams AS (
  SELECT q.doc_id, q.p, {gram_hash} AS h
  FROM ({pos}) q JOIN docs_len ON docs_len.doc_id = q.doc_id),
winnowed AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
  FROM grams)
SELECT doc_id,
       COUNT(DISTINCT fp) AS n_fingerprints,
       MIN(fp) AS min_fp,
       MAX(fp) AS max_fp
FROM winnowed GROUP BY doc_id"""
