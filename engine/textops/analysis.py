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
