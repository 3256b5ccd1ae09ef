"""Dialect-parameterized SQL builders shared by Spark and the DuckDB oracle.

Every training-data operator (dedup, similarity, analysis) is written ONCE
as a SQL template instantiated for dialect in {"spark", "duckdb"}; the Spark
side runs it with spark.sql over temp views, the oracle side verbatim in
DuckDB. All arithmetic is integer-exact or correctly-rounded-double so the
two engines agree bit-for-bit (the driver value-hashes results).

Hash primitive: a31(s) = first 31 bits of sha256(s) as BIGINT — cheap to
express in both dialects, uniform enough for minhash/simhash/LSH.
"""

from __future__ import annotations

import numpy as np

P31 = 2_147_483_647  # Mersenne prime 2^31-1, minhash permutation modulus


def a31(dialect: str, expr: str) -> str:
    """First 31 bits of sha256(expr), as a nonnegative BIGINT."""
    if dialect == "spark":
        return (
            f"(cast(conv(substring(sha2({expr}, 256), 1, 8), 16, 10) as bigint)"
            f" & {P31})"
        )
    return f"(CAST(CONCAT('0x', substr(sha256({expr}), 1, 8)) AS BIGINT) & {P31})"


def split_ws(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"split({expr}, ' ')"
    return f"string_split({expr}, ' ')"


def arr_len(dialect: str, expr: str) -> str:
    return f"size({expr})" if dialect == "spark" else f"len({expr})"


def elem(dialect: str, arr: str, idx1: str) -> str:
    """1-based array element."""
    if dialect == "spark":
        return f"element_at({arr}, {idx1})"
    return f"{arr}[{idx1}]"


def unnest_series(dialect: str, lo: str, hi: str, alias: str) -> str:
    """FROM-clause fragment producing one row per integer in [lo, hi]."""
    if dialect == "spark":
        return f"(SELECT explode(sequence({lo}, {hi})) AS {alias})"
    return f"(SELECT unnest(generate_series({lo}, {hi})) AS {alias})"


def xor(dialect: str, a: str, b: str) -> str:
    return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"


def shiftl(dialect: str, v: str, n: str) -> str:
    return f"shiftleft({v}, {n})" if dialect == "spark" else f"({v} << {n})"


def shiftr(dialect: str, v: str, n: str) -> str:
    return f"shiftright({v}, {n})" if dialect == "spark" else f"({v} >> {n})"


# ------------------------------------------------------- corpora (CTEs) ---

def docs_aug_cte(dialect: str) -> str:
    """documents + a deterministic near-duplicate of every doc (one word
    type rewritten) — makes near-dup detection non-trivial on a corpus of
    distinct texts. aug ids live at +100000."""
    return (
        "docs_aug AS ("
        "SELECT doc_id, text, lang FROM documents "
        "UNION ALL "
        "SELECT doc_id + 100000 AS doc_id, "
        "replace(replace(text, ' data ', ' info '), ' join ', ' merge ') AS text, "
        "lang FROM documents)"
    )


def word_positions_cte(dialect: str, src: str = "docs_aug") -> str:
    """(doc_id, words, p) — one row per 1-based word position per doc."""
    words = split_ws(dialect, "text")
    if dialect == "spark":
        pos = (
            f"SELECT doc_id, words, p FROM doc_words "
            f"LATERAL VIEW explode(sequence(1, size(words))) _pe AS p"
        )
    else:
        pos = (
            "SELECT doc_id, words, unnest(generate_series(1, len(words))) AS p "
            "FROM doc_words"
        )
    return (
        f"doc_words AS (SELECT doc_id, {words} AS words FROM {src}), "
        f"word_pos AS ({pos})"
    )


def shingles_cte(dialect: str, src: str = "docs_aug", w: int = 3) -> str:
    """Distinct word w-gram shingles per doc with their 31-bit hash.

    Relational shingling: explode word positions, build the w-gram with
    1-based element_at — no UDF on either engine.
    """
    gram = ", ' ', ".join(elem(dialect, "words", f"p + {i}") for i in range(w))
    return (
        f"{word_positions_cte(dialect, src)}, "
        f"shingles AS (SELECT DISTINCT doc_id, "
        f"{a31(dialect, f'concat({gram})')} AS h "
        f"FROM word_pos WHERE p <= {arr_len(dialect, 'words')} - {w - 1})"
    )


# ----------------------------------------------------------- minhash/LSH --

def minhash_params(n_perm: int = 16, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for perm_j(h) = (a*h + b) mod P31."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, P31)), int(rng.integers(0, P31)))
        for _ in range(n_perm)
    ]


def minhash_sig_cte(dialect: str, n_perm: int = 16) -> str:
    """Per-doc minhash signature as n_perm columns m0..m{n-1}.

    Column-wise aggregation (one min() per permutation) instead of an
    explode over permutations: no row blowup, map-side partial aggregation,
    one shuffle on doc_id. At 10^12 docs this is the shape that scales —
    the shingle stream is touched once.
    """
    mins = ", ".join(
        f"min(({a} * h + {b}) % {P31}) AS m{j}"
        for j, (a, b) in enumerate(minhash_params(n_perm))
    )
    return f"minhash AS (SELECT doc_id, {mins} FROM shingles GROUP BY doc_id)"


def lsh_pairs_sql(dialect: str, n_perm: int = 16, bands: int = 4) -> str:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band (4 rows/band).

    Band key = the concatenated minhash rows; the self-join is an equi-join
    on (band_idx, band_key) — hash-partitionable, broadcastable histogram.
    """
    rows = n_perm // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {i} AS band, concat_ws(',', {cols}) AS band_key FROM minhash".format(
            i=i,
            cols=", ".join(f"m{i * rows + r}" for r in range(rows)),
        )
        for i in range(bands)
    )
    return (
        f"WITH {docs_aug_cte(dialect)}, {shingles_cte(dialect)}, "
        f"{minhash_sig_cte(dialect, n_perm)}, "
        f"bands AS ({band_selects}) "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id"
    )


def near_dup_pairs_sql(dialect: str, threshold: float = 0.5) -> str:
    """LSH candidates verified by exact shingle Jaccard >= threshold.

    jaccard = |A n B| / |A u B| with integer set sizes -> exact double.

    The Spark text is restructured (r7, guide §2.4 remove repeated passes):
    Spark inlines WITH CTEs, so the original template recomputed the
    shingle pipeline (split + explode + sha256 + distinct) FOUR times —
    once each under minhash, sizes, and the two intersection scans. The
    Spark variant folds minhash + sizes + the per-doc shingle set into ONE
    aggregate (msz); its three consumers are plan-identical, so Spark's
    exchange reuse computes the shingle scan once, and |A n B| becomes
    size(array_intersect(...)) over the (distinct) per-doc shingle arrays.
    Results are identical: cand pairs are unchanged, intersect size over
    distinct sets equals the old matching-h join count, and a 0-common
    pair fails jaccard >= threshold exactly as it vanished from the old
    inner join (threshold > 0). The DuckDB text (the frozen oracle) is
    byte-for-byte the original.
    """
    if dialect == "spark":
        mins = ", ".join(
            f"min(({a} * h + {b}) % {P31}) AS m{j}"
            for j, (a, b) in enumerate(minhash_params(16))
        )
        band_keys = ", ".join(
            "{i}, concat_ws(',', {cols})".format(
                i=i, cols=", ".join(f"m{i * 4 + r}" for r in range(4))
            )
            for i in range(4)
        )
        jac = "CAST(n_common AS DOUBLE) / CAST(na + nb - n_common AS DOUBLE)"
        return (
            f"WITH {docs_aug_cte(dialect)}, {shingles_cte(dialect)}, "
            f"msz AS (SELECT doc_id, {mins}, COUNT(*) AS n, "
            "collect_list(h) AS hs FROM shingles GROUP BY doc_id), "
            f"bands AS (SELECT doc_id, stack(4, {band_keys}) AS (band, band_key) FROM msz), "
            "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key "
            "AND a.doc_id < b.doc_id), "
            "inter AS (SELECT c.doc_a, c.doc_b, "
            "size(array_intersect(za.hs, zb.hs)) AS n_common, "
            "za.n AS na, zb.n AS nb "
            "FROM cand c JOIN msz za ON za.doc_id = c.doc_a "
            "JOIN msz zb ON zb.doc_id = c.doc_b) "
            f"SELECT doc_a, doc_b, {jac} AS jaccard "
            f"FROM inter WHERE {jac} >= {threshold}"
        )
    return (
        f"WITH {docs_aug_cte(dialect)}, {shingles_cte(dialect)}, "
        f"{minhash_sig_cte(dialect)}, "
        "bands AS ("
        + " UNION ALL ".join(
            "SELECT doc_id, {i} AS band, concat_ws(',', {cols}) AS band_key FROM minhash".format(
                i=i, cols=", ".join(f"m{i * 4 + r}" for r in range(4))
            )
            for i in range(4)
        )
        + "), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id), "
        "inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common "
        "FROM cand c JOIN shingles sa ON sa.doc_id = c.doc_a "
        "JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.h = sb.h "
        "GROUP BY c.doc_a, c.doc_b) "
        "SELECT i.doc_a, i.doc_b, "
        "CAST(i.n_common AS DOUBLE) / CAST(za.n + zb.n - i.n_common AS DOUBLE) AS jaccard "
        "FROM inter i JOIN sizes za ON za.doc_id = i.doc_a "
        "JOIN sizes zb ON zb.doc_id = i.doc_b "
        f"WHERE CAST(i.n_common AS DOUBLE) / CAST(za.n + zb.n - i.n_common AS DOUBLE) >= {threshold}"
    )


# --------------------------------------------------------------- simhash --

def simhash_cte(dialect: str, bits: int = 32) -> str:
    """32-bit simhash over word unigrams (with multiplicity).

    bit k of a token's hash contributes +1/-1; simhash bit k is the sign of
    the sum. Bits exploded relationally (32x token rows — bounded, exact).
    """
    words = split_ws(dialect, "text")
    series = unnest_series(dialect, "0", str(bits - 1), "b")
    if dialect == "spark":
        toks_inner = (
            f"SELECT doc_id, tok FROM docs_aug "
            f"LATERAL VIEW explode({words}) _t AS tok"
        )
    else:
        toks_inner = f"SELECT doc_id, unnest({words}) AS tok FROM docs_aug"
    bitval = f"(({shiftr(dialect, 'h', 'b.b')}) % 2)"
    return (
        # hash once per token, THEN blow up by the 32 bit positions
        f"toks AS (SELECT doc_id, {a31(dialect, 'tok')} AS h "
        f"FROM ({toks_inner}) _raw), "
        f"tok_bits AS (SELECT t.doc_id, b.b, "
        f"SUM(CASE WHEN {bitval} = 1 THEN 1 ELSE -1 END) AS s "
        f"FROM toks t CROSS JOIN {series} b "
        f"GROUP BY t.doc_id, b.b), "
        f"simhash AS (SELECT doc_id, "
        f"CAST(SUM(CASE WHEN s > 0 THEN {shiftl(dialect, 'CAST(1 AS BIGINT)', 'b')} ELSE 0 END) AS BIGINT) AS sim "
        f"FROM tok_bits GROUP BY doc_id)"
    )


def simhash_sql(dialect: str) -> str:
    return (
        f"WITH {docs_aug_cte(dialect)}, {simhash_cte(dialect)} "
        "SELECT doc_id, sim AS simhash FROM simhash"
    )


def simhash_dups_sql(dialect: str, max_hamming: int = 3) -> str:
    """Near-dup pairs by simhash: multi-index exact algorithm — hamming<=3
    over 32 bits guarantees >=1 of the 4 byte-chunks is equal (pigeonhole),
    so candidates = pairs sharing a chunk, verified by bit_count(xor)<=3.
    The chunk equi-join is the scalable part (no all-pairs)."""
    chunks = " UNION ALL ".join(
        f"SELECT doc_id, sim, {c} AS chunk_idx, "
        f"(({shiftr(dialect, 'sim', str(8 * c))}) % 256) AS chunk_val FROM simhash"
        for c in range(4)
    )
    ham = f"bit_count({xor(dialect, 'a.sim', 'b.sim')})"
    return (
        f"WITH {docs_aug_cte(dialect)}, {simhash_cte(dialect)}, "
        f"chunks AS ({chunks}) "
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming "
        "FROM chunks a JOIN chunks b ON a.chunk_idx = b.chunk_idx "
        "AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id "
        f"WHERE {ham} <= {max_hamming}"
    )
