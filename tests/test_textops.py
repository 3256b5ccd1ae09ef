"""Unit tests for the textops kernels (rolling hash, winnowing, multimodal
stubs) — the SQL operators themselves are covered by the oracle-parity
tests in test_queries_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest

from engine.textops import multimodal, rolling


def _naive_kgram(data: bytes, k: int):
    out = []
    for i in range(len(data) - k + 1):
        h = 0
        for ch in data[i : i + k]:
            h = (h * rolling.B + ch) % rolling.P
        out.append(h)
    return np.array(out, dtype=np.int64)


def test_rolling_matches_naive():
    rng = np.random.default_rng(5)
    for n, k in [(1, 1), (16, 16), (40, 16), (500, 16), (300, 7)]:
        data = bytes(rng.integers(0, 256, n).tolist())
        got = rolling.kgram_hashes(data, k)
        want = _naive_kgram(data, k)
        assert np.array_equal(got, want), (n, k)


def test_rolling_short_input():
    assert len(rolling.kgram_hashes(b"abc", 16)) == 0


def test_winnow_properties():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2**31, 200)
    fps = rolling.winnow(h, 8)
    assert len(np.unique(fps)) == len(fps)
    assert set(fps.tolist()) <= set(h.tolist())
    # global min always survives winnowing
    assert h.min() in fps
    # identical docs -> identical fingerprints; edited docs share most
    t1 = b"the quick brown fox jumps over the lazy dog " * 20
    t2 = t1.replace(b"fox", b"cat")
    f1 = set(rolling.winnow(rolling.kgram_hashes(t1, 16), 8).tolist())
    f2 = set(rolling.winnow(rolling.kgram_hashes(t2, 16), 8).tolist())
    assert f1 == set(rolling.winnow(rolling.kgram_hashes(t1, 16), 8).tolist())
    assert len(f1 & f2) > 0


def test_fingerprints_text_api():
    fps = rolling.fingerprints("hello world, this is a document " * 10)
    assert len(fps) > 0 and fps.dtype == np.int64


def test_real_decode_is_stub():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x89PNG")


def test_media_frames_rows(spark):
    from engine.pipeline import fixtures

    from .conftest import SF_DIR

    pages = fixtures.pages_df(spark, SF_DIR).limit(200)
    pdf = multimodal.frame_sample_df(pages).toPandas()
    meta = multimodal.decode_media_df(pages).toPandas()
    # one row per (url, frame_idx), counts match the metadata's n_frames
    got = pdf.groupby("url").size().sort_index()
    want = meta.set_index("url")["n_frames"].sort_index()
    assert got.equals(want.astype(got.dtype))
    assert pdf["frame"].map(len).max() <= 16
    assert pdf["frame"].map(type).eq(bytes).all() or pdf["frame"].map(
        lambda b: isinstance(b, (bytes, bytearray))
    ).all()


def test_connected_components_multihop(spark):
    """Chain 1-2-3-4 plus isolated 9: labels propagate across hops (takes
    >1 round), singletons keep themselves, keeper = min id per cluster."""
    from engine.textops.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 8, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        7: (7, True), 8: (7, False), 9: (9, True),
    }


def test_components_star_matches_hashmin(spark):
    """Alternating large/small-star contraction must agree with hash-min
    label propagation on a mixed graph (chains, a cycle, singletons)."""
    from engine.textops.cluster import connected_components, connected_components_star

    nodes = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8), (8, 9), (9, 7), (11, 15), (15, 12),
         (17, 18)],
        "doc_a long, doc_b long",
    )
    want = sorted(tuple(r) for r in connected_components(nodes, pairs).collect())
    got = sorted(tuple(r) for r in connected_components_star(nodes, pairs).collect())
    assert got == want


def test_components_star_deep_chain(spark):
    """A 60-node path has diameter 59: hash-min at max_iters=25 must fail
    loudly, the star contraction must converge in O(log) rounds and label
    the whole chain with its minimum."""
    import pytest as _pytest

    from engine.textops.cluster import connected_components, connected_components_star

    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, pairs, max_iters=25)
    got = connected_components_star(nodes, pairs, max_rounds=12).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert sum(r["is_keeper"] for r in got) == 1


def test_resolve_components_chooser(spark):
    """The production chooser: a shallow graph resolves inside the hash-min
    budget; a deep chain (diameter >> budget) silently falls back to star
    contraction and still converges to the same contract — the path that
    previously raised on the registry pipeline."""
    from engine.textops.cluster import resolve_components

    # deep: 60-node path, budget 4 -> star fallback must label everything 0
    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = resolve_components(nodes, pairs, hashmin_budget=4).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert sum(r["is_keeper"] for r in got) == 1

    # shallow: same graph as the multihop test stays on the hash-min path
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 8, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in resolve_components(nodes, pairs, hashmin_budget=8).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        7: (7, True), 8: (7, False), 9: (9, True),
    }
