"""Window-arithmetic tests for the RAG chunker (the oracle twin covers
value parity; these pin the boundary semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import chunk


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return sorted(
        chunk.chunk_documents(df, **kw).collect(), key=lambda r: r.chunk_id
    )


def test_exact_fit_single_chunk(spark):
    rows = _chunks(
        spark, " ".join(f"t{i}" for i in range(8)),
        chunk_tokens=8, overlap_tokens=2,
    )
    assert len(rows) == 1
    assert rows[0].n_chunk_tokens == 8 and rows[0].start_token == 0


def test_overlap_and_tail(spark):
    # 14 tokens, chunk=8, overlap=2 (stride 6): ceil(12/6)=2 chunks
    toks = [f"t{i}" for i in range(14)]
    rows = _chunks(spark, " ".join(toks), chunk_tokens=8, overlap_tokens=2)
    assert [(r.start_token, r.n_chunk_tokens) for r in rows] == [(0, 8), (6, 8)]
    # consecutive chunks share exactly the overlap
    a, b = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert a[-2:] == b[:2] == toks[6:8]
    # every token appears; stitched text reassembles the doc
    assert a + b[2:] == toks


def test_short_tail_window_emitted(spark):
    # 15 tokens, stride 6: ceil(13/6)=3 chunks; the last is short (3 toks)
    rows = _chunks(
        spark, " ".join(f"t{i}" for i in range(15)),
        chunk_tokens=8, overlap_tokens=2,
    )
    assert [(r.start_token, r.n_chunk_tokens) for r in rows] == [
        (0, 8), (6, 8), (12, 3),
    ]


def test_empty_doc_no_chunks(spark):
    assert _chunks(spark, "", chunk_tokens=8, overlap_tokens=2) == []


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError, match="smaller"):
        chunk.chunk_documents(
            spark.createDataFrame([Row(doc_id=1, text="x")]),
            chunk_tokens=8,
            overlap_tokens=8,
        )


def test_chunk_properties_random_docs(spark):
    """Property: for any doc and any (chunk, overlap), stitching chunk
    texts with the overlap removed reassembles the doc exactly, window
    arithmetic matches the closed form, and only the final window may be
    short."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        n_toks=st.integers(min_value=0, max_value=57),
        chunk_tokens=st.integers(min_value=2, max_value=16),
        overlap=st.integers(min_value=0, max_value=8),
    )
    def prop(n_toks, chunk_tokens, overlap):
        if overlap >= chunk_tokens:
            return
        toks = [f"t{i}" for i in range(n_toks)]
        rows = _chunks(
            spark, " ".join(toks),
            chunk_tokens=chunk_tokens, overlap_tokens=overlap,
        )
        stride = chunk_tokens - overlap
        # nonempty docs always yield >= 1 chunk (short docs are corpus,
        # not droppable); empty docs yield none
        want_n = 0 if n_toks == 0 else max(1, -(-(n_toks - overlap) // stride))
        assert len(rows) == want_n
        stitched = []
        for i, r in enumerate(rows):
            got = r.chunk_text.split() if r.chunk_text else []
            assert r.start_token == i * stride
            if i < len(rows) - 1:
                assert r.n_chunk_tokens == chunk_tokens
            stitched += got[overlap:] if i > 0 else got
        assert stitched == toks

    prop()
