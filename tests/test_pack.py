"""Sequence packing (pipeline/pack.py) vs a sequential reference."""

from __future__ import annotations

import pytest

from lucene_spark.pipeline.pack import pack_sequences


def _ref_pack(docs: list[tuple[int, str]], block: int):
    """Sequential truth: concatenate token streams in id order, slice."""
    spans = []
    off = 0
    for doc_id, text in sorted(docs):
        n = len(text.split())
        if n == 0:
            continue
        done = 0
        while done < n:
            seq = (off + done) // block
            take = min(n - done, (seq + 1) * block - (off + done))
            spans.append((seq, doc_id, done, (off + done) % block, take))
            done += take
        off += n
    return sorted(spans)


def _collect(df):
    return sorted((r["seq_id"], r["doc_id"], r["doc_off"], r["seq_off"],
                   r["span_len"]) for r in df.collect())


def test_matches_sequential_reference(spark):
    docs = [(i, " ".join(f"w{j}" for j in range((i * 7) % 13 + 1)))
            for i in range(50)]
    docs[10] = (10, "")           # empty doc dropped
    docs[11] = (11, "   ")        # whitespace-only dropped
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", block_size=16, buckets=4)
    assert _collect(out) == _ref_pack(docs, 16)


def test_blocks_are_exactly_full(spark):
    docs = [(i, " ".join(["x"] * 5)) for i in range(40)]  # 200 tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", block_size=8, buckets=3)
    rows = out.collect()
    per_seq = {}
    for r in rows:
        per_seq.setdefault(r["seq_id"], 0)
        per_seq[r["seq_id"]] += r["span_len"]
    assert per_seq == {i: 8 for i in range(25)}  # 200/8 full blocks
    # spans within a block tile it without gaps
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append((r["seq_off"],
                                                   r["span_len"]))
    for spans in by_seq.values():
        spans.sort()
        cursor = 0
        for seq_off, ln in spans:
            assert seq_off == cursor
            cursor += ln


def test_long_doc_spans_many_blocks(spark):
    docs = [(0, " ".join(["a"] * 3)), (1, " ".join(["b"] * 50)),
            (2, " ".join(["c"] * 2))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", block_size=10, buckets=2)
    got = _collect(out)
    assert got == _ref_pack(docs, 10)
    doc1 = [g for g in got if g[1] == 1]
    assert len(doc1) == 6  # 50 tokens starting at offset 3 → blocks 0..5


def test_stable_under_repartitioning(spark):
    docs = [(i, " ".join(["t"] * ((i % 5) + 1))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = _collect(pack_sequences(df, "text", "doc_id", 7, buckets=5))
    b = _collect(pack_sequences(df.repartition(13), "text", "doc_id", 7,
                                buckets=2))
    assert a == b


def test_bad_block_size_rejected(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, "text", "doc_id", 0)
