"""BPE train/encode parity against an independent pure-Python reference
(merge loops aren't SQL-expressible, so the oracle is in-process)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import bpe

CORPUS = [
    Row(doc_id=1, text="low lower lowest low low"),
    Row(doc_id=2, text="new newer newest new news"),
    Row(doc_id=3, text="wide wider widest low new"),
    Row(doc_id=4, text=""),
]


def _ref_train(texts, n_merges, min_pair_count=2):
    """Reference BPE trainer (Sennrich et al. 2016 alg. 1), same
    tie-breaks: count desc, then (a, b) ascending."""
    freqs = Counter(w for t in texts for w in t.split())
    words = {w: list(w) + [bpe.EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(CORPUS)
    got = bpe.bpe_train(df, n_merges=12, min_pair_count=2)
    want = _ref_train([r.text for r in CORPUS], 12, 2)
    assert got == want
    assert len(got) > 4  # the corpus supports a real merge sequence


def test_bpe_encode_roundtrip_and_counts(spark):
    df = spark.createDataFrame(CORPUS)
    merges = bpe.bpe_train(df, n_merges=8)
    enc = {r.doc_id: r for r in bpe.bpe_encode(df, merges).collect()}
    # tokens reassemble to the original text (EOW marks word ends)
    joined = "".join(enc[1].tokens).replace(bpe.EOW, " ").strip()
    assert joined == CORPUS[0].text
    assert enc[4].tokens == [] and enc[4].n_tokens == 0
    # merged tokens compress: fewer tokens than characters
    assert 0 < enc[1].n_tokens < len(CORPUS[0].text)


def test_bpe_encode_applies_merge_order(spark):
    # rank order matters: with merges [(l,o),(lo,w)] the word "low" must
    # become ["low", EOW], not ["l", "ow", EOW]
    df = spark.createDataFrame([Row(doc_id=1, text="low")])
    merges = [("l", "o", 99), ("lo", "w", 98)]
    out = bpe.bpe_encode(df, merges).collect()[0]
    assert out.tokens == ["low", bpe.EOW]


def test_bpe_train_stops_below_min_count(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab cd ef")])
    # every pair occurs once -> no merge clears min_pair_count=2
    assert bpe.bpe_train(df, n_merges=10, min_pair_count=2) == []
