"""Unigram-LM quality scoring (CCNet-style perplexity filter)."""

import math

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.lm_score import (
    LP_SCALE, ccnet_buckets, ccnet_buckets_sql, lm_score, lm_score_sql,
    unigram_vocab,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the the the the"),            # most-typical words -> low nll
    (3, "zyx wvu tsr qpo nml kji"),    # all-rare words -> high nll
    (4, "the cat"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_rank_typicality(spark):
    out = {r["doc_id"]: r for r in lm_score(
        _docs(spark), "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 6 and out[2]["n_tokens"] == 4
    # all-stopword doc scores better (lower nll) than all-rare doc
    assert out[2]["avg_nll"] < out[1]["avg_nll"] < out[3]["avg_nll"]


def test_closed_form_single_word_doc(spark):
    out = {r["doc_id"]: r for r in lm_score(
        _docs(spark), "doc_id", "text").collect()}
    # corpus: N=18 tokens, V=11 distinct; "the"x7, "cat"x2 (+1 smoothing)
    denom = 18 + 1.0 * (11 + 1)
    lp_the = -math.floor(-math.log(8 / denom) * LP_SCALE + 0.5)
    lp_cat = -math.floor(-math.log(3 / denom) * LP_SCALE + 0.5)
    want = round(-(lp_the + lp_cat) / (LP_SCALE * 2.0), 4)
    assert out[4]["avg_nll"] == pytest.approx(want, abs=1e-9)


def test_vocab_cap_sends_tail_to_oov(spark):
    docs = _docs(spark)
    vocab, oov = unigram_vocab(docs, "text", "doc_id", max_vocab=2)
    kept = {r["word"] for r in vocab.collect()}
    assert "the" in kept and len(kept) == 2
    out = {r["doc_id"]: r for r in lm_score(
        docs, "doc_id", "text", vocab=vocab, oov_lp_u=oov).collect()}
    # doc 3 is entirely OOV under the cap: avg_nll == -oov/LP_SCALE
    assert out[3]["avg_nll"] == pytest.approx(
        round(-oov / float(LP_SCALE), 4), abs=1e-9)
    # capped scores are >= uncapped (OOV floor is the worst prob)
    full = {r["doc_id"]: r["avg_nll"] for r in lm_score(
        docs, "doc_id", "text").collect()}
    assert all(out[i]["avg_nll"] >= full[i] - 1e-9 for i in out)


def test_external_model_scores_new_docs(spark):
    train = _docs(spark)
    vocab, oov = unigram_vocab(train, "text", "doc_id")
    new = spark.createDataFrame(
        [(100, "the cat"), (101, "unseen wordsoup")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_score(
        new, "doc_id", "text", vocab=vocab, oov_lp_u=oov).collect()}
    assert out[100]["avg_nll"] < out[101]["avg_nll"]
    assert out[101]["avg_nll"] == pytest.approx(
        round(-oov / float(LP_SCALE), 4), abs=1e-9)


def test_duckdb_twin_matches(spark, tmpdir_path):
    import duckdb

    docs = _docs(spark)
    docs.coalesce(1).write.parquet(f"{tmpdir_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmpdir_path}/documents.parquet/*.parquet')")
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        lm_score_sql("documents", "doc_id", "text")).fetchall()}
    got = {r["doc_id"]: (r["n_tokens"], r["avg_nll"])
           for r in lm_score(docs, "doc_id", "text").collect()}
    assert got == want


def test_ccnet_buckets_order_and_rough_thirds(spark):
    docs = spark.read.parquet(SF_DOCS)
    rows = ccnet_buckets(docs, "doc_id", "text", lang_col="lang").collect()
    scored_n = lm_score(docs, "doc_id", "text").count()
    assert len(rows) == scored_n  # every scored doc gets exactly one label
    # per language, the split is monotone in avg_nll:
    # max(head) <= min(middle) <= max(middle) <= min(tail)
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {}).setdefault(
            r["bucket"], []).append(r["avg_nll"])
    for lang, b in per_lang.items():
        lo = float("-inf")
        for name in ("head", "middle", "tail"):
            if name in b:
                assert min(b[name]) >= lo, (lang, name)
                lo = max(b[name])
    # overall the split is near thirds (ties make it approximate)
    n = len(rows)
    for name in ("head", "middle", "tail"):
        frac = sum(1 for r in rows if r["bucket"] == name) / n
        assert 0.2 <= frac <= 0.47, (name, frac)


def test_ccnet_buckets_tie_groups_move_together(spark):
    # four byte-identical docs share one quantized score; the whole tie
    # group must land in ONE bucket even though it straddles a cut
    docs = spark.createDataFrame(
        [(i, "the cat sat") for i in range(1, 5)]
        + [(5, "zyx wvu"), (6, "qpo nml")],
        "doc_id long, text string")
    rows = ccnet_buckets(docs, "doc_id", "text").collect()
    tie = {r["bucket"] for r in rows if r["doc_id"] <= 4}
    assert len(tie) == 1


def test_ccnet_buckets_rejects_bad_fractions(spark):
    docs = _docs(spark)
    for bad in (((1, 2), (1, 2)),      # equal cuts
                ((0, 3), (2, 3)),      # zero lower cut
                ((2, 3), (1, 3)),      # descending
                ((1, 2), (2, 2)),      # upper cut == 1
                (0.3333, 0.6667)):     # floats, not rationals
        with pytest.raises(ValueError, match="fractions"):
            ccnet_buckets(docs, "doc_id", "text", fractions=bad)


def test_ccnet_buckets_duckdb_twin_matches(spark):
    import duckdb

    docs = spark.read.parquet(SF_DOCS)
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["avg_nll"],
                         r["bucket"])
           for r in ccnet_buckets(docs, "doc_id", "text",
                                  lang_col="lang").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DOCS}'")
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(
        ccnet_buckets_sql("documents", "doc_id", "text", "lang"))
        .fetchall()}
    assert got == want
