"""Benchmark decontamination: known-overlap corpus, broadcast plan pin,
and the report/filter contract."""

import pyspark.sql.functions as F
import pytest

from debezium_connector_db2_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            # 0: verbatim copy of eval doc A (max hits)
            (0, "the quick brown fox jumps over the lazy dog"),
            # 1: shares one 3-gram window with eval doc A, case-shifted
            (1, "THE QUICK BROWN otter swims under the bright moon"),
            # 2: no overlap
            (2, "completely unrelated text about spark physical plans"),
            # 3: shares exactly two distinct 3-grams with eval doc B
            (3, "alpha beta gamma delta unrelated tail words here now"),
            # 4: too short to shingle at k=3
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",),
            ("alpha beta gamma delta epsilon",),
        ],
        "text string",
    )
    return train, ev


def test_report_counts_distinct_shared_shingles(corpus):
    train, ev = corpus
    rep = contamination_report(train, "doc_id", "text", ev, k=3)
    got = {r["doc_id"]: r["n_hits"] for r in rep.collect()}
    # doc 0: 7 windows of the 9-word sentence; doc 1: "the quick brown"
    # only (normalize folds case); doc 3: "alpha beta gamma" +
    # "beta gamma delta"; docs 2 and 4 absent.
    assert got == {0: 7, 1: 1, 3: 2}


def test_min_hits_floor(corpus):
    train, ev = corpus
    rep = contamination_report(train, "doc_id", "text", ev, k=3, min_hits=2)
    assert {r["doc_id"] for r in rep.collect()} == {0, 3}
    with pytest.raises(ValueError):
        contamination_report(train, "doc_id", "text", ev, k=3, min_hits=0)


def test_normalize_off_is_case_sensitive(corpus):
    train, ev = corpus
    rep = contamination_report(train, "doc_id", "text", ev, k=3,
                               normalize=False)
    got = {r["doc_id"] for r in rep.collect()}
    assert 1 not in got and 0 in got


def test_decontaminate_removes_flagged_only(corpus):
    train, ev = corpus
    clean = decontaminate(train, "doc_id", "text", ev, k=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    assert clean.columns == train.columns
    # hit floor keeps the single-window doc
    clean2 = decontaminate(train, "doc_id", "text", ev, k=3, min_hits=2)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [1, 2, 4]


def test_eval_side_is_broadcast(corpus):
    """The 100-TB-side contract: the benchmark's shingles broadcast, so
    finding hits never shuffles the training side."""
    train, ev = corpus
    rep = contamination_report(train, "doc_id", "text", ev, k=3)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_separate_eval_text_column(spark, corpus):
    train, _ = corpus
    ev = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "eval_id long, prompt string")
    rep = contamination_report(train, "doc_id", "text", ev,
                               eval_text_col="prompt", k=3)
    assert 0 in {r["doc_id"] for r in rep.collect()}
