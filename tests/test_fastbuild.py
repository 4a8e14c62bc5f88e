"""The shuffle-free postings path must be bit-identical to the classic
explode+groupBy path on the same corpus."""

from trinity_spark.fixtures import gen_transcripts
from trinity_spark.operators.build import build_postings, tokenize_turns
from trinity_spark.operators.docids import assign_doc_ids
from trinity_spark.operators.fastbuild import postings_from_turns


def _norm(df):
    return sorted(
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"])) for r in df.collect()
    )


def test_fast_equals_classic(spark):
    turns = assign_doc_ids(spark.createDataFrame(gen_transcripts(500)), num_partitions=3)
    turns.persist()
    classic = _norm(build_postings(tokenize_turns(turns)))
    fast = _norm(postings_from_turns(turns))
    assert fast == classic
    assert len(fast) > 1000


def test_fast_edge_cases(spark):
    rows = [
        ("c0", 0, "", ""),            # empty text
        ("c0", 1, None, ""),          # null text
        ("c0", 2, "a a a b", ""),     # repeats
        ("c0", 3, "x" * 70 + " ok y", ""),  # overlong term dropped, positions shift
        ("c1", 0, "I.B.M 9.000 L'Oreal", ""),  # tokenizer special cases
    ]
    df = spark.createDataFrame(
        [(c, t, x, tl) for c, t, x, tl in rows],
        "conv_id string, turn_idx int, text string, tool string",
    )
    turns = assign_doc_ids(df, num_partitions=2)
    classic = _norm(build_postings(tokenize_turns(turns)))
    fast = _norm(postings_from_turns(turns))
    assert fast == classic
    terms = {t for t, *_ in fast}
    assert {"ibm", "9", "loreal", "ok", "y", "a", "b"} <= terms
    assert "x" * 70 not in terms


def test_build_scopes_fine_scan_splits(spark, tmp_path):
    """build_index applies its build-tuned 4 MiB scan splits via a runtime
    conf that is RESTORED afterwards — query scans in the same session must
    keep their own (auto-sized) split planning."""
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.indexer import build_index
    from trinity_spark.sources.store import SegmentStore

    key = "spark.sql.files.maxPartitionBytes"
    spark.conf.set(key, "33554432")
    try:
        build_index(
            spark, spark.createDataFrame(gen_transcripts(300)),
            SegmentStore(str(tmp_path / "idx")), rows_per_segment=300,
            input_desc="conf-scope",
        )
        assert spark.conf.get(key) == "33554432"
    finally:
        spark.conf.unset(key)
