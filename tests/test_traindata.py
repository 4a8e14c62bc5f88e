"""Training-data assembly: hash split, decontamination, sequence packing."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trinity_spark.dataops.traindata import (
    balanced_sample,
    decontaminate,
    hash_split,
    pack_sequences,
    sample_sources,
)

_PROP = settings(
    max_examples=int(os.environ.get("TRINITY_PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- hash_split --------------------------------------------------------------


def test_hash_split_exhaustive_deterministic(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(2000)])
    a = hash_split(docs).select("doc_id", "bucket", "split").collect()
    assert len(a) == 2000
    by_split = {}
    for r in a:
        by_split.setdefault(r["split"], []).append(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    # rough proportions (hash is uniform-ish; wide tolerance, zero flake)
    assert 0.7 < len(by_split["train"]) / 2000 < 0.9
    # pure function of (seed, id): re-run identical
    b = hash_split(docs).select("doc_id", "bucket", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # different seed reassigns some documents
    c = hash_split(docs, seed=99).select("doc_id", "split").collect()
    moved = sum(
        1 for x, y in zip(sorted(a, key=lambda r: r["doc_id"]),
                          sorted(c, key=lambda r: r["doc_id"]))
        if x["split"] != y["split"]
    )
    assert moved > 0


def test_hash_split_stable_under_append(spark):
    """The property the hash design buys: adding documents never moves
    existing ones (a sampled/sorted split would reshuffle everything)."""
    small = _docs(spark, [(i, f"doc {i}") for i in range(500)])
    big = _docs(spark, [(i, f"doc {i}") for i in range(1000)])
    a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_split_validates_weights(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, weights={"train": 0.5, "test": 0.2})
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, weights={"train": 1.5, "test": -0.5})


# --- source mixture sampling -------------------------------------------------


def _src_docs(spark, n=1200):
    rows = [(i, f"s{i % 4}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_sample_sources_copy_semantics(spark):
    """Integer part exact, fractional part hash-thinned: rate 2.5 yields 2
    or 3 copies per doc (~2.5 mean), 0.4 yields 0 or 1 (~0.4 mean), 0 drops
    the source, unlisted sources keep exactly 1 copy."""
    docs = _src_docs(spark)
    out = sample_sources(docs, {"s0": 2.5, "s1": 0.4, "s2": 0.0}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], {}).setdefault(r["doc_id"], []).append(r["epoch"])
    assert "s2" not in by_src
    # unlisted source: every doc exactly once, epoch 0
    assert all(v == [0] for v in by_src["s3"].values())
    assert len(by_src["s3"]) == 300
    for copies in by_src["s0"].values():
        assert sorted(copies) in ([0, 1], [0, 1, 2])
    total_s0 = sum(len(v) for v in by_src["s0"].values())
    assert 2.0 * 300 < total_s0 < 3.0 * 300  # mean in (2, 3), ~2.5
    for copies in by_src["s1"].values():
        assert copies == [0]
    assert 0.2 * 300 < len(by_src["s1"]) < 0.6 * 300  # ~0.4 acceptance


def test_sample_sources_deterministic_and_append_stable(spark):
    docs = _src_docs(spark, 400)
    a = sorted(map(tuple, sample_sources(docs, {"s0": 1.5}).collect()))
    b = sorted(map(tuple, sample_sources(docs, {"s0": 1.5}).collect()))
    assert a == b
    # append stability: the original docs' fates are unchanged by new rows
    more = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400, 800)], "doc_id long, source string"
    )
    c = sorted(
        t
        for t in map(tuple, sample_sources(docs.union(more), {"s0": 1.5}).collect())
        if t[0] < 400
    )
    assert a == c


def test_sample_sources_matches_reference_hash(spark):
    """Copy counts replicate the documented md5 formula exactly."""
    import hashlib

    docs = _src_docs(spark, 200)
    out = {}
    for r in sample_sources(docs, {"s0": 2.5, "s1": 0.4}, seed=11).collect():
        out.setdefault((r["doc_id"], r["source"]), []).append(r["epoch"])
    for i in range(200):
        src = f"s{i % 4}"
        bucket = int(hashlib.md5(f"11|{i}".encode()).hexdigest()[:8], 16)
        w = {"s0": 2.5, "s1": 0.4}.get(src, 1.0)
        base = int(w)
        expect = base + (1 if bucket < int(round((w - base) * (1 << 32))) else 0)
        got = out.get((i, src), [])
        assert sorted(got) == list(range(expect)), (i, src, expect, got)


def test_sample_sources_validates_rates(spark):
    docs = _src_docs(spark, 8)
    with pytest.raises(ValueError):
        sample_sources(docs, {"s0": -0.1})
    with pytest.raises(ValueError):
        sample_sources(docs, {}, default_rate=-1.0)


# --- decontaminate -----------------------------------------------------------


def test_decontaminate_planted_overlap(spark):
    gram = "alpha beta gamma delta epsilon"
    corpus = _docs(
        spark,
        [
            (1, f"clean text with no overlap at all here one two three"),
            (2, f"prefix words then {gram} then suffix words"),
            (3, "tiny"),  # shorter than n: reported clean, never joins
            (4, f"{gram} leading and also {gram} repeated"),
        ],
    )
    bench = _docs(spark, [(100, f"the benchmark contains {gram} verbatim")])
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=5).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert not out[1]["contaminated"] and out[1]["n_hit_ngrams"] == 0
    assert out[2]["contaminated"] and out[2]["n_hit_ngrams"] >= 1
    assert not out[3]["contaminated"]
    assert out[4]["contaminated"]


def test_decontaminate_short_benchmark_rows_ignored(spark):
    corpus = _docs(spark, [(1, "one two three four five six")])
    bench = _docs(spark, [(100, "one two")])  # < n tokens: no shingles
    out = decontaminate(corpus, bench, n=5).collect()
    assert not out[0]["contaminated"]


def test_decontaminate_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(i, f"text number {i} with several words") for i in range(50)])
    bench = _docs(spark, [(100, "text number 7 with several words")])
    plan = decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_curate_decontamination_gate(spark):
    from trinity_spark.dataops.curate import curate

    gram = "the quick brown fox jumps over it"
    good = "the code review found that the bug is in the parser for it"
    corpus = _docs(
        spark,
        [
            (1, good),
            (2, f"the report says {gram} and the test is for it now"),
            (3, "x"),  # too_short AND would-be-contaminated: first gate wins
        ],
    )
    bench = _docs(spark, [(100, f"benchmark text where {gram} appears for the set")])
    out = {
        r["doc_id"]: r
        for r in curate(corpus, min_quality=0.0, benchmark=bench, decontam_n=5).collect()
    }
    assert out[1]["keep"] and out[1]["reason"] == ""
    assert not out[2]["keep"] and out[2]["reason"] == "contaminated"
    assert not out[3]["keep"] and out[3]["reason"] == "too_short"


def test_decontaminate_validates_n(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="n must be"):
        decontaminate(docs, docs, n=0)


# --- pack_sequences ----------------------------------------------------------


def test_pack_sequences_prefix_sum_semantics(spark):
    # known token counts via explicit token_col, many partitions
    rows = [(i, "ignored", (i % 7) + 1) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_toks long")
    out = pack_sequences(
        docs, budget=50, token_col="n_toks", num_partitions=8
    ).collect()
    assert len(out) == 1000
    got = {r["doc_id"]: (r["n_tokens"], r["bin_id"]) for r in out}
    cum = 0
    for i in range(1000):
        nt = (i % 7) + 1
        assert got[i] == (nt, cum // 50), f"doc {i}"
        cum += nt


def test_pack_sequences_bin_budget_bound(spark):
    """Each bin's token span is < budget + its last doc (docs straddle at
    most one boundary) and bins are contiguous from 0."""
    rows = [(i, "ignored", 1 + (i * 37) % 113) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_toks long")
    out = sorted(
        pack_sequences(docs, budget=200, token_col="n_toks", num_partitions=5).collect(),
        key=lambda r: r["doc_id"],
    )
    bins = {}
    for r in out:
        bins.setdefault(r["bin_id"], []).append(r["n_tokens"])
    assert min(bins) == 0 and sorted(bins) == list(range(max(bins) + 1))
    for b, toks in bins.items():
        # all but the straddling last doc fit the budget
        assert sum(toks) - toks[-1] < 200


def test_pack_sequences_from_text_matches_token_count(spark):
    from trinity_spark.dataops.textstats import token_count

    docs = _docs(spark, [(i, f"some words here number {i}") for i in range(40)])
    out = pack_sequences(docs, budget=16, num_partitions=3)
    want = {
        r["doc_id"]: r["nt"]
        for r in docs.select("doc_id", token_count(F.col("text")).alias("nt")).collect()
    }
    for r in out.collect():
        assert r["n_tokens"] == want[r["doc_id"]]


@_PROP
@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=300),
    budget=st.integers(min_value=1, max_value=700),
    parts=st.integers(min_value=1, max_value=7),
)
def test_pack_sequences_matches_sequential_reference(spark, toks, budget, parts):
    """Distributed two-phase prefix sum == the driver-side sequential pack,
    for any token profile / budget / partitioning (incl. zero-token docs,
    docs bigger than the budget, more partitions than rows)."""
    rows = [(i, "x", int(t)) for i, t in enumerate(toks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_toks long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in pack_sequences(
            docs, budget=budget, token_col="n_toks", num_partitions=parts
        ).collect()
    }
    cum = 0
    for i, t in enumerate(toks):
        assert got[i] == (t, cum // budget)
        cum += t
    assert len(got) == len(toks)


@_PROP
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=1 << 30),
    w_train=st.floats(min_value=0.05, max_value=0.9),
)
def test_hash_split_matches_reference_hash(spark, n, seed, w_train):
    """Split assignment == the driver-side md5 reference for any seed and
    weight point; every doc lands in exactly one split."""
    import hashlib

    rest = (1.0 - w_train) / 2
    weights = {"train": w_train, "val": rest, "test": rest}
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in hash_split(docs, weights=weights, seed=seed).collect()
    }
    bounds = []
    acc = 0.0
    for name in ["train", "val"]:
        acc += weights[name]
        bounds.append(int(acc * (1 << 32)))
    for i in range(n):
        b = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)
        want = "train" if b < bounds[0] else ("val" if b < bounds[1] else "test")
        assert got[i] == (b, want)


def test_pack_sequences_validates_budget(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)


def test_pack_sequences_rejects_negative_token_counts(spark):
    """A -1 'unknown' sentinel via token_col would regress the prefix sum
    and shift later bin_ids low with no error — must fail loud like NULL."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(0, 10), (1, -1), (2, 10)], "doc_id long, n long"
    ).withColumn("text", F.lit(""))
    with pytest.raises(ValueError, match="negative token"):
        pack_sequences(docs, budget=16, token_col="n")


# --- balanced_sample ---------------------------------------------------------

def _strata(spark):
    # skewed strata: a=60, b=25, c=8 rows
    rows = [(i, "a") for i in range(60)]
    rows += [(100 + i, "b") for i in range(25)]
    rows += [(200 + i, "c") for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_balanced_sample_exact_counts_and_reference_order(spark):
    """Exact method keeps EXACTLY n per stratum, and membership equals the
    driver-side md5-order reference (ties by id)."""
    import hashlib

    docs = _strata(spark)
    got = balanced_sample(docs, "lang", n_per_stratum=5, seed=13).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"a": 5, "b": 5, "c": 5}

    ids = {"a": range(60), "b": range(100, 125), "c": range(200, 208)}
    for lang, rng in ids.items():
        order = sorted(
            rng, key=lambda i: (hashlib.md5(f"13|{i}".encode()).hexdigest()[:8], i)
        )
        assert by_lang[lang] == set(order[:5]), lang


def test_balanced_sample_default_n_is_min_stratum(spark):
    docs = _strata(spark)
    got = balanced_sample(docs, "lang").groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"a": 8, "b": 8, "c": 8}


def test_balanced_sample_deterministic(spark):
    docs = _strata(spark)
    a = {r["doc_id"] for r in balanced_sample(docs, "lang", 4).collect()}
    b = {r["doc_id"] for r in balanced_sample(docs, "lang", 4).collect()}
    assert a == b and len(a) == 12


def test_balanced_sample_threshold_method_bounds(spark):
    """Threshold method: no per-stratum funnel, counts near target, a
    stratum at-or-under target keeps everything (threshold saturates)."""
    docs = _strata(spark)
    got = balanced_sample(docs, "lang", n_per_stratum=8, method="threshold")
    counts = {r["lang"]: r["count"] for r in got.groupBy("lang").count().collect()}
    assert counts["c"] == 8  # n == stratum size -> threshold 2^32 keeps all
    # probabilistic strata: expected 8, allow generous noise but require a cut
    assert 1 <= counts["a"] < 25 and 1 <= counts["b"] <= 25


def test_balanced_sample_null_stratum_consistent(spark):
    """Both methods treat a NULL stratum as a real group: exact samples it
    via the window, threshold must null-safe-join it (a plain equi-join
    would silently drop every null-stratum row)."""
    rows = [(i, "a") for i in range(10)] + [(100 + i, None) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    ex = balanced_sample(docs, "lang", n_per_stratum=4).collect()
    assert sum(1 for r in ex if r["lang"] is None) == 4
    th = balanced_sample(docs, "lang", n_per_stratum=10, method="threshold")
    got = th.collect()
    assert sum(1 for r in got if r["lang"] is None) == 10  # thr saturates
    assert len(got) == 20


def test_balanced_sample_validates(spark):
    docs = _strata(spark)
    with pytest.raises(ValueError, match="method"):
        balanced_sample(docs, "lang", 5, method="nope")
    with pytest.raises(ValueError, match="n_per_stratum"):
        balanced_sample(docs, "lang", 0)
    with pytest.raises(ValueError, match="empty"):
        balanced_sample(docs.where(F.lit(False)), "lang")


def test_split_bucket_null_id_fails_loudly(spark):
    """concat_ws skips NULLs: every NULL id would hash to md5('{seed}') —
    one constant bucket, a whole cohort correlated into the same split."""
    import pytest

    from trinity_spark.dataops.traindata import hash_split

    df = spark.createDataFrame(
        [("a",), (None,)], "doc_id string"
    )
    with pytest.raises(Exception, match="NULL doc_id|assert"):
        hash_split(df).collect()
