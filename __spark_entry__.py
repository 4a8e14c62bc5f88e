"""Driver contract for the spark-graft builder (PySpark target).

The engine under test is ``trinity_spark`` — a PySpark-native inverted-index
+ BM25 engine (reference semantics: phaistos-networks/Trinity).  The driver's
DuckDB oracle runs on the harness parquet tables, so every entry here builds
the index over the ``documents`` table (its synthetic text is plain lowercase
space-separated words, making ANSI-SQL tokenization exactly equivalent to the
engine's tokenizer on this corpus — verified by test_entry.py).

Scores are rounded to 6 dp on BOTH sides and top-k ordering uses the rounded
score (then doc_id) on BOTH sides, so 1-ulp ln() differences between the JVM
and DuckDB cannot flip ranks or value-hashes.

The IR-specific rank-identity gate (exact float64 scores, transcripts corpus,
18 query classes) runs in pytest — see tests/test_engine.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2  # /root/reference/similarity.h:169 (norm fixed to k1 — no length norm)


def _index(spark: SparkSession, sf_dir: str):
    """Build the logical index over documents(doc_id, text)."""
    from trinity_spark.operators.build import (
        build_field_stats,
        build_postings,
        build_term_dict,
        tokenize_turns,
    )
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    hits = tokenize_turns(docs)
    postings = build_postings(hits)
    index = LogicalIndex(
        postings,
        build_term_dict(postings),
        build_field_stats(postings, docs_cnt=docs.count()),
    )
    return QueryPlanner(index)


def _topk(spark: SparkSession, sf_dir: str, query: str, k: int = 10) -> DataFrame:
    planner = _index(spark, sf_dir)
    scored = planner.score_all(query)
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: nested boolean+phrase BM25 top-10 on sf0.001."""
    return _topk(spark, "/root/testdata/sf0.001", '("table hash" OR vector) AND join NOT slow', k=10)


# ---------------------------------------------------------------------------
# queries(): one entry per implemented operator class (SURVEY.md §2)
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # §2.1/§2.4 — term dictionary + corpus statistics
    def term_dict(spark, sf):
        return _index(spark, sf).index.term_dict.select(
            "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
        )

    def field_stats(spark, sf):
        return _index(spark, sf).index.field_stats.select(
            F.col("sum_term_hits").cast("long").alias("sum_term_hits"),
            F.col("total_terms").cast("long").alias("total_terms"),
            F.col("sum_terms_docs").cast("long").alias("sum_terms_docs"),
            F.col("docs_cnt").cast("long").alias("docs_cnt"),
        )

    # §2.4 — per-(term,doc) tf aggregation (posting-list scan slice)
    def postings_term(spark, sf):
        p = _index(spark, sf).index.postings
        return p.where(F.col("term") == "spark").select(
            "doc_id", F.col("tf").cast("long").alias("tf")
        )

    q["term_dict"] = term_dict
    q["field_stats"] = field_stats
    q["postings_scan"] = postings_term

    # §2.3 + §2.6 — docID-set operators with BM25 top-k
    def mk(query: str):
        return lambda spark, sf: _topk(spark, sf, query, k=10)

    q["bm25_single_term"] = mk("spark")
    q["bm25_and"] = mk("join AND merge")
    q["bm25_or"] = mk("scan OR vector")
    q["bm25_not"] = mk("hash NOT join")
    q["bm25_minmatch"] = mk("[sort, merge, window] min=2")
    q["bm25_phrase"] = mk('"table hash"')
    q["bm25_mixed"] = mk('("table hash" OR vector) AND join NOT slow')
    return q


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB-equivalent ANSI SQL over the same parquet views
# ---------------------------------------------------------------------------

_TOKS = """
toks AS (
  SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
  ) u
  WHERE u.term <> ''
  GROUP BY doc_id, u.term
)"""

_STATS = """
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM toks GROUP BY term)"""


def _score_sql(where: str, having: str = "", phrase: bool = False) -> str:
    """Shared skeleton: per-doc BM25 sum over the matched query terms."""
    return f"""
WITH {_TOKS}, {_STATS},
scored AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * (t.tf / (t.tf + {K1}))) AS raw
  FROM toks t
  JOIN dfs d ON d.term = t.term
  CROSS JOIN stats s
  WHERE {where}
  GROUP BY t.doc_id
  {having}
)
SELECT doc_id, round(raw, 6) AS score
FROM scored
ORDER BY round(raw, 6) DESC, doc_id ASC
LIMIT 10
"""


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["term_dict"] = f"""
WITH {_TOKS}
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM toks GROUP BY term
"""
    o["field_stats"] = f"""
WITH {_TOKS}
SELECT CAST(sum(tf) AS BIGINT) AS sum_term_hits,
       CAST(count(DISTINCT term) AS BIGINT) AS total_terms,
       CAST(count(*) AS BIGINT) AS sum_terms_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS docs_cnt
FROM toks
"""
    o["postings_scan"] = f"""
WITH {_TOKS}
SELECT doc_id, tf FROM toks WHERE term = 'spark'
"""
    o["bm25_single_term"] = _score_sql("t.term = 'spark'")
    o["bm25_and"] = _score_sql(
        "t.term IN ('join','merge')", having="HAVING count(DISTINCT t.term) = 2"
    )
    o["bm25_or"] = _score_sql("t.term IN ('scan','vector')")
    o["bm25_not"] = f"""
WITH {_TOKS}, {_STATS},
scored AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * (t.tf / (t.tf + {K1}))) AS raw
  FROM toks t
  JOIN dfs d ON d.term = t.term
  CROSS JOIN stats s
  WHERE t.term = 'hash'
    AND t.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'join')
  GROUP BY t.doc_id
)
SELECT doc_id, round(raw, 6) AS score
FROM scored ORDER BY round(raw, 6) DESC, doc_id ASC LIMIT 10
"""
    o["bm25_minmatch"] = _score_sql(
        "t.term IN ('sort','merge','window')",
        having="HAVING count(DISTINCT t.term) >= 2",
    )
    # phrase: adjacency via position lists; phrase freq is the BM25 freq and
    # phrase idf = sum of member idfs (similarity.h:209-217)
    o["bm25_phrase"] = f"""
WITH pos AS (
  SELECT doc_id, u.term, u.p
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS p
    FROM documents
  ) u
  WHERE u.term <> ''
), {_TOKS}, {_STATS},
pf AS (
  SELECT a.doc_id, CAST(count(*) AS DOUBLE) AS pf
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.term = 'table' AND b.term = 'hash'
  GROUP BY a.doc_id
),
phrase_idf AS (
  SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS idf
  FROM dfs d, stats s WHERE d.term IN ('table','hash')
)
SELECT pf.doc_id, round(i.idf * (pf.pf / (pf.pf + {K1})), 6) AS score
FROM pf, phrase_idf i
ORDER BY round(i.idf * (pf.pf / (pf.pf + {K1})), 6) DESC, pf.doc_id ASC
LIMIT 10
"""
    # mixed: ("table hash" OR vector) AND join NOT slow
    # score = sum of matched branch scores: phrase-or-vector branch + join branch
    o["bm25_mixed"] = f"""
WITH pos AS (
  SELECT doc_id, u.term, u.p
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS p
    FROM documents
  ) u
  WHERE u.term <> ''
), {_TOKS}, {_STATS},
pf AS (
  SELECT a.doc_id, CAST(count(*) AS DOUBLE) AS pf
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.term = 'table' AND b.term = 'hash'
  GROUP BY a.doc_id
),
idfs AS (
  SELECT d.term, ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, stats s
),
phrase_score AS (
  SELECT pf.doc_id,
         (SELECT sum(idf) FROM idfs WHERE term IN ('table','hash')) * (pf.pf / (pf.pf + {K1})) AS s
  FROM pf
),
vector_score AS (
  SELECT t.doc_id, i.idf * (t.tf / (t.tf + {K1})) AS s
  FROM toks t JOIN idfs i ON i.term = t.term WHERE t.term = 'vector'
),
or_branch AS (
  SELECT coalesce(p.doc_id, v.doc_id) AS doc_id,
         coalesce(p.s, 0) + coalesce(v.s, 0) AS s
  FROM phrase_score p FULL OUTER JOIN vector_score v ON v.doc_id = p.doc_id
),
join_score AS (
  SELECT t.doc_id, i.idf * (t.tf / (t.tf + {K1})) AS s
  FROM toks t JOIN idfs i ON i.term = t.term WHERE t.term = 'join'
),
anded AS (
  SELECT o.doc_id, o.s + j.s AS raw
  FROM or_branch o JOIN join_score j ON j.doc_id = o.doc_id
  WHERE o.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'slow')
)
SELECT doc_id, round(raw, 6) AS score
FROM anded ORDER BY round(raw, 6) DESC, doc_id ASC LIMIT 10
"""
    return o
