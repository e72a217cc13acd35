"""Tokenizer training — BPE pair statistics at corpus scale.

Byte-Pair Encoding training (Sennrich, Haddow & Birch, ACL 2016) is an
iterative loop: count adjacent symbol pairs over the corpus, merge the
most frequent pair, repeat.  The classic scale trick — used by every
production BPE trainer — is to aggregate WORD TYPES first: pair counts
are then computed over the (distinct word, frequency) table, which is
vocabulary-sized, not corpus-sized.  `q_bpe_pairs` is one such counting
pass (the step that dominates each merge iteration): the top adjacent
character pairs weighted by word frequency.

Scale shape: one corpus-sized shuffle (word → frequency, partial
aggregated), then everything else runs on the word-type table — the
pair explode amplifies by word LENGTH (bounded small), the pair count
partial-aggregates, and the top-k is TakeOrderedAndProject.  A full
trainer runs this pass per merge with the learned merges applied; the
counting plan is identical each round.

Pairs carry multiplicity within a word ("aaa" contributes (a,a) twice)
— the standard BPE count.  Single-character words contribute nothing;
Spark's `sequence(1, 0)` counts DOWN where the oracle's RANGE is empty,
so the guard is explicit (same pitfall as q_dedup_substring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

BPE_TOP = 20

_BPE_ORACLE = f"""
    WITH words AS (
        SELECT w AS word, COUNT(*) AS freq
        FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS t(w)
        WHERE LENGTH(w) >= 2
        GROUP BY w
    ),
    pairs AS (
        SELECT p.pair, SUM(freq) AS n
        FROM words,
             UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(word)),
                                   i -> SUBSTRING(word, i, 2))) AS p(pair)
        GROUP BY p.pair
    )
    SELECT pair, CAST(n AS BIGINT) AS n
    FROM pairs
    ORDER BY n DESC, pair ASC
    LIMIT {BPE_TOP}
"""


def _char_pairs(word: Column) -> Column:
    """All adjacent character pairs of a word (multiplicity kept)."""
    return F.when(
        F.length(word) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(word) - 1),
            lambda i: word.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query("q_bpe_pairs", _BPE_ORACLE)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs weighted by word frequency — one
    BPE-training counting pass over the word-type table (see module
    docstring for the word-type trick and the per-iteration shape)."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(_char_pairs(F.col("word"))).alias("pair"), "freq"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP)
    )
