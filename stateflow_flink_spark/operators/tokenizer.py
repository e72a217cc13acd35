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
from ..session import pin

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


# ---------------------------------------------------------------------------
# Full BPE trainer — K merge rounds over the word-type table
# ---------------------------------------------------------------------------
#
# The trainer iterates the counting pass above: per round, count adjacent
# symbol pairs weighted by word frequency, pick the most frequent pair
# (ties: lexicographic on (lhs, rhs) — integer counts, so the argmax is
# exact), apply the merge greedily left-to-right in every word, repeat.
#
# Representation: each word type is a SPACED SYMBOL STRING ("h u g");
# symbols never contain spaces, so split(' ') recovers the symbol list
# and a greedy merge is a sequential left fold over it:
#
#     acc starts as the first symbol; for each next symbol s,
#     if the LAST symbol of acc == lhs and s == rhs -> acc || s
#     (appending without a separator fuses s into the last symbol),
#     else acc || ' ' || s.
#
# The fold IS the classic non-overlapping left-to-right merge: a symbol
# just produced by a merge ends with rhs, so it can only chain when
# lhs suffix-matches the merged symbol through the exact last-symbol
# check ("h e l l o" with (l,o) folds to "h e l lo", and "a a a" with
# (a,a) folds to "aa a", both matching the reference algorithm).  Both
# engines run the IDENTICAL fold — Spark `F.aggregate`, DuckDB
# `LIST_REDUCE` (which seeds the accumulator with the first element) —
# so merge outcomes agree string-for-string.
#
# Scale shape (Sennrich §3.2's word-type trick, same as q_bpe_pairs):
# one corpus-sized shuffle builds the (word type, freq) table; each of
# the K rounds then runs on the vocabulary-sized table — a partial-
# aggregating pair count, a TakeOrdered(1), a broadcast-1-row cross
# join applying the merge, and a `pin` cutting lineage so round K's
# plan doesn't re-derive rounds 1..K-1.  No driver-side collect: the
# winning pair stays a DataFrame end to end (the k-means recipe).

BPE_TRAIN_ROUNDS = 6

_PAIR_STRUCT = "array<struct<lhs:string,rhs:string>>"


def _bind(arr: Column, fn) -> Column:
    """Evaluate `arr` once and pass it to `fn` as a lambda variable —
    the expression-tree CSE trick from dedup.shingles (referencing a
    split() twice re-tokenizes twice)."""
    return F.element_at(F.transform(F.array(arr), fn), 1)


def spaced_symbols(word: Column) -> Column:
    """Initial BPE state of a word: its characters joined by ' '."""
    return F.rtrim(F.regexp_replace(word, "(.)", "$1 "))


def _adjacent_pairs(sp: Column) -> Column:
    """Adjacent symbol pairs of a spaced symbol string (multiplicity
    kept; single-symbol words contribute nothing — sequence(1, 0)
    counts DOWN, so the guard is explicit)."""

    def over(syms: Column) -> Column:
        return F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("lhs"),
                    F.element_at(syms, i + 1).alias("rhs"),
                ),
            ),
        ).otherwise(F.array().cast(_PAIR_STRUCT))

    return _bind(F.split(sp, " "), over)


def _apply_merge(sp: Column, lhs: Column, rhs: Column) -> Column:
    """Greedy left-to-right merge of (lhs, rhs) in a spaced symbol
    string — the sequential fold described in the module comment."""

    def over(syms: Column) -> Column:
        def step(acc: Column, s: Column) -> Column:
            at_lhs = (acc == lhs) | acc.endswith(F.concat(F.lit(" "), lhs))
            return F.when(at_lhs & (s == rhs), F.concat(acc, s)).otherwise(
                F.concat(acc, F.lit(" "), s)
            )

        return F.aggregate(
            F.slice(syms, 2, F.size(syms) - 1), F.element_at(syms, 1), step
        )

    return _bind(F.split(sp, " "), over)


def word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(spaced word, corpus frequency) — the table every round runs on."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(spaced_symbols(F.col("word")).alias("sp"), "freq")
    )


def bpe_train(
    words: DataFrame, rounds: int = BPE_TRAIN_ROUNDS, do_pin: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Run `rounds` BPE merge rounds over a (sp, freq) word-type table.

    Returns (merges, final_words): merges has one row per round —
    (step, lhs, rhs, n) — and final_words is the word-type table with
    all merges applied.  If the pair table empties early (tiny corpora)
    the remaining rounds emit nothing, on both engines.  ``do_pin``
    False skips the per-round lineage cuts so plan gates can inspect a
    round's full plan (never run multi-round that way — lineage doubles
    per round)."""
    maybe_pin = pin if do_pin else (lambda df: df)
    merge_frames: list[DataFrame] = []
    w = words
    for r in range(1, rounds + 1):
        counts = (
            w.select(F.explode(_adjacent_pairs(F.col("sp"))).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").cast("long").alias("n"))
        )
        # TakeOrdered(1); pinned because it feeds BOTH the merge apply
        # and the output union — one pair-count job per round, not two
        top1 = maybe_pin(counts.orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs")).limit(1))
        merge_frames.append(
            top1.select(F.lit(r).cast("int").alias("step"), "lhs", "rhs", "n")
        )
        w = maybe_pin(
            w.crossJoin(F.broadcast(top1.select("lhs", "rhs"))).select(
                _apply_merge(F.col("sp"), F.col("lhs"), F.col("rhs")).alias("sp"),
                "freq",
            )
        )
    merges = merge_frames[0]
    for m in merge_frames[1:]:
        merges = merges.unionByName(m)
    return merges.orderBy("step"), w


def _bpe_train_ctes(rounds: int) -> str:
    """Unrolled DuckDB CTE chain mirroring bpe_train round for round."""
    parts = [
        r"""w0 AS (
        SELECT RTRIM(REGEXP_REPLACE(word, '(.)', '\1 ', 'g')) AS sp,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS (
        SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(SUM(freq) AS BIGINT) AS n
        FROM (SELECT STRING_SPLIT(sp, ' ') AS s, freq FROM w{r - 1}),
             UNNEST(GENERATE_SERIES(1, LEN(s) - 1)) AS t(i)
        GROUP BY 1, 2
    ),
    t{r} AS (
        SELECT CAST({r} AS INT) AS step, lhs, rhs, n
        FROM p{r} ORDER BY n DESC, lhs, rhs LIMIT 1
    ),
    w{r} AS (
        SELECT CASE WHEN LEN(s) = 1 THEN sp
                    ELSE LIST_REDUCE(s, (acc, x) ->
                        CASE WHEN (acc = lhs OR
                                   RIGHT(acc, LEN(lhs) + 1) = ' ' || lhs)
                                  AND x = rhs
                             THEN acc || x ELSE acc || ' ' || x END)
               END AS sp, freq
        FROM (SELECT sp, STRING_SPLIT(sp, ' ') AS s, freq FROM w{r - 1}), t{r}
    )"""
        )
    return ",\n    ".join(parts)


_BPE_TRAIN_ORACLE = f"""
    WITH {_bpe_train_ctes(BPE_TRAIN_ROUNDS)}
    SELECT step, lhs, rhs, n
    FROM ({" UNION ALL ".join(f"SELECT * FROM t{r}" for r in range(1, BPE_TRAIN_ROUNDS + 1))})
    ORDER BY step
"""

_BPE_ENCODE_ORACLE = f"""
    WITH {_bpe_train_ctes(BPE_TRAIN_ROUNDS)}
    SELECT tok, CAST(SUM(freq) AS BIGINT) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(sp, ' ')) AS tok, freq
          FROM w{BPE_TRAIN_ROUNDS})
    GROUP BY tok
    ORDER BY n DESC, tok LIMIT {BPE_TOP}
"""


@query("q_bpe_train", _BPE_TRAIN_ORACLE)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge table: {BPE_TRAIN_ROUNDS} training rounds over the
    corpus word-type table — (step, lhs, rhs, pair count at merge time).
    The iterative counting pass the reference's per-event loop could
    never express (ref parity: the reference has no tokenizer; this is
    north-star LLM-pipeline surface)."""
    merges, _ = bpe_train(word_types(spark, sf_dir))
    return merges


@query("q_bpe_encode", _BPE_ENCODE_ORACLE)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token distribution AFTER the learned merges: apply the
    {BPE_TRAIN_ROUNDS}-round merge table to every word type, explode
    symbols weighted by word frequency, top-{BPE_TOP} — the vocabulary
    a trained tokenizer would ship."""
    _, final_words = bpe_train(word_types(spark, sf_dir))
    toks = final_words.select(
        F.explode(F.split(F.col("sp"), " ")).alias("tok"), "freq"
    )
    return (
        toks.groupBy("tok")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — subword-per-word cost of the vocab
# ---------------------------------------------------------------------------


@query(
    "q_tokenizer_fertility",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_words,
           CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]{1,4}')))
               AS BIGINT) AS n_subwords,
           ROUND(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]{1,4}'))) * 1.0
                 / SUM(LEN(STRING_SPLIT(text, ' '))), 6) AS fertility
    FROM documents GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language: subword tokens emitted per
    whitespace word (q_text_token_count's BPE-ish ≤4-char subword regex
    over the corpus, rolled up by lang).  The standard multilingual
    tokenizer-equity readout (Rust et al., ACL 2021): a fertility of 2
    means that language pays twice the sequence length — and twice the
    compute and effective context cost — per word, which is exactly
    what vocab-allocation and per-language sampling decisions consume.

    Scale shape: per-doc token counts are projections riding the scan;
    the only exchange is the |langs|-row partial-aggregated rollup.
    Determinism: two exact integer sums and one correctly-rounded
    division, rounded at 6 dp."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    n_sub = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]{1,4}"), 0)
    ).cast("long")
    return (
        d.select("lang", n_words.alias("w"), n_sub.alias("s"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("s").alias("n_subwords"),
            F.round(F.sum("s") / F.sum("w"), 6).alias("fertility"),
        )
    )
