"""Byte-pair-encoding merge-table training — tokenizer prep
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"). No reference-repo counterpart (the reference has no
tokenizer surface; grep bpe/merge-pair over src/: zero hits) —
beyond-reference scope like the rest of the corpus suite.

BPE trains on the WORD FREQUENCY TABLE, not the corpus: the only
corpus-scale step is one hash aggregation (:func:`word_counts` — the
same shape as the txt09 vocabulary), after which the merge loop
operates on a vocab-sized frame (≈100k-10M distinct words even for a
100 TB corpus). That makes the honest production shape the one real
pipelines use (HuggingFace tokenizers, SentencePiece): reduce the
corpus to word counts distributedly, then train the merge table on
that small table. :func:`train_bpe_merges` therefore has two paths:

- **local** (default for word tables under ``max_vocab_rows``): one
  bounded driver collect of (word, count) — a documented single-node
  residue exactly like the IVF centroid k-means — then the exact
  greedy loop in Python. Fail-loud above the cap, never silent.
- **distributed** (``distributed=True``, or auto above the cap): the
  symbol sequences stay in a DataFrame; each merge round is one hash
  aggregation over adjacent pairs (weighted by word count, map-side
  partials collapse the Zipf head), a 1-row argmax collect (count
  DESC, pair lexicographic ASC — the deterministic tie-break), and a
  pure-Catalyst fold (`F.aggregate`) that applies the greedy
  left-to-right merge per word. ``localCheckpoint`` truncates the
  lineage each round so k rounds never build a k-deep plan.

Both paths implement the identical greedy semantics and tie-break, so
they produce byte-identical merge tables — differentially tested
(tests/test_bpe.py) against each other and against an independent
pure-Python model under hypothesis.

Word → symbols: codepoints plus a terminal ``</w>`` marker (the
paper's end-of-word convention), so merges never cross word
boundaries and the learned units distinguish suffixes from prefixes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ai_etl_framework_spark.functions.text import (
    tokens as _lc_tokens,
    ws_tokens as _ws_tokens,
)

__all__ = [
    "word_counts",
    "train_bpe_merges",
    "merge_table_df",
    "encode_words",
    "bpe_encode",
    "bpe_token_counts",
]

END_OF_WORD = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, n) over the corpus — the single corpus-scale step of BPE
    training. Whitespace tokenization (empty dropped, NULL text ≡ no
    tokens), case-folded by default — byte-identical to the txt09
    vocabulary contract so a pipeline can reuse one table for both."""
    toks = (
        _lc_tokens(F.col(text_col))
        if lowercase
        else _ws_tokens(F.col(text_col))
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _merge_py(sym: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right merge of adjacent (a, b) → a+b — the
    canonical BPE apply step; both engine paths mirror it exactly."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Catalyst fold implementing :func:`_merge_py`: accumulator is
    (out array, pending symbol); a pending ``a`` followed by ``b``
    flushes the merged unit, anything else flushes the pending symbol
    — greedy left-to-right, overlap-safe ("aaa" + (a,a) → [aa, a])."""
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        pend = acc["pend"]
        return (
            F.when(
                pend.isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                (pend == F.lit(a)) & (s == F.lit(b)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(pend)).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def fin(acc: Column) -> Column:
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, init, step, fin)


def _train_local(pairs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Exact greedy BPE on a collected word-count table."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END_OF_WORD], n) for w, n in pairs if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in words:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic argmax: count DESC, then pair lexicographic ASC
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        words = [
            (_merge_py(sym, a, b) if a in sym else sym, n) for sym, n in words
        ]
    return merges


def train_bpe_merges(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "n",
    distributed: bool | str = "auto",
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge table from a (word, count) frame.

    ``distributed="auto"`` collects the table when its row count is
    within ``max_vocab_rows`` (the real-world path — word tables are
    vocab-sized, not corpus-sized) and otherwise runs the in-Spark
    loop; ``True``/``False`` force a path, and ``False`` above the cap
    raises instead of silently materializing an unbounded table on
    the driver. Both paths return the identical merge list (same
    greedy semantics, same count-DESC/lexicographic-ASC tie-break).
    """
    if distributed not in (True, False, "auto"):
        raise ValueError(
            f"distributed must be True, False, or 'auto', got {distributed!r}"
        )
    base = words.select(
        F.col(word_col).cast("string").alias("word"),
        F.col(count_col).cast("long").alias("n"),
    ).where(F.col("word").isNotNull() & (F.col("word") != "") & (F.col("n") > 0))
    if distributed is not True:
        n_rows = base.count()
        if n_rows <= max_vocab_rows:
            rows = base.collect()
            return _train_local([(r["word"], r["n"]) for r in rows], n_merges)
        if distributed is False:
            raise ValueError(
                f"word table has {n_rows} rows > max_vocab_rows="
                f"{max_vocab_rows}; pass distributed=True (in-Spark "
                f"loop) or raise the cap explicitly"
            )

    # distributed loop: symbols stay in Spark; each round is one
    # pair-count aggregation + a 1-row argmax + a fold projection
    chars = F.expr(
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"
    )
    cur = base.select(
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("sym"),
        F.col("n"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            cur.select(
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.zip_with(
                            F.slice(F.col("sym"), 1, F.size("sym") - 1),
                            F.slice(F.col("sym"), 2, F.size("sym") - 1),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        ),
                    ).otherwise(F.expr(
                        "CAST(array() AS array<struct<l:string,r:string>>)"
                    ))
                ).alias("p"),
                F.col("n"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["p"]["l"], pairs[0]["p"]["r"]
        merges.append((a, b))
        cur = cur.select(
            _merge_pair_expr(F.col("sym"), a, b).alias("sym"), F.col("n")
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with a learned merge table — the canonical
    subword-nmt / HuggingFace-tokenizers loop: repeatedly merge the
    LOWEST-RANK adjacent pair present (greedy left-to-right across the
    word), until no ranked pair remains. Lowest-rank-first (not a
    single sequential pass over the table) is the published apply
    semantics: a merge can create a pair with an EARLIER rank, which
    must then win. Encoding a training word with the full table
    reproduces its end-of-training segmentation (property-tested)."""
    if not word:
        return []
    sym = list(word) + [END_OF_WORD]
    while len(sym) >= 2:
        best: Optional[tuple[int, tuple[str, str]]] = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, (sym[i], sym[i + 1]))
        if best is None:
            break
        a, b = best[1]
        sym = _merge_py(sym, a, b)
    return sym


def _word_expr(text_col: str, lowercase: bool) -> Column:
    from ai_etl_framework_spark.functions.text import tokens, ws_tokens

    return tokens(F.col(text_col)) if lowercase else ws_tokens(F.col(text_col))


def _encode_udf(spark, merges: list[tuple[str, str]]):
    """Arrow-batched pandas UDF ``array<string> words → array<string>
    tokens`` with a per-python-worker word cache: BPE vocabularies are
    Zipf-distributed, so within a batch (and across batches on the
    same worker) almost every word is a cache hit — the merge loop
    runs roughly once per DISTINCT word per worker, not once per
    occurrence. The ranks dict rides a broadcast variable (vocab-sized
    — ≤ a few MB even for a 50k-merge table)."""
    from pyspark.sql.pandas.functions import pandas_udf

    b_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    @pandas_udf("array<string>")
    def encode(words_s):  # type: ignore[no-untyped-def]
        import pandas as pd

        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}

        def enc_doc(words):
            if words is None:
                return []
            out: list[str] = []
            for w in words:
                t = cache.get(w)
                if t is None:
                    t = _encode_word(w, ranks)
                    cache[w] = t
                out.extend(t)
            return out

        return pd.Series([enc_doc(ws) for ws in words_s])

    return encode


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize the corpus with a learned merge table — the
    corpus-scale apply step. ZERO-SHUFFLE by construction: the merge
    table broadcasts (vocab-sized), each row is encoded in place by
    one Arrow-batched pandas UDF (a documented Python seam, like the
    embedder), and no corpus byte crosses the wire — the plan is
    scan → ArrowEvalPython → project, no Exchange (plan-pinned).
    Word contract matches :func:`word_counts` (whitespace tokens,
    case-folded by default), so encoding composes with a table
    trained by :func:`train_bpe_merges` on the same corpus."""
    spark = df.sparkSession
    enc = _encode_udf(spark, merges)
    return df.withColumn(out_col, enc(_word_expr(text_col, lowercase)))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document BPE token counts via the distinct-word shape: the
    merge loop runs once per DISTINCT word (vocab-sized frame — the
    pandas UDF never sees the corpus), the per-word token count joins
    back to the exploded corpus words (AQE broadcasts the vocab side),
    and one hash aggregation sums per document. Corpus payload never
    enters Python; only (id, word) pairs shuffle. Output:
    (id, n_words, n_tokens) — blank/NULL docs report 0/0."""
    spark = df.sparkSession
    enc = _encode_udf(spark, merges)
    words = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(_word_expr(text_col, lowercase)).alias("word"),
    )
    vocab = (
        words.where(F.col("word").isNotNull())
        .select("word")
        .distinct()
        .withColumn("n_tok", F.size(enc(F.array(F.col("word")))).cast("long"))
    )
    return (
        words.join(vocab, "word", "left")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.col("word")).cast("long").alias("n_words"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
) -> DataFrame:
    """(word, tokens) over a word table — the vocab-sized encode used
    by :func:`bpe_token_counts` exposed directly (e.g. to persist a
    word→pieces lookup next to the merge table)."""
    enc = _encode_udf(words.sparkSession, merges)
    return words.withColumn(
        out_col, enc(F.array(F.col(word_col).cast("string")))
    )


def merge_table_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, left, right) frame for persisting / serving the table."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", LongType(), False),
            StructField("left", StringType(), False),
            StructField("right", StringType(), False),
        ]
    )
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, schema)
