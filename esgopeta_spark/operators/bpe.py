"""Distributed byte-pair-encoding (BPE) vocabulary training — the
tokenizer-construction step of a training-data pipeline (Sennrich et al.
2016, arXiv:1508.07909, public).

Shape: classic word-level BPE.  The working set is the DISTINCT-WORD
table (words with corpus frequencies) — orders of magnitude smaller than
the corpus, which is what makes BPE training tractable at 100 TB: the
corpus is scanned ONCE to build (word, count); every merge iteration
then runs on the word table alone.  Per iteration:

- adjacent symbol pairs explode from each word's symbol array, weighted
  by word frequency -> ONE partial-aggregated shuffle keyed by pair;
- the winning pair is the argmax under the DETERMINISTIC total order
  (count DESC, left ASC, right ASC) — a 1-row driver action, exactly the
  coordination point real distributed BPE trainers have;
- the merge is applied to the word table by an Arrow mapInPandas kernel
  (per-word python loop over a tiny symbol array), localCheckpoint-ed so
  the growing plan never re-analyzes (CLAUDE.md loop rule).

Determinism: integer frequencies sum order-free; the tiebreak is total;
the resulting merge SEQUENCE is reproducible at any parallelism —
pinned against a pure-python reference in tests/test_llm_ops.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esgopeta_spark.operators.dedup import normalize_text

_END = "</w>"  # end-of-word marker, the classic BPE boundary symbol


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, n) distinct-word frequencies, one scan."""
    words = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    return (
        docs.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _apply_merge(left: str, right: str):
    merged = left + right

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                s = list(syms)
                i, res = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out_syms.append(res)
            yield pd.DataFrame({"word": pdf["word"], "n": pdf["n"], "syms": out_syms})

    return kernel


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the merge
    sequence as [(left, right, weighted_count), ...] in rank order —
    the vocabulary artifact a tokenizer ships."""
    spark = docs.sparkSession
    wt = (
        _word_table(docs, text_col)
        .withColumn(
            "syms",
            F.concat(
                F.split(F.col("word"), ""),  # characters
                F.array(F.lit(_END)),
            ),
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    schema = "word string, n bigint, syms array<string>"
    for _ in range(n_merges):
        pairs = (
            wt.select(
                "n",
                F.explode(
                    F.expr("transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s as l, syms[i + 1] as r))")
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("w"))
        )
        top = pairs.orderBy(F.col("w").desc(), F.col("l").asc(), F.col("r").asc()).limit(1).collect()
        if not top or top[0]["w"] < 2:
            break  # nothing left worth merging
        left, right, w = top[0]["l"], top[0]["r"], int(top[0]["w"])
        merges.append((left, right, w))
        wt = wt.mapInPandas(_apply_merge(left, right), schema).localCheckpoint()
    return merges


def bpe_segment_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned merge sequence and report
    per-doc BPE token counts + compression vs raw characters.  The merge
    list broadcasts inside the Arrow kernel closure; one pass, no
    shuffle."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> int:
        s = list(word) + [_END]
        while len(s) > 1:
            best, best_rank = None, None
            for i in range(len(s) - 1):
                rk = ranks.get((s[i], s[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = i, rk
            if best is None:
                break
            s[best : best + 2] = [s[best] + s[best + 1]]
        return len(s)

    out_schema = "doc_id bigint, n_bpe_tokens bigint, n_chars bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, toks, chars = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                t = " ".join((text or "").lower().split())
                words = [w for w in t.split(" ") if w]
                ids.append(did)
                toks.append(sum(encode_word(w) for w in words))
                chars.append(len(t))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bpe_tokens": pd.Series(toks, dtype="int64"),
                    "n_chars": pd.Series(chars, dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        kernel, out_schema
    )
