"""Unigram-LM tokenizer training (SentencePiece-style; Kudo 2018,
arXiv:1804.10959, public) — the OTHER production tokenizer family next
to BPE (operators/bpe.py): instead of greedy merges, keep a candidate
piece vocabulary with unigram probabilities, segment by Viterbi, and
iterate EM + pruning until the target vocabulary size.

Distributed shape (mirrors bpe.py): ONE corpus scan builds the
distinct-word frequency table; seeding explodes each word's substrings
in an Arrow kernel and aggregates counts with one partial-agg shuffle;
every EM round is one Viterbi pass over the word table (vocab broadcast
in the kernel closure — vocabularies are KB-to-MB driver state, the
MLlib envelope) plus one piece-count aggregation; pruning is
driver-local over the bounded vocab.  The word table is cached once —
round cost is independent of corpus size beyond the first scan.

Documented simplifications vs the SentencePiece reference (the same
policy as bpe.py's batched trainer): HARD EM (Viterbi counts, not
forward-backward expectations) and count-rank pruning (drop
lowest-count pieces, single chars protected) in place of the
likelihood-loss ranking; both keep every step deterministic and
integer-countable, which is what the reference-twin test pins.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esgopeta_spark.operators.bpe import _word_table

_MAX_PIECE = 8  # longest candidate piece (chars)


def viterbi_segment(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs, deterministic:
    DP left-to-right; on exact score ties the FIRST candidate wins with
    piece lengths scanned ascending (shorter final piece preferred).
    Raises ValueError when the word cannot be covered (a char outside
    the vocabulary — cannot happen for text the vocab was trained on:
    single chars are protected)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(_MAX_PIECE, i) + 1):
            lp = logp.get(word[i - l : i])
            if lp is None:
                continue
            sc = best[i - l] + lp
            if sc > best[i]:
                best[i] = sc
                back[i] = l
    if best[n] == -math.inf:
        raise ValueError(f"unsegmentable word (char outside vocab): {word!r}")
    out = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def _seed_counts(wt: DataFrame, seed_size: int) -> list[tuple[str, int]]:
    """Candidate pieces: every substring (len <= _MAX_PIECE) of every
    word, weighted by word frequency x occurrences; top ``seed_size`` by
    (count DESC, piece ASC) plus ALL single chars (coverage guarantee)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces, counts = [], []
            for word, n in zip(pdf["word"], pdf["n"]):
                n = int(n)
                for i in range(len(word)):
                    for l in range(1, min(_MAX_PIECE, len(word) - i) + 1):
                        pieces.append(word[i : i + l])
                        counts.append(n)
            yield pd.DataFrame({"piece": pieces, "c": pd.Series(counts, dtype="int64")})

    agg = (
        wt.mapInPandas(kernel, "piece string, c bigint")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .cache()  # materialize ONCE: two collects below share the scan+shuffle
    )
    try:
        rows = agg.orderBy(F.col("c").desc(), F.col("piece")).limit(
            int(seed_size)
        ).collect()
        seed = {r["piece"]: int(r["c"]) for r in rows}
        for r in agg.filter(F.length("piece") == 1).collect():  # protect chars
            seed.setdefault(r["piece"], int(r["c"]))
    finally:
        agg.unpersist()
    return sorted(seed.items())


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 2000,
    n_iters: int = 4,
    shrink: float = 0.75,
    text_col: str = "text",
    checkpoint: str = "local",
) -> list[tuple[str, int, float]]:
    """Learn a unigram tokenizer vocabulary.  Returns
    ``[(piece, viterbi_count, logprob)]`` sorted by (count DESC, piece)
    with exactly ``vocab_size`` entries (or fewer if the char alphabet +
    surviving pieces run out)."""
    from esgopeta_spark.operators.checkpoint import materialize

    wt = materialize(_word_table(docs, text_col), checkpoint)
    seed = _seed_counts(wt, seed_size)
    total = sum(c for _, c in seed)
    logp = {p: math.log(c / total) for p, c in seed}
    counts = dict(seed)
    chars = {p for p in logp if len(p) == 1}
    for _ in range(n_iters):
        # E-step: Viterbi counts over the word table (hard EM)
        cur = dict(logp)  # closure snapshot for this round's kernel

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pieces, cs = [], []
                for word, n in zip(pdf["word"], pdf["n"]):
                    for piece in viterbi_segment(word, cur):
                        pieces.append(piece)
                        cs.append(int(n))
                yield pd.DataFrame(
                    {"piece": pieces, "c": pd.Series(cs, dtype="int64")}
                )

        rows = (
            wt.mapInPandas(kernel, "piece string, c bigint")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        counts = {r["piece"]: int(r["c"]) for r in rows}
        for ch in chars:  # floor-protect the alphabet
            counts.setdefault(ch, 1)
        # M-step
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items()}
        # prune toward the target: drop lowest-count multi-char pieces
        keep = max(int(vocab_size), int(len(logp) * shrink))
        if len(logp) > keep:
            ranked = sorted(
                logp, key=lambda p: (-counts.get(p, 0), p)
            )
            kept = set(ranked[:keep]) | chars
            logp = {p: lp for p, lp in logp.items() if p in kept}
            counts = {p: counts.get(p, 1) for p in logp}
    ranked = sorted(logp, key=lambda p: (-counts.get(p, 0), p))
    final = ranked[: int(vocab_size)]
    kept = set(final) | chars
    # re-normalize over the final vocabulary
    total = sum(counts.get(p, 1) for p in kept)
    return sorted(
        ((p, counts.get(p, 1), math.log(counts.get(p, 1) / total)) for p in kept),
        key=lambda t: (-t[1], t[0]),
    )


def unigram_segment_counts(
    docs: DataFrame,
    vocab: list[tuple[str, int, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned unigram vocabulary and
    report per-doc token counts + compression vs raw characters — the
    apply-side twin of bpe_segment_counts, one Arrow pass, no shuffle.

    Quarantine posture (house rule for per-row kernels): a document
    containing a character outside the trained alphabet would raise
    ValueError from viterbi_segment and kill the whole stage; instead
    such docs get NULL token counts (n_chars still reported) so one
    poison row never takes down the job."""
    logp = {p: lp for p, _c, lp in vocab}
    out_schema = "doc_id bigint, n_unigram_tokens bigint, n_chars bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, toks, chars_ = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                t = " ".join((text or "").lower().split())
                words = [w for w in t.split(" ") if w]
                ids.append(int(did))
                try:
                    toks.append(
                        sum(len(viterbi_segment(w, logp)) for w in words)
                    )
                except ValueError:  # char outside vocab: quarantine the doc
                    toks.append(None)
                chars_.append(len(t))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_unigram_tokens": pd.Series(toks, dtype="Int64"),
                    "n_chars": pd.Series(chars_, dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        kernel, out_schema
    )
