"""Distributed byte-pair-encoding (BPE) vocabulary training — the
tokenizer-construction step of a training-data pipeline (Sennrich et al.
2016, arXiv:1508.07909, public).

Shape: classic word-level BPE.  The working set is the DISTINCT-WORD
table (words with corpus frequencies) — orders of magnitude smaller than
the corpus, which is what makes BPE training tractable at 100 TB: the
corpus is scanned ONCE to build (word, count); every merge round then
runs on the word table alone.  Per round:

- adjacent symbol pairs explode from each word's symbol array, weighted
  by word frequency -> ONE partial-aggregated shuffle keyed by pair;
- the top (batch+1) pairs under the DETERMINISTIC total order
  (count DESC, left ASC, right ASC) come back in ONE driver action;
- the driver accepts a PROVABLY-SEQUENTIAL-EXACT prefix of them (see
  below) and applies all accepted merges in ONE Arrow mapInPandas pass,
  lineage-cut per round (local or reliable checkpoint — CLAUDE.md loop
  rule) so the growing plan never re-analyzes.

Why the batch is exact (not an approximation).  Accept candidates in
total order, stopping at the first that (a) shares a symbol with an
already-accepted pick, or (b) whose concatenated merge string collides
with an existing symbol or with a merge accepted earlier in the SAME
batch (two symbol-disjoint picks can concatenate identically — ("in",
"g") vs ("i","ng") — and a new symbol fed by two merges would break the
created-pair bound below); then drop trailing picks whose count does not
STRICTLY exceed the first rejected candidate's count (the first pick is
exempt — a batch of one is classic BPE by definition).  Under those
rules each accepted pick q_i is exactly what sequential BPE would choose
at its step: applying earlier picks cannot change q_i's count (symbol-
disjoint, and no-collision means no existing pair gains occurrences);
every pair a prior merge can decrease was ranked at/below the stop
candidate (else the scan would have stopped sooner) so it stays there;
and every pair a prior merge CREATES ((u, m) from trigram (u, l, r)) is
count-bounded by the old count of an overlapping pair ((u, l)), hence
<= the stop candidate's count < every kept pick's count.  So the merge
sequence — including recorded counts — is byte-identical to one-at-a-
time BPE at any batch size; rounds shrink ~batch-fold (measured in
SCALE.md).  The greedy SKIP-and-continue variant sometimes suggested for
this is NOT exact (a skipped overlapping pair can retain a higher count
than the next disjoint pick, and a new pair bounded by the skipped one
can outrank it); stop-at-first-conflict is what makes the proof go
through.

Determinism: integer frequencies sum order-free; the tiebreak is total;
the resulting merge SEQUENCE is reproducible at any parallelism and any
``batch`` — pinned against a pure-python one-merge-at-a-time reference
in tests/test_llm_ops.py (batch=1 and batch>1 must agree byte-for-byte).
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


def _apply_merges(picks: list[tuple[str, str]]):
    """Kernel applying a batch of mutually symbol-disjoint merges in rank
    order (disjointness makes the order immaterial per word, but rank
    order keeps the semantics trivially identical to sequential)."""
    pairs = [(left, right, left + right) for left, right in picks]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                s = list(syms)
                for left, right, merged in pairs:
                    i, res = 0, []
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                            res.append(merged)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                out_syms.append(s)
            yield pd.DataFrame({"word": pdf["word"], "n": pdf["n"], "syms": out_syms})

    return kernel


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    batch: int = 16,
    checkpoint: str = "local",
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the merge
    sequence as [(left, right, weighted_count), ...] in rank order —
    the vocabulary artifact a tokenizer ships.

    ``batch`` bounds how many merges one count->select->apply round may
    commit; the accepted picks per round are the provably-sequential-
    exact prefix (module docstring) so the returned sequence is
    byte-identical at any ``batch``.  batch=1 is the classic
    one-merge-per-round loop.  A production 30k-100k-merge vocabulary
    needs batch >> 1: driver rounds are the scheduling bottleneck
    (~2 Spark jobs per round), and real heavy-tailed text accepts
    multiple disjoint picks per round (measured in SCALE.md).

    ``checkpoint``: "local" | "reliable" — lineage-cut durability per
    round (operators/checkpoint.py); "reliable" requires
    ``spark.sparkContext.setCheckpointDir`` and survives executor loss.

    ``stats``: optional dict; on return, filled with
    ``{"rounds": R, "merges": M}`` so callers can verify R ≈ M/batch.
    """
    from esgopeta_spark.operators.checkpoint import materialize

    if batch < 1:
        raise ValueError("batch must be >= 1")
    wt = materialize(
        _word_table(docs, text_col).withColumn(
            "syms",
            F.concat(
                F.split(F.col("word"), ""),  # characters
                F.array(F.lit(_END)),
            ),
        ),
        checkpoint,
    )
    # symbol vocabulary (alphabet + merges so far), for the collision
    # guard: a merge string equal to an existing symbol may boost
    # existing pairs, so such a pick must end its batch.  Alphabet-sized
    # collect — tiny at any corpus scale.
    vocab = {
        r["s"] for r in wt.select(F.explode("syms").alias("s")).distinct().collect()
    }
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    schema = "word string, n bigint, syms array<string>"
    while len(merges) < n_merges:
        room = min(batch, n_merges - len(merges))
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
        cands = (
            pairs.orderBy(F.col("w").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(room + 1)
            .collect()
        )
        rounds += 1
        complete = len(cands) < room + 1  # fetched the entire pair table
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        batch_merged: set[str] = set()  # merge strings accepted THIS round
        tail_w = 0  # count bound on everything a kept pick must outrank
        exhausted = False
        for row in cands:
            left, right, w = row["l"], row["r"], int(row["w"])
            if w < 2:
                tail_w = w
                exhausted = not accepted
                break
            if len(accepted) == room:
                tail_w = w
                break
            # the merge-string collision guard must ALSO cover merges
            # accepted earlier in this same batch: two disjoint picks with
            # identical concatenations (e.g. ("in","g") and ("i","ng"))
            # feed the SAME new symbol, so pairs created around it sum
            # contributions from both merges — the per-pick tail bound no
            # longer covers them and the sequence could diverge from
            # batch=1.  Stopping at the second such pick keeps each new
            # symbol fed by exactly one merge per batch (proof in module
            # docstring holds).
            if accepted and (
                left in used
                or right in used
                or (left + right) in vocab
                or (left + right) in batch_merged
            ):
                tail_w = w
                break
            accepted.append((left, right, w))
            used.update((left, right))
            batch_merged.add(left + right)
            if (left + right) in vocab:
                # collision pick: safe alone (it IS the argmax) but later
                # picks' counts could be boosted by it — end the batch.
                # tail_w stays whatever the next candidate shows.
                if len(cands) > len(accepted):
                    nxt = cands[len(accepted)]
                    tail_w = int(nxt["w"])
                elif complete:
                    tail_w = 0
                break
        else:
            # scanned every fetched candidate without a stop; with
            # room+1 fetched this only happens when the pair table is
            # smaller than the fetch — nothing exists beyond it.
            tail_w = 0 if complete else int(cands[-1]["w"])
        if exhausted or not accepted:
            break  # nothing left worth merging
        # trailing picks tied with the tail bound are not provably next
        # sequentially — defer them to the next round (first pick exempt:
        # a batch of one is classic BPE)
        while len(accepted) > 1 and accepted[-1][2] <= tail_w:
            accepted.pop()
        merges.extend(accepted)
        vocab.update(left + right for left, right, _ in accepted)
        wt = materialize(
            wt.mapInPandas(_apply_merges([(l, r) for l, r, _ in accepted]), schema),
            checkpoint,
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return merges


def bpe_train_wordtable(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int = 5_000_000,
) -> list[tuple[str, str, int]]:
    """Production-vocabulary scale path: ONE distributed scan builds the
    distinct-word frequency table; the 30k-100k-merge loop then runs
    DRIVER-LOCAL over it with pair-index delta updates — the classic
    fast BPE trainer, and exactly how production tokenizer trainers
    (SentencePiece, HuggingFace tokenizers) consume a pre-counted corpus.

    Why this is the 100 TB design and not a cop-out: BPE's working set
    after the corpus scan is the DISTINCT-WORD table, whose size is
    vocabulary-bound (~10^6-10^7 rows after a ``min_count`` floor even
    for web-scale corpora — Heaps' law), not corpus-bound.  The corpus
    scan is the only part that touches 100 TB and it is one
    partial-aggregated shuffle.  Driving 10^5 global argmax rounds
    through the cluster instead (see ``bpe_train``) costs ~2 Spark jobs
    per merge of pure scheduling on a working set that fits in one
    process; exact batching (``bpe_train(batch=...)``) recovers only a
    small factor because early merges conflict on common symbols.
    ``max_words`` guards the collect: if the table (after ``min_count``)
    exceeds it, raise rather than OOM the driver — use ``bpe_train``.

    Merge loop: lazy-invalidated heap keyed by the same deterministic
    total order (count DESC, left ASC, right ASC) + per-merge delta
    updates touching only words that contain the winning pair.  The
    merge sequence is byte-identical to ``bpe_train`` (pinned in
    tests/test_llm_ops.py).
    """
    import heapq

    wt = _word_table(docs, text_col)
    if min_count > 1:
        wt = wt.filter(F.col("n") >= min_count)
    rows = wt.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"distinct-word table exceeds max_words={max_words}; raise min_count "
            "or use the distributed bpe_train"
        )
    word_syms: list[list[str]] = [list(r["word"]) + [_END] for r in rows]
    word_n: list[int] = [int(r["n"]) for r in rows]

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(word_syms):
        f = word_n[wi]
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
            where.setdefault((a, b), set()).add(wi)

    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, left, right = heapq.heappop(heap)
        pair = (left, right)
        c = counts.get(pair, 0)
        if c != -negc:
            continue  # stale heap entry; the fresh one is still queued
        if c < 2:
            break
        merges.append((left, right, c))
        merged = left + right
        touched: dict[tuple[str, str], int] = {}
        for wi in sorted(where.get(pair, ())):
            syms, f = word_syms[wi], word_n[wi]
            for a, b in zip(syms, syms[1:]):
                touched[(a, b)] = touched.get((a, b), 0) - f
                where.get((a, b), set()).discard(wi)
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            word_syms[wi] = res
            for a, b in zip(res, res[1:]):
                touched[(a, b)] = touched.get((a, b), 0) + f
                where.setdefault((a, b), set()).add(wi)
        for p, delta in touched.items():
            if delta == 0:
                continue
            nc = counts.get(p, 0) + delta
            if nc <= 0:
                counts.pop(p, None)
            else:
                counts[p] = nc
                heapq.heappush(heap, (-nc, p[0], p[1]))
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
