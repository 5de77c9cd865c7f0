"""Multinomial NB classifier (operators/classify.py): learning power on
separable vocabularies, deterministic tie-break, empty-doc prior
fallback, and the score decomposition against the collected model
tables.  Cross-engine exactness is pinned by the catalog parity tests
(select_nb_langid / select_nb_confusion, hash-exact at sf0.001/0.01)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from esgopeta_spark.operators.classify import nb_predict, nb_scores, nb_train

_SCHEMA = "doc_id bigint, lang string, text string"


def _fit_predict(spark, train_rows, score_rows, buckets=1024):
    model, cls = nb_train(spark.createDataFrame(train_rows, _SCHEMA), buckets=buckets)
    pred = nb_predict(
        spark.createDataFrame(score_rows, _SCHEMA), model, cls, buckets=buckets
    )
    return model, cls, {r["doc_id"]: r for r in pred.collect()}


def test_nb_separable_vocabularies_classify_exactly(spark):
    """Disjoint class vocabularies: every held-out doc drawn from one
    vocabulary must be assigned that class (add-1 smoothing cannot flip
    a doc whose every token is 0-count in the other class)."""
    a = ["alpha beta gamma", "beta gamma delta alpha", "gamma alpha alpha beta"]
    b = ["omega sigma tau", "sigma tau rho omega", "tau omega omega sigma"]
    train = [(i, "A", t) for i, t in enumerate(a)] + [
        (10 + i, "B", t) for i, t in enumerate(b)
    ]
    score = [
        (100, "A", "alpha gamma beta beta"),
        (101, "B", "rho tau sigma"),
        (102, "A", "delta delta alpha"),
        (103, "B", "omega"),
    ]
    _, _, got = _fit_predict(spark, train, score)
    assert {d: r["pred_label"] for d, r in got.items()} == {
        100: "A",
        101: "B",
        102: "A",
        103: "B",
    }
    # a mixed doc leans to the majority-token class
    _, _, got = _fit_predict(spark, train, [(200, "?", "alpha beta omega")])
    assert got[200]["pred_label"] == "A"


def test_nb_tiebreak_is_smallest_label(spark):
    """Two classes trained on IDENTICAL text score identically on every
    doc — the argmax must resolve to the lexicographically smallest
    label in a deterministic way (catalog rule 4 order)."""
    train = [(0, "zz", "same words here"), (1, "aa", "same words here")]
    _, _, got = _fit_predict(spark, train, [(10, "?", "same words"), (11, "?", "")])
    assert got[10]["pred_label"] == "aa"
    assert got[11]["pred_label"] == "aa"


def test_nb_empty_doc_scores_prior_only(spark):
    """A zero-token doc has no likelihood term: its per-class score is
    exactly prior_milli and the argmax is the max-prior class."""
    train = [
        (0, "big", "x y"),
        (1, "big", "y z"),
        (2, "big", "z x"),
        (3, "sml", "q r"),
    ]
    model, cls, got = _fit_predict(spark, train, [(10, "?", "")])
    pri = {r["label"]: r["prior_milli"] for r in cls.collect()}
    assert got[10]["pred_label"] == "big"
    assert got[10]["n_tokens"] == 0
    assert got[10]["score_milli"] == pri["big"]


def test_nb_score_decomposition_matches_model_tables(spark):
    """nb_scores must equal prior + sum_b c_b*lw - T*denom recomputed in
    python from the COLLECTED model tables (pins the scoring join/grid
    wiring independent of the log arithmetic, which the parity tests and
    test_milli_log2_matches_float_log2 own)."""
    train = [
        (0, "A", "cat dog cat bird"),
        (1, "A", "dog dog fish"),
        (2, "B", "stone iron stone"),
        (3, "B", "iron coal"),
    ]
    score = [(10, "?", "cat stone stone dog"), (11, "?", "coal coal bird")]
    tdf = spark.createDataFrame(train, _SCHEMA)
    model, cls = nb_train(tdf, buckets=64)
    lw = {(r["label"], r["bucket"]): r["lw_milli"] for r in model.collect()}
    pd_cls = {r["label"]: (r["prior_milli"], r["denom_milli"]) for r in cls.collect()}
    got = {
        (r["_id"], r["label"]): (r["n_tokens"], r["score_milli"])
        for r in nb_scores(
            spark.createDataFrame(score, _SCHEMA), model, cls, buckets=64
        ).collect()
    }
    for did, _, text in score:
        ws = text.split(" ")
        counts: dict[int, int] = {}
        for w in ws:
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
            counts[b] = counts.get(b, 0) + 1
        for lab, (pr, dn) in pd_cls.items():
            want = pr - len(ws) * dn + sum(
                c * lw.get((lab, b), 0) for b, c in counts.items()
            )
            assert got[(did, lab)] == (len(ws), want), (did, lab)


def test_nb_model_tables_are_bounded(spark):
    """The broadcastable-artifact contract: model <= C*B rows, cls = C
    rows, and every lw/denom/prior is a plain int64 (no floats cross the
    model boundary)."""
    train = [(i, "AB"[i % 2], f"w{i} w{i % 3} w{i % 5}") for i in range(20)]
    model, cls = nb_train(spark.createDataFrame(train, _SCHEMA), buckets=32)
    m = model.collect()
    c = cls.collect()
    assert len(m) <= 2 * 32 and len(c) == 2
    assert model.schema["lw_milli"].dataType.typeName() == "long"
    assert cls.schema["prior_milli"].dataType.typeName() == "long"
    assert cls.schema["denom_milli"].dataType.typeName() == "long"
    # priors milli-log2 of class fractions: both negative (each class < D)
    assert all(r["prior_milli"] < 0 for r in c)


def test_nb_margin_separable_vocab_is_confident(spark):
    """Margin pins (r12): a held-out doc with a separable vocabulary
    scores a LARGE top1-top2 margin; an empty doc's scores collapse to
    the priors (margin = prior gap, prediction = the prior argmax)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.classify import nb_scores, nb_train

    train = spark.createDataFrame(
        [(i, "aa", "apfel brot kase wurst") for i in range(8)]
        + [(100 + i, "bb", "apple bread cheese ham") for i in range(6)],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(500, "apfel apfel brot"), (501, "apple cheese ham bread"),
         (502, "")],
        "doc_id long, text string",
    )
    model, cls = nb_train(train)
    sc = nb_scores(test, model, cls)
    w = Window.partitionBy("_id").orderBy(
        F.col("score_milli").desc(), F.col("label").asc())
    rows = sc.withColumn("rn", F.row_number().over(w)).collect()
    by = {}
    for r in rows:
        by.setdefault(r["_id"], {})[r["rn"]] = r
    assert by[500][1]["label"] == "aa" and by[501][1]["label"] == "bb"
    m500 = by[500][1]["score_milli"] - by[500][2]["score_milli"]
    m502 = by[502][1]["score_milli"] - by[502][2]["score_milli"]
    assert m500 > 5000, m500          # separable vocab: decisive
    assert by[502][1]["label"] == "aa"  # prior argmax (8 > 6 train docs)
    prior_gap = {r["label"]: r["prior_milli"] for r in cls.collect()}
    assert m502 == prior_gap["aa"] - prior_gap["bb"]
