"""Unit tests for the dataset-curation operators (operators/curation.py) —
split stability, stratified-sample exactness, quota caps, packing bounds,
contamination detection, and PII scrubbing on constructed inputs (the
synthetic documents corpus has no real PII, so the scrub behavior is pinned
here on purpose-built rows)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import curation as C


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("lang"),
        (F.col("id") % 5).cast("string").alias("source"),
        ((F.col("id") * 37) % 100 + 1).cast("int").alias("n_tok"),
    )


def test_split_fractions_and_determinism(spark):
    df = C.train_val_test_split(_docs(spark), "doc_id")
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # pure function of the id: same assignment on a re-run and on a subset
    again = {
        r["doc_id"]: r["split"]
        for r in C.train_val_test_split(_docs(spark), "doc_id").collect()
    }
    subset = C.train_val_test_split(
        _docs(spark).where(F.col("doc_id") < 50), "doc_id"
    ).collect()
    for r in subset:
        assert again[r["doc_id"]] == r["split"]


def test_stratified_sample_exact_per_stratum(spark):
    frac = 0.1
    base = _docs(spark)
    expected = {
        r["lang"]: math.ceil(r["n"] * frac)
        for r in base.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in C.stratified_sample(base, "lang", "doc_id", frac)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected


def test_cap_per_group_keeps_top_k(spark):
    capped = C.cap_per_group(
        _docs(spark), "source", [F.col("n_tok").desc(), F.col("doc_id")], 3
    )
    per_group = capped.groupBy("source").agg(
        F.count("*").alias("n"), F.min("n_tok").alias("worst")
    )
    for r in per_group.collect():
        assert r["n"] == 3
    # kept rows are the k largest: every kept n_tok >= every dropped n_tok
    kept_min = {r["source"]: r["worst"] for r in per_group.collect()}
    dropped = _docs(spark).join(
        capped.select("doc_id", F.lit(1).alias("_k")), "doc_id", "left_anti"
    )
    for r in dropped.groupBy("source").agg(F.max("n_tok").alias("best")).collect():
        assert r["best"] <= kept_min[r["source"]]


def test_pack_windows_sequential_bins(spark):
    budget = 100
    packed = C.pack_context_windows(
        _docs(spark), "source", "doc_id", "n_tok", budget
    )
    rows = sorted(
        packed.select("source", "doc_id", "n_tok", "bin_id").collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    by_src: dict[str, int] = {}
    cum: dict[str, int] = {}
    for r in rows:
        start = cum.get(r["source"], 0)
        assert r["bin_id"] == start // budget
        # bins never go backwards within a group
        assert r["bin_id"] >= by_src.get(r["source"], 0)
        by_src[r["source"]] = r["bin_id"]
        cum[r["source"]] = start + r["n_tok"]


def test_ngram_contamination_detects_shared_shingles(spark):
    # doc_id buckets: hash-dependent, so pick eval membership by bucket
    texts = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(40)]
        + [(100 + i, f"unique{i} words{i} only{i} here{i} now{i}") for i in range(10)],
        "doc_id long, text string",
    )
    hb = {
        r["doc_id"]: r["b"]
        for r in texts.select(
            "doc_id", C.hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    eval_ids = {d for d, b in hb.items() if b < 5000}
    train_shared = {d for d in hb if d < 100 and d not in eval_ids}
    assert eval_ids and train_shared, "need both sides; widen the bucket"
    out = {
        r["doc"]: r["n_shared_shingles"]
        for r in C.ngram_contamination(
            texts, "text", "doc_id", eval_bucket_lt=5000, max_df=100
        ).collect()
    }
    # every non-eval doc sharing the common text is flagged; unique docs not
    assert set(out) == train_shared
    for d in train_shared:
        assert out[d] == 3  # three 3-shingles in a 5-token text


def test_ngram_contamination_drops_stop_shingles(spark):
    texts = spark.createDataFrame(
        [(i, "same same same same same") for i in range(30)],
        "doc_id long, text string",
    )
    out = C.ngram_contamination(
        texts, "text", "doc_id", eval_bucket_lt=5000, max_df=10
    ).collect()
    assert out == []  # DF=30 > 10 ⇒ the only shingle is boilerplate


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 415-555-0199 or 415 555 0123"),
            (3, "ssn 123-45-6789 on file"),
            (4, "clean text with no pii at all"),
            (5, "both a@b.io and 999-88-7777"),
        ],
        "id long, t string",
    )
    cnt = C.pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            cnt["email"].alias("e"),
            cnt["phone"].alias("p"),
            cnt["ssn"].alias("s"),
            C.scrub_pii(F.col("t")).alias("scrubbed"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["s"]) == (1, 0, 0)
    assert out[1]["scrubbed"] == "mail <EMAIL> now"
    assert (out[2]["e"], out[2]["p"], out[2]["s"]) == (0, 2, 0)
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert (out[3]["e"], out[3]["p"], out[3]["s"]) == (0, 0, 1)
    assert out[3]["scrubbed"] == "ssn <SSN> on file"
    assert (out[4]["e"], out[4]["p"], out[4]["s"]) == (0, 0, 0)
    assert out[4]["scrubbed"] == "clean text with no pii at all"
    assert (out[5]["e"], out[5]["p"], out[5]["s"]) == (1, 0, 1)
    assert out[5]["scrubbed"] == "both <EMAIL> and <SSN>"


def test_connected_components_transitive_chain(spark):
    """A–B, B–C chain collapses to one component labelled by the smallest
    id; D–E is a separate component; ids untouched by any pair don't
    appear (they are their own singleton groups by definition)."""
    from kinesis_stream_consumer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4), (9, 7), (7, 8), (8, 9)],
        "doc_a long, doc_b long",
    )
    out = {
        r["node"]: r["component_id"] for r in connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7, 9: 7}


def test_mixture_sample_strict_fills_shortfall_sources(spark):
    """The hash-threshold prefilter is statistical: with a crushed margin
    and no slack it under-fills sources whose ids hash high. strict=True
    must detect the shortfall and deliver the exact per-source targets
    (capped at source size) anyway; the loose mode documents the bound."""
    df = _docs(spark, 1000)
    weights = {"0": 4, "1": 2}
    loose = C.mixture_sample(
        df, "source", "doc_id", weights, margin=0.6, slack_rows=0
    )
    strict = C.mixture_sample(
        df, "source", "doc_id", weights, margin=0.6, slack_rows=0, strict=True
    )

    import math

    counts = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(counts.values())
    t_total = n_total // 5
    sumw = sum(weights.get(s, 1) for s in counts)
    expected = {
        s: min(counts[s], math.floor(weights.get(s, 1) / sumw * t_total + 0.5))
        for s in counts
    }
    got_strict = {
        r["source"]: r["n"]
        for r in strict.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got_strict == {s: t for s, t in expected.items() if t > 0}

    got_loose = {
        r["source"]: r["n"]
        for r in loose.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # the crushed prefilter must have under-filled at least one source —
    # otherwise this test isn't exercising the fallback at all
    assert any(got_loose.get(s, 0) < t for s, t in expected.items())

    # determinism: strict keeps smallest-hash-first selection
    a = sorted(r["doc_id"] for r in strict.collect())
    b = sorted(r["doc_id"] for r in C.mixture_sample(
        df, "source", "doc_id", weights, margin=0.6, slack_rows=0, strict=True
    ).collect())
    assert a == b
