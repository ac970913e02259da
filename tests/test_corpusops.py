"""Operator-level tests for functions/corpusops.py — the edge behaviors
the sf0.001 oracle gate can't exercise (all-boilerplate docs, budget
properties, replacement ordering, determinism)."""

import math

from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_boilerplate_all_boilerplate_doc_survives_empty(spark):
    from extractpdf4j_spark.functions.corpusops import strip_boilerplate
    bp = "all rights reserved"
    rows = ([(i, f"unique body {i}\n{bp}") for i in range(5)]
            + [(99, bp)])  # doc 99 is nothing but the boilerplate line
    out = {r["doc_id"]: r for r in
           strip_boilerplate(_docs_df(spark, rows), min_docs=3).collect()}
    assert out[99]["text"] == ""
    assert out[99]["n_lines_kept"] == 0
    assert out[99]["n_lines_dropped"] == 1
    for i in range(5):
        assert out[i]["text"] == f"unique body {i}"
        assert out[i]["n_lines_kept"] == 1
        assert out[i]["n_lines_dropped"] == 1


def test_strip_boilerplate_preserves_line_order(spark):
    from extractpdf4j_spark.functions.corpusops import strip_boilerplate
    bp = "footer"
    rows = [(i, f"a{i}\n{bp}\nb{i}\nc{i}") for i in range(4)]
    out = strip_boilerplate(_docs_df(spark, rows), min_docs=3).collect()
    for r in out:
        i = r["doc_id"]
        assert r["text"] == f"a{i}\nb{i}\nc{i}"


def test_hash_sample_deterministic_and_nested(spark):
    from extractpdf4j_spark.functions.corpusops import hash_sample
    d = _docs_df(spark, [(i, f"t{i}") for i in range(400)])
    k200 = {r["doc_id"] for r in hash_sample(d, 200_000).collect()}
    k200b = {r["doc_id"] for r in hash_sample(d, 200_000).collect()}
    k500 = {r["doc_id"] for r in hash_sample(d, 500_000).collect()}
    assert k200 == k200b                 # run-to-run deterministic
    assert k200 <= k500                  # thresholds nest
    assert 0 < len(k200) < len(k500) < 400


def test_quota_sample_caps_every_group(spark):
    from extractpdf4j_spark.functions.corpusops import quota_sample
    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, grp string")
    out = quota_sample(d, group_col="grp", cap=7, key_col="doc_id")
    per = out.groupBy("grp").count().collect()
    assert all(r["count"] == 7 for r in per)
    ranks = out.filter(F.col("grp") == "g0") \
        .select("sample_rank").orderBy("sample_rank").collect()
    assert [r["sample_rank"] for r in ranks] == list(range(1, 8))


def test_pack_shards_budget_property(spark):
    from extractpdf4j_spark.functions.corpusops import pack_shards
    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_shards(d, token_col="n_tok", budget=1500, n_buckets=4,
                      key_col="doc_id").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault((r["bucket"], r["shard"]), []).append(r["n_tok"])
    for (b, s), toks in by_shard.items():
        # prefix-sum packing: a shard holds < budget before its last doc
        assert sum(toks) - max(toks) < 1500, (b, s, toks)
    # shard ids are dense from 0 within each bucket
    buckets = {}
    for (b, s) in by_shard:
        buckets.setdefault(b, set()).add(s)
    for b, shards in buckets.items():
        assert shards == set(range(len(shards)))


def test_pii_scrub_replacement_and_order(spark):
    from extractpdf4j_spark.functions.corpusops import pii_scrub
    rows = [(1, "mail a.b+c@x-y.example.org then 192.168.0.1 then 4111111111111111"),
            (2, "clean text, no pii at all"),
            (3, "ip 8.8.8.8 twice 8.8.4.4 and num 1234567")]
    out = {r["doc_id"]: r for r in
           pii_scrub(_docs_df(spark, rows)).collect()}
    assert out[1]["text"] == "mail <EMAIL> then <IP> then <NUM>"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_longnums"]) == (1, 1, 1)
    assert out[2]["text"] == "clean text, no pii at all"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_longnums"]) == (0, 0, 0)
    assert out[3]["text"] == "ip <IP> twice <IP> and num <NUM>"
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_longnums"]) == (0, 2, 1)


def test_unigram_logprob_hand_computed(spark):
    from extractpdf4j_spark.functions.corpusops import unigram_logprob
    # corpus: "a a b" + "b c" -> counts a:2 b:2 c:1, total 5
    d = _docs_df(spark, [(1, "a a b"), (2, "b c")])
    out = {r["doc_id"]: r for r in unigram_logprob(d).collect()}
    lp = lambda c: math.log(c / 5.0)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_logprob"] - round((2 * lp(2) + lp(2)) / 3, 6)) < 1e-9
    assert out[2]["n_tokens"] == 2
    assert abs(out[2]["avg_logprob"] - round((lp(2) + lp(1)) / 2, 6)) < 1e-9


def test_chunk_documents_windows_and_short_doc(spark):
    from extractpdf4j_spark.functions.corpusops import chunk_documents
    d = _docs_df(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
                         (2, "only two")])
    out = chunk_documents(d, chunk_tokens=4, overlap=1).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # stride 3: chunks cover [0:4) [3:7) [6:10)
    assert set(by[1]) == {0, 1, 2}
    assert by[1][0]["chunk"] == "t0 t1 t2 t3"
    assert by[1][1]["chunk"] == "t3 t4 t5 t6"
    assert by[1][2]["chunk"] == "t6 t7 t8 t9"
    assert all(by[1][k]["n_chunk_tokens"] == 4 for k in range(3))
    # sub-chunk doc yields exactly one short chunk
    assert set(by[2]) == {0}
    assert by[2][0]["chunk"] == "only two"
    assert by[2][0]["n_chunk_tokens"] == 2


def test_repetition_metrics_hand_computed(spark):
    from extractpdf4j_spark.functions.corpusops import repetition_metrics
    d = _docs_df(spark, [(1, "a a a b"), (2, "x x x x x"),
                         (3, "all words differ here fine")])
    out = {r["doc_id"]: r for r in repetition_metrics(d, n=3).collect()}
    # doc1 trigrams: "a a a", "a a b" -> all distinct; top token a = 3/4
    assert (out[1]["n_grams"], out[1]["distinct_grams"]) == (2, 2)
    assert out[1]["dup_gram_frac"] == 0.0
    assert abs(out[1]["top_token_frac"] - 0.75) < 1e-9
    # doc2 trigrams: 3 x "x x x" -> 1 distinct; dup 2/3; top 1.0
    assert (out[2]["n_grams"], out[2]["distinct_grams"]) == (3, 1)
    assert abs(out[2]["dup_gram_frac"] - round(1 - 1 / 3, 6)) < 1e-9
    assert out[2]["top_token_frac"] == 1.0
    # doc3: no repetition at all
    assert out[3]["dup_gram_frac"] == 0.0
    assert abs(out[3]["top_token_frac"] - 0.2) < 1e-9


def test_chunk_documents_rejects_bad_params(spark):
    import pytest
    from extractpdf4j_spark.functions.corpusops import chunk_documents
    d = _docs_df(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=64, overlap=-36)  # would skip tokens
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=0, overlap=0)


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 60), min_size=1, max_size=20))
def test_chunk_documents_cover_all_tokens_property(spark, ns):
    """Every token appears in the chunk stream, reconstruction by
    dropping each non-first chunk's leading overlap is exact, and no
    chunk exceeds the window."""
    from extractpdf4j_spark.functions.corpusops import chunk_documents
    chunk, overlap = 8, 3
    docs = [(i, " ".join(f"t{i}x{j}" for j in range(n)))
            for i, n in enumerate(ns)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(d, chunk_tokens=chunk, overlap=overlap).collect()
    by = {}
    for r in out:
        assert r["n_chunk_tokens"] <= chunk
        by.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    assert set(by) == set(range(len(ns)))
    for i, n in enumerate(ns):
        chunks = [by[i][k] for k in sorted(by[i])]
        recon = chunks[0].split(" ")
        for c in chunks[1:]:
            recon += c.split(" ")[overlap:]
        assert recon == [f"t{i}x{j}" for j in range(n)]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 500), min_size=1, max_size=60))
def test_pack_shards_partition_property(spark, toks):
    """pack_shards is a partition of the input (every doc in exactly one
    shard), budget holds before each shard's last doc, shard ids dense."""
    from extractpdf4j_spark.functions.corpusops import pack_shards
    rows = [(i, t) for i, t in enumerate(toks)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_shards(d, token_col="n_tok", budget=900, n_buckets=3,
                      key_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(toks)))
    by_shard = {}
    for r in out:
        by_shard.setdefault((r["bucket"], r["shard"]), []).append(r["n_tok"])
    buckets = {}
    for (b, s), tk in by_shard.items():
        assert sum(tk) - max(tk) < 900
        buckets.setdefault(b, set()).add(s)
    for shards in buckets.values():
        assert shards == set(range(len(shards)))


def test_decontaminate_counts_and_removal(spark):
    from extractpdf4j_spark.functions.corpusops import (decontaminate,
                                                        remove_contaminated)
    corpus = spark.createDataFrame([
        ("c0", "alpha beta gamma delta epsilon"),      # shares a trigram
        ("c1", "one two three four five"),             # clean
        ("c2", "alpha beta gamma zeta"),               # shares 1 of 2
        ("c3", "six seven eight nine"),                # clean
    ], "doc_id string, text string")
    evals = spark.createDataFrame(
        [("e0", "alpha beta gamma delta")],
        "doc_id string, text string")

    flagged = {r["doc_id"]: r for r in
               decontaminate(corpus, evals, n=3).collect()}
    # c0 grams: {abg, bgd, gde}; eval grams: {abg, bgd} -> 2/3 overlap
    assert set(flagged) == {"c0", "c2"}
    assert flagged["c0"]["overlap_grams"] == 2
    assert flagged["c0"]["total_grams"] == 3
    assert abs(flagged["c0"]["overlap_frac"] - round(2 / 3, 6)) < 1e-9
    # c2 grams: {abg, bgz}; overlap {abg} -> 1/2
    assert flagged["c2"]["overlap_grams"] == 1
    assert flagged["c2"]["total_grams"] == 2

    kept = sorted(r["doc_id"]
                  for r in remove_contaminated(corpus, evals, n=3).collect())
    assert kept == ["c1", "c3"]

    # min_overlap raises the bar: only c0 reaches 2 shared grams
    strict = sorted(r["doc_id"] for r in
                    decontaminate(corpus, evals, n=3,
                                  min_overlap=2).collect())
    assert strict == ["c0"]


def test_scrub_contaminated_fragments(spark):
    from extractpdf4j_spark.functions.corpusops import scrub_contaminated
    corpus = spark.createDataFrame([
        # eval trigram embedded mid-doc (positions 5-7), uppercase to
        # prove matching is normalized but output keeps original casing
        ("s0", "t0 t1 t2 t3 t4 QA QB QC t5 t6 t7 t8"),
        ("s1", "Hello World Foo Bar"),                  # clean
        ("s2", "qa qb qc"),                             # fully contaminated
    ], "doc_id string, text string")
    evals = spark.createDataFrame([("e0", "qa qb qc")],
                                  "doc_id string, text string")

    out = scrub_contaminated(corpus, evals, n=3, window=1, min_fragment=2)
    rows = {(r["doc_id"], r["frag_id"]): r for r in out.collect()}
    # s0: hit at pos 5 -> excise tokens 4..8 -> prefix + suffix survive
    assert set(rows) == {("s0", 0), ("s0", 1), ("s1", 0)}
    assert rows[("s0", 0)]["text"] == "t0 t1 t2 t3"
    assert rows[("s0", 0)]["n_tokens"] == 4
    assert rows[("s0", 1)]["text"] == "t6 t7 t8"
    assert rows[("s0", 1)]["n_tokens"] == 3
    # clean doc passes through whole, original casing intact
    assert rows[("s1", 0)]["text"] == "Hello World Foo Bar"
    # fully-contaminated doc yields no rows (s2 absent above)

    # min_fragment drops the short suffix; frag ids stay dense from 0
    strict = {(r["doc_id"], r["frag_id"]): r["text"] for r in
              scrub_contaminated(corpus, evals, n=3, window=1,
                                 min_fragment=4).collect()}
    assert strict == {("s0", 0): "t0 t1 t2 t3",
                      ("s1", 0): "Hello World Foo Bar"}


def test_temperature_sample_quotas(spark):
    from extractpdf4j_spark.functions.corpusops import temperature_sample
    import math
    # 64 docs in "big", 4 in "small": alpha=0.5 weights 8 vs 2 -> a
    # 20-doc target gives big ceil(16)=16, small min(4, ceil(4))=4
    rows = ([(f"b{i:02d}", "big") for i in range(64)]
            + [(f"s{i}", "small") for i in range(4)])
    d = spark.createDataFrame(rows, "doc_id string, lang string")
    out = temperature_sample(d, group_col="lang", target_total=20,
                             alpha=0.5).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["sample_rank"])
    assert len(by["big"]) == 16 and sorted(by["big"]) == list(range(1, 17))
    assert len(by["small"]) == 4
    # alpha=1 reproduces natural proportions: quotas ceil(20*64/68)=19,
    # ceil(20*4/68)=2
    nat = temperature_sample(d, group_col="lang", target_total=20,
                             alpha=1.0).collect()
    byn = {}
    for r in nat:
        byn.setdefault(r["lang"], 0)
        byn[r["lang"]] += 1
    assert byn == {"big": math.ceil(20 * 64 / 68), "small": 2}
    # determinism: same input -> identical picked ids
    again = temperature_sample(d, group_col="lang", target_total=20,
                               alpha=0.5).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out)


def _plan_of(df):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scrub_contaminated_plan_broadcasts_eval_grams(spark):
    """The scrub's hit probe must stay a broadcast join of the eval
    gram set (the corpus side is never exchanged to FIND hits), even
    with auto-broadcast off — same 100 TB shape as decontaminate."""
    from extractpdf4j_spark.functions.corpusops import scrub_contaminated
    corpus = spark.range(0, 50).selectExpr(
        "CAST(id AS STRING) AS doc_id",
        "concat('w', CAST(id % 7 AS STRING), ' x y z q', "
        "CAST(id AS STRING)) AS text")
    evals = spark.createDataFrame([("e0", "w1 x y z")],
                                  "doc_id string, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # checkpoint_hits=False keeps the probe lineage visible in the
        # returned plan (the default eagerly checkpoints the hit rows,
        # which hides the already-executed broadcast from explain)
        plan = _plan_of(scrub_contaminated(corpus, evals, n=3,
                                           checkpoint_hits=False))
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_decontaminate_plan_broadcasts_eval_grams(spark):
    """Plan evidence for the 100 TB shape: the corpus gram rows probe
    the eval gram set through a BROADCAST join (the corpus side is never
    exchanged for the probe), even with auto-broadcast disabled — the
    broadcast is explicit in the operator."""
    from extractpdf4j_spark.functions.corpusops import decontaminate
    corpus = spark.range(0, 50).selectExpr(
        "CAST(id AS STRING) AS doc_id",
        "concat('w', CAST(id % 7 AS STRING), ' x y z q', "
        "CAST(id AS STRING)) AS text")
    evals = spark.createDataFrame([("e0", "w1 x y z")],
                                  "doc_id string, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan_of(decontaminate(corpus, evals, n=3))
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_temperature_sample_plan_broadcasts_quota(spark):
    """The per-group quota table attaches via broadcast; the only
    corpus-wide exchange is the per-group rank window's."""
    from extractpdf4j_spark.functions.corpusops import temperature_sample
    d = spark.range(0, 100).selectExpr(
        "CAST(id AS STRING) AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END AS lang")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan_of(temperature_sample(d, "lang", target_total=30))
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dedup_paragraphs_keep_first(spark):
    from extractpdf4j_spark.functions.corpusops import dedup_paragraphs
    d = spark.createDataFrame([
        (1, "unique alpha paragraph\nshared body text\nok"),
        (2, "shared body text\nanother unique one\nok"),
        (3, "shared body text"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(d, min_chars=5).collect()}
    # doc 1 owns the first occurrence of the shared paragraph; "ok" is
    # below min_chars so it's exempt everywhere
    assert out[1]["text"] == "unique alpha paragraph\nshared body text\nok"
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "another unique one\nok"
    assert out[2]["n_kept"] == 2 and out[2]["n_dropped"] == 1
    # doc 3 loses its only line but survives with empty text
    assert out[3]["text"] == ""
    assert out[3]["n_kept"] == 0 and out[3]["n_dropped"] == 1


def test_pack_sequences_contiguous_stream(spark):
    from extractpdf4j_spark.functions.corpusops import pack_sequences
    rows = [(i, (i * 53) % 700) for i in range(1, 120)] + [(0, 0)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(d, token_col="n_tok", seq_len=512,
                         n_buckets=4, key_col="doc_id").collect()
    assert len(out) == 120
    # the layout is one contiguous token stream: sorted by global_start,
    # each doc begins exactly where the previous one ended
    laid = sorted(out, key=lambda r: (r["global_start"], r["doc_id"]))
    pos = 0
    for r in laid:
        assert r["global_start"] == pos
        pos += r["n_tok"]
    assert pos == sum(t for _, t in rows)
    for r in out:
        assert r["seq_first"] == r["global_start"] // 512
        assert r["offset_in_seq"] == r["global_start"] % 512
        if r["n_tok"] == 0:
            assert r["n_seqs"] == 0
        else:
            last = r["global_start"] + r["n_tok"] - 1
            assert r["n_seqs"] == last // 512 - r["seq_first"] + 1


def test_pack_sequences_partition_invariant(spark):
    from extractpdf4j_spark.functions.corpusops import pack_sequences
    rows = [(i, 10 + i % 7) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = {r["doc_id"]: (r["bucket"], r["global_start"], r["n_seqs"])
         for r in pack_sequences(d, "n_tok", 64, n_buckets=4).collect()}
    # the layout is a pure function of (id hash, token counts): the
    # same corpus arriving in any partitioning maps onto the same
    # sequences — the reproducibility a resumable tokenizer run needs
    b = {r["doc_id"]: (r["bucket"], r["global_start"], r["n_seqs"])
         for r in pack_sequences(d.repartition(7), "n_tok", 64,
                                 n_buckets=4).collect()}
    assert a == b


def test_mix_corpora_budget_and_boundary(spark):
    import pytest
    from extractpdf4j_spark.functions.corpusops import mix_corpora
    rows = [(i, "g%d" % (i % 3), 100) for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
    out = mix_corpora(d, group_col="grp", weights={"g0": 3, "g1": 1},
                      target_tokens=2000, token_col="n_tok").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["grp"], []).append(r)
    assert set(by_g) == {"g0", "g1"}          # unweighted g2 dropped
    # quotas: g0 = 2000*3/4 = 1500 tokens, g1 = 500; boundary doc kept
    # means totals land in [quota, quota + one doc)
    assert sum(r["n_tok"] for r in by_g["g0"]) == 1500
    assert sum(r["n_tok"] for r in by_g["g1"]) == 500
    for rs in by_g.values():                  # kept docs START in-budget
        for r in rs:
            assert r["cum_before"] * 4 < 2000 * (3 if r["grp"] == "g0"
                                                 else 1)
    with pytest.raises(ValueError):
        mix_corpora(d, "grp", {}, 100, "n_tok")
    with pytest.raises(ValueError):
        mix_corpora(d, "grp", {"g0": 0.5}, 100, "n_tok")


def test_mix_corpora_exhausted_group_keeps_everything(spark):
    from extractpdf4j_spark.functions.corpusops import mix_corpora
    rows = [(i, "small" if i < 3 else "big", 50) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
    out = mix_corpora(d, "grp", {"small": 1, "big": 1},
                      target_tokens=10_000, token_col="n_tok").collect()
    small = [r for r in out if r["grp"] == "small"]
    assert len(small) == 3                    # quota exceeds the group


def test_logprob_buckets_tiers(spark):
    from extractpdf4j_spark.functions.corpusops import logprob_buckets
    rows = [(1, "a a", "en"), (2, "a b", "en"), (3, "c d", "en")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in
           logprob_buckets(d, n_buckets=3, group_col="lang").collect()}
    # corpus unigrams: a:3 b:1 c:1 d:1 of 6 -> doc1 (ln .5) most fluent,
    # doc3 (ln 1/6) least; head/middle/tail in that order
    assert (out[1]["bucket"], out[1]["tier"]) == (1, "head")
    assert (out[2]["bucket"], out[2]["tier"]) == (2, "middle")
    assert (out[3]["bucket"], out[3]["tier"]) == (3, "tail")
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] \
        > out[3]["avg_logprob"]
    two = {r["doc_id"]: r["tier"] for r in
           logprob_buckets(d, n_buckets=2, group_col="lang").collect()}
    assert set(two.values()) == {"b1", "b2"}  # non-3 bucket labels


def test_bigram_logprob_backoff_branches(spark):
    import math
    from extractpdf4j_spark.functions.corpusops import bigram_logprob
    lm = spark.createDataFrame(
        [(101, "a b"), (102, "a b"), (103, "a c")],
        "doc_id long, text string")
    # LM: uni a:3 b:2 c:1 / total 6; bigrams (a,b):2 (a,c):1
    scored = spark.createDataFrame(
        [(1, "a b"),    # seen bigram: ln(3/6), ln(2/3)
         (2, "b a"),    # unseen bigram, known words: ln(2/6), ln(.4*3/6)
         (3, "z"),      # OOV first token: ln(1/6)
         (4, "a z")],   # OOV continuation: ln(3/6), ln(.4*1/6)
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in bigram_logprob(scored, lm_df=lm, alpha=0.4).collect()}
    exp = {
        1: (math.log(3 / 6) + math.log(2 / 3)) / 2,
        2: (math.log(2 / 6) + math.log(0.4 * (3 / 6))) / 2,
        3: math.log(1 / 6),
        4: (math.log(3 / 6) + math.log(0.4 * (1 / 6))) / 2,
    }
    for d, e in exp.items():
        assert out[d]["avg_logprob"] == round(e, 6), d
    assert out[1]["n_tokens"] == 2 and out[3]["n_tokens"] == 1
    # self-scoring default: every bigram is in its own LM, so the
    # backoff branch never fires and scores are finite conditionals
    self_scores = bigram_logprob(lm).collect()
    assert all(r["avg_logprob"] < 0 for r in self_scores)


def test_clean_text_rules_in_order(spark):
    from extractpdf4j_spark.functions.corpusops import clean_text
    rows = [
        (1, "\ufeffa\u200bb\x07c"),     # zero-width + control drop
        (2, "x\u00a0y\u2003z"),          # unicode spaces -> ' '
        (3, "line \t\nnext"),                 # trailing ws stripped
        (4, "p1\n\n\n\n\np2"),                # >=3 newlines -> 2
        (5, "a   b\t\tc"),                    # space runs collapse
        (6, "  padded  "),                    # trim
        (7, ""),                              # empty survives empty
    ]
    out = {r["doc_id"]: r for r in
           clean_text(spark.createDataFrame(
               rows, "doc_id long, text string")).collect()}
    assert out[1]["text"] == "abc"
    assert out[2]["text"] == "x y z"
    assert out[3]["text"] == "line\nnext"
    assert out[4]["text"] == "p1\n\np2"
    assert out[5]["text"] == "a b c"
    assert out[6]["text"] == "padded"
    assert out[7]["text"] == "" and out[7]["n_chars_after"] == 0
    assert out[1]["n_chars_before"] == 6 and out[1]["n_chars_after"] == 3
    # idempotent: cleaning cleaned text is a no-op
    again = {r["doc_id"]: r["text"] for r in clean_text(
        spark.createDataFrame(
            [(k, v["text"]) for k, v in out.items()],
            "doc_id long, text string")).collect()}
    assert again == {k: v["text"] for k, v in out.items()}


def test_corpus_report_agrees_with_dedup(spark):
    from extractpdf4j_spark.functions.corpusops import corpus_report
    from extractpdf4j_spark.functions.dedup import dedup_keep_one
    rows = [(i, "s%d" % (i % 2), ["en", "fr"][i % 2],
             "dup text" if i < 6 and i % 2 == 0 else f"unique {i}")
            for i in range(12)]
    d = spark.createDataFrame(rows,
                              "doc_id long, source string, lang string, "
                              "text string")
    rep = {r["source"]: r for r in corpus_report(d).collect()}
    # s0: docs 0,2,4 share "dup text" (+"Dup  Text" would too); 6 docs,
    # 4 distinct
    assert rep["s0"]["n_docs"] == 6
    assert rep["s0"]["n_distinct_texts"] == 4
    assert rep["s0"]["dup_frac"] == round(1 - 4 / 6, 6)
    assert rep["s1"]["dup_frac"] == 0.0
    assert rep["s0"]["n_langs"] == 1 and rep["s1"]["n_langs"] == 1
    # the report's promise: dup_frac predicts dedup_keep_one exactly
    for s in ("s0", "s1"):
        kept = dedup_keep_one(d.filter(F.col("source") == s)).count()
        assert kept == rep[s]["n_distinct_texts"]


def test_split_corpus_deterministic_partition(spark):
    import pytest
    from extractpdf4j_spark.functions.corpusops import split_corpus
    d = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = split_corpus(d, {"train": 8, "val": 1, "test": 1}).collect()
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert len(by["train"]) > len(by["val"])          # weights respected
    assert sum(len(v) for v in by.values()) == 1000   # total partition
    # stable: same assignment on a different partitioning
    again = {r["doc_id"]: r["split"]
             for r in split_corpus(d.repartition(7),
                                   {"train": 8, "val": 1,
                                    "test": 1}).collect()}
    for s, ids in by.items():
        assert all(again[i] == s for i in ids)
    # growing the corpus never moves an existing row
    grown = split_corpus(
        spark.createDataFrame([(i,) for i in range(2000)], "doc_id long"),
        {"train": 8, "val": 1, "test": 1}).collect()
    gmap = {r["doc_id"]: r["split"] for r in grown}
    for s, ids in by.items():
        assert all(gmap[i] == s for i in ids)
    with pytest.raises(ValueError):
        split_corpus(d, {"train": 0.8, "val": 0.2})


def test_leakage_safe_split_keeps_clusters_together(spark):
    from extractpdf4j_spark.functions.corpusops import leakage_safe_split
    base = ("long shared body of text that minhash will band together "
            "word word word alpha beta gamma delta epsilon zeta")
    rows = ([(i, base + f" tail{i % 2}") for i in range(6)]      # near-dups
            + [(100 + i, " ".join(f"u{i}w{j}" for j in range(12)))
               for i in range(20)])  # pairwise-disjoint vocabularies
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           leakage_safe_split(d, {"a": 1, "b": 1},
                              max_bucket=None).collect()}
    assert len(out) == 26
    # the six near-dups share one representative and thus one split
    reps = {out[i]["rep_id"] for i in range(6)}
    assert reps == {0}
    splits = {out[i]["split"] for i in range(6)}
    assert len(splits) == 1
    # singletons represent themselves
    assert all(out[100 + i]["rep_id"] == 100 + i for i in range(20))


def test_quality_classifier_separates_and_handles_edges(spark):
    from pyspark.sql import functions as F
    from extractpdf4j_spark.functions.corpusops import (
        classifier_score, nb_train_quality_classifier)
    rows = ([(i, "excellent lucid prose paragraph", True)
             for i in range(10)]
            + [(100 + i, "zzz spam junk garble", False) for i in range(10)]
            + [(200, "", True)])  # zero-token doc
    df = spark.createDataFrame(rows, "doc_id long, text string, good boolean")
    w, b = nb_train_quality_classifier(df, "good", buckets=256)
    out = {r["doc_id"]: r for r in
           classifier_score(df, w, b, buckets=256).collect()}
    assert all(out[i]["score"] > 0.9 and out[i]["keep"] == 1
               for i in range(10))
    assert all(out[100 + i]["score"] < 0.1 and out[100 + i]["keep"] == 0
               for i in range(10))
    # zero-token doc falls back to the prior (11 good vs 10 bad -> keep)
    assert out[200]["n_tokens"] == 0 and out[200]["keep"] == 1
    # keep flag is exactly the score >= 0.5 decision
    assert all((r["score"] >= 0.5) == (r["keep"] == 1)
               for r in out.values())
    # unseen doc scores through the same weights without retraining
    new = spark.createDataFrame([(300, "lucid prose with zzz")],
                                "doc_id long, text string")
    got = classifier_score(new, w, b, buckets=256).collect()[0]
    assert got["n_tokens"] == 4


def test_snapshot_diff_all_statuses(spark):
    from extractpdf4j_spark.functions.corpusops import snapshot_diff
    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "goes away")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "  SAME   text "),     # normalized-identical -> unchanged
         (2, "has changed"),
         (4, "brand new")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def _h60(s: str) -> int:
    import hashlib
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def test_pack_multimodal_matches_scalar_replay(spark):
    from extractpdf4j_spark.functions.corpusops import pack_multimodal
    L = 32
    docs = []
    for i in range(12):
        spans = []
        words = ["w%d" % k for k in range(5 + (i * 7) % 40)]
        for c in range(0, len(words), 6):
            spans.append(("text", " ".join(words[c:c + 6]), None, c))
            if i % 2 == 0 and (c // 6) % 2 == 1:
                spans.append(("image", None, f"img:{i}:{c}", c))
        if i % 5 == 0:
            spans.append(("audio", None, f"aud:{i}", 999))
        docs.append((i, spans))
    d = spark.createDataFrame(
        docs, "doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    out = pack_multimodal(d, seq_len=L, media_costs={"image": 7},
                          default_media_cost=13, n_buckets=3).collect()

    # scalar replay: same hash order, same greedy atomic-media fold
    span_rows = []
    for i, spans in docs:
        for sidx, (kind, text, ref, off) in enumerate(spans):
            cost = (len((text or "").split()) or 1) if kind == "text" \
                else (7 if kind == "image" else 13)
            span_rows.append((_h60(i) % 3, _h60(i), i, sidx, kind, cost))
    expected = {}
    for b in range(3):
        rows = sorted([r for r in span_rows if r[0] == b],
                      key=lambda r: (r[1], r[2], r[3]))
        pos = 0
        for _, _, i, sidx, kind, cost in rows:
            pad = 0
            if kind != "text":
                r = pos % L
                if r > 0 and r + cost > L:
                    pad = L - r
            gs = pos + pad
            expected[(i, sidx)] = (b, cost, gs, pad, gs // L, gs % L,
                                   0 if cost == 0 else
                                   (gs % L + cost + L - 1) // L)
            pos = gs + cost
    assert len(out) == len(expected)
    for r in out:
        exp = expected[(r["doc_id"], r["span_idx"])]
        got = (r["bucket"], r["cost"], r["global_start"], r["pad_before"],
               r["seq_first"], r["offset_in_seq"], r["n_seqs"])
        assert got == exp, (r["doc_id"], r["span_idx"], got, exp)
    # media atomicity: never crosses a boundary, exactly one sequence
    for r in out:
        if r["kind"] != "text":
            assert r["offset_in_seq"] + r["cost"] <= L
            assert r["n_seqs"] == 1


def test_pack_multimodal_partition_invariant_and_validation(spark):
    import pytest as _pytest
    from extractpdf4j_spark.functions.corpusops import pack_multimodal
    d = spark.createDataFrame(
        [(i, [("text", "a b c d e", None, 0),
              ("image", None, "m%d" % i, 1)]) for i in range(20)],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    key = lambda rows: sorted((r["doc_id"], r["span_idx"],
                               r["global_start"], r["pad_before"])
                              for r in rows)
    a = key(pack_multimodal(d.repartition(2), 16, media_costs={"image": 9},
                            default_media_cost=9).collect())
    b = key(pack_multimodal(d.repartition(8), 16, media_costs={"image": 9},
                            default_media_cost=9).collect())
    assert a == b
    with _pytest.raises(ValueError):
        pack_multimodal(d, 16, media_costs={"image": 17},
                        default_media_cost=9)
    with _pytest.raises(ValueError):
        pack_multimodal(d, 16, default_media_cost=0)


def test_nfc_normalize_text_composition_and_nulls(spark):
    """Decomposed sequences compose; already-composed text is a no-op;
    NFC (not NFKC) leaves compatibility ligatures alone; NULL text
    passes through with changed=0."""
    from extractpdf4j_spark.functions.corpusops import nfc_normalize_text
    rows = [(1, "cafe\u0301"), (2, "caf\u00e9"),
            (3, "\ufb01sh"), (4, None)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in nfc_normalize_text(d).collect()}
    assert out[1]["text"] == out[2]["text"] == "café"
    assert (out[1]["changed"], out[2]["changed"]) == (1, 0)
    assert out[3]["text"] == "ﬁsh" and out[3]["changed"] == 0
    assert out[4]["text"] is None and out[4]["changed"] == 0
