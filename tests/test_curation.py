"""Corpus-curation operators: deterministic sampling, PII scrubbing,
and embedding-space near-duplicate clustering.

The sampling tests pin the properties the docstrings promise —
stability (pure function of id+seed, independent of partitioning) and
monotonicity (raising the rate only adds rows) — because those, not
any particular kept-set, are what make the operator safe to re-run on
a 1000-executor cluster mid-pipeline.  PII scrubbing is tested on
planted spans (the synthetic corpus contains none).
"""

import pytest

from pyspark.sql import functions as F

from graphlab_spark.functions.curation import (
    hash_sample,
    scrub_pii,
    stratified_sample,
)
from graphlab_spark.functions.similarity import cosine_dup_clusters


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc number {i} body text", ["en", "es", "zh"][i % 3])
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_sample_deterministic_and_partition_invariant(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).collect())
    b = sorted(r.doc_id for r in
               hash_sample(docs.repartition(7), 0.3).collect())
    assert a == b and 0 < len(a) < 300


def test_hash_sample_monotone_in_rate(spark, docs):
    small = {r.doc_id for r in hash_sample(docs, 0.2).collect()}
    big = {r.doc_id for r in hash_sample(docs, 0.6).collect()}
    assert small < big  # strictly grows, never swaps


def test_hash_sample_rate_roughly_honored(spark, docs):
    n = hash_sample(docs, 0.5).count()
    assert 0.35 * 300 <= n <= 0.65 * 300


def test_stratified_rates_per_stratum(spark, docs):
    kept = stratified_sample(
        docs, "lang", {"en": 1.0, "es": 0.0}, default_rate=0.5)
    by_lang = {r.lang: r.n for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == 100          # rate 1.0 keeps all
    assert "es" not in by_lang               # rate 0.0 keeps none
    assert 25 <= by_lang.get("zh", 0) <= 75  # default 0.5


def test_stratified_subset_of_hash_sample(spark, docs):
    """Same draw per doc => a stratum at rate r equals hash_sample(r)
    restricted to that stratum (the cross-operator consistency that
    makes staged curation reproducible)."""
    strat = {r.doc_id for r in stratified_sample(
        docs, "lang", {"en": 0.4}, default_rate=0.0).collect()}
    plain = {r.doc_id for r in hash_sample(
        docs.filter(F.col("lang") == "en"), 0.4).collect()}
    assert strat == plain


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "mail bob@example.com and alice@test.org now"),
        (2, "call 555-123-4567 or +1 555.987.6543 ok"),
        (3, "host 10.0.0.1 and 192.168.1.255 up"),
        (4, "clean text, no pii here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[1].n_emails == 2 and out[1].text.count("<EMAIL>") == 2
    assert "bob@" not in out[1].text
    assert out[2].n_phones == 2 and "<PHONE>" in out[2].text
    assert out[3].n_ips == 2 and out[3].text.count("<IP>") == 2
    assert out[4].text == "clean text, no pii here"
    assert (out[4].n_emails, out[4].n_phones, out[4].n_ips) == (0, 0, 0)


def test_scrub_pii_email_not_rescanned_as_phone(spark):
    # digit-heavy email: local part would phone-match if scrubbed late
    df = spark.createDataFrame(
        [(1, "x 555-123-4567@example.com y")], "doc_id long, text string")
    r = scrub_pii(df).collect()[0]
    assert r.n_emails == 1 and r.n_phones == 0


def test_cosine_dup_clusters_transitive(spark):
    # a~b and b~c above tau but a~c below: CC must still merge all three
    va = [1.0, 0.0]
    vb = [0.9, 0.4358898943540674]   # cos(a,b) ~= 0.9
    vc = [0.62, 0.7846018098373213]  # cos(b,c) ~= 0.9, cos(a,c) ~= 0.62
    rows = [(0, va), (1, vb), (2, vc), (3, [-1.0, 0.0]), (4, [-1.0, 0.01])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.canonical_id
           for r in cosine_dup_clusters(emb, tau=0.85).collect()}
    assert out[0] == out[1] == out[2] == 0   # one transitive cluster
    assert out[3] == out[4] == 3             # near-parallel negatives
    assert len(out) == 5


def test_decontaminate_planted_leak(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            # verbatim copy: every 5-gram position hits
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # partial overlap: one leaked 5-token span inside fresh text
            (2, "one two three alpha beta gamma delta epsilon nine ten"),
            # disjoint vocabulary: zero hits
            (3, "red orange yellow green blue indigo violet pink"),
            # shorter than n: zero n-grams, uncontaminated
            (4, "tiny doc"),
        ],
        "doc_id long, text string")
    from graphlab_spark.functions.curation import decontaminate
    out = {r.doc_id: r for r in decontaminate(corpus, bench, n=5).collect()}
    assert out[1].n_hits == out[1].n_ngrams == 4
    assert out[1].hit_frac == 1.0 and out[1].contaminated == 1
    assert out[2].n_hits == 1 and out[2].contaminated == 1
    assert out[3].n_hits == 0 and out[3].contaminated == 0
    assert out[4].n_ngrams == 0 and out[4].hit_frac == 0.0
    assert out[4].contaminated == 0


def test_decontaminate_hash_path_matches_portable(spark, docs):
    from graphlab_spark.functions.curation import decontaminate
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    a = sorted(map(tuple, decontaminate(corpus, bench, n=3,
                                        portable=True).collect()))
    b = sorted(map(tuple, decontaminate(corpus, bench, n=3,
                                        portable=False).collect()))
    assert a == b


def test_pack_sequences_invariants(spark):
    from graphlab_spark.functions.curation import pack_sequences
    rows = [(i, " ".join(f"w{j}" for j in range((i * 13) % 37 + 1)))
            for i in range(120)] + [(999, "   ")]  # blank doc dropped
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=16, shards=4).collect()
    assert {r.doc_id for r in out} == set(range(120))
    # slices of one doc are contiguous from 0 and sum to its tokens
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r.tok_from)
        assert rs[0].tok_from == 0
        assert all(a.tok_to == b.tok_from for a, b in zip(rs, rs[1:]))
        assert rs[-1].tok_to == (did * 13) % 37 + 1
        # one shard per doc; chunk indices consecutive
        assert len({r.shard for r in rs}) == 1
        cis = [r.chunk_idx for r in rs]
        assert cis == list(range(cis[0], cis[0] + len(cis)))
    # every chunk except the last of each shard holds exactly budget
    fill, last = {}, {}
    for r in out:
        key = (r.shard, r.chunk_idx)
        fill[key] = fill.get(key, 0) + (r.tok_to - r.tok_from)
        last[r.shard] = max(last.get(r.shard, -1), r.chunk_idx)
    for (sh, ci), tot in fill.items():
        assert tot == 16 or ci == last[sh]


def test_pack_sequences_partition_invariant(spark):
    from graphlab_spark.functions.curation import pack_sequences
    rows = [(i, " ".join("tok" for _ in range(i % 9 + 1)))
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df, budget=8).collect()))
    b = sorted(map(tuple,
                   pack_sequences(df.repartition(13), budget=8).collect()))
    assert a == b


def test_quality_buckets_separates_garbled(spark):
    from graphlab_spark.functions.curation import quality_buckets
    normal = [(i, "the quick brown fox jumps over the lazy dog again and again")
              for i in range(8)]
    garbled = [(100 + i, "zq xj qz jx zx qj zzqq xxjj " * 2) for i in range(4)]
    docs = spark.createDataFrame(normal + garbled, "doc_id long, text string")
    got = {r.bucket: r for r in quality_buckets(docs, n_buckets=2).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_docs + got[2].n_docs == 12
    # bucket 1 = lowest avg_logp: the 4 garbled docs (plus 2 normal —
    # ntile(2) on 12 docs splits 6/6, so the boundary lands mid-normal)
    assert got[1].n_docs == 6 and got[2].n_docs == 6
    assert got[1].min_logp < got[2].min_logp          # garbled at the bottom
    assert got[1].max_logp <= got[2].min_logp         # ordered buckets
    # token mass preserved across buckets
    total_toks = got[1].n_tokens + got[2].n_tokens
    assert total_toks == sum(len(t.split()) for _, t in normal + garbled)


def test_quality_buckets_scale_path_close_to_exact(spark):
    from graphlab_spark.functions.curation import quality_buckets
    rows = [(i, f"doc number {i} with some shared words and filler " * (1 + i % 3))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r.bucket: r.n_docs
             for r in quality_buckets(docs, n_buckets=4).collect()}
    approx = {r.bucket: r.n_docs
              for r in quality_buckets(docs, n_buckets=4,
                                       portable=False).collect()}
    assert sum(exact.values()) == sum(approx.values()) == 40
    for b in exact:
        assert abs(exact[b] - approx.get(b, 0)) <= 3  # boundary ties only


def test_quality_buckets_scale_path_empty_corpus(spark):
    """portable=False on a corpus with no scoreable document must
    return empty like the portable path, not IndexError on the empty
    approxQuantile cut list."""
    from graphlab_spark.functions.curation import quality_buckets
    docs = spark.createDataFrame([(1, "a"), (2, "")],
                                 "doc_id long, text string")
    assert quality_buckets(docs, n_buckets=4, portable=False).count() == 0
    assert quality_buckets(docs, n_buckets=4, portable=True).count() == 0


def test_sql_stratified_sample_escapes_quotes():
    import duckdb

    from graphlab_spark.functions.curation import sql_stratified_sample
    sql = sql_stratified_sample("lang", {"o'brien": 0.5})
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT 1 AS doc_id, "
        "'o''brien' AS lang")
    con.execute(sql).fetchall()  # must parse
