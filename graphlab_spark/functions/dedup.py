"""Deduplication operators for training-data pipelines.

Exact + near-duplicate detection over a `documents(doc_id, text, ...)`
table, each scale-first and with a DuckDB-replayable SQL twin:

- **exact**: md5-hash groupBy (one shuffle on the hash);
- **n-gram Jaccard**: char-shingle inverted index -> shared-shingle
  candidate pairs -> exact Jaccard verify;
- **MinHash + LSH**: shingles -> dense shingle ids -> k permutation
  min-hashes -> banded bucket join -> Jaccard verify (the scale path:
  candidate generation touches only docs sharing a band, never the
  full pair matrix);
- **SimHash**: token-hash sign aggregation into a B-bit signature,
  nibble-banded candidate pairs within Hamming distance.

Portability rule (shared with the driver's DuckDB oracle): all "hash"
functions are arithmetic over *dense ranks* of the distinct shingle /
token strings (`row_number() over (order by s)`), never engine hash
builtins — so any SQL engine reproduces identical signatures.

At 100 TB the shingle inverted index dominates; everything here is
groupBy/join over (id, shingle-id) longs — native partial+final hash
aggregation, AQE skew splitting for hot shingles, no Python in the
plan. The reference (a graph engine) has no dedup subsystem; these are
the training-data-pipeline extensions from the project brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lsh_guard import LSH_MAX_BUCKET, cap_bucket_groups

SHINGLE_N = 5  # 5-char shingles: baseline Jaccard between unrelated docs
               # stays low while near-dups stay ~1.0 (3-grams of a small
               # vocabulary are corpus-wide common -> candidate explosion)
JACCARD_TAU = 0.8

MINHASH_P = 2147483647  # 2^31 - 1, prime
# fixed (a, b) permutation coefficients — 16 hashes, 4 bands x 4 rows
# (r=4 rows/band puts the LSH S-curve threshold at (1/4)^(1/4) ~ 0.71:
# steep enough that low-similarity pairs almost never band-collide)
MINHASH_COEFFS = [
    (1203077, 94321), (2038075, 515093), (3714089, 860981), (494501, 1282807),
    (5583631, 173627), (6192733, 2038721), (7154587, 391939), (8237321, 3415217),
    (9318157, 517289), (1066613, 2716371), (1186717, 631931), (1299827, 3917223),
    (1414219, 747217), (1529173, 4118429), (1646237, 861851), (1763431, 4319533),
]
MINHASH_BAND_ROWS = 4
# signature-estimate prefilter: candidates must agree on >= this many of
# the 16 min-hashes (estimated Jaccard >= 10/16) before the exact verify
# — cuts the shingle-join fanout to the survivors only
MINHASH_EST_MIN = 10

SIMHASH_BITS = 16
SIMHASH_A, SIMHASH_B, SIMHASH_M = 1103515245, 12345, 2**31
SIMHASH_HAM_MAX = 3


# -- shingling ---------------------------------------------------------------

def char_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct (doc_id, shingle) character n-grams; texts shorter than
    n contribute their whole text as one shingle."""
    arr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(text) - {n - 1}, 1)),"
        f" i -> substring(text, i, {n})))"
    )
    return docs.select("doc_id", F.explode(arr).alias("s"))


def sql_char_shingles(n: int = SHINGLE_N, table: str = "documents") -> str:
    return (
        f"SELECT DISTINCT doc_id, s FROM (SELECT doc_id, "
        f"unnest([substr(text, i, {n}) for i in "
        f"generate_series(1, greatest(length(text) - {n - 1}, 1))]) AS s FROM {table})"
    )


def shingle_dim(shingles: DataFrame) -> DataFrame:
    """(s, sid): dense 1-based rank of each distinct shingle by value —
    the engine-portable 'hash' domain for MinHash.

    Scale note: the global row_number is a single-partition sort, fine
    for the bounded 3-gram alphabet but NOT for unbounded domains — the
    production path (`portable=False` in the callers) uses `xxhash64`
    directly: no window, fully parallel, engine-specific values.
    """
    w = Window.orderBy("s")
    return (
        shingles.select("s").distinct()
        .select("s", F.row_number().over(w).cast("long").alias("sid"))
    )


# -- exact dedup -------------------------------------------------------------

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, n_docs, canonical_id) for every md5-identical group
    with >1 member; canonical = min doc_id (the survivor)."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def sql_exact_dup_groups(table: str = "documents") -> str:
    return (
        f"SELECT md5(text) AS text_hash, count(*) AS n_docs, "
        f"min(doc_id) AS canonical_id FROM {table} "
        f"GROUP BY 1 HAVING count(*) > 1"
    )


# -- n-gram Jaccard ----------------------------------------------------------

def jaccard_pairs(docs: DataFrame, tau: float = JACCARD_TAU, n: int = SHINGLE_N,
                  df_cap: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jac) for pairs with shingle-set Jaccard >= tau.

    Candidate generation via the shingle inverted index (pairs must
    share >=1 shingle).  ``df_cap=None`` is the exact mode (every
    shared shingle generates a candidate) — correct, but a single
    corpus-wide-common shingle makes the index join quadratic, so it
    is ONLY for verification scale.  The scale path sets ``df_cap``:
    shingles whose document frequency exceeds the cap are excluded
    from *candidate generation* (the skewed join side), and the exact
    intersection is then recomputed over ALL shingles for just the
    surviving candidates, so reported Jaccard values stay exact.  A
    qualifying pair is missed only if every shingle it shares is
    hotter than the cap — at Jaccard >= tau that requires the pair to
    be made almost entirely of corpus-stopword shingles, the standard
    (documented) trade-off; MinHash-LSH remains the primary 100 TB
    dedup path.
    """
    # lazy localCheckpoint, not persist: the shingle table is reused
    # by several branches of the RETURNED lazy plan, so an explicit
    # cache could never be unpersisted here — RDD-level checkpoint
    # blocks are ContextCleaner-collected once the result is dropped,
    # where a CacheManager entry would pin executor storage for the
    # session lifetime (one leak per call)
    sh = char_shingles(docs, n).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    if df_cap is None:
        inter = (
            a.join(b, "s")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("i"))
        )
    else:
        rare = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("s")
        )
        ar = a.join(rare, "s")
        br = b.join(rare, "s")
        cand = (
            ar.join(br, "s")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        # Exact intersection over ALL shingles, candidates only.
        inter = (
            cand.join(a, "doc_a")
            .join(b, ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("i"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= tau)
    )
    return out


def sql_jaccard_pairs(tau: float = JACCARD_TAU, n: int = SHINGLE_N,
                      table: str = "documents") -> str:
    return f"""
WITH sh AS ({sql_char_shingles(n, table)}),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (x.n_sh + y.n_sh - i), 6) AS jac
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE round(CAST(i AS DOUBLE) / (x.n_sh + y.n_sh - i), 6) >= {tau}
"""


# -- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(docs: DataFrame, n: int = SHINGLE_N,
                       portable: bool = True) -> DataFrame:
    """(doc_id, m0..m{k-1}): k permutation min-hashes over shingle ids —
    one groupBy with k min() aggregates (partial+final, one shuffle).

    portable=True uses the dense-rank shingle dim (SQL-replayable, for
    the oracle); portable=False hashes shingles with `xxhash64` — the
    scale path with no global sort (values are engine-specific but the
    LSH/dedup *semantics* are identical).
    """
    sh = char_shingles(docs, n)
    if portable:
        with_sid = sh.join(shingle_dim(sh), "s")
    else:
        with_sid = sh.select(
            "doc_id", (F.abs(F.xxhash64("s")) % F.lit(MINHASH_P)).alias("sid"))
    aggs = [
        F.min((F.lit(a).cast("long") * F.col("sid") + F.lit(b)) % F.lit(MINHASH_P))
        .alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return with_sid.groupBy("doc_id").agg(*aggs)


def sql_minhash_signatures(n: int = SHINGLE_N, table: str = "documents") -> str:
    mins = ", ".join(
        f"min(({a} * sid + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f"""
WITH sh AS ({sql_char_shingles(n, table)}),
dim AS (SELECT s, row_number() OVER (ORDER BY s) AS sid
        FROM (SELECT DISTINCT s FROM sh)),
ws AS (SELECT doc_id, sid FROM sh JOIN dim USING (s))
SELECT doc_id, {mins} FROM ws GROUP BY doc_id
"""


def minhash_lsh_pairs(docs: DataFrame, tau: float = JACCARD_TAU,
                      n: int = SHINGLE_N, portable: bool = True,
                      max_bucket: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """MinHash-LSH candidate pairs verified by exact Jaccard >= tau.

    Bands of MINHASH_BAND_ROWS rows; a pair is a candidate iff it
    collides in >=1 band.  This is the 100 TB path: the join fans out on
    (band, band-key), never on raw shingles or the full pair matrix.

    ``max_bucket`` caps rows per (band, bkey) group *before* the
    candidate self-join (``lsh_guard.cap_bucket_groups``), so one
    mega-bucket of boilerplate can never emit B^2 candidate rows;
    dropped volume is observable via the guard's observe metric and
    ``lsh_guard.oversized_groups``.  ``max_bucket=None`` is the exact
    uncapped mode the DuckDB oracle replays (identical results on any
    corpus whose buckets stay under the cap).
    """
    k = len(MINHASH_COEFFS)
    n_bands = k // MINHASH_BAND_ROWS
    # lazy localCheckpoint (see jaccard_pairs): reused by the band
    # explosion AND the estimate prefilter, released with the result
    sig = minhash_signatures(docs, n, portable=portable).localCheckpoint(
        eager=False)
    bands = None
    for j in range(n_bands):
        cols = [f"m{j * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)]
        bd = sig.select(
            "doc_id", F.lit(j).alias("band"),
            F.concat_ws("_", *cols).alias("bkey"),
        )
        bands = bd if bands is None else bands.unionAll(bd)
    bands = cap_bucket_groups(bands, ["band", "bkey"], max_bucket,
                              label="minhash_lsh")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Signature-estimate prefilter: the signatures are tiny (one row per
    # doc) so this is a broadcast-joinable arithmetic pass over the
    # candidate pairs; only pairs whose estimated Jaccard clears
    # MINHASH_EST_MIN/k proceed to the exact shingle-join verify.
    est_matches = sum(
        F.when(F.col(f"a_m{i}") == F.col(f"b_m{i}"), 1).otherwise(0)
        for i in range(k)
    )
    sig_a = sig.select(F.col("doc_id").alias("doc_a"),
                       *[F.col(f"m{i}").alias(f"a_m{i}") for i in range(k)])
    sig_b = sig.select(F.col("doc_id").alias("doc_b"),
                       *[F.col(f"m{i}").alias(f"b_m{i}") for i in range(k)])
    cand = (
        cand.join(sig_a, "doc_a").join(sig_b, "doc_b")
        .filter(est_matches >= MINHASH_EST_MIN)
        .select("doc_a", "doc_b")
    )
    # Candidate-driven exact-Jaccard verify: intersections are computed
    # ONLY for prefiltered candidates (never the full inverted-index
    # pair blowup — hot shingles would make that quadratic).
    sh = char_shingles(docs, n).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= tau)
    )


def sql_minhash_lsh_pairs(tau: float = JACCARD_TAU, n: int = SHINGLE_N,
                          table: str = "documents") -> str:
    k = len(MINHASH_COEFFS)
    n_bands = k // MINHASH_BAND_ROWS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band, concat_ws('_', {cols}) AS bkey FROM sig".format(
            j=j,
            cols=", ".join(
                f"m{j * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
            ),
        )
        for j in range(n_bands)
    )
    est = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH sig AS ({sql_minhash_signatures(n, table)}),
bands AS ({band_rows}),
cand0 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
          AND a.doc_id < b.doc_id),
cand AS (SELECT c.doc_a, c.doc_b FROM cand0 c
         JOIN sig sa ON c.doc_a = sa.doc_id
         JOIN sig sb ON c.doc_b = sb.doc_id
         WHERE {est} >= {MINHASH_EST_MIN}),
jac AS ({sql_jaccard_pairs(tau, n, table)})
SELECT j.doc_a, j.doc_b, j.jac FROM jac j
JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
"""


# -- SimHash -----------------------------------------------------------------

def _token_df(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) lowercase whitespace tokens WITH multiplicity."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)


def simhash_signatures(docs: DataFrame, portable: bool = True) -> DataFrame:
    """(doc_id, simhash): B-bit sign-aggregated signature over token
    hashes (h = (A*tid + B) mod M), token multiplicity as weight — one
    groupBy with B conditional sums.  `portable` as in
    `minhash_signatures` (dense-rank dim vs xxhash64 scale path)."""
    toks = _token_df(docs)
    if portable:
        w = Window.orderBy("tok")
        dim = toks.select("tok").distinct().select(
            "tok", F.row_number().over(w).cast("long").alias("tid"))
        with_tid = toks.join(dim, "tok")
    else:
        with_tid = toks.select(
            "doc_id", (F.abs(F.xxhash64("tok")) % F.lit(SIMHASH_M)).alias("tid"))
    h = (F.lit(SIMHASH_A).cast("long") * F.col("tid") + F.lit(SIMHASH_B)) % F.lit(SIMHASH_M)
    with_h = with_tid.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sig_expr = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig_expr = term if sig_expr is None else sig_expr + term
    return (
        with_h.groupBy("doc_id").agg(*bit_sums)
        .select("doc_id", sig_expr.cast("long").alias("simhash"))
    )


def sql_simhash_signatures(table: str = "documents") -> str:
    bit_sums = ", ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
    FROM {table}) WHERE length(tok) > 0),
dim AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid
        FROM (SELECT DISTINCT tok FROM toks)),
wh AS (SELECT doc_id, ({SIMHASH_A} * tid + {SIMHASH_B}) % {SIMHASH_M} AS h
       FROM toks JOIN dim USING (tok)),
sums AS (SELECT doc_id, {bit_sums} FROM wh GROUP BY doc_id)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums
"""


def simhash_pairs(docs: DataFrame, ham_max: int = SIMHASH_HAM_MAX,
                  portable: bool = True) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming distance, candidates
    via nibble banding (B/4 bands of 4 bits; distance <= 3 guarantees
    >=1 identical nibble by pigeonhole)."""
    sig = simhash_signatures(docs, portable=portable).localCheckpoint(
        eager=False)
    n_nibbles = SIMHASH_BITS // 4
    bands = None
    for j in range(n_nibbles):
        bd = sig.select(
            "doc_id", "simhash", F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), 4 * j).bitwiseAND(F.lit(15)).alias("bkey"),
        )
        bands = bd if bands is None else bands.unionAll(bd)
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"),
                     "band", "bkey")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"),
                     "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.bit_count(F.expr("ha ^ hb")).cast("long").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= ham_max)
    )


def sql_simhash_pairs(ham_max: int = SIMHASH_HAM_MAX, table: str = "documents") -> str:
    n_nibbles = SIMHASH_BITS // 4
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, (simhash >> {4 * j}) & 15 AS bkey FROM sig"
        for j in range(n_nibbles)
    )
    return f"""
WITH sig AS ({sql_simhash_signatures(table)}),
bands AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {ham_max}
"""


def minhash_dup_clusters(docs: DataFrame, tau: float = JACCARD_TAU,
                         n: int = SHINGLE_N,
                         portable: bool = True) -> DataFrame:
    """(doc_id, canonical_id): near-duplicate clusters — connected
    components of the MinHash-LSH pair graph, canonical = smallest
    doc_id in the cluster; singleton docs are their own canonical.

    This is the step a production dedup pipeline runs after pair
    generation: transitively closing the pair relation so A~B, B~C
    collapse to one keeper even when (A, C) never collided in a band.
    Scale path: the pair graph is tiny relative to the corpus (only
    near-dups appear), so the hash-min iteration runs on the pair
    endpoints alone and the corpus-sized side is one left join.
    """
    from ..algos.connected_components import connected_components
    from ..graph import EdgeGraph

    pairs = minhash_lsh_pairs(docs, tau, n, portable=portable)
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    # partition count follows the session's shuffle setting (EdgeGraph
    # default) — the pair graph is corpus-size-dependent, never a
    # constant
    g = EdgeGraph(edges)
    state = connected_components(g, resume=False).state
    # CC has already run (one action per superstep) and its state is
    # lineage-truncated, so the pair graph's cache can be released now
    g.unpersist()
    out = (
        docs.select("doc_id")
        .join(state.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").alias("canonical_id"))
    )
    return out


def sql_minhash_dup_clusters(tau: float = JACCARD_TAU, n: int = SHINGLE_N,
                             table: str = "documents") -> str:
    """Hash-min fixpoint over the (derived-table-wrapped) pair SQL."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({sql_minhash_lsh_pairs(tau, n, table)}) t),
dverts AS (SELECT DISTINCT id FROM (SELECT doc_a AS id FROM pairs
           UNION ALL SELECT doc_b FROM pairs)),
dsym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION ALL SELECT doc_b, doc_a FROM pairs),
dcc(iter, id, component, nchanged) AS (
  SELECT 0, id, id, CAST(1 AS BIGINT) FROM dverts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           least(p.component, coalesce(m.received, p.component)) AS component,
           sum(CASE WHEN coalesce(m.received, p.component) < p.component
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM dcc p
    LEFT JOIN (SELECT s.dst AS mid, min(p2.component) AS received
               FROM dcc p2 JOIN dsym s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.mid
    WHERE p.nchanged > 0 AND p.iter < 100
  )
),
fin AS (SELECT id, component FROM dcc
        WHERE iter = (SELECT max(iter) FROM dcc))
SELECT d.doc_id, coalesce(f.component, d.doc_id) AS canonical_id
FROM {table} d LEFT JOIN fin f ON f.id = d.doc_id"""


# -- cross-document line dedup (C4 / CCNet style) ----------------------------

LINE_MAX_DOC_FREQ = 2   # drop lines appearing in more docs than this
LINE_WORDS = 8          # pseudo-line width for corpora without newlines


def chunk_into_lines(docs: DataFrame, words_per_line: int = LINE_WORDS,
                     text_col: str = "text") -> DataFrame:
    """Rewrite ``text`` with a newline after every ``words_per_line``
    whitespace tokens — a deterministic pseudo-line segmentation for
    corpora whose documents carry no newlines (like the synthetic
    testdata), so line-level operators stay exercisable end-to-end.
    Pure column expressions; pipelines into the scan."""
    w = words_per_line
    lined = F.expr(
        f"CASE WHEN length(trim({text_col})) = 0 THEN {text_col} ELSE "
        f"array_join(transform("
        f"  sequence(0, CAST(ceil(size(split(trim({text_col}), '\\\\s+')) "
        f"                   / {w}.0) AS INT) - 1),"
        f"  i -> array_join(slice(split(trim({text_col}), '\\\\s+'),"
        f"                        i * {w} + 1, {w}), ' ')), '\\n') END"
    )
    keep = [c for c in docs.columns if c != text_col]
    return docs.select(*keep, lined.alias(text_col))


def sql_chunk_into_lines(words_per_line: int = LINE_WORDS,
                         text_col: str = "text") -> str:
    """Expression twin of chunk_into_lines for one SQL column."""
    w = words_per_line
    toks = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    return (
        f"CASE WHEN length(trim({text_col})) = 0 THEN {text_col} ELSE "
        f"array_to_string([array_to_string("
        f"list_slice({toks}, i * {w} + 1, i * {w} + {w}), ' ')"
        f" for i in generate_series(0,"
        f" CAST(ceil(len({toks}) / {w}.0) AS INT) - 1)], chr(10)) END"
    )


def line_dedup(docs: DataFrame,
               max_doc_freq: int = LINE_MAX_DOC_FREQ) -> DataFrame:
    """Cross-document line deduplication (the C4 / CCNet boilerplate
    filter): drop every line whose trimmed form occurs in more than
    ``max_doc_freq`` distinct documents, and return
    ``(doc_id, text, n_kept, n_dropped)`` with each document's
    surviving lines rejoined in their original order.

    Scale shape: lines explode once; the document-frequency pass is a
    partial+final aggregation on ``md5(line)`` (fixed-width shuffle
    key; the hot boilerplate lines are exactly the skew that map-side
    combine absorbs); the verdict joins back on the same key; ordered
    reassembly is ``array_sort(collect_list(struct(pos, line)))`` —
    grouped, never a global window sort.  No Python in the plan.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\n", -1)).alias("pos", "line"),
    ).withColumn("h", F.md5(F.trim("line")))
    freq = (lines.groupBy("h")
            .agg(F.count_distinct("doc_id").alias("n_docs_line")))
    flagged = lines.join(freq, "h").withColumn(
        "keep", F.col("n_docs_line") <= F.lit(max_doc_freq))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(
                F.when(F.col("keep"), F.struct("pos", "line")))).alias("ks"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
             .cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1))
             .cast("long").alias("n_dropped"),
        )
        .select(
            "doc_id",
            F.array_join(F.expr("transform(ks, s -> s.line)"), "\n")
             .alias("text"),
            "n_kept", "n_dropped",
        )
    )


def sql_line_dedup(max_doc_freq: int = LINE_MAX_DOC_FREQ,
                   table: str = "documents",
                   prelude_ctes: str = "") -> str:
    """``prelude_ctes``: extra CTE definitions (each ending with a
    comma) spliced into the single WITH list so callers can stack a
    derived input view without illegal nested WITHs."""
    return f"""
WITH {prelude_ctes}lines AS (
  SELECT doc_id, s.pos, s.line, md5(trim(s.line)) AS h FROM (
    SELECT doc_id,
           unnest([struct_pack(pos := i - 1, line := ls[i])
                   for i in generate_series(1, len(ls))]) AS s
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {table}))),
freq AS (SELECT h, count(DISTINCT doc_id) AS n_docs_line
         FROM lines GROUP BY h),
flagged AS (SELECT l.*, f.n_docs_line <= {max_doc_freq} AS keep
            FROM lines l JOIN freq f USING (h))
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE keep), '') AS text,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
FROM flagged GROUP BY doc_id"""
