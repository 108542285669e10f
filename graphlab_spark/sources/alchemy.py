"""Alchemy factor-graph file IO (gibbs_sampling toolkit).

Reference: ``/root/reference/toolkits/graphical_models/deprecated/
gibbs_sampling/factorized_model.cpp:77-209`` (``load_alchemy``) /
``:232-281`` (``save_alchemy``) — the file format the parallel-Gibbs
toolkit consumes, produced by ``make_denoise_alchemy.cpp``:

    variables:
    <name>[\\t<arity>]          (arity defaults to 2, ``:103-109``)
    ...
    factors:
    <v1> [/ <v2> ...] // w0 w1 ... [/// weight]

- variable ids are assigned in file order (``unique_var_id++``,
  ``:113-118``);
- table values are LOG potentials (``:198-201``) listed with the FIRST
  listed variable varying fastest
  (``discrete_assignment::operator++``,
  ``factors/discrete_assignment.hpp:210-222``): file index
  ``j = x_1 + x_2*k_1``;
- the optional ``///``-suffixed weight is ignored by the reference
  loader (it only truncates the value list, ``:180-186``) and here.

Spark mapping: the file is read with ``textFile().zipWithIndex()``
(split order preserves line order), the two sections split on the
``factors:`` boundary, and all parsing is column expressions; the only
driver-side work is the two boundary lookups.  Two loaders share the
parse: :func:`load_alchemy` targets the unary+pairwise MRF surface
(:mod:`..algos.gibbs`, :mod:`..algos.mplp`) and raises on arity >= 3;
:func:`load_alchemy_factor_graph` loads ANY arity into the N-ary
factor-graph surface of :mod:`..algos.factor_bp` — together they cover
the reference loader's full scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_sections(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared alchemy parse: split the two sections, number variables,
    tokenize factor lines.  Returns ``(lines, variables, raw)`` with
    ``lines``/``variables`` PERSISTED (callers unpersist) and
    ``raw = (idx, args: array<string>, vals: array<double>)`` one row
    per non-blank factor line."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(rdd, "line string, idx long") \
        .select(F.trim("line").alias("line"), "idx").persist()
    variables = None
    try:
        head = lines.filter(F.col("idx") == 0).take(1)
        if not head or head[0]["line"] != "variables:":
            raise ValueError(
                f"load_alchemy: {path} does not start with 'variables:' "
                f"(got {head[0]['line']!r} )" if head else
                f"load_alchemy: {path} is empty")
        fb_row = (lines.filter(F.col("line") == "factors:")
                  .agg(F.min("idx").alias("i")).first())
        if fb_row["i"] is None:
            raise ValueError(
                f"load_alchemy: {path} has no 'factors:' section")
        fb = int(fb_row["i"])

        parts = F.split("line", "\t")
        # ids are assigned by ROW ORDER OVER NON-BLANK LINES, not the
        # raw line index — a blank line inside the variables section
        # must not shift/gap ids (the reference's unique_var_id++ only
        # advances on parsed lines).  A model file is metadata-scale,
        # so the single-partition row_number window is fine here (the
        # same documented trade as save_alchemy's driver-side write).
        from pyspark.sql import Window
        arity_tok = F.when(F.size(parts) > 1,
                           F.trim(F.element_at(parts, 2)))
        variables = (
            lines.filter((F.col("idx") > 0) & (F.col("idx") < fb)
                         & (F.length("line") > 0))
            .select(
                "idx",
                F.trim(F.element_at(parts, 1)).alias("name"),
                arity_tok.alias("_atok"),
                F.coalesce(arity_tok.try_cast("int"), F.lit(2))
                .alias("arity"))
            .withColumn(
                "id",
                (F.row_number().over(Window.orderBy("idx")) - F.lit(1))
                .cast("long"))
            .persist()
        )
        # a malformed arity token must raise, not silently default to 2
        bad_arity = variables.filter(
            F.col("_atok").isNotNull()
            & (F.col("_atok").try_cast("int").isNull()
               | (F.col("arity") < 1))).take(1)
        if bad_arity:
            raise ValueError(
                f"load_alchemy: variable line {bad_arity[0]['idx']} has "
                f"unparseable arity token {bad_arity[0]['_atok']!r}")
        dup = (variables.groupBy("name").count()
               .filter(F.col("count") > 1).take(1))
        if dup:
            raise ValueError(
                f"load_alchemy: variable name {dup[0]['name']!r} is "
                "declared more than once — the reference's name->id map "
                "cannot represent duplicates and the factor joins would "
                "silently fan out")

        raw = (
            lines.filter((F.col("idx") > fb) & (F.length("line") > 0))
            .select(
                "idx",
                F.transform(
                    F.split(F.substring_index("line", "//", 1), "/"),
                    lambda s: F.trim(s)).alias("args"),
                F.transform(
                    F.split(F.trim(F.substring_index(
                        # values live between the first '//' and an
                        # optional '///' weight suffix
                        F.substring_index("line", "///", 1), "//", -1)),
                        r"\s+"),
                    # try_cast, not cast: under ANSI (the Spark 4
                    # default) a malformed token would die with a
                    # context-free CAST_INVALID_INPUT before the
                    # friendly per-line error below; with ANSI off it
                    # would flow into the BP/Gibbs tables as a silent
                    # NULL that passes every size-based check
                    lambda s: s.try_cast("double")).alias("vals"))
        )
        badval = raw.filter(
            F.exists("vals", lambda x: x.isNull())).take(1)
        if badval:
            raise ValueError(
                f"load_alchemy: factor line {badval[0]['idx']} has an "
                "unparseable table value token (values section: "
                "whitespace-separated doubles between '//' and an "
                "optional '///' weight)")
        return lines, variables, raw
    except Exception:
        if variables is not None:
            variables.unpersist()
        lines.unpersist()
        raise


def load_alchemy(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Parse an alchemy file into the engine's MRF surface.

    Returns ``(variables, unary, pairwise)``:

    - ``variables = (id long, name string, arity int)`` — ids in file
      order, exactly the reference's ``unique_var_id`` numbering;
    - ``unary = (id, theta: array<double>)`` — 1-variable factors'
      log tables; multiple unary factors on one variable multiply,
      i.e. their log tables add elementwise (the belief product);
    - ``pairwise = (src, dst, table: array<double>[k_src*k_dst])`` —
      row-major ``table[x_src*k_dst + x_dst]`` (the layout
      :func:`..algos.gibbs.chromatic_gibbs` and
      :func:`..algos.mplp.mplp_table_labels` consume), reordered from
      the file's first-var-fastest sequence.

    Factors of arity >= 3 raise here (this is the unary+pairwise MRF
    surface); :func:`load_alchemy_factor_graph` loads the same file at
    any arity for the N-ary BP engine.
    """
    lines, variables, raw = _parse_sections(spark, path)
    try:
        big = raw.filter(F.size("args") > 2).take(1)
        if big:
            raise ValueError(
                f"load_alchemy: factor line {big[0]['idx']} has "
                f"{len(big[0]['args'])} variables — this engine's MRF "
                "surface is unary + pairwise only")

        # resolve names -> (id, arity); one join per argument slot keeps
        # everything a broadcast-friendly equi-join on the (small) name
        # dim.  BOTH legs join left so an unknown name in EITHER slot is
        # caught below instead of silently dropping the factor row.
        v1 = variables.select(F.col("name").alias("_n1"),
                              F.col("id").alias("_i1"),
                              F.col("arity").alias("_k1"))
        v2 = variables.select(F.col("name").alias("_n2"),
                              F.col("id").alias("_i2"),
                              F.col("arity").alias("_k2"))
        resolved = (
            raw.select("idx", "vals", F.size("args").alias("nargs"),
                       F.element_at("args", 1).alias("_n1"),
                       F.when(F.size("args") > 1, F.element_at("args", 2))
                       .alias("_n2"))
            .join(F.broadcast(v1), "_n1", "left")
            .join(F.broadcast(v2), "_n2", "left")
        )
        missing = resolved.filter(
            F.col("_i1").isNull()
            | ((F.col("nargs") == 2) & F.col("_i2").isNull())).take(1)
        if missing:
            bad = (missing[0]["_n1"] if missing[0]["_i1"] is None
                   else missing[0]["_n2"])
            raise ValueError(
                f"load_alchemy: factor line {missing[0]['idx']} "
                f"references unknown variable {bad!r}")
        badlen = resolved.filter(
            F.size("vals") != F.col("_k1") * F.coalesce("_k2", F.lit(1))
        ).take(1)
        if badlen:
            raise ValueError(
                f"load_alchemy: factor line {badlen[0]['idx']} has "
                f"{len(badlen[0]['vals'])} values, expected "
                "arity-product many")

        # cut lineage so consuming the returned frames never re-reads /
        # re-parses the text file (model files are metadata-scale; one
        # eager materialization replaces per-action re-scans)
        resolved = resolved.localCheckpoint()

        unary = (
            resolved.filter(F.col("nargs") == 1)
            .select(F.col("_i1").alias("id"), "vals")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("vals")))
                 .alias("ts"))
            .select(
                "id",
                F.aggregate(
                    F.expr("slice(ts, 2, size(ts) - 1)"),
                    F.element_at(F.col("ts"), 1)["vals"],
                    lambda acc, t: F.zip_with(
                        acc, t["vals"], lambda a, b: a + b))
                .alias("theta"))
        )
        # file order j = x1 + x2*k1  ->  row-major i = x1*k2 + x2:
        # vals[(i div k2) + (i % k2) * k1]
        pairwise = (
            resolved.filter(F.col("nargs") == 2)
            .select(
                F.col("_i1").alias("src"), F.col("_i2").alias("dst"),
                F.transform(
                    F.sequence(F.lit(0), F.col("_k1") * F.col("_k2") - 1),
                    lambda i: F.element_at(
                        "vals",
                        ((i / F.col("_k2")).cast("int")
                         + (i % F.col("_k2")) * F.col("_k1") + 1)
                        .cast("int"))).alias("table"))
        )
        out_vars = (variables.select("id", "name", "arity")
                    .localCheckpoint())
        return out_vars, unary, pairwise
    finally:
        if variables is not None:
            variables.unpersist()
        lines.unpersist()


def load_alchemy_factor_graph(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, DataFrame]:
    """Parse an alchemy file into the N-ary factor-graph surface of
    :func:`..algos.factor_bp.factor_graph_bp` — the general-arity twin
    of :func:`load_alchemy`, matching the reference loader's full scope
    (``factorized_model.cpp:149-209`` parses any number of
    ``/``-separated arguments).

    - every factor line (arity >= 1) becomes one factor vertex; factor
      ids CONTINUE the variable numbering in file order, exactly the
      reference's shared ``_unique_var_id++`` space
      (``factor_graph.hpp:109,293``);
    - table values are taken VERBATIM in file order: both the file and
      the BP engine lay entries out first-listed-variable-fastest
      (``discrete_assignment.hpp:210-222``), so no reordering — unlike
      the pairwise surface, which permutes to row-major;
    - variables get zero priors (``factor_graph.hpp:258-260`` — in this
      format node priors are explicit arity-1 factor lines).

    Returns ``(variables, factors)``:
    ``(id, card, prior: array<double>)`` /
    ``(fid, vids: array<long>, cards: array<int>,
    table: array<double>)``.
    """
    lines, variables, raw = _parse_sections(spark, path)
    try:
        from pyspark.sql import Window
        n_vars = variables.count()
        ex = raw.select("idx", F.posexplode("args").alias("pos", "name"))
        res = ex.join(
            F.broadcast(variables.select("name", "id", "arity")),
            "name", "left")
        missing = res.filter(F.col("id").isNull()).take(1)
        if missing:
            raise ValueError(
                f"load_alchemy_factor_graph: factor line "
                f"{missing[0]['idx']} references unknown variable "
                f"{missing[0]['name']!r}")
        slots = res.groupBy("idx").agg(
            F.array_sort(F.collect_list(F.struct("pos", "id", "arity")))
            .alias("slots"))
        factors = (
            raw.join(slots, "idx")
            .select(
                "idx", "vals",
                F.transform("slots", lambda s: s["id"]).alias("vids"),
                F.transform("slots", lambda s: s["arity"].cast("int"))
                .alias("cards"))
        )
        dupv = factors.filter(
            F.size(F.array_distinct("vids")) != F.size("vids")).take(1)
        if dupv:
            raise ValueError(
                f"load_alchemy_factor_graph: factor line "
                f"{dupv[0]['idx']} repeats a variable — duplicate edges "
                "are unsupported (factor_graph.hpp:427-429)")
        numel = F.aggregate("cards", F.lit(1).cast("long"),
                            lambda a, c: a * c)
        badlen = factors.filter(F.size("vals") != numel).take(1)
        if badlen:
            raise ValueError(
                f"load_alchemy_factor_graph: factor line "
                f"{badlen[0]['idx']} has {len(badlen[0]['vals'])} "
                "values, expected arity-product many")
        out_factors = (
            factors.withColumn(
                "fid",
                (F.lit(n_vars)
                 + F.row_number().over(Window.orderBy("idx")) - F.lit(1))
                .cast("long"))
            .select("fid", "vids", "cards", F.col("vals").alias("table"))
            .localCheckpoint()
        )
        out_vars = variables.select(
            "id", F.col("arity").alias("card"),
            F.array_repeat(F.lit(0.0), F.col("arity")).alias("prior")
        ).localCheckpoint()
        return out_vars, out_factors
    finally:
        variables.unpersist()
        lines.unpersist()


def save_alchemy(
    variables: DataFrame, unary: DataFrame, pairwise: DataFrame,
    path: str,
) -> None:
    """Write the MRF surface back to an alchemy file
    (``factorized_model.cpp:232-281`` save_alchemy): variables in id
    order with explicit arity, one factor line per unary/pairwise row,
    pairwise values re-serialized first-var-fastest.  A model file is
    metadata-scale, so this is a driver-side text write (the same
    documented trade as the reference's own single-stream writer).
    """
    names = {r["id"]: (r["name"], r["arity"])
             for r in variables.orderBy("id").collect()}
    with open(path, "w") as f:
        f.write("variables:\n")
        for vid in sorted(names):
            name, arity = names[vid]
            f.write(f"{name}\t{arity}\n")
        f.write("factors:\n")
        for r in unary.orderBy("id").collect():
            name, _ = names[r["id"]]
            vals = " ".join(repr(v) for v in r["theta"])
            f.write(f"{name} // {vals}\n")
        for r in pairwise.orderBy("src", "dst").collect():
            n1, k1 = names[r["src"]]
            n2, k2 = names[r["dst"]]
            # row-major table[x1*k2 + x2] -> file order j = x1 + x2*k1
            vals = " ".join(
                repr(r["table"][(j % k1) * k2 + (j // k1)])
                for j in range(k1 * k2))
            f.write(f"{n1} / {n2} // {vals}\n")


def make_denoise_alchemy(
    spark: SparkSession, path: str, rows: int = 32, cols: int = 32,
    ncolors: int = 5, error_rate: float = 0.5, lam: float = 1.5,
    seed: int = 17,
) -> None:
    """The ``make_denoise_alchemy.cpp`` tool: build the synthetic noisy
    image (:func:`.parsers.load_synthetic_image`), attach log-prior
    unaries and Potts smoothing pairwise tables, and save the whole
    model as an alchemy file — the exact input the reference's
    chromatic sampler demos consume."""
    from .parsers import load_synthetic_image

    v, e = load_synthetic_image(spark, rows, cols, ncolors, error_rate,
                                seed)
    v = v.persist()
    variables = v.select(
        "id", F.concat(F.lit("px_"), F.col("r"), F.lit("_"), F.col("c"))
        .alias("name"), F.lit(ncolors).alias("arity"))
    unary = v.select(
        "id", F.expr("transform(prior, p -> ln(p))").alias("theta"))
    potts = [0.0 if x == y else -lam
             for x in range(ncolors) for y in range(ncolors)]
    pairwise = e.select(
        "src", "dst", F.array(*[F.lit(p) for p in potts]).alias("table"))
    save_alchemy(variables, unary, pairwise, path)
    v.unpersist()
