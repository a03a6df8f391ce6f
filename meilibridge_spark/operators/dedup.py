"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, n-gram Jaccard, SimHash.

Design constraints:
- fully distributed Catalyst plans (explode/groupBy/join) — the
  pairwise work is always LSH-bucketed, never all-pairs, so the plans
  survive 100x scale-up (candidate generation is a bucket equi-join);
- hash functions are md5-based so every operator has an exact DuckDB
  oracle (Spark md5 == DuckDB md5; min over hex strings is
  lexicographic in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.operators.textstats import TOKEN_RX


def _tokens(text_col: str) -> "F.Column":
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with count
    and canonical (min) id. Map-side partial agg makes this a single
    cheap shuffle on the 16-byte hash."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias(f"canonical_{id_col}"),
    )


def shingles(text_col: str, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    toks = _tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(grams)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """k-permutation MinHash over word shingles.

    h_i(doc) = min over shingles s of md5(i || ':' || s) — k independent
    hash families via the salt prefix; min is over hex strings
    (lexicographic — identical semantics in the SQL oracle). One explode
    + one groupBy(doc) with k min-aggregates (map-side combine)."""
    ex = df.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Signature -> (id, band_id, band_hash): band j hashes rows
    [j*r, (j+1)*r). Docs agreeing on any band become candidates."""
    n_bands = k // rows_per_band
    bands = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{j * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("band_hash"),
        )
        for j in range(n_bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("b")
    ).select(id_col, F.col("b.band_id"), F.col("b.band_hash"))


def lsh_candidate_pairs(
    bands: DataFrame,
    id_col: str = "doc_id",
    max_bucket: "int | None" = None,
) -> DataFrame:
    """Distinct candidate pairs sharing >= 1 band: self equi-join on
    (band_id, band_hash) — a bucket join, never a cross join.

    ``max_bucket``: degenerate-bucket cap. A band value shared by
    millions of docs (empty/boilerplate text hashing identically) makes
    that ONE bucket quadratic — size^2 pairs from content that is
    near-dup only in the degenerate sense. Buckets larger than
    ``max_bucket`` are dropped from candidate generation BEFORE the
    self-join (one groupBy(count) guard; members stay discoverable
    through their other, non-degenerate bands). Set it at scale;
    ``lsh_dropped_buckets`` reports what a cap would drop so the
    decision is observable, not silent. None (default) = uncapped."""
    if max_bucket is not None:
        sizes = bands.groupBy("band_id", "band_hash").agg(
            F.count("*").alias("_bsz")
        )
        bands = (
            bands.join(sizes, ["band_id", "band_hash"])
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    a = bands.select(
        F.col(id_col).alias("id_a"), "band_id", "band_hash"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band_id", "band_hash"
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_dropped_buckets(
    bands: DataFrame, max_bucket: int, id_col: str = "doc_id"
) -> DataFrame:
    """Observability companion to ``lsh_candidate_pairs(max_bucket=...)``:
    the buckets a cap of ``max_bucket`` would exclude ->
    (band_id, band_hash, n_docs), largest first. Log/inspect these
    before enabling the cap — they should be boilerplate."""
    del id_col  # any column works for counting; kept for symmetry
    return (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
        .orderBy(F.col("n_docs").desc(), "band_id", "band_hash")
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact token-SET Jaccard for given candidate pairs.

    Each candidate doc's distinct-token SET is carried as a sorted
    array; the pair join attaches both sides' arrays and the
    intersection is a JVM-side ``array_intersect`` per pair. Cost is
    exactly sum over pairs of |A|+|B| — a token shared by every
    candidate (stop-word-grade) adds one array element per doc, never a
    |candidates|^2 row blowup the way a token-level equi-join would.
    Output rows == candidate pairs (before thresholding), by
    construction."""
    # NULL text -> empty token set (F.size of a NULL array is -1, which
    # would poison the counts); jaccard with an empty set is 0
    tok_sets = df.select(
        F.col(id_col),
        F.coalesce(
            F.array_sort(F.array_distinct(_tokens(text_col))),
            F.array().cast("array<string>"),
        ).alias("_ts"),
    )
    docs_needed = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    ).distinct()
    tok_sets = tok_sets.join(docs_needed, id_col, "left_semi")
    ta = tok_sets.select(
        F.col(id_col).alias("id_a"), F.col("_ts").alias("_ta"), F.size("_ts").alias("na")
    )
    tb = tok_sets.select(
        F.col(id_col).alias("id_b"), F.col("_ts").alias("_tb"), F.size("_ts").alias("nb")
    )
    out = (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn(
            "jaccard",
            F.when(
                F.col("na") + F.col("nb") - F.col("inter") > 0,
                F.round(
                    F.col("inter")
                    / (F.col("na") + F.col("nb") - F.col("inter")),
                    6,
                ),
            ).otherwise(F.lit(0.0)),  # two empty sets -> 0, not NULL
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def dedup_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Connected components over verified near-dup pairs -> one row per
    doc appearing in any pair: (doc_id, cluster_id), where cluster_id
    is the component's minimum doc_id (the canonical survivor a dedup
    pipeline keeps). Both algorithms produce identical output (tested).

    ``algorithm="label_prop"`` (default): min-label propagation — each
    round every node takes the minimum of its own label and its
    neighbours' labels; converges in O(component DIAMETER) rounds
    (near-dup components are shallow in practice). Each round is one
    join + one aggregation; labels are localCheckpoint-ed so lineage
    stays flat. No driver-side graph state — scales with the pair
    count.

    ``algorithm="star"``: the large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — each round rewires edges toward local minima, HALVING
    long paths, so convergence is O(log diameter) rounds instead of
    O(diameter): the right choice for deep components (chains of
    pairwise-near duplicates) where label propagation would need
    hundreds of rounds. Per round: two groupBy-min + join passes over
    the (shrinking) edge set.

    ``max_iter`` is a safety bound in both; non-convergence raises."""
    if algorithm not in ("label_prop", "star"):
        raise ValueError(
            f"algorithm must be 'label_prop' or 'star', got {algorithm!r}"
        )
    if algorithm == "star":
        return _star_components(pairs, max_iter)
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("dlabel")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nmin"))
        )
        # checkpoint FIRST, then read both the changed-count and the
        # next labels from the materialized result — otherwise the
        # join+agg (the dominant cost) executes twice per round
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                "label",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.filter(F.col("new_label") != F.col("label")).limit(1).count()
        )
        labels = updated.select("node", F.col("new_label").alias("label"))
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            "rounds — a component's diameter exceeds the bound; raise "
            "max_iter (rounds needed = max component diameter)"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over a canonical (u > v) edge set: every
    node's strictly-LARGER neighbours rewire to the minimum of its
    closed neighbourhood. Output stays canonical (v > u >= m)."""
    sym = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).union(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
    mins = sym.groupBy("node").agg(F.min("nbr").alias("_mn"))
    mins = mins.select("node", F.least("node", "_mn").alias("_m"))
    return (
        sym.join(mins, "node")
        .filter(F.col("nbr") > F.col("node"))
        .select(F.col("nbr").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node's SMALLER-or-equal
    neighbourhood (which is exactly its canonical out-edges) rewires to
    its minimum; the node itself links there too."""
    mins = edges.groupBy("u").agg(F.min("v").alias("_m"))
    rewired = (
        edges.join(mins, "u")
        .filter(F.col("v") != F.col("_m"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    self_links = mins.select("u", F.col("_m").alias("v"))
    return rewired.union(self_links).filter(
        F.col("u") != F.col("v")
    ).distinct()


def _star_components(pairs: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star to the fixed point: the edge
    set becomes a star per component, centred at its minimum node."""
    nodes = (
        pairs.select(F.col("id_a").cast("long").alias("node"))
        .union(pairs.select(F.col("id_b").cast("long").alias("node")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.greatest(
                F.col("id_a").cast("long"), F.col("id_b").cast("long")
            ).alias("u"),
            F.least(
                F.col("id_a").cast("long"), F.col("id_b").cast("long")
            ).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # set equality via counts + one-way difference (both
        # materialized): equal sets <=> same size and empty difference
        same = (
            nxt.count() == edges.count()
            and nxt.exceptAll(edges).limit(1).count() == 0
        )
        edges = nxt
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star components did not converge within max_iter={max_iter} "
            "rounds — expected O(log diameter); raise max_iter"
        )
    # fixed point = stars: every non-minimum node has exactly one edge,
    # to its component minimum; minima label themselves
    return nodes.join(
        edges.select(F.col("u").alias("node"), F.col("v").alias("_lbl")),
        "node",
        "left",
    ).select(
        F.col("node").alias("doc_id"),
        F.coalesce(F.col("_lbl"), F.col("node")).alias("cluster_id"),
    )


def simhash32(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash with tf weights: bit_j = sign of
    sum_t tf(t) * (bit_j(h32(t)) * 2 - 1), h32 = first 8 hex of md5.
    Integer-exact (doubles only as 2^j carriers < 2^53) so the SQL
    oracle matches bit-for-bit. Plan: explode terms -> per-(doc, term)
    tf -> explode 32 bit positions -> two groupBys."""
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("t"))
    tf = toks.groupBy(id_col, "t").agg(F.count("*").alias("tf"))
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    bits = (
        tf.withColumn("h", h)
        .select(
            id_col,
            "tf",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"),
        )
        .withColumn(
            "bit",
            (F.col("h") / F.pow(F.lit(2.0), F.col("j"))).cast("long") % 2,
        )
        .withColumn("w", (F.col("bit") * 2 - 1) * F.col("tf"))
    )
    per_bit = bits.groupBy(id_col, "j").agg(F.sum("w").alias("s"))
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").cast("long").alias("simhash32"))
    )
