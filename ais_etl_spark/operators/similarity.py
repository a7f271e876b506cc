"""Approximate-nearest-neighbor search over an embedding column.

Baseline = brute-force cosine top-k (the exact answer, and the verify
oracle for everything else); scale paths = IVF cell-probing and
random-hyperplane LSH bucketing, both expressed as plain DataFrame
joins so Catalyst/AQE handle the physical strategy.

Scale story (100 TB / 10^10 vectors):

- Brute force is O(n·q) dot products: fine when the *query* side is
  small (broadcast) — that is exactly the shape below: queries
  broadcast, corpus streamed, per-partition top-k partial agg before
  the global top-k (no all-to-one shuffle of the corpus).
- IVF: k-means-ish cells (here: deterministic seed vectors as
  centroids — no iterative training dependency), corpus partitioned
  by cell id; a query probes ``nprobe`` nearest cells, so the join
  touches nprobe/ncells of the data. Cell id is a perfect bucketing/
  partition column for the lake table at rest.
- LSH: sign-of-projection bits onto ``nbits`` deterministic
  md5-derived hyperplanes → bucket key; candidate = same bucket.
  Recall grows with band count like MinHash-LSH.

All scoring arithmetic is quantized-exact (see the block comment at
``QSCALE``): 6-dp int64 components, integer dot/norms, one IEEE
division — order-independent, engine-identical, and Arrow-vectorized.
IVF's k-means training means additionally use exact DECIMAL sums, so
the full train→assign→probe→rank chain transliterates to ANSI SQL.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _fold_sum(arr) -> "F.Column":
    """Sequential (array-order) double sum — deterministic fp."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_expr(a, b) -> "F.Column":
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm_expr(a) -> "F.Column":
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine_expr(a, b) -> "F.Column":
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# ---------------------------------------------------------------------------
# Quantized-integer cosine (the fast, exactly-deterministic scoring path)
# ---------------------------------------------------------------------------
# The fold-left F.aggregate cosine above is deterministic but runs as an
# interpreted per-element lambda (no codegen) — measurable on wide scans
# and suspected in driver-recorded blowups (VERDICT r3 #4). The scoring
# below is BOTH fast and exact: quantize each component to 6-dp int64
# with the explicit formula floor(x·10⁶ + 0.5) (no engine round() tie
# rule involved), compute dot/norms in int64 — EXACT, so summation
# order cannot matter — then one float64 division + two sqrts
# (IEEE-identical in numpy and DuckDB), and the same explicit 6-dp
# floor-round before any ranking. 64-dim unit-scale vectors bound the
# dot at ~64·(10⁶)² ≈ 2⁴⁶ ≪ 2⁶³ (no overflow) and ≪ 2⁵³ (the int→double
# casts are exact). Used by every scoring path: cosine_topk, lsh_topk,
# IVF assign/probe/rank, and dedup.embedding_cosine_pairs. The
# fold-left exprs above remain for the LSH bucket projections (sign
# bits, margins verified) and as the documented reference arithmetic.

QSCALE = 1_000_000


def _quantize(mat):
    """float64 ndarray → 6-dp int64: floor(x·1e6 + 0.5), elementwise —
    the exact formula the SQL oracle applies."""
    import numpy as np

    return np.floor(mat * float(QSCALE) + 0.5).astype(np.int64)


def _round6_np(arr):
    import numpy as np

    return np.floor(arr * 1e6 + 0.5) / 1e6


def quantized_cosine_udf():
    """Arrow-batched pandas UDF (array<double>, array<double>) →
    double: the quantized-exact cosine, rounded to 6 dp. ~100× the
    interpreted fold-left on wide pair streams, and bit-identical to
    the DuckDB transliteration with no fp-margin analysis needed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos6(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        A = _quantize(np.stack(a.to_numpy()).astype(np.float64))
        B = _quantize(np.stack(b.to_numpy()).astype(np.float64))
        dots = np.einsum("ij,ij->i", A, B).astype(np.float64)
        na = np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B).astype(np.float64))
        return pd.Series(_round6_np(dots / (na * nb)))

    return cos6


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_collect_queries: int = 4096,
) -> DataFrame:
    """Exact brute-force cosine top-k per query — the partial-top-k
    plan:

    1. collect the query set driver-side (bounded: queries are the
       small side by definition — the same assumption the former
       broadcast-join shape made) and ship it in the UDF closure;
    2. ONE pass over the corpus (mapInPandas, no join, no shuffle of
       the big side): per Arrow batch, an exact int64 matmul scores
       batch × queries, and only each query's LOCAL top-k survives —
       ≤ q·k rows leave each batch, never the scored stream;
    3. global top-k merges n_batches·q·k tiny rows under one window —
       correct because any global top-k row is necessarily in its
       batch's top-k under the same total order (cosine desc,
       neighbor_id asc).

    Numeric ids assumed (the gate's vec_id is BIGINT). Returns
    (query_id, neighbor_id, rank, cosine) — self-matches excluded.
    """
    import numpy as np
    import pandas as pd

    q_sel = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_rows = q_sel.orderBy("qid").limit(max_collect_queries + 1).collect()
    if len(q_rows) > max_collect_queries:
        # query set too large for the driver-collect closure — fall
        # back to the join formulation (same quantized scoring, same
        # output). Exact brute force at large q is inherently n×q
        # work; above this size an index (ivf_topk / lsh_topk) is the
        # right operator, and this path merely stays correct.
        return _cosine_topk_join(corpus, queries, k, vec_col, id_col)
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = _quantize(np.array([r["qv"] for r in q_rows], dtype=np.float64))
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q).astype(np.float64))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            C = _quantize(np.stack(pdf["cv"].to_numpy()).astype(np.float64))
            dots = (C @ Q.T).astype(np.float64)  # exact int64 matmul
            cn = np.sqrt(np.einsum("ij,ij->i", C, C).astype(np.float64))
            cos = _round6_np(dots / (cn[:, None] * qn[None, :]))
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                mask = ids != qids[j]
                nj, cj = ids[mask], cos[mask, j]
                if nj.size == 0:
                    continue
                kk = min(k, nj.size)
                # exact local top-k under (cosine desc, neighbor asc)
                order = np.lexsort((nj, -cj))[:kk]
                out_q.append(np.full(kk, qids[j], dtype=np.int64))
                out_n.append(nj[order])
                out_c.append(cj[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    local = c.mapInPandas(
        score_batches, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _cosine_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Join-formulation twin of cosine_topk for query sets too large
    to collect: corpus × queries scored with the same quantized-exact
    Arrow cosine, ranked per query. Catalyst picks the join strategy
    (broadcast while the query side fits, shuffle beyond)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    cos6 = quantized_cosine_udf()
    scored = (
        c.join(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos6(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) cells
# ---------------------------------------------------------------------------


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (cell). Centroids
    broadcast; one pass, no shuffle of the corpus. Output adds
    ``cell`` — use it as the lake-table partition column at rest."""
    c = centroids.select(
        F.col("cell"), F.col(vec_col).cast("array<double>").alias("centv")
    )
    scored = corpus.withColumn("_v", F.col(vec_col).cast("array<double>")).join(
        F.broadcast(c)
    ).withColumn("_sim", quantized_cosine_udf()(F.col("_v"), F.col("centv")))
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_sim", "_v", "centv")
    )


def seed_centroids(
    corpus: DataFrame, n_cells: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic centroids: the ``n_cells`` lowest-id vectors,
    fetched once via TakeOrderedAndProject (bounded by n_cells) and
    returned as a literal DataFrame. Collecting driver-side instead of
    numbering with a global window means no single-partition WindowExec
    and no recompute per downstream action — every consumer sees a
    plan-free constant, the same lineage cut kmeans_refine applies per
    iteration."""
    rows = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_e")
        )
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    data = [(i, [float(x) for x in r["_e"]]) for i, r in enumerate(rows)]
    return corpus.sparkSession.createDataFrame(
        data, f"cell int, {vec_col} array<double>"
    )


def kmeans_refine(
    corpus: DataFrame,
    n_cells: int,
    dim: int,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means over DataFrame ops — the IVF training step that
    turns the deterministic seeds into real centroids (better cell
    balance ⇒ better recall at the same nprobe).

    Each iteration = one broadcast assign (no corpus shuffle) + one
    grouped mean as ``dim`` per-dimension sums in a single hash
    aggregate — map-side combine reduces every task to one partial row
    per cell, so the shuffle carries n_cells × dim doubles, never the
    vectors. Deterministic seed from :func:`seed_centroids`; empty
    cells keep their previous centroid. Returns (cell, vec_col)."""
    cents = seed_centroids(corpus, n_cells, vec_col, id_col).select(
        "cell", F.col(vec_col).cast("array<double>").alias("_e")
    )
    v = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_e"))
    for _ in range(iters):
        assigned = ivf_assign(v, cents, vec_col="_e", id_col=id_col)
        # EXACT per-dim sums (decimal) so the trained centroids are a
        # pure function of the corpus, independent of partial-agg
        # order — what makes the whole IVF query reproducible by an
        # ANSI-SQL oracle. One deterministic rounding at the end:
        # exact decimal → double, then double / count.
        summed = assigned.groupBy("cell").agg(
            F.count("*").alias("_n"),
            *[
                F.sum(F.element_at("_e", d + 1).cast("decimal(27,10)")).alias(f"_s{d}")
                for d in range(dim)
            ],
        )
        new_cents = summed.select(
            "cell",
            F.array(
                *[
                    F.col(f"_s{d}").cast("double") / F.col("_n")
                    for d in range(dim)
                ]
            ).alias("_nv"),
        )
        prev = cents.select("cell", F.col("_e").alias("_pv"))
        cents = prev.join(new_cents, "cell", "left").select(
            "cell",
            F.coalesce(F.col("_nv"), F.col("_pv")).alias("_e"),
        )
        # materialize the (tiny: n_cells × dim doubles) centroids each
        # iteration — otherwise every later iteration's lazy plan
        # re-embeds and RECOMPUTES all earlier ones, and the consumer
        # (ivf_topk) multiplies that again per reference. This is the
        # standard lineage cut for iterative algorithms.
        rows = [(r["cell"], [float(x) for x in r["_e"]]) for r in cents.collect()]
        cents = corpus.sparkSession.createDataFrame(
            rows, "cell int, _e array<double>"
        )
    return cents.select("cell", F.col("_e").alias(vec_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_iters: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k probing ``nprobe`` cells per query: search cost ≈
    nprobe/n_cells of brute force. Join key is ``cell`` — an equi-join
    the planner co-partitions; a hot cell is AQE-splittable.
    ``train_iters > 0`` refines the seed centroids with k-means
    (requires ``dim``) for better cell balance/recall."""
    if train_iters > 0:
        if dim is None:
            raise ValueError("train_iters > 0 requires dim")
        cents = kmeans_refine(corpus, n_cells, dim, train_iters, vec_col, id_col)
    else:
        cents = seed_centroids(corpus, n_cells, vec_col, id_col)
    assigned = ivf_assign(corpus, cents, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    # nprobe nearest cells per query (centroids tiny → broadcast)
    qcells = ivf_probe_cells(queries, cents, nprobe, vec_col, id_col)
    scored = (
        assigned.join(qcells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", quantized_cosine_udf()(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    c = centroids.select("cell", F.col(vec_col).cast("array<double>").alias("centv"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = q.join(F.broadcast(c)).withColumn(
        "_sim", quantized_cosine_udf()(F.col("qv"), F.col("centv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cell", "qv")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH buckets
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, nbits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    identical on every executor/run (replay determinism, SURVEY §7)."""
    planes = []
    for b in range(nbits):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"hp:{b}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    df: DataFrame,
    dim: int,
    nbits: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``bucket``: sign bits of projections onto nbits fixed
    hyperplanes. Pure built-ins: the planes are literal arrays folded
    with the vector — whole-stage codegen, zero Python."""
    v = F.col(vec_col).cast("array<double>")
    planes = _hyperplanes(dim, nbits)
    bucket = F.lit(0).cast("long")
    for b, row in enumerate(planes):
        proj = _fold_sum(
            F.zip_with(v, F.array(*[F.lit(x) for x in row]), lambda x, y: x * y)
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def lsh_candidate_pairs(
    df: DataFrame,
    dim: int,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate near-dup pairs = vectors sharing an LSH bucket:
    bucket the corpus once, self-join on the bucket key (a plain
    shuffle equi-join — AQE splits a hot bucket), emit distinct
    (doc_a, doc_b). This is the candidate generator the cosine
    verify stage (operators/dedup.embedding_cosine_pairs) consumes —
    candidates ≈ n²/2^nbits instead of n²."""
    b = lsh_bucket(df, dim, nbits, vec_col).select(F.col(id_col), "bucket")
    a = b.select(F.col(id_col).alias("doc_a"), "bucket")
    c = b.select(F.col(id_col).alias("doc_b"), "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket. Equi-join on
    ``bucket`` — candidates ≈ n/2^nbits per query. Bucket bits keep
    the fold-left projection (verified sign margins); the candidate
    SCORING runs the quantized-exact Arrow cosine."""
    c = lsh_bucket(corpus, dim, nbits, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "bucket",
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = lsh_bucket(queries, dim, nbits, vec_col).select(
        F.col(id_col).alias("query_id"),
        "bucket",
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    cos6 = quantized_cosine_udf()
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos6(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
