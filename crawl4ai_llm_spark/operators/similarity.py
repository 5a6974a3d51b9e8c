"""Similarity search over embedding columns (array<float>).

Two oracle-checked tiers plus a throughput tier:

  q_ann_topk          brute-force cosine top-k — the exactness baseline.
                      Queries broadcast against the corpus; one window rank.
  q_ann_lsh_bucketed  sign-LSH bucketing (coordinate-hyperplane signatures):
                      candidates only within the query's bucket. Integer-
                      exact bucket assignment (sign tests), so fully
                      oracle-checkable — this is the plan shape that
                      replaces the n·N scan at 10^9 vectors.
  topk_pandas         numpy/BLAS Pandas-UDF variant of brute force for raw
                      throughput (same results; used by bench, unit-tested
                      against the fold version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_llm_spark.functions import vectors as vx
from crawl4ai_llm_spark.session import load_table

N_QUERIES = 5
TOP_K = 5
# sign of dims 0..7 → 256 buckets. Tolerable for ANN (per-query candidate
# cost = bucket occupancy, linear in n; IVF is the real scale tier) — the
# DEDUP path needs a finer space and uses its own 4×16-bit banded sign
# scheme (operators/dedup.py sign_band_keys), not this constant.
LSH_BITS = 8
LSH_QUERIES = 20
LSH_TOP_K = 3


def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k: the (tiny) query set joins the full corpus — at scale the
    query side broadcasts and the corpus scan stays partition-local; ranking
    is a per-query window over k·|queries| rows after a map-side filter."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim"), 6).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def sign_bucket(vec_col) -> "F.Column":
    """Coordinate-hyperplane sign signature: bit j = (v[j] > 0). Integer-
    exact (no FP accumulation), deterministic in any engine.
    try_element_at: dims past the vector end read null ⇒ bit 0 (plain
    element_at throws under Spark 4 ANSI — same fix as dedup's
    sign_band_keys)."""
    bits = [
        F.when(F.try_element_at(vec_col, F.lit(j + 1)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(LSH_BITS)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("long")


def q_ann_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed ANN: rank only within the query's sign-LSH bucket. The
    bucket column is the shuffle key — at 10^9 vectors each bucket is a
    partition-local candidate list instead of a full scan."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    emb = emb.withColumn("bucket", sign_bucket(F.col("v")))
    q = emb.where(F.col("vec_id") < LSH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        F.broadcast(q)
        .join(emb, (F.col("qb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LSH_TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim"), 6).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


# ANN multiband constants: 8 bands × 8 sign bits over dims 0..63. DEDUP's
# 4×16-bit bands are built for near-IDENTICAL vectors (a 16-bit band match
# at cosine 0.5 has p≈0.0015 — measured recall@3 0.0 on this corpus); ANN
# neighbors are merely CLOSE, so the bands must be looser. 8×8 keeps each
# band as selective as the single-bucket tier (2⁻⁸ of the corpus per band,
# ~3% candidates total) while giving 8 independent chances per neighbor —
# measured recall@3 0.117 vs 0.033 single-bucket at sf0.1 (worst-case
# uniform corpus; real embedding corpora cluster far better). The sweep
# table (4×8/8×8/8×6/16×4) is in BENCH.md; IVF stays the recall tier.
ANN_BANDS = 8
ANN_BAND_BITS = 8
# multi-probe (VERDICT r04 #5): besides the 8 exact band keys, the QUERY
# side also probes 18 one-bit-flipped keys — the flips chosen at the
# globally smallest hyperplane margins |v[dim]| (the coordinates most
# likely to have landed on the wrong side of their sign hyperplane for a
# true neighbor; classic multi-probe LSH). Measured on the worst-case
# uniform corpus (tools/bench_ann_recall.py sweep, BENCH.md): recall@3
# 0.117 → 0.317 at 9.9% of the corpus as candidates (16 flips → 0.283 @
# 9.1%, 20 → 0.350 @ 10.7%; 18 is the last point under the 10% budget).
# The corpus side stays EXACT keys only: the expansion is per-query, so
# the index never grows.
ANN_PROBE_FLIPS = 18


def q_ann_multiband(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-band sign-LSH ANN (VERDICT r03 #5): candidates are vectors
    sharing ≥1 of the query's 8×8-bit sign band keys (dedup's
    sign_band_keys machinery, reused with ANN constants) — the union of 8
    band buckets, deduped, then exact-cosine ranked. vs
    q_ann_lsh_bucketed's ONE 8-bit bucket: 8 independent chances to catch
    a neighbor (recall at 10⁹ no longer hinges on a single bucket), while
    each band's 256-key space keeps per-band candidate lists ∝ n/256.
    Plan shape: band-key equi-join (query side tiny → broadcast),
    distinct, vector join, one window rank — no scan of the corpus
    outside matched keys.

    Measured recall@3 vs exact brute force is reported in BENCH.md (the
    banded candidate rule is the tier's semantics, so the oracle encodes
    the same rule — exactness of the PLAN, not of ANN itself)."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    emb = emb.cache()  # feeds band keys + both vector joins
    from crawl4ai_llm_spark.operators.dedup import sign_band_rows

    bk = sign_band_rows(emb, "vec_id", n_bands=ANN_BANDS, band_bits=ANN_BAND_BITS)
    qk = bk.where(F.col("vec_id") < LSH_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "key"
    )
    cand = (
        F.broadcast(qk)
        .join(bk, ["band", "key"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = emb.where(F.col("vec_id") < LSH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LSH_TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim"), 6).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


_probe_udfs: dict = {}


def multi_probe_keys(
    vec_col,
    n_bands: int = ANN_BANDS,
    band_bits: int = ANN_BAND_BITS,
    n_flips: int = ANN_PROBE_FLIPS,
) -> "F.Column":
    """array<struct<band int, key long>> of probe keys for a QUERY vector:
    the ``n_bands`` exact sign-band keys plus ``n_flips`` one-bit-flipped
    variants, flips chosen at the globally smallest margins |v[dim]| (ties
    → lower dim; dims past the vector length are never flipped). Sign
    semantics match sign_band_keys_fast exactly (NaN sets the bit; NaN
    margins sort last, matching DuckDB's NaN-above-everything order)."""
    key = (n_bands, band_bits, n_flips)
    if key not in _probe_udfs:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        NB, BB, NF = n_bands, band_bits, n_flips
        W = (np.uint64(1) << np.arange(BB, dtype=np.uint64))

        def probes(vs):
            out = []
            for v in vs:
                n = NB * BB
                a = np.zeros(n, dtype=np.float64)
                m = 0 if v is None else min(len(v), n)
                if m:
                    a[:m] = v[:m]
                bits = ((a > 0) | np.isnan(a)).astype(np.uint64).reshape(NB, BB)
                keys = (bits * W).sum(axis=1)  # uint64 per band
                margins = np.abs(a)
                margins[m:] = np.inf  # padded dims can never flip
                order = np.argsort(margins, kind="stable")[:NF]
                rows = [
                    {"band": b, "key": int(np.int64(keys[b]))} for b in range(NB)
                ]
                for idx in order:
                    b, j = int(idx) // BB, int(idx) % BB
                    rows.append(
                        {"band": b, "key": int(np.int64(keys[b] ^ (np.uint64(1) << np.uint64(j))))}
                    )
                out.append(rows)
            return pd.Series(out, dtype=object)

        _probe_udfs[key] = pandas_udf(probes, "array<struct<band:int,key:long>>")
    return _probe_udfs[key](vec_col)


def q_ann_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-probe sign-LSH ANN (VERDICT r04 #5): q_ann_multiband's
    band-key equi-join, with the query side expanded to its exact keys
    PLUS the ANN_PROBE_FLIPS (=18) lowest-margin one-bit flips
    (multi_probe_keys). Plan shape is unchanged — the tiny probe table
    broadcasts against the corpus's exact band rows, distinct,
    exact-cosine rank — so the corpus-side cost is identical to
    multiband; only candidate mass grows (~3% → ~9.9% measured), buying
    recall sub-linearly instead of by widening bands into a scan (the
    16×4 row of the r04 sweep hit 65% of the corpus). The
    probed-candidate rule is the tier's semantics; the DuckDB oracle
    encodes the same rule with the same flip count."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    emb = emb.cache()  # feeds band keys + both vector joins
    from crawl4ai_llm_spark.operators.dedup import sign_band_rows

    bk = sign_band_rows(emb, "vec_id", n_bands=ANN_BANDS, band_bits=ANN_BAND_BITS)
    qp = (
        emb.where(F.col("vec_id") < LSH_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(multi_probe_keys(F.col("v"))).alias("p"),
        )
        .select("query_id", F.col("p.band").alias("band"), F.col("p.key").alias("key"))
    )
    cand = (
        F.broadcast(qp)
        .join(bk, ["band", "key"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = emb.where(F.col("vec_id") < LSH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LSH_TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim"), 6).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def topk_pandas(spark: SparkSession, sf: str, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Throughput tier: brute-force top-k with numpy matmul inside
    mapInPandas — Arrow batches in, one BLAS GEMM per batch. Same results as
    q_ann_topk (unit-tested); ~2 orders of magnitude faster per core than
    per-element fold at large batch sizes."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    q_ids = np.array([r["vec_id"] for r in qrows])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Qn @ Vn.T  # (q, batch) — one GEMM per Arrow batch
            for qi, qid in enumerate(q_ids):
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": pdf["vec_id"].values,
                        "sim": S[qi],
                    }
                )

    scored = emb.mapInPandas(score, "query_id long, vec_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.where(F.col("query_id") != F.col("vec_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("long").alias("rn"))
    )


def ivf_topk(
    spark: SparkSession,
    sf: str,
    n_clusters: int = 16,
    n_probe: int = 10,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """IVF ANN with TRAINED coarse centroids (pyspark.ml KMeans, fixed
    seed): corpus vectors are assigned to their nearest centroid once; a
    query searches only its ``n_probe`` nearest cells. This is the
    10^9-vector plan: the centroid table broadcasts, the corpus shuffles
    once at index build, and each query's candidate scan is
    |corpus|·n_probe/n_clusters. KMeans training isn't SQL-expressible,
    so the unit test measures recall against the exact brute-force top-k;
    the family's GATE entry is q_ann_ivf below — the same probed-cell
    rule over deterministically derived centroids, oracle-checked
    bit-for-bit (VERDICT r06 #2).

    Default n_probe=10 measured on the synthetic corpus (near-uniform — no
    cluster structure, the worst case for a coarse quantizer): recall@5 =
    0.96 at sf0.001, 0.96-1.0 at sf0.01 (n_probe=8 → 0.76 at sf0.001).
    Real embedding corpora cluster, needing far fewer probes per cell
    count."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    ml_df = emb.select("vec_id", array_to_vector("v").alias("features"))
    model = KMeans(k=n_clusters, seed=42, featuresCol="features").fit(ml_df)
    assigned = (
        model.transform(ml_df)
        .select("vec_id", vector_to_array("features").alias("v"), F.col("prediction").alias("cell"))
        .cache()
    )
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]

    # query → n_probe nearest cells (centroid table is tiny: crossJoin lit)
    cent_rows = [(i, c) for i, c in enumerate(centroids)]
    cent_df = spark.createDataFrame(cent_rows, "cell int, centroid array<double>")
    q = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probe = (
        q.join(F.broadcast(cent_df))
        .select("query_id", "qv", "cell", d2.alias("d2"))
        .withColumn("cr", F.row_number().over(w_cell))
        .where(F.col("cr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        probe.join(assigned, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("long").alias("rn"))
    )


# --- deterministic IVF (the gate-checkable member of the IVF family) ----
#
# ivf_topk above is the production tier: KMeans-trained centroids, recall-
# tested against exact brute force. Its training loop isn't SQL, so the
# family's GATE entry derives the quantizer deterministically instead
# (VERDICT r06 #2): stride seeds = the IVF_CELLS lowest vec_ids outside
# the query set, then ONE Lloyd refinement whose per-(cell,dim) mean is a
# sequential fold in vec_id order — bit-identical in Spark
# (aggregate(array_sort(collect_list(...)))) and DuckDB
# (list_reduce(list(x ORDER BY vec_id))). Assignment/probing/scan/top-k
# are exactly ivf_topk's rule: argmin ||v−c||² (tie → lowest cell),
# probe IVF_PROBE nearest cells, exact cosine over probed cells only.
IVF_CELLS = 16
IVF_PROBE = 4
EMB_DIM = 64  # testdata embedding width (all sf); oracle SQL needs it constant


def _ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    fold ||v−c||² sequentially, rank (d2 asc, cell asc) per vector."""
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    return (
        emb.join(F.broadcast(cent))
        .select("vec_id", "v", "cell", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", vx.as_double(F.col("embedding")).alias("v")
    )
    w_seed = Window.orderBy("vec_id")
    cent0 = (
        emb.where(F.col("vec_id") >= LSH_QUERIES)
        .orderBy("vec_id")
        .limit(IVF_CELLS)
        .select((F.row_number().over(w_seed) - 1).alias("cell"), F.col("v").alias("centroid"))
    )
    a1 = _ivf_assign(emb, cent0)
    # Lloyd refinement: per-(cell,dim) mean as an ORDERED fold (vec_id asc)
    # so the double summation order matches the oracle exactly. At corpus
    # scale this pivots to decimal partial sums; here the fold IS the spec.
    dims = a1.select("vec_id", "cell", F.posexplode("v").alias("dim", "x"))
    comp = dims.groupBy("cell", "dim").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("vec_id", "x"))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("sum_x"),
        F.count(F.lit(1)).alias("cnt"),
    )
    cent1 = (
        comp.select("cell", "dim", (F.col("sum_x") / F.col("cnt")).alias("mu"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
            ).alias("centroid")
        )
    )
    assigned = _ivf_assign(emb, cent1)
    # query → IVF_PROBE nearest refined cells
    d2q = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probe = (
        emb.where(F.col("vec_id") < LSH_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .join(F.broadcast(cent1))
        .select("query_id", "qv", "cell", d2q.alias("d2"))
        .withColumn("cr", F.row_number().over(w_cell))
        .where(F.col("cr") <= IVF_PROBE)
        .select("query_id", "qv", "cell")
    )
    cos = vx.cosine(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        probe.join(assigned, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LSH_TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round("sim", 6).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


_SQL_NORMED = """
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), n AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                    (acc, x) -> acc + x)) AS nrm
        FROM e
    )
"""

_SQL_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i])), "
    "(acc, x) -> acc + x)"
)

def _sql_band_key(b: int, bits: int = ANN_BAND_BITS) -> str:
    """DuckDB form of the sign band key for band b (``bits`` sign CASEs
    packed little-endian) — a list index past the end is NULL in DuckDB,
    matching Spark's try_element_at ⇒ bit 0."""
    return (
        "("
        + " + ".join(
            f"(CASE WHEN v[{b * bits + j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        )
        + ")"
    )


_MB_KEYS = ",\n               ".join(
    f"{_sql_band_key(b)} AS k{b}" for b in range(ANN_BANDS)
)
_MB_JOIN = " OR ".join(f"q.k{b} = c.k{b}" for b in range(ANN_BANDS))

_SQL_MULTIBAND = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), n AS (
        SELECT vec_id, v,
               {_MB_KEYS},
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                    (acc, x) -> acc + x)) AS nrm
        FROM e
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               {{dot}} / (q.nrm * c.nrm) AS sim
        FROM n q JOIN n c
          ON q.vec_id < {LSH_QUERIES} AND q.vec_id <> c.vec_id
         AND ({_MB_JOIN})
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {LSH_TOP_K}
"""


# DuckDB form of the multi-probe rule. Structure: band-key structs are
# unnested into (vec_id, band, key) rows for the corpus; query probes are
# the exact keys UNION ALL the 1-bit flips at the ANN_PROBE_FLIPS
# smallest margins (ORDER BY margin, dim — numpy's stable argsort tie
# rule, interpolated into the SQL below so code and oracle cannot
# disagree on the count); candidates
# join on (band, key); exact cosine rank. abs(v[dim+1]) is the raw stored
# value, so the margin comparison is bit-identical to the numpy path;
# dims past the vector end read NULL → infinity (never flipped).
_KEY_STRUCTS = ", ".join(
    f"{{'band': {b}, 'key': k{b}}}" for b in range(ANN_BANDS)
)

_SQL_MULTIPROBE = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), n AS (
        SELECT vec_id, v,
               {_MB_KEYS},
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                    (acc, x) -> acc + x)) AS nrm
        FROM e
    ), ck AS (
        SELECT vec_id, u.band AS band, u.key AS key FROM (
            SELECT vec_id, unnest([{_KEY_STRUCTS}]) AS u FROM n
        )
    ), qm AS (
        SELECT vec_id AS query_id, t.g AS dim,
               COALESCE(ABS(v[t.g + 1]), CAST('infinity' AS DOUBLE)) AS margin
        FROM n, generate_series(0, {ANN_BANDS * ANN_BAND_BITS - 1}) AS t(g)
        WHERE vec_id < {LSH_QUERIES}
    ), flips AS (
        SELECT query_id, dim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY margin ASC, dim ASC) AS r
        FROM qm
    ), qprobe AS (
        SELECT vec_id AS query_id, band, key
        FROM ck WHERE vec_id < {LSH_QUERIES}
        UNION ALL
        SELECT f.query_id, f.dim // {ANN_BAND_BITS} AS band,
               xor(c.key, 1 << (f.dim % {ANN_BAND_BITS})) AS key
        FROM flips f
        JOIN ck c ON c.vec_id = f.query_id AND c.band = f.dim // {ANN_BAND_BITS}
        WHERE f.r <= {ANN_PROBE_FLIPS}
    ), cand AS (
        SELECT DISTINCT p.query_id, c.vec_id
        FROM qprobe p JOIN ck c ON c.band = p.band AND c.key = p.key
        WHERE c.vec_id <> p.query_id
    ), scored AS (
        SELECT cand.query_id, cand.vec_id,
               list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(generate_series(1, len(qn.v)),
                                  i -> qn.v[i] * cn.v[i])),
                   (acc, x) -> acc + x) / (qn.nrm * cn.nrm) AS sim
        FROM cand
        JOIN n qn ON qn.vec_id = cand.query_id
        JOIN n cn ON cn.vec_id = cand.vec_id
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {LSH_TOP_K}
"""


# DuckDB form of the deterministic IVF rule — same CTE skeleton as the
# Spark plan: seeds → assign → ordered-fold Lloyd means → reassign →
# probe → exact cosine over probed cells. The per-(cell,dim) mean folds
# in vec_id order (list(x ORDER BY vec_id)) to match Spark's
# array_sort(collect_list(struct(vec_id, x))) summation order exactly.
def _sql_d2(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (acc, x) -> acc + x)"
    )


_SQL_IVF = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v
        FROM e WHERE vec_id >= {LSH_QUERIES} ORDER BY vec_id LIMIT {IVF_CELLS}
    ), a1 AS (
        SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, s.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_sql_d2('e.v', 's.v')} ASC,
                                               s.cell ASC) AS rn
            FROM e CROSS JOIN seeds s
        ) WHERE rn = 1
    ), dims AS (
        SELECT vec_id, cell, t.i - 1 AS dim, v[t.i] AS x
        FROM a1, generate_series(1, {EMB_DIM}) AS t(i)
    ), comp AS (
        SELECT cell, dim,
               list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY vec_id)),
                           (acc, y) -> acc + y) / COUNT(*) AS mu
        FROM dims GROUP BY cell, dim
    ), cent1 AS (
        SELECT cell, list(mu ORDER BY dim) AS v FROM comp GROUP BY cell
    ), a2 AS (
        SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_sql_d2('e.v', 'c.v')} ASC,
                                               c.cell ASC) AS rn
            FROM e CROSS JOIN cent1 c
        ) WHERE rn = 1
    ), n AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                    (acc, x) -> acc + x)) AS nrm
        FROM e
    ), probe AS (
        SELECT query_id, cell FROM (
            SELECT e.vec_id AS query_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_sql_d2('e.v', 'c.v')} ASC,
                                               c.cell ASC) AS cr
            FROM e CROSS JOIN cent1 c WHERE e.vec_id < {LSH_QUERIES}
        ) WHERE cr <= {IVF_PROBE}
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(generate_series(1, len(qn.v)),
                                  i -> qn.v[i] * cn.v[i])),
                   (acc, x) -> acc + x) / (qn.nrm * cn.nrm) AS sim
        FROM probe p
        JOIN a2 a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
        JOIN n cn ON cn.vec_id = a.vec_id
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {LSH_TOP_K}
"""


ORACLES: dict[str, str] = {
    "q_ann_ivf": _SQL_IVF,
    "q_ann_multiband": _SQL_MULTIBAND.format(dot=_SQL_DOT),
    "q_ann_multiprobe": _SQL_MULTIPROBE,
    "q_ann_topk": _SQL_NORMED
    + f"""
    , scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               {_SQL_DOT} / (q.nrm * c.nrm) AS sim
        FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    "q_ann_lsh_bucketed": f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), n AS (
        SELECT vec_id, v,
               (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
             + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
             + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
             + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END)
             + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                    (acc, x) -> acc + x)) AS nrm
        FROM e
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               {_SQL_DOT} / (q.nrm * c.nrm) AS sim
        FROM n q JOIN n c ON q.vec_id < {LSH_QUERIES} AND q.vec_id <> c.vec_id
                          AND q.bucket = c.bucket
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {LSH_TOP_K}
    """,
}

QUERIES = {
    "q_ann_topk": q_ann_topk,
    "q_ann_lsh_bucketed": q_ann_lsh_bucketed,
    "q_ann_multiband": q_ann_multiband,
    "q_ann_multiprobe": q_ann_multiprobe,
    "q_ann_ivf": q_ann_ivf,
}
