"""Nearest-centroid assignment + external validation (SURVEY.md §2A A4/A14).

Reference parity: ClusterIndices assigns points with MLlib's
``model.predict`` (nearest centroid). Here the assignment is a pure dataflow —
argmin over the broadcast centroid array with a deterministic (d2, cl)
tie-break — so it is SQL-expressible and oracle-checked, unlike an MLlib fit.

Scale: one broadcast join + per-row O(K·dim) codegen math; zero shuffle for
assignment itself, one K×L-group shuffle for the contingency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterindices_spark.functions.aggregates import SQL_ROUND6
from clusterindices_spark.operators.indices import (
    centroids_of,
    labeled_points,
    with_dist_array,
)


def assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cluster, assigned_cluster): argmin_cl ‖x − c_cl‖², ties broken
    by smallest cluster id via lexicographic struct min — deterministic in
    both engines.

    The argmin compares ROUND6-quantized d2 (r9 hostile gate): an argmin is
    a threshold decision, and raw float d2 exposes it to aggregation-order
    ulp noise — DuckDB's parallel SUM in the oracle's `pc` CTE is
    order-nondeterministic at the last bit, so exact-tie duplicates (two
    identical vectors under different labels) flip assignments BETWEEN RUNS
    of the same oracle. Quantizing both sides (here + the oracle's
    ORDER BY floor(d2·1e6+0.5)) makes ulps irrelevant; genuine sub-1e-6
    ties fall to the stable cluster-id tie-break."""
    from clusterindices_spark.functions.aggregates import round6_stable

    best = F.array_min(
        F.transform(
            F.col("d2s"),
            lambda s: F.struct(
                round6_stable(s["d2"]).alias("d2"), s["cl"].alias("cl")
            ),
        )
    )
    return with_dist_array(pts, cents).select(
        "vec_id", "cluster", best["cl"].alias("assigned_cluster")
    )


def q_assign_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = labeled_points(spark, sf_dir)
    return assign(pts, centroids_of(pts)).select("vec_id", "assigned_cluster")


def q_cluster_label_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency of assigned cluster × true label (A14 external validation):
    with label-derived centroids the diagonal dominates iff labels are
    geometrically coherent."""
    pts = labeled_points(spark, sf_dir)
    assigned = assign(pts, centroids_of(pts))
    return (
        assigned.groupBy(
            F.col("assigned_cluster").alias("cluster"), F.col("cluster").alias("label")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_cluster_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² statistic of the cluster×label contingency (A14's χ²-style external
    validation): χ² = Σ_cells (O−E)²/E over the FULL K×L grid (zero-observed
    cells still contribute E), E = row·col/N. The grid is built by cross-
    joining the two marginal tables — K×L ≤ 100 rows, driver-scale math kept
    distributed anyway for shape consistency.
    BOUND (int64, pinned r9): E's numerator row·col is a BIGINT product of
    marginals ≤ N each — exact while N < ~3.0e9 points; past it Spark
    ANSI-errors LOUDLY (tests/test_int64_bounds.py). Same bound governs
    the n·(n−1) pair counts in external_agreement / agreement_ext below."""
    cont = q_cluster_label_contingency(spark, sf_dir)
    row_tot = cont.groupBy("cluster").agg(F.sum("n").alias("row_n"))
    col_tot = cont.groupBy("label").agg(F.sum("n").alias("col_n"))
    n_total = cont.agg(F.sum("n").alias("grand_n"))
    grid = (
        row_tot.crossJoin(col_tot)
        .join(F.broadcast(n_total))
        .join(cont, ["cluster", "label"], "left")
        .select(
            "cluster",
            "label",
            F.coalesce("n", F.lit(0)).alias("obs"),
            (F.col("row_n") * F.col("col_n") / F.col("grand_n")).alias("exp"),
        )
    )
    return grid.agg(
        F.round(
            F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp")), 6
        ).alias("chi2"),
        (
            (F.countDistinct("cluster") - 1) * (F.countDistinct("label") - 1)
        ).cast("bigint").alias("dof"),
        F.sum("obs").alias("n_points"),
    )


def external_agreement(cont: DataFrame) -> DataFrame:
    """ARI + NMI + Cramér's V from a (cluster, label, n) contingency table —
    the standard external-agreement trio over the same K×L counts χ² uses.

    - ARI (Hubert–Arabie): pair-counting index from ΣC(n_ij,2) and the
      marginal pair sums; every pair count is an exact BIGINT, only the
      final ratio is floating. BOUND (int64, pinned r9): C(n,2) =
      n·(n−1) div 2 is exact while every marginal/cell count n < ~3.0e9
      (n² < 2⁶³); past it Spark ANSI-errors LOUDLY. The pr·pl product
      under ARI's sqrt is cast to double BEFORE multiplying — by intent
      (it only feeds a float normalizer).
    - NMI (sqrt normalization): MI = (Σ n·ln n over cells − rows − cols
      + N·ln N)/N, H from the marginals — the n·ln n formulation keeps
      every term a function of an integer count, so both engines feed ln
      identical arguments.
    - Cramér's V via χ² = N·(Σ n_ij²/(a_i·b_j) − 1): the sum form needs no
      zero-cell grid (empty cells contribute nothing), unlike the (O−E)²/E
      grid in q_cluster_chi2.

    Scale: cont is K×L ≤ ~100 rows; marginals broadcast; all math is one
    tiny agg + a 1-row cross-join — driver-scale kept distributed for
    shape consistency with the rest of the suite.
    """
    row_tot = cont.groupBy("cluster").agg(F.sum("n").alias("a"))
    col_tot = cont.groupBy("label").agg(F.sum("n").alias("b"))
    cells = (
        cont.join(F.broadcast(row_tot), "cluster")
        .join(F.broadcast(col_tot), "label")
        .agg(
            # pair counts stay in integer arithmetic end-to-end: n*(n-1) is
            # even, so div 2 is exact — float division would round above 2^53
            # (n ≈ 1.35e8 per cell) and truncate differently per engine
            F.expr("sum(n * (n - 1)) div 2").cast("bigint").alias("pc"),
            F.sum(F.col("n").cast("double") * F.log(F.col("n").cast("double"))).alias(
                "nln_c"
            ),
            F.sum(
                (F.col("n") * F.col("n")).cast("double")
                / (F.col("a") * F.col("b")).cast("double")
            ).alias("nsq_ab"),
        )
    )
    rows_m = row_tot.agg(
        F.expr("sum(a * (a - 1)) div 2").cast("bigint").alias("pr"),
        F.sum(F.col("a").cast("double") * F.log(F.col("a").cast("double"))).alias(
            "nln_r"
        ),
        F.sum("a").cast("bigint").alias("n_points"),
        F.count(F.lit(1)).alias("k"),
    )
    cols_m = col_tot.agg(
        F.expr("sum(b * (b - 1)) div 2").cast("bigint").alias("pl"),
        F.sum(F.col("b").cast("double") * F.log(F.col("b").cast("double"))).alias(
            "nln_l"
        ),
        F.count(F.lit(1)).alias("l"),
    )
    j = cells.join(F.broadcast(rows_m)).join(F.broadcast(cols_m))
    n = F.col("n_points").cast("double")
    # nullif: a 1-point corpus (fuzz wave-3 one:embeddings) makes the pair
    # denominator 0 — ANSI Spark raises where DuckDB's x/0 is NULL; the
    # degenerate contract is NULL indices, matching the oracle
    exp_idx = (
        F.col("pr").cast("double") * F.col("pl").cast("double")
        / F.nullif(n * (n - 1) / 2, F.lit(0.0))
    )
    max_idx = (F.col("pr") + F.col("pl")).cast("double") / 2
    mi = (F.col("nln_c") - F.col("nln_r") - F.col("nln_l")) / n + F.log(n)
    # entropies are >= 0 mathematically; float error can land a hair below
    # (single-cluster case: ln n − (n·ln n)/n), and a negative product under
    # sqrt would emit NaN instead of the NULL the k=1/l=1 case contracts
    h_c = F.greatest(F.log(n) - F.col("nln_r") / n, F.lit(0.0))
    h_l = F.greatest(F.log(n) - F.col("nln_l") / n, F.lit(0.0))
    return j.select(
        F.round(
            (F.col("pc").cast("double") - exp_idx)
            / F.nullif(max_idx - exp_idx, F.lit(0.0)),
            6,
        ).alias("ari"),
        F.round(mi / F.nullif(F.sqrt(h_c * h_l), F.lit(0.0)), 6).alias("nmi"),
        # undefined for a single cluster or single label (k=1 or l=1): NULL,
        # not an ANSI divide-by-zero; numerator clamped at 0 because float
        # summation can land epsilon below the mathematical floor nsq_ab >= 1
        F.round(
            F.sqrt(
                F.greatest(F.col("nsq_ab") - 1, F.lit(0.0))
                / F.nullif(
                    F.least(F.col("k") - 1, F.col("l") - 1).cast("double"),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("cramers_v"),
        F.col("n_points"),
    )


def q_cluster_external_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 external-validation depth beyond χ²: ARI, NMI, Cramér's V of
    assigned cluster × true label."""
    return external_agreement(q_cluster_label_contingency(spark, sf_dir))


def agreement_ext(cont: DataFrame) -> DataFrame:
    """Second external-agreement family over the same contingency counts:

    - Fowlkes–Mallows: pc/√(pr·pl) — TP/√((TP+FP)(TP+FN)) in the pair
      formulation; exact BIGINT pair counts, one floating ratio.
    - homogeneity / completeness / V-measure (Rosenberg & Hirschberg 2007,
      sklearn conventions pinned): h = 1 − H(L|C)/H(L) with the n·ln n
      formulation — H(L|C) = (nln_r − nln_c)/N, H(L) = ln N − nln_l/N —
      so both engines feed ln identical integer arguments; h := 1 when
      H(L) = 0, c := 1 when H(C) = 0, V := 0 when h + c = 0.
    - purity: Σ_i max_j n_ij / N.

    Scale: identical posture to external_agreement — K×L ≤ ~100-row
    contingency, broadcast marginals, 1-row result."""
    from clusterindices_spark.functions.aggregates import round6_stable

    row_tot = cont.groupBy("cluster").agg(F.sum("n").alias("a"))
    col_tot = cont.groupBy("label").agg(F.sum("n").alias("b"))
    cells = cont.agg(
        F.expr("sum(n * (n - 1)) div 2").cast("bigint").alias("pc"),
        F.sum(F.col("n").cast("double") * F.log(F.col("n").cast("double"))).alias(
            "nln_c"
        ),
    )
    rows_m = row_tot.agg(
        F.expr("sum(a * (a - 1)) div 2").cast("bigint").alias("pr"),
        F.sum(F.col("a").cast("double") * F.log(F.col("a").cast("double"))).alias(
            "nln_r"
        ),
        F.sum("a").cast("bigint").alias("n_points"),
    )
    cols_m = col_tot.agg(
        F.expr("sum(b * (b - 1)) div 2").cast("bigint").alias("pl"),
        F.sum(F.col("b").cast("double") * F.log(F.col("b").cast("double"))).alias(
            "nln_l"
        ),
    )
    pure = (
        cont.groupBy("cluster")
        .agg(F.max("n").alias("maxn"))
        .agg(F.sum("maxn").cast("bigint").alias("pure_n"))
    )
    j = (
        cells.join(F.broadcast(rows_m))
        .join(F.broadcast(cols_m))
        .join(F.broadcast(pure))
    )
    n = F.col("n_points").cast("double")
    # H(L) and H(C) scaled by N (avoids a needless /N on both sides of the
    # ratio); clamped at 0 like external_agreement's entropies
    nh_l = F.greatest(n * F.log(n) - F.col("nln_l"), F.lit(0.0))
    nh_c = F.greatest(n * F.log(n) - F.col("nln_r"), F.lit(0.0))
    h = F.when(nh_l == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.greatest(F.col("nln_r") - F.col("nln_c"), F.lit(0.0)) / nh_l
    )
    c = F.when(nh_c == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.greatest(F.col("nln_l") - F.col("nln_c"), F.lit(0.0)) / nh_c
    )
    v = F.when(h + c == 0.0, F.lit(0.0)).otherwise(2.0 * h * c / (h + c))
    return j.select(
        round6_stable(
            F.col("pc").cast("double")
            / F.nullif(
                F.sqrt(F.col("pr").cast("double") * F.col("pl").cast("double")),
                F.lit(0.0),
            )
        ).alias("fowlkes_mallows"),
        round6_stable(h).alias("homogeneity"),
        round6_stable(c).alias("completeness"),
        round6_stable(v).alias("v_measure"),
        round6_stable(F.col("pure_n").cast("double") / n).alias("purity"),
        F.col("n_points"),
    )


def q_cluster_agreement_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agreement_ext(q_cluster_label_contingency(spark, sf_dir))


QUERIES = {
    "assign_nearest_centroid": q_assign_nearest_centroid,
    "cluster_label_contingency": q_cluster_label_contingency,
    "cluster_chi2": q_cluster_chi2,
    "cluster_external_agreement": q_cluster_external_agreement,
    "cluster_agreement_ext": q_cluster_agreement_ext,
}

_PC = """
WITH pts AS (
  SELECT vec_id, label AS cluster, CAST(embedding AS DOUBLE[]) AS x
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
dimvals AS (
  SELECT vec_id, cluster, unnest(range(len(x))) AS dim, unnest(x) AS val FROM pts
),
cent AS (
  SELECT cluster AS cl, dim, AVG(val) AS m FROM dimvals GROUP BY cluster, dim
),
pc AS (
  SELECT d.vec_id, d.cluster, c.cl, SUM((d.val - c.m) * (d.val - c.m)) AS d2
  FROM dimvals d JOIN cent c ON d.dim = c.dim
  GROUP BY d.vec_id, d.cluster, c.cl
),
assigned AS (
  SELECT vec_id, cluster, CAST(cl AS INT) AS assigned_cluster
  FROM (
    SELECT vec_id, cluster, cl,
           -- round6-quantized argmin: see assign()'s docstring (ulp-stable
           -- under DuckDB's order-nondeterministic parallel float SUM)
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY floor(d2 * 1000000.0 + 0.5), cl
           ) AS rn
    FROM pc
  )
  WHERE rn = 1
)
"""

ORACLES = {
    "assign_nearest_centroid": _PC
    + "SELECT vec_id, assigned_cluster FROM assigned",
    "cluster_label_contingency": _PC
    + """
SELECT a.assigned_cluster AS cluster, a.cluster AS label, COUNT(*) AS n
FROM assigned a GROUP BY a.assigned_cluster, a.cluster
""",
    "cluster_chi2": _PC
    + """
, cont AS (
  SELECT a.assigned_cluster AS cluster, a.cluster AS label, COUNT(*) AS n
  FROM assigned a GROUP BY a.assigned_cluster, a.cluster
),
row_tot AS (SELECT cluster, SUM(n) AS row_n FROM cont GROUP BY cluster),
col_tot AS (SELECT label, SUM(n) AS col_n FROM cont GROUP BY label),
grand AS (SELECT SUM(n) AS grand_n FROM cont),
grid AS (
  SELECT r.cluster, c.label,
         COALESCE(o.n, 0) AS obs,
         r.row_n * c.col_n / g.grand_n AS exp
  FROM row_tot r CROSS JOIN col_tot c CROSS JOIN grand g
  LEFT JOIN cont o ON o.cluster = r.cluster AND o.label = c.label
)
SELECT ROUND(SUM((obs - exp) * (obs - exp) / exp), 6) AS chi2,
       CAST((COUNT(DISTINCT cluster) - 1) * (COUNT(DISTINCT label) - 1) AS BIGINT) AS dof,
       CAST(SUM(obs) AS BIGINT) AS n_points
FROM grid
""",
    "cluster_external_agreement": _PC
    + """
, cont AS (
  SELECT a.assigned_cluster AS cluster, a.cluster AS label, COUNT(*) AS n
  FROM assigned a GROUP BY a.assigned_cluster, a.cluster
),
row_tot AS (SELECT cluster, SUM(n) AS a FROM cont GROUP BY cluster),
col_tot AS (SELECT label, SUM(n) AS b FROM cont GROUP BY label),
cells AS (
  SELECT CAST(SUM(o.n * (o.n - 1)) // 2 AS BIGINT) AS pc,
         SUM(CAST(o.n AS DOUBLE) * ln(CAST(o.n AS DOUBLE))) AS nln_c,
         SUM(CAST(o.n * o.n AS DOUBLE) / CAST(r.a * c.b AS DOUBLE)) AS nsq_ab
  FROM cont o
  JOIN row_tot r USING (cluster)
  JOIN col_tot c USING (label)
),
rows_m AS (
  SELECT CAST(SUM(a * (a - 1)) // 2 AS BIGINT) AS pr,
         SUM(CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE))) AS nln_r,
         CAST(SUM(a) AS BIGINT) AS n_points,
         COUNT(*) AS k
  FROM row_tot
),
cols_m AS (
  SELECT CAST(SUM(b * (b - 1)) // 2 AS BIGINT) AS pl,
         SUM(CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE))) AS nln_l,
         COUNT(*) AS l
  FROM col_tot
)
SELECT
  ROUND((CAST(pc AS DOUBLE)
         - CAST(pr AS DOUBLE) * CAST(pl AS DOUBLE)
           / (CAST(n_points AS DOUBLE) * (n_points - 1) / 2))
        / NULLIF(CAST(pr + pl AS DOUBLE) / 2
                 - CAST(pr AS DOUBLE) * CAST(pl AS DOUBLE)
                   / (CAST(n_points AS DOUBLE) * (n_points - 1) / 2), 0.0),
        6) AS ari,
  ROUND(((nln_c - nln_r - nln_l) / n_points + ln(CAST(n_points AS DOUBLE)))
        / NULLIF(sqrt(greatest(ln(CAST(n_points AS DOUBLE)) - nln_r / n_points, 0.0)
                      * greatest(ln(CAST(n_points AS DOUBLE)) - nln_l / n_points, 0.0)), 0.0),
        6) AS nmi,
  ROUND(sqrt(greatest(nsq_ab - 1, 0.0)
             / NULLIF(CAST(least(k - 1, l - 1) AS DOUBLE), 0.0)), 6) AS cramers_v,
  n_points
FROM cells, rows_m, cols_m
""",
    "cluster_agreement_ext": _PC
    + """
, cont AS (
  SELECT a.assigned_cluster AS cluster, a.cluster AS label, COUNT(*) AS n
  FROM assigned a GROUP BY a.assigned_cluster, a.cluster
),
row_tot AS (SELECT cluster, SUM(n) AS a FROM cont GROUP BY cluster),
col_tot AS (SELECT label, SUM(n) AS b FROM cont GROUP BY label),
cells AS (
  SELECT CAST(SUM(n * (n - 1)) // 2 AS BIGINT) AS pc,
         SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nln_c
  FROM cont
),
rows_m AS (
  SELECT CAST(SUM(a * (a - 1)) // 2 AS BIGINT) AS pr,
         SUM(CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE))) AS nln_r,
         CAST(SUM(a) AS BIGINT) AS n_points
  FROM row_tot
),
cols_m AS (
  SELECT CAST(SUM(b * (b - 1)) // 2 AS BIGINT) AS pl,
         SUM(CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE))) AS nln_l
  FROM col_tot
),
pure AS (
  SELECT CAST(SUM(maxn) AS BIGINT) AS pure_n
  FROM (SELECT MAX(n) AS maxn FROM cont GROUP BY cluster)
),
hc AS (
  SELECT *,
    greatest(CAST(n_points AS DOUBLE) * ln(CAST(n_points AS DOUBLE)) - nln_l, 0.0) AS nh_l,
    greatest(CAST(n_points AS DOUBLE) * ln(CAST(n_points AS DOUBLE)) - nln_r, 0.0) AS nh_c
  FROM cells, rows_m, cols_m, pure
),
hv AS (
  SELECT *,
    CASE WHEN nh_l = 0.0 THEN 1.0
         ELSE 1.0 - greatest(nln_r - nln_c, 0.0) / nh_l END AS h,
    CASE WHEN nh_c = 0.0 THEN 1.0
         ELSE 1.0 - greatest(nln_l - nln_c, 0.0) / nh_c END AS c
  FROM hc
)
SELECT
  """
    + SQL_ROUND6.format(
        x="CAST(pc AS DOUBLE) / NULLIF(sqrt(CAST(pr AS DOUBLE) * CAST(pl AS DOUBLE)), 0.0)"
    )
    + """ AS fowlkes_mallows,
  """
    + SQL_ROUND6.format(x="h")
    + """ AS homogeneity,
  """
    + SQL_ROUND6.format(x="c")
    + """ AS completeness,
  """
    + SQL_ROUND6.format(
        x="CASE WHEN h + c = 0.0 THEN 0.0 ELSE 2.0 * h * c / (h + c) END"
    )
    + """ AS v_measure,
  """
    + SQL_ROUND6.format(x="CAST(pure_n AS DOUBLE) / n_points")
    + """ AS purity,
  n_points
FROM hv
""",
}
