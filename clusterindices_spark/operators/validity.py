"""Round-3 widening of the clustering-validity surface (SURVEY.md §2A⁺).

Four more indices from the public validity-index literature, same
architecture as operators/indices.py (one scan → broadcast K-row centroid
table → codegen HOF math → K-scale aggregation):

- Wemmert–Gançarski (clusterCrit §"WemmertGancarski"): per point
  R(p) = d_own / min-other-centroid distance; J_k = max(0, 1 − mean_k R);
  WG = (1/n) Σ_k n_k J_k. Rides point_metrics — no new shuffle topology.
- SD index (Halkidi, Vazirgiannis & Batistakis 2000): average scattering
  Scat = (1/K) Σ_k ‖σ_k‖/‖σ_X‖ (per-dim population variances, Euclidean
  norm) plus total separation Dis = (Dmax/Dmin) Σ_i (Σ_j ‖c_i−c_j‖)⁻¹.
  Pinned: sd_index = Scat + Dis (α = 1; the paper's α = Dis(c_max) is
  sweep-relative, so both components are also emitted for reweighting).
- S_Dbw (Halkidi & Vazirgiannis 2001): Scat as above + inter-cluster
  density Dens_bw, with stdev = (1/K)·sqrt(Σ_k ‖σ_k‖); density counted
  over the pair's union within radius stdev of the midpoint vs the two
  centroids. Pinned: a pair with max(density(v_i), density(v_j)) = 0
  contributes 0. Membership test compares SQUARED distance to stdev² in
  both engines (no sqrt at the boundary).
- C-index (Hubert & Levin 1976): (S_w − S_min)/(S_max − S_min) with S_w
  the sum of within-cluster pair distances, S_min/S_max the sums of the
  n_w smallest/largest distances over ALL pairs. O(n²) yardstick —
  guarded by functions/guards.cap_quadratic like silhouette_exact.

Scale posture (100 TB): WG / SD / S_Dbw stay linear — per-dim variance
aggregations are K·p / p groups with map-side partial agg; the S_Dbw
density join replicates each point 2(K−1) times against a broadcast
K²-row pair table (K is small by construction). C-index is the documented
quadratic ground-truth tier and refuses oversized input.

/root/reference is empty (SURVEY.md §0) — no file:line citations are
possible; the DuckDB oracles below are the correctness authority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clusterindices_spark.functions.aggregates import SQL_ROUND6, round6_stable
from clusterindices_spark.functions.distances import l2, l2sq
from clusterindices_spark.operators.indices import (
    _PREFIX,
    centroid_pair_dists,
    centroids_of,
    labeled_points,
    point_metrics,
)

# ---------------------------------------------------------------------------
# Wemmert–Gançarski
# ---------------------------------------------------------------------------


def wemmert_gancarski_of(pts: DataFrame) -> DataFrame:
    """WG index in the centroid form. R(p) undefined when the nearest other
    centroid coincides with the point (d_nearest_other = 0): NULL in both
    engines, dropped from the per-cluster mean (AVG skips NULLs)."""
    pm = point_metrics(pts, centroids_of(pts))
    r = F.col("d_own") / F.nullif(F.col("d_nearest_other"), F.lit(0.0))
    per = pm.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_k"), F.avg(r).alias("rbar")
    )
    j_k = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("rbar"))
    return per.agg(
        F.count(F.lit(1)).alias("k"),
        round6_stable(F.sum(F.col("n_k") * j_k) / F.sum("n_k")).alias(
            "wemmert_gancarski"
        ),
    )


def q_wemmert_gancarski(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wemmert_gancarski_of(labeled_points(spark, sf_dir))


# ---------------------------------------------------------------------------
# shared variance-norm blocks (SD and S_Dbw)
# ---------------------------------------------------------------------------


def _dimvals(pts: DataFrame) -> DataFrame:
    return pts.select("cluster", F.posexplode("x").alias("dim", "val"))


def _cluster_var_norms(pts: DataFrame) -> DataFrame:
    """(cluster, nk = ‖per-dim population-variance vector‖)."""
    return (
        _dimvals(pts)
        .groupBy("cluster", "dim")
        .agg(F.var_pop("val").alias("v"))
        .groupBy("cluster")
        .agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nk"))
    )


def _global_var_norm(pts: DataFrame) -> DataFrame:
    """1-row (ng = ‖global per-dim population-variance vector‖)."""
    return (
        _dimvals(pts)
        .groupBy("dim")
        .agg(F.var_pop("val").alias("v"))
        .agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("ng"))
    )


def _scat_row(pts: DataFrame) -> DataFrame:
    """1-row (k, scat): average scattering, shared by SD and S_Dbw."""
    return (
        _cluster_var_norms(pts)
        .crossJoin(F.broadcast(_global_var_norm(pts)))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.avg(F.col("nk") / F.nullif(F.col("ng"), F.lit(0.0))).alias("scat"),
        )
    )


def sd_index_of(pts: DataFrame) -> DataFrame:
    pairs = centroid_pair_dists(centroids_of(pts))
    # Σ_j ‖c_i − c_j‖ per i, then Σ_i of the reciprocals; Dmax/Dmin scale it
    inv_sum = (
        pairs.groupBy("i")
        .agg(F.sum("dist").alias("sum_d"))
        .agg(F.sum(F.lit(1.0) / F.nullif(F.col("sum_d"), F.lit(0.0))).alias("inv"))
    )
    ext = pairs.agg(F.max("dist").alias("dmax"), F.min("dist").alias("dmin"))
    return (
        _scat_row(pts)
        .crossJoin(ext)
        .crossJoin(inv_sum)
        .select(
            "k",
            round6_stable(F.col("scat")).alias("sd_scat"),
            round6_stable(
                F.col("dmax") / F.nullif(F.col("dmin"), F.lit(0.0)) * F.col("inv")
            ).alias("sd_dis"),
            round6_stable(
                F.col("scat")
                + F.col("dmax") / F.nullif(F.col("dmin"), F.lit(0.0)) * F.col("inv")
            ).alias("sd_index"),
        )
    )


def q_sd_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sd_index_of(labeled_points(spark, sf_dir))


def s_dbw_of(pts: DataFrame) -> DataFrame:
    cents = centroids_of(pts)
    # stdev = (1/K) sqrt(Σ_k ‖σ_k‖) — one K-row aggregate
    stdev = _cluster_var_norms(pts).agg(
        (F.sqrt(F.sum("nk")) / F.count(F.lit(1))).alias("sd")
    )
    # unordered centroid pairs with midpoints; K(K−1)/2 rows, broadcastable
    a = cents.select(F.col("cluster").alias("i"), F.col("centroid").alias("ca"))
    b = cents.select(F.col("cluster").alias("j"), F.col("centroid").alias("cb"))
    prs = (
        a.crossJoin(b)
        .where(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            "ca",
            "cb",
            F.zip_with("ca", "cb", lambda x, y: (x + y) / F.lit(2.0)).alias("u"),
        )
    )
    # replicate each pair under both member clusters → plain equi-join on
    # cluster (broadcast hash join; n·2(K−1) probe rows, never a BNLJ)
    prs_long = prs.select(
        "i", "j", "ca", "cb", "u", F.explode(F.array("i", "j")).alias("cluster")
    )
    sd2 = (F.col("sd") * F.col("sd")).alias("sd2")
    probed = (
        pts.join(F.broadcast(prs_long), "cluster")
        .crossJoin(F.broadcast(stdev.select(sd2)))
        .select(
            "i",
            "j",
            (l2sq(F.col("x"), F.col("u")) <= F.col("sd2")).cast("int").alias("near_u"),
            (l2sq(F.col("x"), F.col("ca")) <= F.col("sd2"))
            .cast("int")
            .alias("near_i"),
            (l2sq(F.col("x"), F.col("cb")) <= F.col("sd2"))
            .cast("int")
            .alias("near_j"),
        )
    )
    per_pair = probed.groupBy("i", "j").agg(
        F.sum("near_u").alias("du"),
        F.sum("near_i").alias("di"),
        F.sum("near_j").alias("dj"),
    )
    term = F.when(
        F.greatest("di", "dj") > 0,
        F.col("du") / F.greatest("di", "dj").cast("double"),
    ).otherwise(F.lit(0.0))
    dens = per_pair.agg(F.avg(term).alias("dens_bw"))
    return (
        _scat_row(pts)
        .crossJoin(dens)
        .select(
            "k",
            round6_stable(F.col("scat")).alias("s_dbw_scat"),
            round6_stable(F.col("dens_bw")).alias("dens_bw"),
            round6_stable(F.col("scat") + F.col("dens_bw")).alias("s_dbw"),
        )
    )


def q_s_dbw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return s_dbw_of(labeled_points(spark, sf_dir))


# ---------------------------------------------------------------------------
# C-index (guarded quadratic yardstick)
# ---------------------------------------------------------------------------


def c_index_of(
    pts: DataFrame,
    sample_fraction: float | None = None,
    max_rows: int | None = None,
) -> DataFrame:
    """Hubert–Levin C-index. n_w comes from cluster counts (Σ n_k(n_k−1)/2,
    no pair scan); one pass over the i<j pair distances ranks them both
    ways (single-partition window — acceptable only because cap_quadratic
    bounds the input; this tier is the yardstick, not the scale path).
    BOUND (int64, pinned r9): the n_k·(n_k−1) pair counts need n_k <
    ~3.0e9 — structurally unreachable here because cap_quadratic bounds
    total rows to QUADRATIC_MAX_ROWS long before any cluster count nears
    the line; the bound is inherited, not load-bearing."""
    from clusterindices_spark.functions.guards import (
        QUADRATIC_MAX_ROWS,
        cap_quadratic,
    )

    pts = cap_quadratic(
        pts,
        "c_index",
        "vec_id",
        max_rows=max_rows if max_rows is not None else QUADRATIC_MAX_ROWS,
        sample_fraction=sample_fraction,
    )
    n_w_row = (
        pts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_k"))
        .agg(
            F.expr("sum(n_k * (n_k - 1) div 2)").cast("bigint").alias("n_w")
        )
    )
    a = pts.select(
        F.col("vec_id").alias("pid"), F.col("cluster").alias("pcl"), F.col("x").alias("xa")
    )
    b = pts.select(
        F.col("vec_id").alias("qid"), F.col("cluster").alias("qcl"), F.col("x").alias("xb")
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("pid") < F.col("qid"))
        .select(
            l2("xa", "xb").alias("d"),
            (F.col("pcl") == F.col("qcl")).cast("int").alias("w"),
        )
    )
    ranked = pairs.select(
        "d",
        "w",
        F.row_number().over(Window.orderBy("d")).alias("rn_asc"),
        F.row_number().over(Window.orderBy(F.desc("d"))).alias("rn_desc"),
    )
    # groupBy(n_w), not a global agg: on an EMPTY pair set a global agg
    # still emits its one NULL row while the oracle's `FROM ranked, nw
    # GROUP BY n_w` yields zero — grouping matches the engines (n_w is a
    # single value, so the group is unique on any non-empty input)
    agg = ranked.crossJoin(F.broadcast(n_w_row)).groupBy("n_w").agg(
        F.sum(F.when(F.col("w") == 1, F.col("d"))).alias("s_w"),
        F.sum(F.when(F.col("rn_asc") <= F.col("n_w"), F.col("d"))).alias("s_min"),
        F.sum(F.when(F.col("rn_desc") <= F.col("n_w"), F.col("d"))).alias("s_max"),
    )
    return agg.select(
        "n_w",
        round6_stable(
            (F.col("s_w") - F.col("s_min"))
            / F.nullif(F.col("s_max") - F.col("s_min"), F.lit(0.0))
        ).alias("c_index"),
    )


def q_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return c_index_of(labeled_points(spark, sf_dir, fan=True))


def pair_validity_of(
    pts: DataFrame,
    sample_fraction: float | None = None,
    max_rows: int | None = None,
) -> DataFrame:
    """The remaining pair-statistic indices, one pass over the i<j pair
    distances (same guarded-quadratic contract as c_index):

    - point_biserial = (m_between − m_within)·√(n_w·n_b)/n_t / s_all,
      with s_all the POPULATION std of all pair distances (pinned; the
      literature also carries the sample-std variant). Larger = better.
    - mcclain_rao = m_within / m_between. Smaller = better.

    Unlike c_index there is no rank, so this pass is a plain aggregate —
    still O(n²) work, guarded identically."""
    from clusterindices_spark.functions.guards import (
        QUADRATIC_MAX_ROWS,
        cap_quadratic,
    )

    pts = cap_quadratic(
        pts,
        "pair_validity",
        "vec_id",
        max_rows=max_rows if max_rows is not None else QUADRATIC_MAX_ROWS,
        sample_fraction=sample_fraction,
    )
    a = pts.select(
        F.col("vec_id").alias("pid"), F.col("cluster").alias("pcl"), F.col("x").alias("xa")
    )
    b = pts.select(
        F.col("vec_id").alias("qid"), F.col("cluster").alias("qcl"), F.col("x").alias("xb")
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("pid") < F.col("qid"))
        .select(
            l2("xa", "xb").alias("d"),
            (F.col("pcl") == F.col("qcl")).cast("int").alias("w"),
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_t"),
        F.sum("w").cast("bigint").alias("n_w"),
        F.avg(F.when(F.col("w") == 1, F.col("d"))).alias("m_w"),
        F.avg(F.when(F.col("w") == 0, F.col("d"))).alias("m_b"),
        F.stddev_pop("d").alias("s_all"),
    )
    n_b_ = (F.col("n_t") - F.col("n_w")).cast("double")
    pb = (
        (F.col("m_b") - F.col("m_w"))
        * F.sqrt(F.col("n_w").cast("double") * n_b_)
        / F.col("n_t").cast("double")
        / F.nullif(F.col("s_all"), F.lit(0.0))
    )
    return agg.select(
        "n_w",
        (F.col("n_t") - F.col("n_w")).cast("bigint").alias("n_b"),
        round6_stable(pb).alias("point_biserial"),
        round6_stable(
            F.col("m_w") / F.nullif(F.col("m_b"), F.lit(0.0))
        ).alias("mcclain_rao"),
    )


def q_pair_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pair_validity_of(labeled_points(spark, sf_dir, fan=True))


QUERIES = {
    "wemmert_gancarski": q_wemmert_gancarski,
    "sd_index": q_sd_index,
    "s_dbw": q_s_dbw,
    "c_index": q_c_index,
    "pair_validity": q_pair_validity,
}

# ---------------------------------------------------------------------------
# DuckDB oracles — indices._PREFIX supplies pts/dimvals/cent/centvec/pc/pp/cc;
# variance CTEs are appended here. Same math, same pinned edge cases, same
# stable 6dp rounding.
# ---------------------------------------------------------------------------

_VAR_CTES = """
, vark AS (
  SELECT cluster AS cl, dim, var_pop(val) AS v FROM dimvals GROUP BY cluster, dim
),
normk AS (
  SELECT cl, SQRT(SUM(v * v)) AS nk FROM vark GROUP BY cl
),
normg AS (
  SELECT SQRT(SUM(v * v)) AS ng
  FROM (SELECT dim, var_pop(val) AS v FROM dimvals GROUP BY dim)
),
scat AS (
  SELECT COUNT(*) AS k, AVG(nk / NULLIF(ng, 0)) AS scat FROM normk, normg
)
"""

ORACLES = {
    "wemmert_gancarski": _PREFIX
    + """
, wg AS (
  SELECT cluster, COUNT(*) AS n_k,
         AVG(d_own / NULLIF(d_nearest_other, 0)) AS rbar
  FROM pp GROUP BY cluster
)
SELECT COUNT(*) AS k,
       """
    + SQL_ROUND6.format(x="SUM(n_k * GREATEST(0.0, 1.0 - rbar)) / SUM(n_k)")
    + """ AS wemmert_gancarski
FROM wg
""",
    "sd_index": _PREFIX
    + _VAR_CTES
    + """
, dsum AS (
  SELECT i, SUM(dist) AS sum_d FROM cc GROUP BY i
),
inv AS (
  SELECT SUM(1.0 / NULLIF(sum_d, 0)) AS inv FROM dsum
),
ext AS (
  SELECT MAX(dist) AS dmax, MIN(dist) AS dmin FROM cc
)
SELECT k,
       """
    + SQL_ROUND6.format(x="scat")
    + """ AS sd_scat,
       """
    + SQL_ROUND6.format(x="dmax / NULLIF(dmin, 0) * inv")
    + """ AS sd_dis,
       """
    + SQL_ROUND6.format(x="scat + dmax / NULLIF(dmin, 0) * inv")
    + """ AS sd_index
FROM scat, ext, inv
""",
    "s_dbw": _PREFIX
    + _VAR_CTES
    + """
, sdv AS (
  SELECT SQRT(SUM(nk)) / COUNT(*) AS sd FROM normk
),
prs AS (
  SELECT a.cl AS i, b.cl AS j FROM centvec a JOIN centvec b ON a.cl < b.cl
),
pairdim AS (
  SELECT p.i, p.j, c1.dim, (c1.m + c2.m) / 2 AS mid
  FROM prs p
  JOIN cent c1 ON c1.cl = p.i
  JOIN cent c2 ON c2.cl = p.j AND c2.dim = c1.dim
),
pu AS (
  SELECT d.vec_id, pd.i, pd.j,
         SUM((d.val - pd.mid) * (d.val - pd.mid)) AS d2u
  FROM dimvals d JOIN pairdim pd
    ON d.dim = pd.dim AND d.cluster IN (pd.i, pd.j)
  GROUP BY d.vec_id, pd.i, pd.j
),
du AS (
  SELECT i, j,
         SUM(CASE WHEN d2u <= (SELECT sd * sd FROM sdv) THEN 1 ELSE 0 END) AS du
  FROM pu GROUP BY i, j
),
dij AS (
  SELECT p.i, p.j,
         SUM(CASE WHEN c.cl = p.i AND c.d2 <= (SELECT sd * sd FROM sdv)
                  THEN 1 ELSE 0 END) AS di,
         SUM(CASE WHEN c.cl = p.j AND c.d2 <= (SELECT sd * sd FROM sdv)
                  THEN 1 ELSE 0 END) AS dj
  FROM prs p JOIN pc c
    ON c.cluster IN (p.i, p.j) AND c.cl IN (p.i, p.j)
  GROUP BY p.i, p.j
),
dens AS (
  SELECT AVG(CASE WHEN GREATEST(di, dj) > 0
                  THEN du / CAST(GREATEST(di, dj) AS DOUBLE)
                  ELSE 0.0 END) AS dens_bw
  FROM du JOIN dij USING (i, j)
)
SELECT k,
       """
    + SQL_ROUND6.format(x="scat")
    + """ AS s_dbw_scat,
       """
    + SQL_ROUND6.format(x="dens_bw")
    + """ AS dens_bw,
       """
    + SQL_ROUND6.format(x="scat + dens_bw")
    + """ AS s_dbw
FROM scat, dens
""",
    "pair_validity": _PREFIX
    + """
, pd AS (
  SELECT list_distance(a.x, b.x) AS d,
         CASE WHEN a.cluster = b.cluster THEN 1 ELSE 0 END AS w
  FROM pts a JOIN pts b ON a.vec_id < b.vec_id
),
agg AS (
  SELECT COUNT(*) AS n_t,
         CAST(SUM(w) AS BIGINT) AS n_w,
         AVG(CASE WHEN w = 1 THEN d END) AS m_w,
         AVG(CASE WHEN w = 0 THEN d END) AS m_b,
         stddev_pop(d) AS s_all
  FROM pd
)
SELECT n_w,
       CAST(n_t - n_w AS BIGINT) AS n_b,
       """
    + SQL_ROUND6.format(
        x="(m_b - m_w) * sqrt(CAST(n_w AS DOUBLE) * CAST(n_t - n_w AS DOUBLE))"
        " / CAST(n_t AS DOUBLE) / NULLIF(s_all, 0)"
    )
    + """ AS point_biserial,
       """
    + SQL_ROUND6.format(x="m_w / NULLIF(m_b, 0)")
    + """ AS mcclain_rao
FROM agg
""",
    "c_index": _PREFIX
    + """
, nw AS (
  SELECT CAST(SUM(n_k * (n_k - 1) // 2) AS BIGINT) AS n_w
  FROM (SELECT COUNT(*) AS n_k FROM pts GROUP BY cluster)
),
pd AS (
  SELECT list_distance(a.x, b.x) AS d,
         CASE WHEN a.cluster = b.cluster THEN 1 ELSE 0 END AS w
  FROM pts a JOIN pts b ON a.vec_id < b.vec_id
),
ranked AS (
  SELECT d, w,
         ROW_NUMBER() OVER (ORDER BY d) AS rn_asc,
         ROW_NUMBER() OVER (ORDER BY d DESC) AS rn_desc
  FROM pd
)
SELECT n_w,
       """
    + SQL_ROUND6.format(
        x="(SUM(CASE WHEN w = 1 THEN d END) - SUM(CASE WHEN rn_asc <= n_w THEN d END))"
        " / NULLIF(SUM(CASE WHEN rn_desc <= n_w THEN d END)"
        " - SUM(CASE WHEN rn_asc <= n_w THEN d END), 0)"
    )
    + """ AS c_index
FROM ranked, nw
GROUP BY n_w
""",
}
