"""Data-quality / exploration report CLI: the analytics layer composed
into one pass over the fixture warehouse.

    python examples/analytics_main.py <sf_dir>
    python examples/analytics_main.py /root/testdata/sf0.001

Sections (each a shipped operator):
1. table profile      — per-column nulls/distincts/min/max (operators/analytics)
2. value histogram    — clamped fixed-width buckets over events.value
3. outliers           — z-score AND median/MAD counts per event type
4. path mining        — top event-type trigrams across user journeys
5. funnel + retention — conversion funnel and weekly cohorts (operators/sessions)
6. drift              — per-label embedding centroid shift (operators/embeddings)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = argv[0]

    from clusterindices_spark.operators.analytics import (
        q_events_histogram,
        q_events_outliers,
        q_events_outliers_mad,
        q_events_path_trigrams,
        q_profile_orders,
    )
    from clusterindices_spark.operators.embeddings import (
        q_embedding_centroid_drift,
    )
    from clusterindices_spark.operators.sessions import (
        q_events_funnel,
        q_events_retention,
    )
    from clusterindices_spark.session import get_spark

    spark = get_spark("analytics-report")
    spark.sparkContext.setLogLevel("ERROR")

    print("== orders profile ==")
    for r in q_profile_orders(spark, sf_dir).collect():
        rng = (
            f"[{r['min_num']}, {r['max_num']}]"
            if r["min_num"] is not None
            else f"[{r['min_str']!r}, {r['max_str']!r}]"
        )
        print(
            f"  {r['column']}: nulls={r['n_nulls']}"
            f" distinct={r['n_distinct']} range={rng}"
        )

    print("== events.value histogram ==")
    for r in q_events_histogram(spark, sf_dir).orderBy("bucket").collect():
        bar = "#" * max(1, r["n"] // max(1, r["n"] // 40 or 1))
        print(f"  [{r['lo']:6.1f}, {r['hi']:6.1f}): {r['n']:>6} {bar[:40]}")

    nz = q_events_outliers(spark, sf_dir).count()
    nm = q_events_outliers_mad(spark, sf_dir).count()
    print(f"== outliers: z-score={nz} rows, median/MAD={nm} rows ==")

    print("== top user-journey trigrams ==")
    for r in q_events_path_trigrams(spark, sf_dir).limit(5).collect():
        print(f"  {r['trigram']}: {r['n']}")

    f = q_events_funnel(spark, sf_dir).collect()[0]
    print(
        f"== funnel: view {f['n_view']} -> click {f['n_click']}"
        f" -> purchase {f['n_purchase']}"
        f" (v->c {f['view_to_click']}, c->p {f['click_to_purchase']}) =="
    )

    print("== weekly retention (first 4 cohort rows) ==")
    for r in (
        q_events_retention(spark, sf_dir).orderBy("cohort", "k").limit(4).collect()
    ):
        print(f"  cohort {r['cohort']} k={r['k']}: {r['n_users']} users")

    print("== embedding centroid drift (halves A/B) ==")
    for r in q_embedding_centroid_drift(spark, sf_dir).orderBy("label").collect():
        print(
            f"  label {r['label']}: n_a={r['n_a']} n_b={r['n_b']}"
            f" drift={r['drift']}"
        )

    # --- r6 additions: experimentation, uncertainty, drift, survival ----
    from pyspark.sql import functions as F

    from clusterindices_spark.operators.analytics import (
        q_events_ab_ttest,
        q_events_bootstrap_ci,
        q_events_cusum,
        q_events_markov_entropy,
        q_events_survival_km,
    )

    print("== Welch t-tests between event-type value distributions ==")
    for r in (
        q_events_ab_ttest(spark, sf_dir).orderBy("type_a", "type_b").collect()
    ):
        sig = " *" if r["is_significant"] else ""
        print(
            f"  {r['type_a']:>8} vs {r['type_b']:<8} t={r['t_stat']:+8.3f}"
            f" df={r['welch_df']:8.1f}{sig}"
        )

    print("== Poisson-bootstrap 95% CI for mean value per type ==")
    for r in q_events_bootstrap_ci(spark, sf_dir).orderBy("event_type").collect():
        print(
            f"  {r['event_type']:>8}: {r['mean_value']:7.3f}"
            f"  [{r['ci_lo']:7.3f}, {r['ci_hi']:7.3f}]  n={r['n']}"
        )

    alarms = (
        q_events_cusum(spark, sf_dir).where(F.col("is_alarm")).count()
    )
    print(f"== CUSUM drift chart: {alarms} alarm hours ==")

    km = sorted(
        q_events_survival_km(spark, sf_dir).collect(), key=lambda r: r["t_hours"]
    )
    print(
        f"== Kaplan-Meier: {len(km)} curve points, final S(t)="
        f"{km[-1]['surv']:.4f} at t={km[-1]['t_hours']}h =="
    )

    me = q_events_markov_entropy(spark, sf_dir).collect()
    print(
        f"== journey predictability: entropy rate"
        f" {me[0]['entropy_rate_bits']:.4f} bits/transition =="
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
