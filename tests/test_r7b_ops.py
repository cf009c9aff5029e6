"""Round-7b additions: activity streaks (gaps-and-islands), change-point
location (exact-integer CUSUM argmax), and the binned exponential
interarrival KS fit — planted micro-fixtures pin the semantics the DuckDB
oracle then hashes at the gate SFs."""

import math
import tempfile
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(ms: int):
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
        tzinfo=None
    )


def _write_events(spark, rows, prefix):
    """rows = (event_id, ms, user_id, event_type, value)."""
    d = spark.createDataFrame(
        [(i, _ts(ms), u, t, v) for (i, ms, u, t, v) in rows],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    tmp = tempfile.mkdtemp(prefix=prefix)
    d.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    return tmp


DAY = 86_400_000


def test_streak_lengths_islands(spark):
    """User A: days {0,1,2, 5,6} → max streak 3; user B: {10} → 1;
    user C: {0,1,2,3} → 4. Multiple events on one day must not inflate
    the streak (the distinct-day reduction)."""
    rows = []
    eid = 0
    for day in [0, 1, 2, 5, 6]:
        for _ in range(3):  # duplicates within the day
            eid += 1
            rows.append((eid, day * DAY + eid, 1, "view", 0.0))
    eid += 1
    rows.append((eid, 10 * DAY, 2, "view", 0.0))
    for day in [0, 1, 2, 3]:
        eid += 1
        rows.append((eid, day * DAY + 500, 3, "view", 0.0))
    tmp = _write_events(spark, rows, "ci-streak-")
    from clusterindices_spark.operators.sessions import (
        q_events_streak_lengths,
    )

    out = {r["streak_len"]: r for r in q_events_streak_lengths(spark, tmp).collect()}
    assert set(out) == {1, 3, 4}
    assert all(out[k]["n_users"] == 1 for k in out)
    assert abs(out[3]["user_share"] - round(1 / 3, 6)) < 2e-6


def test_changepoint_finds_planted_shift_and_flat_ties_earliest(spark):
    """Type 'shift': 5 hours at 5 events then 5 hours at 15 → split at
    t=5 (hour index 4 is the last pre-shift hour), pre_mean 5, post_mean
    15. Type 'flat': constant rate → stat ≡ 0 everywhere → the earliest
    hour wins (tie-break determinism)."""
    rows = []
    eid = 0
    for h in range(10):
        n = 5 if h < 5 else 15
        for _ in range(n):
            eid += 1
            rows.append((eid, h * 3_600_000 + eid, 1, "shift", 0.0))
    for h in range(6):
        for _ in range(7):
            eid += 1
            rows.append((eid, h * 3_600_000 + eid, 2, "flat", 0.0))
    tmp = _write_events(spark, rows, "ci-chgpt-")
    from clusterindices_spark.operators.analytics import (
        q_events_changepoint_loc,
    )

    out = {r["event_type"]: r for r in q_events_changepoint_loc(spark, tmp).collect()}
    s = out["shift"]
    assert s["t_index"] == 5 and s["change_hour"] == 4
    assert s["pre_mean"] == 5.0 and s["post_mean"] == 15.0
    assert s["mean_shift"] == 10.0
    f = out["flat"]
    assert f["stat"] == 0 and f["change_hour"] == 0 and f["t_index"] == 1


def test_interarrival_fit_accepts_exponential_rejects_regular(spark):
    """Type 'exp': gaps planted by the exponential inverse CDF at
    quantile midpoints (mean 60 min) → binned KS ≈ 1/(2n) ≪ crit.
    Type 'reg': constant 30-min gaps → D ≈ |1 − (1−e^{−31/30})| ≈ 0.356
    ≫ crit. Both per one user so the lag window sees one series."""
    n = 200
    mean_ms = 3_600_000.0
    rows = []
    eid = 0
    t = 0
    for i in range(1, n + 1):
        gap = -mean_ms * math.log(1.0 - (i - 0.5) / n)
        t += int(gap)
        eid += 1
        rows.append((eid, t, 1, "exp", 0.0))
    eid += 1
    rows.append((eid, 0, 2, "reg", 0.0))  # anchor so first gap exists
    t2 = 0
    for _ in range(60):
        t2 += 1_800_000
        eid += 1
        rows.append((eid, t2, 2, "reg", 0.0))
    tmp = _write_events(spark, rows, "ci-iat-")
    from clusterindices_spark.operators.analytics import (
        q_events_interarrival_fit,
    )

    out = {r["event_type"]: r for r in q_events_interarrival_fit(spark, tmp).collect()}
    e = out["exp"]
    assert e["fits_exponential"] is True
    assert e["ks_d"] < 0.05
    r = out["reg"]
    assert r["fits_exponential"] is False
    assert r["ks_d"] > 0.3
    assert abs(r["mean_gap_s"] - 1800.0) < 1.0


def test_incremental_mv_moves_creates_and_drops_groups(spark):
    """The MV refresh must (a) move an updated row's contribution across
    groups ('O' → 'U'), (b) delete-win when a key matches both images,
    (c) DROP a group whose count reaches zero ('P'), and (d) create
    groups that only exist post-merge ('U', 'N')."""
    import tempfile

    orders = spark.createDataFrame(
        [
            (1, "F", 40.0),
            (3, "F", 100.0),   # %23==3 → deleted
            (210, "F", 10.0),  # matches update AND delete → deleted
            (10, "O", 50.0),   # updated → 'U' @ 55.0
            (7, "O", 20.0),
            (26, "P", 10.0),   # %23==3 → deleted; 'P' group vanishes
        ],
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
    )
    cust = spark.createDataFrame(
        [(100,), (7,)], "c_custkey BIGINT"
    )
    tmp = tempfile.mkdtemp(prefix="ci-mv-")
    orders.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    cust.write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    from clusterindices_spark.operators.relational_ext import (
        q_agg_incremental_mv,
    )

    out = {
        r["o_orderstatus"]: r
        for r in q_agg_incremental_mv(spark, tmp).collect()
    }
    assert set(out) == {"F", "O", "U", "N"}  # 'P' dropped at n=0
    assert out["F"]["n_orders"] == 1 and out["F"]["sum_price"] == 40.0
    assert out["O"]["n_orders"] == 1 and out["O"]["sum_price"] == 20.0
    assert out["U"]["n_orders"] == 1 and out["U"]["sum_price"] == 55.0
    assert out["N"]["n_orders"] == 1 and out["N"]["sum_price"] == 0.0


def test_url_canonical_collapses_variant_groups(spark):
    """doc_ids 0-3 are the four variant shapes of page 0: v0 (plain) and
    v1 (upper scheme+host, :443, trailing slash) must collapse; v2
    (www + utm_* + unsorted params) and v3 (unsorted params) must collapse
    to the param-sorted canonical; the two groups must stay distinct."""
    import tempfile

    d = spark.createDataFrame([(i,) for i in range(4)], "doc_id BIGINT")
    tmp = tempfile.mkdtemp(prefix="ci-url-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.operators.dedup import q_dedup_url_canonical

    out = {r["canonical_url"]: r for r in q_dedup_url_canonical(spark, tmp).collect()}
    plain = "https://site0.example.com/page/0"
    qry = "https://site0.example.com/page/0?a=1&b=2"
    assert set(out) == {plain, qry}
    assert out[plain]["n_copies"] == 2 and out[plain]["keeper_doc_id"] == 0
    assert out[qry]["n_copies"] == 2 and out[qry]["keeper_doc_id"] == 2
    assert out[plain]["n_raw_variants"] == 2  # raw forms differ


def test_code_detect_separates_code_from_prose(spark):
    """A planted code snippet (indentation, braces, keywords) must clear
    the threshold; plain prose must not. Counting columns pin the regex
    semantics."""
    import tempfile

    code = (
        "def main():\n"
        "  x = [1, 2];\n"
        "  if x:\n"
        "    return {x}\n"
        "class Foo:\n"
        "  pass\n"
    )
    prose = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [(1, code, "en", "web", len(code)), (2, prose, "en", "web", len(prose))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    tmp = tempfile.mkdtemp(prefix="ci-code-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_code_detect

    out = {r["doc_id"]: r for r in q_text_code_detect(spark, tmp).collect()}
    c, p = out[1], out[2]
    assert c["is_code"] is True and p["is_code"] is False
    assert c["keyword_hits"] == 3  # def, return, class
    assert c["indent_lines"] == 4
    assert p["symbol_count"] == 0 and p["keyword_hits"] == 0
    assert p["code_score"] < 0.1


def test_random_projection_is_deterministic_and_jl_preserving(spark):
    """(a) The hash-derived sign matrix makes the projection a pure
    function — two runs agree exactly. (b) JL property: pairwise squared
    distances in the 16-dim image approximate the 64-dim originals within
    loose tolerance on average (sparse Achlioptas guarantees E ≡ exact).
    (c) A hand-computed vector replays the mapInArrow arithmetic."""
    import math

    import numpy as np

    from clusterindices_spark.operators.embeddings import (
        RP_HASH_KNUTH,
        RP_HASH_MOD,
        RP_HASH_ROW,
        RP_IN_DIM,
        RP_OUT_DIM,
        q_embedding_random_projection,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_embedding_random_projection(spark, sf).collect()
    again = q_embedding_random_projection(spark, sf).collect()
    key = lambda r: (r["vec_id"], r["out_dim"])
    assert sorted(map(key, rows)) == sorted(map(key, again))
    m1 = {key(r): r["val"] for r in rows}
    m2 = {key(r): r["val"] for r in again}
    assert m1 == m2

    # replay one vector by hand
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet").to_pydict()
    xs = {v: e for v, e in zip(tbl["vec_id"], tbl["embedding"])}
    vid = tbl["vec_id"][0]
    x = np.asarray(xs[vid], dtype=np.float64)
    u = np.floor(x * 1e6 + 0.5)
    ii = np.arange(RP_IN_DIM)[:, None]
    jj = np.arange(RP_OUT_DIM)[None, :]
    h = ((ii * RP_HASH_ROW + jj) * RP_HASH_KNUTH) % RP_HASH_MOD
    sgn = np.where(h % 6 == 0, 1.0, np.where(h % 6 == 1, -1.0, 0.0))
    scale = math.sqrt(3.0 / RP_OUT_DIM)
    ref = np.floor((u @ sgn / 1e6) * scale * 1e6 + 0.5) / 1e6
    for j in range(RP_OUT_DIM):
        assert m1[(vid, j)] == ref[j]

    # JL: mean squared-distance ratio near 1 over a probe sample
    vids = sorted(xs)[:20]
    proj = {
        v: np.array([m1[(v, j)] for j in range(RP_OUT_DIM)]) for v in vids
    }
    ratios = []
    for a_i in range(len(vids)):
        for b_i in range(a_i + 1, len(vids)):
            a, b = vids[a_i], vids[b_i]
            d0 = np.sum(
                (np.asarray(xs[a], dtype=np.float64) - np.asarray(xs[b], dtype=np.float64)) ** 2
            )
            d1 = np.sum((proj[a] - proj[b]) ** 2)
            if d0 > 0:
                ratios.append(d1 / d0)
    mean_ratio = float(np.mean(ratios))
    assert 0.7 < mean_ratio < 1.3, mean_ratio


def test_spatial_radius_matches_bruteforce(spark):
    """Pigeonhole completeness, empirically: the grid-cell join must
    reproduce the exact brute-force pair set (every metric value is exact
    BIGINT, so set equality is bit-exact) at sf0.01 — 1 500 × 100 keys."""
    import numpy as np

    from clusterindices_spark.operators.relational_ext import (
        SPATIAL_HASH_X,
        SPATIAL_HASH_Y,
        SPATIAL_PLANE_M,
        SPATIAL_RADIUS_M,
        q_join_spatial_radius,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        (r["c_custkey"], r["s_suppkey"]): r["dist_m"]
        for r in q_join_spatial_radius(spark, sf).collect()
    }

    import pyarrow.parquet as pq

    ck = np.array(
        pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
        .column(0)
        .to_pylist(),
        dtype=np.int64,
    )
    sk = np.array(
        pq.read_table(f"{sf}/supplier.parquet", columns=["s_suppkey"])
        .column(0)
        .to_pylist(),
        dtype=np.int64,
    )

    def xy(k, ox, oy):
        m = k % SPATIAL_PLANE_M
        return (
            (m * SPATIAL_HASH_X + ox) % SPATIAL_PLANE_M,
            (m * SPATIAL_HASH_Y + oy) % SPATIAL_PLANE_M,
        )

    cx, cy = xy(ck, 7, 11)
    sx, sy = xy(sk, 13, 17)
    d2 = (cx[:, None] - sx[None, :]) ** 2 + (cy[:, None] - sy[None, :]) ** 2
    mask = d2 <= SPATIAL_RADIUS_M * SPATIAL_RADIUS_M
    want = {
        (int(ck[i]), int(sk[j])): int(np.floor(np.sqrt(float(d2[i, j]))))
        for i, j in zip(*np.nonzero(mask))
    }
    assert got == want and len(got) == 293


def test_attribution_linear_shares_and_window(spark):
    """Purchase A (rev 100, 4 in-window touches + 1 stale) → 25 per touch;
    purchase B (rev 100, 3 touches) → floor(33.333333…) each, remainder
    dropped; a touch-less purchase contributes nothing."""
    H = 3_600_000
    rows = [
        # purchase A at t=10d, touches within 7d: 2 clicks + 2 views
        (1, 10 * DAY, 1, "purchase", 100.0),
        (2, 10 * DAY - H, 1, "click", 0.0),
        (3, 10 * DAY - 2 * H, 1, "click", 0.0),
        (4, 10 * DAY - 3 * H, 1, "view", 0.0),
        (5, 10 * DAY - 4 * H, 1, "view", 0.0),
        (6, 1 * DAY, 1, "view", 0.0),  # stale: 9 days before
        # purchase B: 3 touches, one channel
        (7, 20 * DAY, 2, "purchase", 100.0),
        (8, 20 * DAY - H, 2, "click", 0.0),
        (9, 20 * DAY - 2 * H, 2, "click", 0.0),
        (10, 20 * DAY - 3 * H, 2, "click", 0.0),
        # purchase C: no touches at all
        (11, 30 * DAY, 3, "purchase", 55.0),
    ]
    tmp = _write_events(spark, rows, "ci-attr-")
    from clusterindices_spark.operators.analytics import (
        q_events_attribution_linear,
    )

    out = {r["channel"]: r for r in q_events_attribution_linear(spark, tmp).collect()}
    assert set(out) == {"click", "view"}
    # A: 100/4 = 25 per touch; B: floor(100e6/3)/1e6 = 33.333333
    assert out["view"]["attributed_revenue"] == 50.0
    assert out["view"]["n_touches"] == 2 and out["view"]["n_purchases"] == 1
    assert out["click"]["n_touches"] == 5
    assert out["click"]["n_purchases"] == 2
    assert abs(out["click"]["attributed_revenue"] - (50.0 + 3 * 33.333333)) < 1e-9


def test_jsonl_roundtrip_survives_escaping_hazards(spark):
    """Quotes, backslashes, newlines, tabs, and non-ASCII must survive the
    write→escape→parse roundtrip byte-for-byte (lengths are the witness;
    doc_ids chosen ≡0 mod 3 to pass the slice filter)."""
    import tempfile

    hazards = [
        (3, 'he said "hi" \\ and left', "en"),
        (6, "line1\nline2\ttabbed", "en"),
        (9, "naïve café — 中文 🙂", "fr"),
        (12, "plain", "en"),
        (13, "filtered out", "en"),  # not ≡0 mod 3
    ]
    d = spark.createDataFrame(
        [(i, t, l, "web", len(t)) for (i, t, l) in hazards],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    tmp = tempfile.mkdtemp(prefix="ci-jsonl-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.sources.readers import q_source_jsonl_roundtrip

    out = {r["lang"]: r for r in q_source_jsonl_roundtrip(spark, tmp).collect()}
    assert out["en"]["n_docs"] == 3
    assert out["en"]["sum_text_len"] == sum(
        len(t) for (i, t, l) in hazards if l == "en" and i % 3 == 0
    )
    assert out["fr"]["n_docs"] == 1
    assert out["fr"]["sum_text_len"] == len(hazards[2][1])


def test_pmi_separates_collocation_from_chance(spark):
    """'new york' always adjacent → PMI ≈ log2(U/N·…) ≫ 0; two frequent
    but independent fillers co-occur at chance → PMI near 0; pairs under
    the min count must be absent."""
    import tempfile

    docs = []
    for i in range(40):
        filler = ["alpha", "beta"][i % 2]
        docs.append((i, f"new york {filler} gamma " * 2, "en", "web", 0))
    d = spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    tmp = tempfile.mkdtemp(prefix="ci-pmi-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_pmi_bigrams

    out = {(r["w1"], r["w2"]): r for r in q_text_pmi_bigrams(spark, tmp).collect()}
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny["pmi"] > 1.5  # perfect collocation
    assert ny["n_ab"] == 80 and ny["c1"] == 80 and ny["c2"] == 80
    # exact formula replay: N = 40 docs × 7 bigrams, U = 40 × 8 tokens
    n_big, u_tok = 40 * 7, 40 * 8
    expect = math.floor(
        math.log2((80 / n_big) / ((80 / u_tok) * (80 / u_tok))) * 1e6 + 0.5
    ) / 1e6
    assert ny["pmi"] == expect
    # no bigram with count < 5 may appear
    assert all(r["n_ab"] >= 5 for r in out.values())


def test_pattern_match_counts_and_nonoverlap(spark):
    """'vccp' → 1 match (len 4); 'vp' → 0 (strict adjacency, no click);
    'vcpvccp' → 2 matches, longest 4; 'vcvcp' → 1 (the first v-c is
    broken by the v — leftmost restart finds v-c-p at position 2)."""
    seqs = {
        1: "vccp",
        2: "vp",
        3: "vcpvccp",
        4: "vcvcp",
    }
    letter2type = {"v": "view", "c": "click", "p": "purchase"}
    rows = []
    eid = 0
    for uid, s in seqs.items():
        for ch in s:
            eid += 1
            rows.append((eid, eid * 1000, uid, letter2type[ch], 0.0))
    tmp = _write_events(spark, rows, "ci-pat-")
    from clusterindices_spark.operators.analytics import q_events_pattern_match

    out = {r["user_id"]: r for r in q_events_pattern_match(spark, tmp).collect()}
    assert out[1]["n_matches"] == 1 and out[1]["longest_match_len"] == 4
    assert out[2]["n_matches"] == 0 and out[2]["is_converter"] is False
    assert out[2]["longest_match_len"] == 0
    assert out[3]["n_matches"] == 2 and out[3]["longest_match_len"] == 4
    assert out[4]["n_matches"] == 1 and out[4]["longest_match_len"] == 3


def test_gini_planted_values(spark):
    """Counts [1,1,1,7]: ranks 1..4 ascending, src = 34, S = 10, n = 4 →
    G = (68 − 50)/40 = 0.45 exactly (all-integer numerator)."""
    rows = []
    eid = 0
    for uid, cnt in [(1, 1), (2, 1), (3, 1), (4, 7)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, eid * 1000, uid, "view", 0.0))
    tmp = _write_events(spark, rows, "ci-gini-")
    from clusterindices_spark.operators.analytics import q_events_gini_activity

    (row,) = q_events_gini_activity(spark, tmp).collect()
    assert row["n_users"] == 4 and row["total_events"] == 10
    assert row["sum_rank_weighted"] == 34
    assert row["gini"] == 0.45


def test_snapshot_diff_reconciles_with_snapshots(spark):
    """Diff-class accounting must reconcile with the two snapshot sizes:
    |v0| = unchanged + changed + removed, |v1| = unchanged + changed +
    added; 'added' carries zero before-mass; 'changed' moves price mass
    (the 1.1× reprice)."""
    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.versioned import (
        q_versioned_snapshot_diff,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["change_class"]: r for r in q_versioned_snapshot_diff(spark, sf).collect()}
    o = load_table(spark, sf, "orders").select("o_orderkey")
    n_base = o.where(F.col("o_orderkey") % 4 != 0).count()
    assert set(out) <= {"added", "removed", "changed", "unchanged"}
    g = lambda c, f: out[c][f] if c in out else 0
    assert (
        g("unchanged", "n_rows") + g("changed", "n_rows") + g("removed", "n_rows")
        == n_base
    )
    assert g("added", "sum_price_before") == 0.0
    assert g("changed", "sum_price_after") > g("changed", "sum_price_before")
    assert g("unchanged", "sum_price_after") == g("unchanged", "sum_price_before")


def test_bpe_merges_replay_sennrich_example(spark):
    """The classic BPE walkthrough vocabulary (low×5, lower×2, newest×6,
    widest×3) must learn exactly: e+s(9), es+t(9), est+</w>(9), l+o(7),
    lo+w(7) — ties broken lexicographically ('e s' < 's t' < 't </w>')."""
    import tempfile

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    rows = []
    i = 0
    for w, n in vocab:
        for _ in range(n):
            rows.append((i, w, "en", "web", len(w)))
            i += 1
    d = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    tmp = tempfile.mkdtemp(prefix="ci-bpe-")
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from clusterindices_spark.operators.textops import q_text_bpe_train_merges

    got = [
        (r["round"], r["pair"], r["merged"], r["cnt"])
        for r in q_text_bpe_train_merges(spark, tmp).collect()
    ]
    assert sorted(got) == [
        (1, "e s", "es", 9),
        (2, "es t", "est", 9),
        (3, "est </w>", "est</w>", 9),
        (4, "l o", "lo", 7),
        (5, "lo w", "low", 7),
    ]


def test_equidepth_histogram_depth_and_coverage(spark):
    """Bucket depths must be near-equal (⌈k·n/B⌉ boundaries ⇒ depth
    ∈ {⌊n/B⌋, ⌈n/B⌉}), buckets must tile the value range in order
    (lo_{k+1} ≥ hi_k), and counts must total n."""
    from clusterindices_spark.operators.relational_ext import (
        EQUIDEPTH_BUCKETS,
        q_agg_equidepth_histogram,
    )
    from clusterindices_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        q_agg_equidepth_histogram(spark, sf).collect(),
        key=lambda r: r["bucket"],
    )
    n = load_table(spark, sf, "orders").count()
    assert [r["bucket"] for r in rows] == list(range(1, EQUIDEPTH_BUCKETS + 1))
    assert sum(r["n_rows"] for r in rows) == n
    lo_d, hi_d = n // EQUIDEPTH_BUCKETS, -(-n // EQUIDEPTH_BUCKETS)
    assert all(lo_d <= r["n_rows"] <= hi_d for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b["lo"] >= a["hi"] or b["lo"] == a["hi"]  # ties may straddle
        assert a["lo"] <= a["hi"]


def test_diff_in_diff_planted_2x2(spark):
    """Planted 2×2: treated delta 10, control delta 2 → DiD = 8; each
    cell [m−1, m+1, m, m] so var = 2/3 per cell, se = √(2/3), t ≈ 9.8 →
    significant. Boundary: treated = even user_id, post = ≥ Jan 16."""
    from clusterindices_spark.operators.analytics import DID_SPLIT_MS

    PRE, POST = DID_SPLIT_MS - 5 * DAY, DID_SPLIT_MS + 5 * DAY
    cells = [
        (2, PRE, 10), (4, PRE, 10),      # treated-pre
        (2, POST, 20), (4, POST, 20),    # treated-post
        (1, PRE, 10), (3, PRE, 10),      # control-pre
        (1, POST, 12), (3, POST, 12),    # control-post
    ]
    rows, eid = [], 0
    for uid, t0, m in cells:
        for dv in (-1.0, 1.0, 0.0, 0.0):
            eid += 1
            rows.append((eid, t0 + eid * 1000, uid, "view", m + dv))
    tmp = _write_events(spark, rows, "ci-did-")
    from clusterindices_spark.operators.analytics import q_events_diff_in_diff

    (r,) = q_events_diff_in_diff(spark, tmp).collect()
    assert r["n_tpre"] == r["n_tpost"] == r["n_cpre"] == r["n_cpost"] == 8
    assert r["delta_treated"] == 10.0 and r["delta_control"] == 2.0
    assert r["did_estimate"] == 8.0
    # each cell: 8 values mean m, ss = 4 → var 4/7; se² = 4·(4/7)/8
    import math

    se = math.sqrt(4 * (4 / 7) / 8)
    assert abs(r["se"] - se) < 1e-6
    assert r["is_significant"] is True


def test_power_mde_replays_closed_form(spark):
    """One planted type: the output must replay the closed forms from its
    own mean/sd/n (z constants interpolated from the module)."""
    import math

    from clusterindices_spark.operators.analytics import (
        MDE_REL_TARGET,
        Z_ALPHA,
        Z_BETA,
        q_events_power_mde,
    )

    vals = [8.0, 10.0, 12.0, 10.0, 9.0, 11.0]
    rows = [(i + 1, i * 1000, 1, "view", v) for i, v in enumerate(vals)]
    tmp = _write_events(spark, rows, "ci-mde-")
    (r,) = q_events_power_mde(spark, tmp).collect()
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    sd = math.sqrt(var)
    zsum = Z_ALPHA + Z_BETA
    mde = zsum * sd * math.sqrt(2.0 / (n // 2))
    assert r["n"] == n and r["n_arm"] == n // 2
    assert abs(r["mean"] - mean) < 1e-6 and abs(r["sd"] - sd) < 1e-6
    assert abs(r["mde_abs"] - mde) < 1e-5
    n_req = math.ceil(2.0 * var * zsum * zsum / (MDE_REL_TARGET * mean) ** 2)
    assert r["n_required_per_arm"] == n_req


def test_cuped_perfect_and_zero_correlation(spark):
    """User with post = 2·pre exactly across users → ρ² = 1, adjusted
    variance 0; and θ replays cov/var from the planted numbers."""
    from clusterindices_spark.operators.analytics import (
        DID_SPLIT_MS,
        q_events_cuped,
    )

    PRE, POST = DID_SPLIT_MS - DAY, DID_SPLIT_MS + DAY
    rows, eid = [], 0
    for uid, pre_v in [(1, 10.0), (2, 20.0), (3, 30.0)]:
        eid += 1
        rows.append((eid, PRE + eid * 1000, uid, "view", pre_v))
        eid += 1
        rows.append((eid, POST + eid * 1000, uid, "view", 2 * pre_v))
    tmp = _write_events(spark, rows, "ci-cuped-")
    (r,) = q_events_cuped(spark, tmp).collect()
    assert r["n_users"] == 3
    assert r["theta"] == 2.0
    assert r["rho2"] == 1.0
    assert r["var_adjusted"] == 0.0
    assert r["var_reduction_pct"] == 100.0
    assert r["mean_post"] == 40.0


def test_anneal_mixture_conserves_and_interpolates(spark):
    """Every step's weights must sum to 1 (linear blend of two unit
    vectors); step 1 ≈ 90% uniform + 10% target, step T = exactly the
    target shares."""
    from clusterindices_spark.operators.curation import (
        ANNEAL_STEPS,
        q_curation_anneal_mixture,
    )

    rows = q_curation_anneal_mixture(spark, "/root/testdata/sf0.001").collect()
    by_step = {}
    for r in rows:
        by_step.setdefault(r["step"], []).append(r)
    assert set(by_step) == set(range(1, ANNEAL_STEPS + 1))
    k = len(by_step[1])
    for step, grp in by_step.items():
        assert abs(sum(r["weight"] for r in grp) - 1.0) < 1e-4
    for r in by_step[ANNEAL_STEPS]:
        assert abs(r["weight"] - r["target_share"]) < 2e-6
    for r in by_step[1]:
        want = 0.9 / k + 0.1 * r["target_share"]
        assert abs(r["weight"] - want) < 2e-6


def test_ipv4_roundtrip_and_flags(spark):
    """aton(ntoa(x)) must equal x for every row; CIDR prefixes must match
    the rendered address; the private flag must replay the RFC-1918 rules
    recomputed from the integer."""
    from clusterindices_spark.operators.sql_features import q_scalar_ipv4_cidr

    rows = q_scalar_ipv4_cidr(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for r in rows:
        assert r["ip_roundtrip"] == r["ip_int"]
        o1, o2 = (r["ip_int"] >> 24) & 255, (r["ip_int"] >> 16) & 255
        assert r["ip"].startswith(f"{o1}.{o2}.")
        assert r["cidr16"] == f"{o1}.{o2}.0.0/16"
        want_priv = (
            o1 == 10 or (o1 == 172 and 16 <= o2 <= 31) or (o1 == 192 and o2 == 168)
        )
        assert r["is_private"] is want_priv


def test_bitmap_distinct_sign_bit_and_duplicates(spark):
    """Users 0..63 of one word (including id 63 → the SIGN bit) plus
    duplicates and a second word must count exactly; agreement with
    countDistinct is the operator's whole contract."""
    rows, eid = [], 0
    for uid in list(range(64)) + [5, 63, 63, 100, 101]:
        eid += 1
        rows.append((eid, eid * 1000, uid, "view", 0.0))
    tmp = _write_events(spark, rows, "ci-bitmap-")
    from clusterindices_spark.operators.relational_ext import (
        q_agg_bitmap_distinct,
    )

    (r,) = q_agg_bitmap_distinct(spark, tmp).collect()
    assert r["n_distinct_users"] == 66  # 0..63 plus 100, 101
    assert r["n_words"] == 2


def test_bitmap_distinct_past_2_53(spark):
    """Snowflake-scale ids: at 2⁵⁹ doubles are spaced 128 apart, so a
    double-division word index maps BOTH 2⁵⁹ and 2⁵⁹+64 (true words 2⁵³
    and 2⁵³+1, both bit 0) onto word 2⁵³ and bit_or silently undercounts
    2 as 1. Integer ``div`` must keep them distinct (VERDICT r7 wrong #1;
    red under the old F.floor(user_id / 64) form)."""
    big = 1 << 59
    rows = [
        (1, 1000, big, "view", 0.0),
        (2, 2000, big + 64, "view", 0.0),
        (3, 3000, big + 64, "view", 0.0),  # duplicate must not inflate
    ]
    tmp = _write_events(spark, rows, "ci-bitmap53-")
    from clusterindices_spark.operators.relational_ext import (
        q_agg_bitmap_distinct,
    )

    (r,) = q_agg_bitmap_distinct(spark, tmp).collect()
    assert r["n_distinct_users"] == 2
    assert r["n_words"] == 2
