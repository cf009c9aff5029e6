"""Kernel ≡ HOF equality pins for the r14 vectorized cell-assignment kernel
(functions/cellassign.py).

Every test builds a hostile corpus / centroid table, runs BOTH forms — the
HOF reference (`_assign_folded` / `_probe_cells` / `_assign_codes`) and the
Arrow kernel — and requires bit-identical full outputs (floats compared by
repr, i.e. exact doubles). These are the ordering semantics the kernel
replicates: NULL d2 outranks every real distance, NaN ranks after +Inf,
ties break on the lowest cl/code, zip_with pads dim mismatches with NULL,
row order is preserved.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clusterindices_spark.functions import cellassign as ck
from clusterindices_spark.operators.similarity import (
    _assign_folded,
    _cents_of,
    _probe_cells,
)


def _rows(df):
    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return repr(v)

    return sorted("|".join(cell(v) for v in r) for r in df.collect())


def _ordered_rows(df):
    # order-sensitive variant: assignment must PRESERVE row order so
    # downstream floating aggregations accumulate identically
    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return repr(v)

    return ["|".join(cell(v) for v in r) for r in df.collect()]


def _mk_pts(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, x ARRAY<DOUBLE>")


def _mk_folded(spark, cents):
    return spark.createDataFrame(
        [(cents,)], "cents ARRAY<STRUCT<cl: INT, c: ARRAY<DOUBLE>>>"
    )


NAN = float("nan")
INF = float("inf")

CLEAN_CENTS = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])]

HOSTILE_PTS = [
    (1, [0.1, 0.2]),
    (2, [9.9, 0.3]),
    (3, None),  # NULL row vector
    (4, [0.5, None]),  # NULL element
    (5, [NAN, 0.0]),  # NaN distance to every centroid
    (6, [5.0, 5.0]),  # equidistant tie -> lowest cl
    (7, [1.0]),  # ragged dim (1 != 2)
    (8, [1e308, -1e308]),  # overflow -> +Inf distances
    (9, [0.0, 10.0]),
]

HOSTILE_CENTS = [
    (0, [0.0, 0.0]),
    (1, [10.0, 0.0]),
    (2, None),  # NULL centroid -> d2 NULL vs every row
    (3, [0.0, None]),  # NULL element -> d2 NULL
    (4, [1.0, 2.0, 3.0]),  # dim-mismatched centroid -> d2 NULL
    (5, [NAN, 0.0]),  # NaN centroid -> NaN d2
]


def _cases():
    return [
        ("clean", HOSTILE_PTS[:2] + HOSTILE_PTS[5:6] + HOSTILE_PTS[8:], CLEAN_CENTS),
        ("hostile_pts", HOSTILE_PTS, CLEAN_CENTS),
        ("hostile_cents", HOSTILE_PTS, HOSTILE_CENTS),
        ("empty_cents", HOSTILE_PTS, []),
        ("one_cent", HOSTILE_PTS, [(7, [1.0, 1.0])]),
        ("empty_pts", [], CLEAN_CENTS),
    ]


@pytest.mark.parametrize("name,pts_rows,cents", _cases())
def test_assign_kernel_equals_hof(spark, name, pts_rows, cents):
    pts = _mk_pts(spark, pts_rows)
    folded = _mk_folded(spark, cents)
    hof = _assign_folded(pts, folded)
    kern = ck.assign_cells(pts, _cents_of(folded.collect()), "vec_id", "x")
    assert _ordered_rows(kern) == _ordered_rows(hof), name


@pytest.mark.parametrize("name,pts_rows,cents", _cases())
@pytest.mark.parametrize("p", [1, 3, 99])
def test_probe_kernel_equals_hof(spark, name, pts_rows, cents, p):
    pts = _mk_pts(spark, pts_rows)
    folded = _mk_folded(spark, cents)
    hof = _probe_cells(pts, folded, p)
    kern = ck.probe_cells_kernel(
        pts, _cents_of(folded.collect()), p, "vec_id", "x"
    )
    assert _rows(kern) == _rows(hof), (name, p)


def test_codes_kernel_equals_hof(spark):
    from clusterindices_spark.operators.pq import (
        _assign_codes,
        _books_of,
        _fold_codebook,
    )

    sub_rows = [
        (1, 0, [0.1, 0.2]),
        (1, 1, [9.9, 0.3]),
        (2, 0, [5.0, 5.0]),  # tie -> lowest code
        (2, 1, None),  # NULL sub -> all d2 NULL -> lowest code
        (3, 0, [NAN, 0.0]),
        (3, 7, [1.0, 1.0]),  # m with no book row -> dropped (inner join)
        (4, 1, [0.5, None]),  # NULL element
        (5, 0, [1.0]),  # ragged sub
        (6, None, [1.0, 1.0]),  # NULL m -> dropped (inner join)
    ]
    sub = spark.createDataFrame(
        sub_rows, "vec_id BIGINT, m INT, sub ARRAY<DOUBLE>"
    )
    cents = spark.createDataFrame(
        [
            (0, 0, [0.0, 0.0]),
            (0, 1, [10.0, 0.0]),
            (0, 2, [0.0, 10.0]),
            (1, 0, [0.0, 0.0]),
            (1, 1, [5.0, 5.0]),
        ],
        "m INT, code INT, c ARRAY<DOUBLE>",
    )
    folded = _fold_codebook(cents)
    books = _books_of(folded.collect())
    hof = _assign_codes(sub, folded).select("vec_id", "m", "sub", "code")
    kern = ck.assign_codes_kernel(sub, books, "vec_id", with_sub=True)
    assert _ordered_rows(kern.select("vec_id", "m", "sub", "code")) == _ordered_rows(hof)
    # the no-sub form used by the final encode: same rows minus the column
    kern2 = ck.assign_codes_kernel(sub, books, "vec_id", with_sub=False)
    assert _ordered_rows(kern2) == _ordered_rows(hof.select("vec_id", "m", "code"))


def test_kernel_closures_are_same_result(spark):
    """Two kernel frames built from equal driver-side centroid lists must
    canonicalize sameResult — the pin/memo economy (functions/pins.py)
    rides on this (a fresh closure per invocation must still hit the
    cached generation)."""
    from clusterindices_spark.functions.pins import same_plan

    pts = _mk_pts(spark, HOSTILE_PTS)
    cents_a = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    cents_b = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    a = ck.assign_cells(pts, cents_a, "vec_id", "x")
    b = ck.assign_cells(pts, cents_b, "vec_id", "x")
    assert same_plan(a, b)
    # and different centroid VALUES must NOT be sameResult
    c = ck.assign_cells(pts, [(0, [0.0, 0.1]), (1, [10.0, 0.0])], "vec_id", "x")
    assert not same_plan(a, c)
    pa_ = ck.probe_cells_kernel(pts, cents_a, 2, "vec_id", "x")
    pb = ck.probe_cells_kernel(pts, cents_b, 2, "vec_id", "x")
    assert same_plan(pa_, pb)


def test_kernel_guards(spark):
    """Out-of-contract shapes fall back (callers catch Unsupported or use
    kernel_ok): float32 column refuses the kernel; NULL cl raises."""
    pts32 = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id BIGINT, x ARRAY<FLOAT>"
    )
    assert not ck.kernel_ok(pts32, "x")
    pts = _mk_pts(spark, HOSTILE_PTS[:2])
    assert ck.kernel_ok(pts, "x")
    with pytest.raises(ck.Unsupported):
        ck.assign_cells(pts, [(None, [0.0, 0.0])], "vec_id", "x")


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_size_dispatch_and_memo_replay(spark):
    """Below the work crossover the build keeps the HOF broadcast form
    (no Python stage for trivial inputs); above it (or with the sampling
    cap disabled — the stress/scale posture) the kernel engages. The memo
    replays the decision so repeat builds stay sameResult (downstream
    pins ride that identity)."""
    from clusterindices_spark.functions.pins import same_plan
    from clusterindices_spark.operators import similarity as sm

    emb = _mk_pts(
        spark, [(i, [float(i % 7), float(i % 3)]) for i in range(100)]
    )
    sm._IVF_TRAINED.clear()
    _, i1 = sm.ivf_build(emb, n_cells=4, lloyd_iters=1)  # 400 evals << min
    assert "MapInArrow" not in _plan_str(i1)
    _, i2 = sm.ivf_build(emb, n_cells=4, lloyd_iters=1)  # memo hit
    assert same_plan(i1, i2)
    sm._IVF_TRAINED.clear()
    _, i3 = sm.ivf_build(emb, n_cells=4, lloyd_iters=1, sample_cap=None)
    assert "MapInArrow" in _plan_str(i3)
    sm._IVF_TRAINED.clear()


def test_pq_size_dispatch(spark):
    """Same dispatch for the PQ encode: tiny corpus keeps the HOF
    broadcast-join argmin; sample_cap=None engages the kernel."""
    from clusterindices_spark.functions.pins import clear_pins
    from clusterindices_spark.operators import pq as P

    emb = _mk_pts(
        spark,
        [(i, [float((i * 31) % 13) for _ in range(8)]) for i in range(64)],
    )
    P._TRAINED.clear()
    clear_pins()
    _, codes = P.pq_train_encode(emb, m=4, k=4, lloyd_iters=1)
    assert "MapInArrow" not in _plan_str(codes)
    P._TRAINED.clear()
    clear_pins()
    _, codes2 = P.pq_train_encode(emb, m=4, k=4, lloyd_iters=1, sample_cap=None)
    assert "MapInArrow" in _plan_str(codes2)
    P._TRAINED.clear()
    clear_pins()


def test_fit_loop_kernel_equals_hof_chain(spark):
    """End-to-end Lloyd fit: the kernel path's per-round collect+reembed
    must produce the SAME centroid rows as the chained HOF plan — pinned
    here at the library level (ivf_build dispatches on kernel_ok, so the
    registry keys only ever see one path per dtype)."""
    from clusterindices_spark.operators.similarity import (
        _centroids_folded,
        ivf_build,
        unfold_cents,
    )

    rows = [
        (i, [float((i * 37) % 11), float((i * 53) % 7), float(i % 5)])
        for i in range(200)
    ]
    emb = _mk_pts(spark, [(i, x) for i, x in rows])
    # HOF chain (the pre-r14 formulation), built inline
    seeds = (
        emb.orderBy("vec_id")
        .limit(4)
        .agg(F.array_sort(F.collect_list(F.struct("vec_id", "x"))).alias("sv"))
        .select(
            F.transform(
                "sv",
                lambda s, i: F.struct(i.cast("int").alias("cl"), s["x"].alias("c")),
            ).alias("cents")
        )
    )
    folded_hof = seeds
    for _ in range(2):
        folded_hof = _centroids_folded(_assign_folded(emb, folded_hof))
    hof_rows = _rows(unfold_cents(folded_hof))
    ck_folded, _ = ivf_build(emb, n_cells=4, lloyd_iters=2, sample_cap=None)
    assert _rows(unfold_cents(ck_folded)) == hof_rows
