"""Vectorized per-cell pair scoring for the IVF candidate tiers (r14).

The candidate meet in `semantic_pairs_ann` / `knn_graph` is an equi-join on
cell whose join filter evaluates an interpreted higher-order-function dot
per candidate pair — measured ~40 µs/pair at sf0.1 (2.19M candidate pairs →
~2.5 s inside one SortMergeJoin filter). Guide §4.2: hand whole batches to
vectorized native code instead. Shipping the *pairs* through Arrow loses the
win again (2.19M × 128 doubles ≈ 2.2 GB — measured a wash), so per §8 the
sides are shipped ONCE each, cogrouped by cell (24k + 2k rows ≈ 13 MB at
sf0.1), and the per-cell dot matrix is computed in NumPy.

Bit-exactness contract (verified 0 mismatches / 2 188 452 pairs at sf0.1,
and full-output equality at sf0.001/0.01/0.1 for every consumer):

- ``aggregate(zip_with(a, b, (p,q) -> p*q), 0D, (acc,v) -> acc+v)`` is the
  left fold ((0 + a0·b0) + a1·b1) + … in IEEE binary64. The NumPy loop
  ``acc = acc + A[:, i] * B[:, i]`` performs the identical operation
  sequence elementwise, so dots and norms are bit-equal.
- Python emits only (probe_id, neighbor_id, d, na, nb[, nn]) for pairs that
  can possibly survive, with a conservative raw-cosine margin; the JVM then
  re-applies the ORIGINAL expression — round(d / nullif(na*nb, 0), 6) with
  Spark's HALF_UP rounding, NaN-largest comparisons and NULL propagation —
  so the decisive values never depend on Python float formatting or pandas
  coercions. The margin only admits extras the exact JVM filter re-drops:
  |round(c,6) − c| ≤ 5e-7 < MARGIN, so no true survivor is ever pruned.
- NaN caveat: pandas→Arrow coerces float NaN to NULL, while the HOF dot of
  NaN-bearing vectors is NaN (which Spark ranks/compares as the LARGEST
  double). Any pair with a NaN dot/norm is therefore emitted with nn=true
  and the JVM reconstructs the NaN cosine explicitly.
- Cross-dimension pairs: ``zip_with`` pads the shorter array with NULLs, so
  the HOF dot is NULL ⇒ cosine NULL. Threshold mode drops them (NULL fails
  ``>=``); top-k mode must keep up to k of them per probe because a probe
  with fewer than k real candidates ranks NULL sims (DESC NULLS LAST,
  neighbor_id tie-break) into its top-k. Emitted with d=None.

Top-k margin rule (knn mode): per (probe, cell), keep candidates with raw
c ≥ (k-th best raw c) − MARGIN (NaN ranked +inf). If a row is excluded, its
cell holds ≥ k rows whose raw c exceeds it by > MARGIN ≥ 2·5e-7, so their
ROUNDED sims are strictly greater and the row can never enter the global
top-k under any tie-break — each candidate pair meets in exactly one cell,
so the union of per-cell survivor sets is a superset of the global top-k.

Skew note (100 TB): group size per task is one cell's inverted list plus
its probe fan-in — the same per-cell volume the previous SortMergeJoin
streamed per key, so the skew envelope is unchanged; hot cells are still
star-expanded upstream (semantic tier) or bounded by Lloyd balance (knn).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# raw-cosine slack covering HALF_UP rounding to 6dp on both compare sides
MARGIN = 1e-6

PAIR_SCHEMA = (
    "probe_id BIGINT, neighbor_id BIGINT, d DOUBLE, na DOUBLE, nb DOUBLE, "
    "nn BOOLEAN"
)

_EMPTY = {
    "probe_id": pd.Series([], dtype="int64"),
    "neighbor_id": pd.Series([], dtype="int64"),
    "d": pd.Series([], dtype="float64"),
    "na": pd.Series([], dtype="float64"),
    "nb": pd.Series([], dtype="float64"),
    "nn": pd.Series([], dtype="bool"),
}


def _by_dim(col: pd.Series):
    """Split a Series of float arrays into {dim: (row_positions, matrix)}.
    One group on every real corpus; the split only exists so ragged inputs
    reproduce zip_with's pad-with-NULL semantics (cross-dim dot = NULL)."""
    lens = col.map(len).to_numpy()
    out = {}
    for d in np.unique(lens):
        idx = np.nonzero(lens == d)[0]
        mat = np.array([col.iloc[i] for i in idx], dtype="float64")
        out[int(d)] = (idx, mat.reshape(len(idx), int(d)))
    return out


def _dots_block(A: np.ndarray, B: np.ndarray):
    """Dot matrix + side norms via the exact left-fold operation order of
    aggregate(zip_with(x, y, *), 0D, +): acc_{i+1} = acc_i + x_i·y_i."""
    naq = np.zeros(len(A))
    nbq = np.zeros(len(B))
    acc = np.zeros((len(A), len(B)))
    for i in range(A.shape[1]):
        naq = naq + A[:, i] * A[:, i]
        nbq = nbq + B[:, i] * B[:, i]
        acc = acc + A[:, i : i + 1] * B[:, i][None, :]
    return acc, np.sqrt(naq), np.sqrt(nbq)


def _frame(pid, nid, d, na, nb, nn) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "probe_id": pid,
            "neighbor_id": nid,
            "d": d,
            "na": na,
            "nb": nb,
            "nn": nn,
        }
    )


def make_threshold_fold(threshold: float):
    """Cogroup fold for the semantic pair tier: emit candidate pairs whose
    raw cosine clears ``threshold − MARGIN`` (NaN kept: Spark compares NaN
    as largest, so NaN cosines PASS the JVM ``>=``). Cross-dim pairs have
    NULL cosine and can never pass — not emitted."""

    def fold(pl: pd.DataFrame, pr: pd.DataFrame) -> pd.DataFrame:
        if len(pl) == 0 or len(pr) == 0:
            return pd.DataFrame(_EMPTY)
        pa = pl["probe_id"].to_numpy()
        pb = pr["neighbor_id"].to_numpy()
        out = []
        right = _by_dim(pr["xb"])
        for da, (ia, A) in _by_dim(pl["xa"]).items():
            if da not in right:
                continue
            ib, B = right[da]
            acc, na, nb = _dots_block(A, B)
            denom = na[:, None] * nb[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                c = acc / denom
            isnan = np.isnan(c)
            keep = (
                ((c >= threshold - MARGIN) | isnan)
                & (denom != 0.0)
                & (pa[ia][:, None] != pb[ib][None, :])
            )
            ii, jj = np.nonzero(keep)
            out.append(
                _frame(
                    pa[ia][ii],
                    pb[ib][jj],
                    acc[ii, jj],
                    na[ii],
                    nb[jj],
                    isnan[ii, jj],
                )
            )
        if not out:
            return pd.DataFrame(_EMPTY)
        return pd.concat(out, ignore_index=True)

    return fold


def make_allpairs_fold(threshold: float, blocks: int):
    """applyInPandas fold for the EXACT all-pairs cosine tier, grouped by
    unordered block pair (bi ≤ bj) with g = pmod(vec_id, blocks): group
    (i, i) scores the within-block triangle (vec_a < vec_b), group (i, j)
    scores only cross-block pairs — every unordered pair lands in exactly
    one group. The caller pre-drops NULL-x / NULL-element rows (their HOF
    dot is NULL ⇒ cosine NULL ⇒ they can never pass ``>=``), which keeps
    the NULL-vs-NaN distinction out of the pandas boundary (pandas→Arrow
    cannot carry it). Emission contract identical to make_threshold_fold:
    (vec_a as probe_id, vec_b as neighbor_id, d, na, nb, nn) with vec_a <
    vec_b, margin-padded; the JVM re-applies the exact rounded filter."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(_EMPTY)
        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        ga = pdf["g"].to_numpy()
        left = pdf[ga == bi]
        right = pdf[ga == bj] if bj != bi else left
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(_EMPTY)
        pa = left["vec_id"].to_numpy()
        pb = right["vec_id"].to_numpy()
        out = []
        rgroups = _by_dim(right["x"])
        for da, (ia, A) in _by_dim(left["x"]).items():
            if da not in rgroups:
                continue
            ib, B = rgroups[da]
            acc, na, nb = _dots_block(A, B)
            denom = na[:, None] * nb[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                c = acc / denom
            isnan = np.isnan(c)
            keep = (
                ((c >= threshold - MARGIN) | isnan)
                & (denom != 0.0)
                & (pa[ia][:, None] < pb[ib][None, :])
            )
            ii, jj = np.nonzero(keep)
            out.append(
                _frame(
                    pa[ia][ii],
                    pb[ib][jj],
                    acc[ii, jj],
                    na[ii],
                    nb[jj],
                    isnan[ii, jj],
                )
            )
            if bi != bj:
                # cross-block pairs where the RIGHT block holds the smaller
                # id: same dot bits by IEEE commutativity of the per-element
                # products; na/nb only ever feed the commutative product
                keep2 = (
                    ((c >= threshold - MARGIN) | isnan)
                    & (denom != 0.0)
                    & (pb[ib][None, :] < pa[ia][:, None])
                )
                ii, jj = np.nonzero(keep2)
                out.append(
                    _frame(
                        pb[ib][jj],
                        pa[ia][ii],
                        acc[ii, jj],
                        nb[jj],
                        na[ii],
                        isnan[ii, jj],
                    )
                )
        if not out:
            return pd.DataFrame(_EMPTY)
        return pd.concat(out, ignore_index=True)

    return fold


def make_topk_fold(k: int):
    """Cogroup fold for the knn candidate tier: per (probe, cell), emit the
    margin-padded raw top-k (NaN as +inf — Spark's NaN-largest order) plus
    up to k smallest-id NULL-sim candidates (cross-dim / zero-denominator),
    which the probe's global ranking may still need (DESC NULLS LAST)."""

    def fold(pl: pd.DataFrame, pr: pd.DataFrame) -> pd.DataFrame:
        if len(pl) == 0 or len(pr) == 0:
            return pd.DataFrame(_EMPTY)
        pa = pl["probe_id"].to_numpy()
        pb = pr["neighbor_id"].to_numpy()
        right = _by_dim(pr["xb"])
        parts = []  # (probe, neighbor, d, na, nb, nn, rank_key)
        null_parts = []  # NULL-sim candidates: (probe, neighbor)
        for da, (ia, A) in _by_dim(pl["xa"]).items():
            for db, (ib, B) in right.items():
                notself = pa[ia][:, None] != pb[ib][None, :]
                if da != db:
                    ii, jj = np.nonzero(notself)
                    null_parts.append((pa[ia][ii], pb[ib][jj]))
                    continue
                acc, na, nb = _dots_block(A, B)
                denom = na[:, None] * nb[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = acc / denom
                isnan = np.isnan(c)
                zero = (denom == 0.0) & notself
                if zero.any():
                    zi, zj = np.nonzero(zero)
                    null_parts.append((pa[ia][zi], pb[ib][zj]))
                keep = notself & (denom != 0.0)
                ii, jj = np.nonzero(keep)
                key = np.where(isnan[ii, jj], np.inf, c[ii, jj])
                parts.append(
                    (
                        pa[ia][ii],
                        pb[ib][jj],
                        acc[ii, jj],
                        na[ii],
                        nb[jj],
                        isnan[ii, jj],
                        key,
                    )
                )
        frames = []
        if parts:
            pid = np.concatenate([p[0] for p in parts])
            nid = np.concatenate([p[1] for p in parts])
            d = np.concatenate([p[2] for p in parts])
            na = np.concatenate([p[3] for p in parts])
            nb = np.concatenate([p[4] for p in parts])
            nn = np.concatenate([p[5] for p in parts])
            key = np.concatenate([p[6] for p in parts])
            df = pd.DataFrame({"p": pid, "k": key})
            sdf = df.sort_values(["p", "k"], ascending=[True, False])
            sdf["rn"] = sdf.groupby("p").cumcount()
            kth = sdf[sdf["rn"] == k - 1].set_index("p")["k"]
            thresh = df["p"].map(kth).to_numpy()  # NaN when group < k rows
            keep = ~(key < thresh - MARGIN)  # NaN thresh keeps everything
            frames.append(
                _frame(pid[keep], nid[keep], d[keep], na[keep], nb[keep], nn[keep])
            )
        if null_parts:
            npid = np.concatenate([p[0] for p in null_parts])
            nnid = np.concatenate([p[1] for p in null_parts])
            ndf = (
                pd.DataFrame({"p": npid, "j": nnid})
                .sort_values(["p", "j"])
                .groupby("p")
                .head(k)
            )
            m = len(ndf)
            frames.append(
                _frame(
                    ndf["p"].to_numpy(),
                    ndf["j"].to_numpy(),
                    np.full(m, np.nan),  # → NULL d (pandas→Arrow) → NULL sim
                    np.full(m, np.nan),
                    np.full(m, np.nan),
                    np.zeros(m, dtype=bool),
                )
            )
        if not frames:
            return pd.DataFrame(_EMPTY)
        return pd.concat(frames, ignore_index=True)

    return fold
