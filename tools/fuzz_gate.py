#!/usr/bin/env python
"""Seeded randomized differential fuzz gate (round 10½).

The hostile gate (tools/hostile_gate.py) sweeps FIXED adversarial fixtures —
it catches the input classes someone thought to plant. This gate SAMPLES the
input space: each trial draws, from a seeded RNG, per-column NULL
probabilities, vocabulary mixes (fixture values + boundary strings + junk),
key skew, duplicate rates, timestamp tie rates, id regimes (small / negative
/ 2^53-adjacent), and table sizes; writes schema-exact parquet (schemas
mirrored from the driver fixture footers, like tools/hostile_fixtures.py);
and runs registry keys through the SAME Spark-vs-DuckDB comparison as
tools/check_oracle.py. A finding is replayable from its seed alone.

Contract envelopes honored (FIXTURES.md / hostile_fixtures.py), so a finding
is a real divergence and never a violated input contract:

- events.ts stays inside Jan 2024 (sessionization/DiD month envelope);
  o_orderdate in 1995..2001, l_shipdate in 1995..2001.
- background value/price magnitudes stay small; wave-2 spikes probe BOTH
  sides of the documented per-family quantization bounds
  (tests/test_int64_bounds.py): ±6e5 is large-but-legal (silent-divergence
  probe), ±1e9 is past the milli²-family loud bounds — those cells verify
  both engines REJECT out-of-envelope magnitudes (consistent XERR, pinned
  by _explain). ids stay under BIG ≈ 2^62/1000003·1000.
- NaN/Inf: wave-1/2 seeds (< 103000) do NOT generate them. Wave-3 seeds
  (>= 103000) DO spike NaN/±Inf/subnormal/-0.0 into the scalar measure
  doubles (events.value, *_acctbal, prices, l_* rates) — the float-specials
  knob VERDICT r10 asked for. Embedding vectors stay finite by declared
  envelope (the vector tier's zero-norm/NULL exclusion contract extends to
  non-finite: a NaN component poisons every distance, an input-contract
  question rather than an engine-divergence one); they do get subnormal
  and -0.0 components, which must quantize identically.
- Fully-empty tables: wave-1/2 never generate them (the hostile `empty`
  variant pins the all-empty class). Wave-3's degenerate-table knob
  truncates ONE randomly chosen table to 0 or 1 rows per trial — the
  mixed-degeneracy positions (empty dim × populated fact and vice versa)
  that neither the all-empty variant nor the populated fuzz space reaches.
- Embedding corpora are single-dimension per trial, drawn from {16, 32, 64}
  (exercises the r10 _corpus_dim fix beyond the fixture's 64).

Findings taxonomy = hostile_gate's (PASS/ROWS/XERR/DIVERGE). Known engine
boundaries are explained by PREDICATE pins (the fuzzer's variants are
dynamic, so (variant,key) pins can't work): see EXPLAIN below. Exit 0 iff
zero unexplained findings.

Usage:
  python tools/fuzz_gate.py --trials 20 --base-seed 101000   # campaign
  python tools/fuzz_gate.py --seeds 101007                   # replay one
  python tools/fuzz_gate.py --seeds 101007 dedup_chunk_exact # one cell
Report: reports/fuzz_gate.md (append-summary per campaign).
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import re
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_fixtures import REF_SF, TABLES, BIG, P53  # noqa: E402

P53 = int(P53)
BIG = int(BIG)

# ---------------------------------------------------------------------------
# string pools
# ---------------------------------------------------------------------------

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu data spark plan shuffle join scan the and of"
).split()

BOUNDARY_TEXTS = [
    "",
    " ",
    "\t\n\r",
    "café résumé naïve",                      # combining accents
    "\U0001f30d\U0001f680 rocket \U0001f9ea", # 4-byte emoji
    "مرحبا بالعالم",                           # RTL
    "a​b c‍d",                      # zero-width space / joiner
    "中文文本没有空格",                         # CJK, no spaces
    "nbsp separated words",
    "ßÆœ İstanbul Iı",                        # special casing points
    "x" * 4000,                               # one giant token
    ("tok " * 600).strip(),                   # long many-token doc
    "'; DROP TABLE docs; --",                 # quoting hazard
    'quote " and \\ backslash',
]

LANGS = ["de", "en", "es", "fr", "zh", "xx", "", None]
SOURCES = [f"src{i}" for i in range(20)] + ["", "weird source", None]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view",
               "unknown_t", "", None]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
            "", None]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
              "", None]
PROPS_POOL = ['{"k": %d}', '{"k": %d, "j": 1}', "{}", "[1,2]", "not json",
              "", None, '{"k": null}']

# ---- wave-3 (seeds >= 103000) mutation tables -----------------------------
_W3_SPECIALS = [
    float("nan"), float("inf"), float("-inf"),
    5e-324,                      # smallest subnormal
    2.2250738585072014e-308,     # smallest normal
    -0.0,
]
_W3_DOUBLE_COLS = {
    "events": ("value",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
    "orders": ("o_totalprice",),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
}
_W3_TEXT_COLS = {
    "documents": ("text",),
    "customer": ("c_name",),
    "part": ("p_name",),
}
_W3_TS_EDGES = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 0),            # first envelope instant
    dt.datetime(2024, 1, 31, 23, 59, 59, 999999),   # last envelope instant
    dt.datetime(2024, 1, 15, 12, 0, 0, 999500),     # ms-rounding hazard ↑
    dt.datetime(2024, 1, 15, 12, 0, 0, 499),        # ms-rounding hazard ↓
    dt.datetime(2024, 1, 15, 12, 0, 1, 0),          # exact second
]
_W3_DATE_EDGES = [
    dt.datetime(1995, 1, 1),     # envelope start
    dt.datetime(2001, 12, 31),   # envelope end
    dt.datetime(1996, 2, 29),    # leap day
    dt.datetime(2000, 2, 29),    # century leap day
    dt.datetime(2000, 2, 28),
    dt.datetime(2000, 3, 1),
    dt.datetime(1999, 12, 31),   # Y2K boundary pair
    dt.datetime(2000, 1, 1),
]

# ---- wave-4 (seeds >= 104000) adversarial STRING STRUCTURE ----------------
# Wave 3 covered value/NULL/time/unicode-normalization space; wave 4 probes
# pathological string SHAPE for the regex/parse surface (pii_scrub,
# token_count, langid, rake, repetition, code_detect, fingerprint, bpe,
# scrub_blocklist, scalar_json/variant, CSV/XML/JSONL roundtrip payloads):
# catastrophic-backtracking shapes, giant tokens/runs, PII-regex edge
# forms, CSV/XML-hostile separators and control chars, format-string
# hazards, case-fold traps.
_W4_HOSTILE_TEXTS = [
    "a" * 3000 + "!",                         # single-char run + mismatch tail
    "(" * 500,                                # unbalanced deep open-nesting
    "[" * 200 + "x" + "]" * 200,              # balanced deep nesting
    "ab" * 1500 + "c",                        # alternating-pair run
    "a@" * 800,                               # email-regex hostile repetition
    "user@example.com reach me at user@example.com " * 40,  # dense PII hits
    "x" + "." * 2000 + "@y.com",              # dot-run local part
    "john.doe+tag-1_2@sub.domain.example.co.uk",  # legit complex email
    "+1 (555) 000-1234 or 555-00-0000; card 4111 1111 1111 1111",
    "9" * 300,                                # giant digit run
    "999.999.999.999 1.2.3.4.5 01.02.003.4 256.1.1.1",  # IP-ish zoo
    "see http://a.b/c?d=e&f=g#h and https://[::1]:8080/p%20q?x=1",
    "﻿BOM prefixed text",                # BOM survives serialization?
    "line1\r\nline2\rline3\nline4",           # CR/LF zoo (CSV hazard)
    'comma, "quoted; semicolon" and \ttab | pipe',  # CSV delimiter/quote zoo
    '<tag attr="v">&amp; ]]> </closed>',      # XML specials + CDATA-end
    "%s%s%n{0}${HOME}\\x41\\u0041",           # format-string hazards
    ("word " * 2000).strip(),                 # 2k-token document
    "ẞßİIıi Σσς",  # case-fold traps
    ".*+?^$()[]{}|\\ regex metachar soup .*+?",  # pattern-literal hazard
]
_W4_HOSTILE_PROPS = [
    '{"a":' * 64 + "1" + "}" * 64,            # 64-deep nesting
    '{"k":[' + "1," * 4999 + "1]}",           # 5k-element array
    '{"k":1e999}',                            # overflows double → Inf/null?
    '{"k":-0.0}',
    '{"k":9223372036854775808}',              # int64 max + 1
    '{"k":1,"k":2}',                          # duplicate keys
    '{"k":"\\u00e9\\n\\t"}',                  # escapes in value
    '{"k":"123\\n"}',                         # digit string + trailing \n:
    #   Java ^...$ matched (→123) where RE2 $ is end-of-text (→NULL);
    #   pins the \A...\z anchor fix (r13 advice, relational.py scalar_json)
    '{"k":"123\\r"}',                         # same hazard, \r terminator
    '{"k":"-45\\u2028"}',                     # Unicode line separator
    '   {"k":1}   ',                          # whitespace-padded
    '{"k":1}trailing',                        # trailing garbage
    '{"k:1}',                                 # broken quote
    "nan",                                    # bare non-JSON token
    '{"k":"' + "x" * 8000 + '"}',             # giant string value
]


# ---------------------------------------------------------------------------
# per-trial generation
# ---------------------------------------------------------------------------

def _schema(table: str) -> pa.Schema:
    return pq.read_schema(f"{REF_SF}/{table}.parquet").remove_metadata()


def _write(out_dir: str, table: str, columns: dict[str, list]) -> None:
    schema = _schema(table)
    arrays = [pa.array(columns[f.name], type=f.type) for f in schema]
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.Table.from_arrays(arrays, schema=schema),
                   f"{out_dir}/{table}.parquet")


def _null_mask(rng, n, p):
    return rng.random(n) < p


def _maybe_null(rng, values, p):
    m = _null_mask(rng, len(values), p)
    return [None if mi else v for v, mi in zip(values, m)]


def _ids(rng, n, regime):
    """Id column under one of three regimes; always unique."""
    base = np.arange(n, dtype=np.int64)
    if regime == "small":
        return (base * int(rng.integers(1, 7)) + int(rng.integers(0, 5)))
    if regime == "negative":
        # mixed sign — exercises pmod/hash sign handling
        return base * 3 - n
    # "big": a 2^53-adjacent block plus a 2^62-scale block, rest small
    out = base.copy()
    k = max(1, n // 4)
    out[:k] = P53 - k // 2 + np.arange(k, dtype=np.int64)
    out[k:2 * k] = BIG - np.arange(k, dtype=np.int64) * 997
    return out


def _texts(rng, n, dup_rate, boundary_rate):
    out = []
    for i in range(n):
        r = rng.random()
        if out and r < dup_rate:
            out.append(out[int(rng.integers(0, len(out)))])  # exact dup
        elif r < dup_rate + boundary_rate:
            out.append(BOUNDARY_TEXTS[int(rng.integers(0, len(BOUNDARY_TEXTS)))])
        else:
            k = int(rng.integers(1, 30))
            words = rng.choice(WORDS, size=k)
            out.append(" ".join(words))
    return out


def _spiked_values(rng, n, spike_p):
    """Normal values with occasional spikes at the pinned quantization
    bounds: ±1e9 (the int64-audit magnitude cap), exact 0.0, and -0.0 —
    the values where floor-micro integerization and engine zero-sign
    conventions are most load-bearing (wave-2 knob)."""
    vals = [round(float(x), 3) for x in rng.normal(50, 60, size=n)]
    if spike_p > 0:  # wave-1 seeds consume zero extra randomness
        # ±1e9 sits PAST the milli²-family loud bounds (int64 audit:
        # e.g. rolling_zscore per-bucket ≤ ~6.2e5) — those cells verify
        # both engines REJECT out-of-bound magnitudes (XERR, pinned by
        # _explain); ±6e5 is large-but-legal and probes for silent
        # divergence inside the documented envelope
        spikes = [1e9, -1e9, 6e5, -6e5, 0.0, -0.0]
        for i in range(n):
            if rng.random() < spike_p:
                vals[i] = spikes[int(rng.integers(0, len(spikes)))]
    return vals


def _skewed_choice(rng, pool, n, skew):
    """With probability `skew`, the hot head element; else uniform."""
    hot = pool[0]
    picks = rng.integers(0, len(pool), size=n)
    mask = rng.random(n) < skew
    return [hot if m else pool[int(i)] for m, i in zip(mask, picks)]


def gen_trial(out: str, seed: int, scale: int = 1) -> dict:
    """Write all ten tables for one trial; returns the drawn knobs.

    ``scale`` multiplies the big-table row ranges (events / documents /
    embeddings / lineitem / orders); dims and the small tables stay
    small. scale=2000 puts events/lineitem near 1M rows — the fuzz
    counterpart of tools/hostile_fixtures.py --scale, for the key family
    whose failure modes only appear at volume (the r8 CC-truncation
    class)."""
    rng = np.random.default_rng(seed)
    # Knob schema is VERSIONED BY SEED RANGE so wave-1 seeds keep
    # replaying bit-identically (a changed draw sequence would orphan
    # every recorded finding): seeds < 102000 draw exactly the wave-1
    # knobs; 102000+ adds total skew (1.0), value spikes at the pinned
    # quantization bounds (±1e9, 0.0, -0.0), and envelope-boundary
    # timestamps. Wave-2 draws happen AFTER all wave-1 draws, and the
    # spike loops consume no randomness when spike_p == 0.
    wave2 = seed >= 102000
    s_doc = s_ev = scale
    s_li = s_ord = min(scale, 50)
    s_emb = min(scale, 10)
    knobs = {
        "null_p": float(rng.choice([0.0, 0.05, 0.2, 0.4])),
        "id_regime": str(rng.choice(["small", "small", "negative", "big"])),
        "skew": float(rng.choice([0.0, 0.5, 0.85, 1.0] if wave2
                                 else [0.0, 0.5, 0.85])),
        "dup_rate": float(rng.choice([0.0, 0.1, 0.35])),
        "tie_rate": float(rng.choice([0.0, 0.3])),
        "dim": int(rng.choice([16, 32, 64])),
        "orphan_p": float(rng.choice([0.0, 0.15])),
        "spike_p": float(rng.choice([0.05, 0.15])) if wave2 else 0.0,
    }
    np_ = knobs["null_p"]

    # ---- wave-3 knobs (seeds >= 103000): float specials, timestamp
    # precision/boundary regimes, date edges, NFC/NFD unicode mixing, and
    # degenerate 0/1-row tables. ALL wave-3 randomness comes from a
    # SEPARATE rng (rng3) and mutations run as a post-pass over each
    # table's built columns, so wave-1/2 seeds replay bit-identically
    # (their base-rng draw sequence is untouched and rng3 never spins).
    wave3 = seed >= 103000
    rng3 = np.random.default_rng(seed * 9973 + 3) if wave3 else None
    if wave3:
        k3 = {
            "w3_special_p": float(rng3.choice([0.0, 0.04, 0.12])),
            "w3_ts_regime": str(rng3.choice(["none", "micros", "edges"])),
            "w3_date_edge_p": float(rng3.choice([0.0, 0.12])),
            "w3_nfd_p": float(rng3.choice([0.0, 0.2])),
        }
        if rng3.random() < 0.3:
            k3["w3_tiny"] = "none"
        else:
            t = TABLES[int(rng3.integers(0, len(TABLES)))]
            k3["w3_tiny"] = (
                ("empty:" if rng3.random() < 0.5 else "one:") + t
            )
        knobs.update(k3)
    else:
        k3 = {"w3_special_p": 0.0, "w3_ts_regime": "none",
              "w3_date_edge_p": 0.0, "w3_nfd_p": 0.0, "w3_tiny": "none"}

    # ---- wave-4 knobs (seeds >= 104000): adversarial string structure.
    # Separate rng (rng4) + post-pass BEFORE w3 (so w3's NFD pass and the
    # documents n_chars fix-up see the final texts) — waves 1-3 replay
    # bit-identically.
    wave4 = seed >= 104000
    rng4 = np.random.default_rng(seed * 9967 + 4) if wave4 else None
    if wave4:
        k4 = {
            "w4_text_p": float(rng4.choice([0.0, 0.08, 0.2])),
            "w4_props_p": float(rng4.choice([0.0, 0.15])),
            "w4_giant": int(rng4.choice([0, 1])),
        }
        knobs.update(k4)
    else:
        k4 = {"w4_text_p": 0.0, "w4_props_p": 0.0, "w4_giant": 0}

    def w4(table: str, cols: dict[str, list]) -> dict[str, list]:
        """Wave-4 post-pass mutator; identity for wave-1/2/3 seeds."""
        if not wave4:
            return cols
        nrow = len(next(iter(cols.values())))
        tp = k4["w4_text_p"]
        if tp > 0:
            for cname in _W3_TEXT_COLS.get(table, ()):
                vals = list(cols[cname])
                for i in range(nrow):
                    if vals[i] is not None and rng4.random() < tp:
                        vals[i] = _W4_HOSTILE_TEXTS[
                            int(rng4.integers(0, len(_W4_HOSTILE_TEXTS)))]
                cols[cname] = vals
        if table == "events" and k4["w4_props_p"] > 0:
            vals = list(cols["props"])
            for i in range(nrow):
                if vals[i] is not None and rng4.random() < k4["w4_props_p"]:
                    vals[i] = _W4_HOSTILE_PROPS[
                        int(rng4.integers(0, len(_W4_HOSTILE_PROPS)))]
            cols["props"] = vals
        if table == "documents":
            if k4["w4_giant"] and nrow:
                # one ~200KB monster document (giant-token + giant-doc
                # regimes at once)
                cols["text"] = list(cols["text"])
                cols["text"][int(rng4.integers(0, nrow))] = (
                    ("lorem ipsum dolor " * 8000) + "y" * 50_000
                )
            cols["n_chars"] = [
                None if t is None else len(t) for t in cols["text"]]
        return cols

    def w3(table: str, cols: dict[str, list]) -> dict[str, list]:
        """Wave-3 post-pass mutator; identity for wave-1/2 seeds."""
        if not wave3:
            return cols
        nrow = len(next(iter(cols.values())))
        sp = k3["w3_special_p"]
        if sp > 0:
            for cname in _W3_DOUBLE_COLS.get(table, ()):
                vals = list(cols[cname])
                for i in range(nrow):
                    if vals[i] is not None and rng3.random() < sp:
                        vals[i] = _W3_SPECIALS[
                            int(rng3.integers(0, len(_W3_SPECIALS)))]
                cols[cname] = vals
        nfd = k3["w3_nfd_p"]
        if nfd > 0:
            import unicodedata
            for cname in _W3_TEXT_COLS.get(table, ()):
                vals = list(cols[cname])
                for i in range(nrow):
                    if vals[i] and rng3.random() < nfd:
                        vals[i] = unicodedata.normalize("NFD", vals[i])
                cols[cname] = vals
            if table == "documents":
                # n_chars stays consistent with the (possibly re-normalized)
                # text — the fixture invariant
                cols["n_chars"] = [
                    None if t is None else len(t) for t in cols["text"]]
        if table == "events" and k3["w3_ts_regime"] != "none":
            vals = list(cols["ts"])
            if k3["w3_ts_regime"] == "micros":
                for i in range(nrow):
                    if vals[i] is not None:
                        vals[i] = vals[i] + dt.timedelta(
                            microseconds=int(rng3.integers(0, 1_000_000)))
            else:  # "edges": envelope-boundary + ms-rounding-hazard instants
                for i in range(nrow):
                    if vals[i] is not None and rng3.random() < 0.12:
                        vals[i] = _W3_TS_EDGES[
                            int(rng3.integers(0, len(_W3_TS_EDGES)))]
            cols["ts"] = vals
        de = k3["w3_date_edge_p"]
        if de > 0:
            for cname in ("o_orderdate", "l_shipdate"):
                if cname in cols:
                    vals = list(cols[cname])
                    for i in range(nrow):
                        if vals[i] is not None and rng3.random() < de:
                            vals[i] = _W3_DATE_EDGES[
                                int(rng3.integers(0, len(_W3_DATE_EDGES)))]
                    cols[cname] = vals
        if k3["w3_tiny"] == f"empty:{table}":
            cols = {c: [] for c in cols}
        elif k3["w3_tiny"] == f"one:{table}":
            cols = {c: v[:1] for c, v in cols.items()}
        return cols

    def _w(table: str, cols: dict[str, list]) -> None:
        _write(out, table, w3(table, w4(table, cols)))

    # --- region / nation (small dims; names fuzzed, keys dense) ---
    nr = int(rng.integers(2, 6))
    _w("region", {
        "r_regionkey": list(range(nr)),
        "r_name": _maybe_null(rng, _texts(rng, nr, 0, 0.4), np_ / 2),
    })
    nn = int(rng.integers(3, 26))
    _w("nation", {
        "n_nationkey": list(range(nn)),
        "n_name": _maybe_null(rng, _texts(rng, nn, 0.1, 0.4), np_ / 2),
        "n_regionkey": [int(x) for x in rng.integers(0, nr, size=nn)],
    })

    # --- customer / supplier / part ---
    nc = int(rng.integers(5, 60))
    ckeys = _ids(rng, nc, knobs["id_regime"])
    _w("customer", {
        "c_custkey": [int(x) for x in ckeys],
        "c_name": _maybe_null(rng, _texts(rng, nc, 0.2, 0.3), np_),
        "c_nationkey": [int(x) for x in rng.integers(0, nn, size=nc)],
        "c_acctbal": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.normal(1000, 3000, size=nc)], np_),
        "c_mktsegment": _skewed_choice(rng, SEGMENTS, nc, knobs["skew"]),
    })
    ns = int(rng.integers(2, 11))
    skeys = _ids(rng, ns, knobs["id_regime"])
    _w("supplier", {
        "s_suppkey": [int(x) for x in skeys],
        "s_name": _maybe_null(rng, _texts(rng, ns, 0, 0.3), np_),
        "s_nationkey": [int(x) for x in rng.integers(0, nn, size=ns)],
        "s_acctbal": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.normal(5000, 2000, size=ns)], np_),
    })
    npart = int(rng.integers(5, 50))
    pkeys = _ids(rng, npart, knobs["id_regime"])
    _w("part", {
        "p_partkey": [int(x) for x in pkeys],
        "p_name": _maybe_null(rng, _texts(rng, npart, 0.1, 0.3), np_),
        "p_brand": _skewed_choice(
            rng, [f"Brand#{i}" for i in range(1, 6)] + ["", None],
            npart, knobs["skew"]),
        "p_type": _skewed_choice(
            rng, ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
                  "PROMO", None], npart, knobs["skew"]),
        "p_size": _maybe_null(
            rng, [int(x) for x in rng.integers(1, 51, size=npart)], np_),
        "p_retailprice": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.uniform(1, 2000, size=npart)], np_),
    })

    # --- orders / lineitem (referential, some orphans) ---
    no = int(rng.integers(20, 250)) * s_ord
    okeys = _ids(rng, no, knobs["id_regime"])
    ocust = rng.choice(ckeys, size=no)
    orphan = _null_mask(rng, no, knobs["orphan_p"])
    ocust = [int(c) + (10 ** 9 if o and knobs["id_regime"] != "big" else 0)
             for c, o in zip(ocust, orphan)]
    year = rng.integers(1995, 2002, size=no)
    month = rng.integers(1, 13, size=no)
    day = rng.integers(1, 28, size=no)
    _w("orders", {
        "o_orderkey": [int(x) for x in okeys],
        "o_custkey": ocust,
        "o_orderstatus": _skewed_choice(rng, ["F", "O", "P", "", None],
                                        no, knobs["skew"]),
        "o_totalprice": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.uniform(-500, 500000, size=no)], np_),
        "o_orderdate": [dt.datetime(int(y), int(m), int(d))
                        for y, m, d in zip(year, month, day)],
        "o_orderpriority": _skewed_choice(rng, PRIORITIES, no, knobs["skew"]),
    })
    nl = int(rng.integers(50, 700)) * s_li
    lok = _skewed_choice(rng, [int(x) for x in okeys], nl, knobs["skew"])
    yearl = rng.integers(1995, 2002, size=nl)
    monthl = rng.integers(1, 13, size=nl)
    dayl = rng.integers(1, 28, size=nl)
    _w("lineitem", {
        "l_orderkey": lok,
        "l_partkey": [int(x) for x in rng.choice(pkeys, size=nl)],
        "l_suppkey": [int(x) for x in rng.choice(skeys, size=nl)],
        "l_linenumber": [int(x) for x in rng.integers(1, 8, size=nl)],
        "l_quantity": _maybe_null(
            rng, [float(x) for x in rng.integers(1, 51, size=nl)], np_),
        "l_extendedprice": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.uniform(0, 100000, size=nl)], np_),
        "l_discount": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.uniform(0, 0.1, size=nl)], np_),
        "l_tax": _maybe_null(
            rng, [round(float(x), 2) for x in
                  rng.uniform(0, 0.08, size=nl)], np_),
        "l_returnflag": _skewed_choice(rng, ["A", "N", "R", "", None],
                                       nl, knobs["skew"]),
        "l_linestatus": _skewed_choice(rng, ["F", "O", None],
                                       nl, knobs["skew"]),
        "l_shipdate": [dt.datetime(int(y), int(m), int(d))
                       for y, m, d in zip(yearl, monthl, dayl)],
    })

    # --- events (Jan-2024 envelope; ties; skewed users; junk props) ---
    ne = int(rng.integers(50, 500)) * s_ev
    ekeys = _ids(rng, ne, knobs["id_regime"])
    users = _skewed_choice(
        rng, [int(x) for x in _ids(rng, max(3, ne // 20),
                                   knobs["id_regime"])],
        ne, knobs["skew"])
    day_e = rng.integers(1, 31, size=ne)
    sec_e = rng.integers(0, 86400, size=ne)
    ts = [dt.datetime(2024, 1, int(d)) + dt.timedelta(seconds=int(s))
          for d, s in zip(day_e, sec_e)]
    # envelope-boundary timestamps (wave-2): the exact first and last
    # representable instants of the Jan-2024 envelope. Guarded so wave-1
    # seeds consume zero extra randomness.
    if knobs["spike_p"] > 0:
        _TS_EDGES = [dt.datetime(2024, 1, 1, 0, 0, 0, 0),
                     dt.datetime(2024, 1, 30, 23, 59, 59, 999999)]
        for i in range(ne):
            if rng.random() < knobs["spike_p"] / 2:
                ts[i] = _TS_EDGES[int(rng.integers(0, 2))]
    # timestamp ties: copy a previous row's ts
    for i in range(1, ne):
        if rng.random() < knobs["tie_rate"]:
            ts[i] = ts[int(rng.integers(0, i))]
    props = []
    for i in range(ne):
        p = PROPS_POOL[int(rng.integers(0, len(PROPS_POOL)))]
        props.append(p % int(rng.integers(0, 100)) if p and "%d" in p else p)
    _w("events", {
        "event_id": [int(x) for x in ekeys],
        "ts": _maybe_null(rng, ts, np_ / 2),
        "user_id": _maybe_null(rng, users, np_ / 2),
        "event_type": _skewed_choice(rng, EVENT_TYPES, ne, knobs["skew"]),
        "value": _maybe_null(
            rng, _spiked_values(rng, ne, knobs["spike_p"]), np_),
        "props": props,
    })

    # --- documents (dups, boundary texts, n_chars consistent) ---
    nd = int(rng.integers(20, 200)) * s_doc
    dkeys = _ids(rng, nd, knobs["id_regime"])
    texts = _maybe_null(
        rng, _texts(rng, nd, knobs["dup_rate"], 0.25), np_ / 2)
    _w("documents", {
        "doc_id": [int(x) for x in dkeys],
        "text": texts,
        "lang": _skewed_choice(rng, LANGS, nd, knobs["skew"]),
        "source": _skewed_choice(rng, SOURCES, nd, knobs["skew"]),
        "n_chars": [None if t is None else len(t) for t in texts],
    })

    # --- embeddings (one dim per trial; zero/dup/NULL vectors) ---
    nv = int(rng.integers(20, 200)) * s_emb
    vkeys = _ids(rng, nv, knobs["id_regime"])
    dim = knobs["dim"]
    vecs = rng.normal(0, 1, size=(nv, dim)).astype(np.float32)
    for i in range(nv):
        r = rng.random()
        if r < 0.05:
            vecs[i] = 0.0                      # zero-norm
        elif r < 0.05 + knobs["dup_rate"] / 2 and i > 0:
            vecs[i] = vecs[int(rng.integers(0, i))]  # identical vector
    emb = _maybe_null(rng, [list(map(float, v)) for v in vecs], np_ / 3)
    _w("embeddings", {
        "vec_id": [int(x) for x in vkeys],
        "embedding": emb,
        "label": _maybe_null(
            rng, [int(x) for x in rng.integers(0, 10, size=nv)], np_ / 3),
    })
    return knobs


# ---------------------------------------------------------------------------
# explanation predicates (dynamic-variant ALLOW)
# ---------------------------------------------------------------------------

_GROUPING_KEYS = {"agg_rollup", "agg_grouping_sets", "agg_cube"}


# Overflow-SPECIFIC markers only (ADVICE r10): the generic 'Py4JJavaError'
# matched every Spark exception, so any XERR cell whose DuckDB side looked
# like overflow was auto-explained even when Spark failed for an unrelated
# reason (ANSI divide, cast, codegen) — masking real findings.
_OVERFLOW_SPARK = re.compile(
    r"ARITHMETIC_OVERFLOW|long overflow|CAST_OVERFLOW"
    r"|NUMERIC_VALUE_OUT_OF_RANGE|BinaryArithmetic overflow"
    r"|Overflow in function|CANNOT_CHANGE_DECIMAL_PRECISION")
_OVERFLOW_DUCK = re.compile(
    r"Out of Range|out of range|OUT_OF_RANGE|Conversion Error|Overflow")


def _explain(key: str, out: str, detail: str) -> str | None:
    """Return a one-line justification if (key, detail) is a pinned engine
    boundary, else None (a real finding). Mirrors hostile_gate.ALLOW but by
    predicate, since fuzz variants are dynamic."""
    if key in _GROUPING_KEYS and re.search(
            r"rowcount: spark=0 duck=[1-9]", detail or ""):
        return ("Spark emits zero rows for ROLLUP/CUBE/GROUPING SETS over an "
                "empty (post-filter) relation; DuckDB emits the SQL-standard "
                "grand-total row — pinned engine boundary (hostile_gate "
                "ALLOW, r9)")
    if out == "XERR" and detail:
        m = re.match(r"spark\[(?P<s>.*)\] duck\[(?P<d>.*)\]", detail,
                     re.DOTALL)
        if (m and _OVERFLOW_SPARK.search(m.group("s"))
                and _OVERFLOW_DUCK.search(m.group("d"))):
            return ("both engines LOUDLY reject a value magnitude past the "
                    "documented integer-quantization bound (int64 audit / "
                    "tests/test_int64_bounds.py _expect_loud) — the "
                    "contracted out-of-envelope behavior, not a silent "
                    "divergence")
    return None


# ---------------------------------------------------------------------------
# campaign driver
# ---------------------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    # default root is per-process: a replay sharing a campaign's root
    # deletes trial dirs out from under it (observed: 6 spurious SERRs)
    ap.add_argument("--root", default=f"/tmp/fuzz-{os.getpid()}")
    ap.add_argument("--trials", type=int, default=0)
    ap.add_argument("--base-seed", type=int, default=101000)
    ap.add_argument("--seeds", default="",
                    help="comma-separated explicit seeds (replay)")
    ap.add_argument("--report", default="reports/fuzz_gate.md")
    ap.add_argument("--keep", action="store_true",
                    help="keep trial parquet dirs")
    ap.add_argument("--scale", type=int, default=1,
                    help="big-table row multiplier (2000 ≈ 1M events); "
                         "defaults keys to hostile_gate.SCALE_KEYS")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
    else:
        n = args.trials or 10
        seeds = [args.base_seed + i for i in range(n)]

    from hostile_gate import run_gate  # after sys.path setup
    from clusterindices_spark.session import get_spark

    if args.scale > 1 and not args.keys:
        # at volume, only the shuffle-heavy family is worth the wall —
        # same scoping rationale as hostile_gate's scale variant
        from hostile_gate import SCALE_KEYS
        args.keys = list(SCALE_KEYS)

    spark = get_spark("fuzz-gate")
    all_results = []   # (seed, key, out, detail, sec)
    knob_log = {}
    for seed in seeds:
        variant = f"fz{seed}"
        trial_dir = os.path.join(args.root, variant)
        if os.path.isdir(trial_dir):
            shutil.rmtree(trial_dir)
        knob_log[seed] = gen_trial(trial_dir, seed, scale=args.scale)
        print(f"--- seed {seed} knobs={knob_log[seed]}", flush=True)
        res = run_gate([variant], args.keys, args.root, spark=spark)
        for v, k, out, detail, sec in res:
            all_results.append((seed, k, out, detail, sec))
        if not args.keep:
            shutil.rmtree(trial_dir, ignore_errors=True)

    # classify
    n = {"PASS": 0, "ROWS": 0, "XERR": 0, "DIVERGE": 0, "SERR": 0}
    unexplained, explained = [], []
    for seed, k, out, detail, sec in all_results:
        n[out] += 1
        if out in ("DIVERGE", "XERR", "SERR"):
            why = _explain(k, out, detail)
            (explained if why else unexplained).append(
                (seed, k, out, detail, why))

    lines = ["# Randomized differential fuzz gate (tools/fuzz_gate.py)", ""]
    lines.append(f"seeds: {seeds[0]}..{seeds[-1]} ({len(seeds)} trials), "
                 f"cells: {len(all_results)} — "
                 + ", ".join(f"{v} {c}" for c, v in n.items()))
    lines.append(f"unexplained findings: {len(unexplained)}")
    lines.append("")
    if unexplained:
        lines.append("## UNEXPLAINED (replay: python tools/fuzz_gate.py "
                     "--seeds <seed> <key>)")
        lines.append("")
        for seed, k, out, detail, why in unexplained:
            lines.append(f"- **seed {seed} / {k}** [{out}]: {detail}")
        lines.append("")
    if explained:
        lines.append("## Explained (pinned engine boundaries)")
        lines.append("")
        for seed, k, out, detail, why in explained:
            lines.append(f"- seed {seed} / {k} [{out}] — {why}")
        lines.append("")
    lines.append("## Trial knobs")
    lines.append("")
    for seed in seeds:
        lines.append(f"- {seed}: {knob_log[seed]}")
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nreport: {args.report}; unexplained: {len(unexplained)}")
    return 1 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
