#!/usr/bin/env python
"""Seeded adversarial fixture generator (VERDICT r8 item 1).

Writes parquet tables that MATCH the driver fixtures' schemas exactly
(schemas are mirrored from /root/testdata parquet footers, never hand-typed)
but carry the input classes the well-formed gate fixtures can never produce:

- ``empty``   — every table 0 rows (schema-correct empty parquet).
- ``edge``    — NULL floods in every nullable non-key column, empty strings,
  single-row / single-group / single-cluster degenerates, unicode boundary
  text (combining chars, 4-byte emoji, RTL, zero-width, CJK), whitespace-only
  and 5000-char single-token documents, zero/identical/NULL vectors, maximal
  key skew (one user owns ~80% of events; one order owns half of lineitem),
  duplicate (user, ts) timestamp ties, malformed / empty / non-object JSON
  props, and negative revenue (refund regime — the attribution truncation
  semantics note).
- ``bigid``   — every id column carries 2^53-adjacent and 2^62-scale values
  (the silent-quotient-collapse class the r8 int64 audit proved real), with
  referential integrity preserved so joins still produce rows. Value columns
  stay at a magnitude where every documented per-operator quantization bound
  holds — value-scale boundary proofs live in tests/test_int64_bounds.py,
  where each bound is pinned individually.

Everything is a deterministic arithmetic formula of the row index — no
random(), no time. Re-running produces byte-identical tables.

Usage: python tools/hostile_fixtures.py [--out /tmp/hostile]
Writes {out}/{empty,edge,bigid}/{table}.parquet.
The differential gate over these dirs is tools/hostile_gate.py.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

REF_SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

P53 = 2**53  # 9007199254740992: doubles lose integer exactness past here
BIG = 2**62 // 1000003 * 1000  # ~4.6e15: huge but safe under every mod/hash

DIM = 64  # embeddings dim (FIXTURES.md)

# unicode boundary texts (edge variant): combining chars, emoji (4-byte
# UTF-8), RTL, zero-width joiner/space, CJK (no spaces), NBSP-separated
U_TEXTS = [
    "café résumé naïve",  # combining accents
    "\U0001f30d\U0001f680 rocket \U0001f9ea lab",  # 4-byte emoji
    "مرحبا بالعالم",  # RTL arabic
    "a​b c‍d",  # zero-width space / joiner
    "中文文本没有空格",  # CJK, no spaces
    "tab\tsep\nnewline\rcarriage",  # control whitespace
    "nbsp separated words",  # non-breaking spaces
    "ßÆœ İstanbul Iı",  # casing edge points
]


def _ts(day: int, hour: int = 0, minute: int = 0, sec: int = 0, us: int = 0):
    """2024-01-<day> timestamp (events stay inside the fixture's Jan 2024
    envelope — DiD splits at Jan 16, sessionization assumes the month)."""
    return dt.datetime(2024, 1, day, hour, minute, sec, us)


def _ots(year: int, month: int = 6, day: int = 15):
    return dt.datetime(year, month, day)


def _schema(table: str) -> pa.Schema:
    return pq.read_schema(f"{REF_SF}/{table}.parquet").remove_metadata()


def _write(out_dir: str, table: str, columns: dict[str, list]) -> None:
    schema = _schema(table)
    arrays = [
        pa.array(columns[f.name], type=f.type) for f in schema
    ]
    tbl = pa.Table.from_arrays(arrays, schema=schema)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, f"{out_dir}/{table}.parquet")


def gen_empty(out: str) -> None:
    for t in TABLES:
        _write(out, t, {f.name: [] for f in _schema(t)})


def gen_edge(out: str) -> None:
    # --- star schema: tiny but referentially intact, NULLs everywhere the
    # schema allows except join keys ---
    _write(out, "region", {
        "r_regionkey": [0, 1],
        "r_name": ["", "ünïcode \U0001f30d region"],
    })
    _write(out, "nation", {
        "n_nationkey": [0, 1, 2],
        "n_name": ["", None, "中国"],
        "n_regionkey": [0, 0, 1],  # region 1 nearly empty; region 0 skewed
    })
    _write(out, "customer", {
        "c_custkey": list(range(8)),
        "c_name": ["", None, "ć", "dup", "dup", "  ", "c6", "c7"],
        "c_nationkey": [0] * 7 + [2],  # nation skew
        "c_acctbal": [0.0, None, -999.99, 0.005, 1e9, None, 2.5, 2.5],
        "c_mktsegment": ["BUILDING", None, "", "BUILDING", "BUILDING",
                         "BUILDING", "BUILDING", "AUTOMOBILE"],
    })
    _write(out, "supplier", {
        "s_suppkey": [0, 1, 2],
        "s_name": ["", None, "s2"],
        "s_nationkey": [0, 0, 2],
        "s_acctbal": [None, 0.0, -1.5],
    })
    _write(out, "part", {
        "p_partkey": list(range(5)),
        "p_name": ["", None, "p two words", "\U0001f9ea", "p4"],
        "p_brand": ["Brand#0"] * 4 + [""],
        "p_type": ["", None, "STANDARD BRUSHED TIN", "STANDARD BRUSHED TIN",
                   "ECONOMY"],
        "p_size": [0, 1, 1, 1, 50],
        "p_retailprice": [0.0, None, -1.0, 100.005, 1e7],
    })
    # orders: customer 0 owns 12 of 16 (skew); one NULL price; one NULL date;
    # date range edges; one order with NO lineitems (order 15); one
    # customer (7) with exactly one order
    n_ord = 16
    _write(out, "orders", {
        "o_orderkey": list(range(n_ord)),
        "o_custkey": [0] * 12 + [3, 4, 7, 0],
        "o_orderstatus": ["F"] * 8 + ["O"] * 6 + ["P", "F"],
        "o_totalprice": [0.0, None, -5.0] + [100.0 + i for i in range(12)]
        + [1e8],
        "o_orderdate": [_ots(1995, 1, 1), _ots(2001, 8, 1), None]
        + [_ots(1996 + i % 5) for i in range(12)] + [_ots(1999)],
        "o_orderpriority": ["1-URGENT", "", None] + ["3-MEDIUM"] * 12
        + ["5-LOW"],
    })
    # lineitem: order 0 owns 30 of 60 lines (skew); zero quantity; discount
    # 1.0 (full); NULL tax; negative price; degenerate flag groups
    n_li = 60
    li_ok = [0] * 30 + [1 + (i % 14) for i in range(30)]
    _write(out, "lineitem", {
        "l_orderkey": li_ok,
        "l_partkey": [i % 5 for i in range(n_li)],
        "l_suppkey": [i % 3 for i in range(n_li)],
        "l_linenumber": [
            (i + 1) if ok == 0 else 1 + i % 3
            for i, ok in enumerate(li_ok)
        ],
        "l_quantity": [0.0, None] + [1.0 + i % 7 for i in range(n_li - 2)],
        "l_extendedprice": [0.0, -10.0, None]
        + [10.0 * (1 + i % 9) for i in range(n_li - 3)],
        "l_discount": [1.0, 0.0, None] + [round(0.01 * (i % 11), 2)
                                          for i in range(n_li - 3)],
        "l_tax": [None, 0.0] + [0.04] * (n_li - 2),
        "l_returnflag": ["A"] * (n_li - 2) + ["N", "R"],  # degenerate group
        "l_linestatus": ["F"] * (n_li - 1) + ["O"],
        "l_shipdate": [_ots(1995, 1, 2), None]
        + [_ots(1996 + i % 6, 1 + i % 12, 1 + i % 28)
           for i in range(n_li - 2)],
    })
    # events: user 0 owns 200 of 240 (one hour, one type = max skew +
    # degenerate group); user 5 has exactly ONE event; NULL user/value/
    # props/ts rows; duplicate (user, ts) ties; negative revenue purchases;
    # malformed JSON
    ev, n = [], 240
    for i in range(200):  # the hot block: same user, same hour, same type
        ev.append((i, _ts(10, 12, i % 60, i // 60), 0, "click",
                   float(i % 5), '{"k": %d}' % (i % 9)))
    ev.append((200, _ts(1, 0, 0, 0), 5, "signup", 1.0, '{"k": 1}'))  # lone
    ev.append((201, _ts(30, 23, 59, 59, 999999), 6, "view", 2.0, '{"k": 2}'))
    ev.append((202, _ts(2, 1), None, "click", 3.0, '{"k": 3}'))  # NULL user
    ev.append((203, _ts(2, 2), None, "error", None, None))
    ev.append((204, None, 7, "view", 1.0, '{"k": 4}'))  # NULL ts
    ev.append((205, None, 7, "purchase", -50.0, "{"))  # refund + bad JSON
    ev.append((206, _ts(3, 3), 8, "purchase", -0.000001, "{}"))  # tiny refund
    ev.append((207, _ts(3, 2), 8, "view", 0.0, "null"))  # touch before 206
    ev.append((208, _ts(3, 4), 8, "purchase", 0.0, ""))  # zero-value conv
    # duplicate (user, ts) ties — id is the only tie-break
    ev.append((209, _ts(4, 4), 9, "view", 1.0, '{"k": 5}'))
    ev.append((210, _ts(4, 4), 9, "view", 1.0, '{"k": 5}'))
    ev.append((211, _ts(4, 4), 9, "click", 2.0, '{"k": 6}'))
    # a funnel for one user: view -> click -> purchase across 3 days
    ev.append((212, _ts(5, 1), 10, "view", 1.0, '{"k": 7}'))
    ev.append((213, _ts(6, 1), 10, "click", 1.0, '{"k": 7}'))
    ev.append((214, _ts(7, 1), 10, "purchase", 9.99, '{"k": 7}'))
    for i in range(215, n):  # sparse background users 11..14
        ev.append((i, _ts(1 + i % 28, i % 24, i % 60), 11 + i % 4,
                   ["view", "click", "error", "signup", "purchase"][i % 5],
                   float(i % 100) / 4.0, '{"k": %d}' % (i % 100)))
    # NULL-ts click for a user who ALSO has a valid click and a later
    # purchase: as-of attribution must ignore it (r10 advice — NaN ms
    # cast NaN->int64 made the searchsorted array end with INT64_MIN,
    # silently attributing every purchase to the NULL-ts click)
    ev.append((240, None, 10, "click", 1.0, '{"k": 8}'))
    # NULL event_type for an active user (late r10): type-keyed groupBys,
    # funnels, and type-partitioned windows must treat the NULL type
    # group identically in both engines
    ev.append((241, _ts(6, 2), 10, None, 2.0, '{"k": 9}'))
    # NULL value on a PURCHASE for an active user (late r10): revenue
    # sums/means in LTV, attribution, funnels, and t-tests must skip it
    # identically — distinct from event 203's NULL value (error type,
    # NULL user), which most revenue paths never reach
    ev.append((242, _ts(8, 1), 10, "purchase", None, '{"k": 10}'))
    _write(out, "events", {
        "event_id": [e[0] for e in ev],
        "ts": [e[1] for e in ev],
        "user_id": [e[2] for e in ev],
        "event_type": [e[3] for e in ev],
        "value": [e[4] for e in ev],
        "props": [e[5] for e in ev],
    })
    # documents: empties, whitespace, unicode, 5000-char token, exact dups,
    # near dup, single shared token corpus-wide skew, NULL text/lang/source
    docs = [
        (0, "", "en", "src0", 0),
        (1, " ", "en", "src0", 1),
        (2, "a", "en", "src0", 1),  # single 1-char token
        (3, "a a a a a a a a", "en", "src0", 15),  # one repeated token
        (4, "x" * 5000, "en", "src0", 5000),  # one huge token
        (5, "x" * 5000, "en", "src1", 0),  # exact dup of 4 + WRONG n_chars
        (6, None, "en", "src0", 0),  # NULL text
        (7, "common words here", None, "src0", 17),  # NULL lang
        (8, "common words here", "xx", None, 17),  # unknown lang, NULL src
        (9, "common words there", "", "", 18),  # near-dup of 7/8
    ]
    for i, t in enumerate(U_TEXTS):
        docs.append((10 + i, t, ["zh", "es", "de", "fr"][i % 4], "src0",
                     len(t)))
    for i in range(len(docs), 30):  # filler so stats have mass; all src0
        docs.append((i, f"filler doc number {i} shared corpus words",
                     "en", "src0", 38))
    # NULL n_chars for a real text (late r10): size-weighted packing,
    # keep-best char accounting, and SUM(n_chars) windows must treat the
    # unknown-size doc identically in both engines
    docs.append((30, "detector doc with unknown size words here",
                 "en", "src1", None))
    _write(out, "documents", {
        "doc_id": [d[0] for d in docs],
        "text": [d[1] for d in docs],
        "lang": [d[2] for d in docs],
        "source": [d[3] for d in docs],
        "n_chars": [d[4] for d in docs],
    })
    # embeddings: probes (vec_id<10) exist; zero vector; identical pair;
    # NULL embedding; NULL label; tiny/huge magnitudes; single-cluster
    # degenerate (label 0 everywhere except two rows)
    vecs, labels = [], []
    ids = list(range(24))
    for i in ids:
        if i == 3:
            vecs.append([0.0] * DIM)  # zero vector: norm 0
        elif i == 4 or i == 5:
            vecs.append([1.0] * DIM)  # identical pair: cosine 1, d2 0
        elif i == 6:
            vecs.append(None)  # NULL embedding
        elif i == 7:
            vecs.append([1e-30] * DIM)  # denormal-scale norm
        elif i == 8:
            vecs.append([1e3 * ((j % 3) - 1) for j in range(DIM)])
        else:
            vecs.append([((i * 31 + j * 7) % 17 - 8) / 8.0
                         for j in range(DIM)])
        labels.append(None if i == 9 else (1 if i >= 22 else 0))
    _write(out, "embeddings", {
        "vec_id": ids,
        "embedding": vecs,
        "label": labels,
    })


def gen_bigid(out: str) -> None:
    """2^53/2^62-adjacent ids with referential integrity. Joins stay
    non-vacuous; value columns stay in the safe regime (value-scale bounds
    are pinned per-operator in tests/test_int64_bounds.py)."""
    ck = [P53 - 1, P53, P53 + 1, P53 + 2, BIG, BIG + 1]
    _write(out, "region", {"r_regionkey": [0, 1],
                           "r_name": ["AMERICA", "ASIA"]})
    _write(out, "nation", {"n_nationkey": [0, 1],
                           "n_name": ["BRAZIL", "CHINA"],
                           "n_regionkey": [0, 1]})
    _write(out, "customer", {
        "c_custkey": ck,
        "c_name": [f"cust{i}" for i in range(6)],
        "c_nationkey": [0, 1, 0, 1, 0, 1],
        "c_acctbal": [100.5, 200.25, 300.125, 400.0, 500.75, 600.5],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING", "MACHINERY",
                         "BUILDING", "HOUSEHOLD"],
    })
    sk = [P53 - 2, P53 + 3, BIG + 2]
    _write(out, "supplier", {
        "s_suppkey": sk,
        "s_name": ["s0", "s1", "s2"],
        "s_nationkey": [0, 1, 0],
        "s_acctbal": [10.5, 20.25, 30.75],
    })
    pk = [P53 - 3, P53 + 4, P53 + 5, BIG + 3]
    _write(out, "part", {
        "p_partkey": pk,
        "p_name": [f"part {i} green" for i in range(4)],
        "p_brand": ["Brand#1", "Brand#2", "Brand#1", "Brand#3"],
        "p_type": ["STANDARD BRUSHED TIN", "ECONOMY ANODIZED STEEL",
                   "STANDARD BRUSHED TIN", "PROMO POLISHED COPPER"],
        "p_size": [1, 5, 9, 49],
        "p_retailprice": [901.0, 902.5, 903.25, 904.125],
    })
    n_ord = 20
    ok = [P53 - 5 + i for i in range(10)] + [BIG + 10 + i for i in range(10)]
    _write(out, "orders", {
        "o_orderkey": ok,
        "o_custkey": [ck[i % 6] for i in range(n_ord)],
        "o_orderstatus": ["F", "O", "P", "F", "O"] * 4,
        "o_totalprice": [1000.25 * (1 + i % 7) for i in range(n_ord)],
        "o_orderdate": [_ots(1995 + i % 7, 1 + i % 12, 1 + i % 28)
                        for i in range(n_ord)],
        "o_orderpriority": [f"{1 + i % 5}-X" for i in range(n_ord)],
    })
    n_li = 60
    _write(out, "lineitem", {
        "l_orderkey": [ok[i % n_ord] for i in range(n_li)],
        "l_partkey": [pk[i % 4] for i in range(n_li)],
        "l_suppkey": [sk[i % 3] for i in range(n_li)],
        "l_linenumber": [1 + (i // n_ord) for i in range(n_li)],
        "l_quantity": [1.0 + i % 49 for i in range(n_li)],
        "l_extendedprice": [100.25 * (1 + i % 11) for i in range(n_li)],
        "l_discount": [round(0.01 * (i % 11), 2) for i in range(n_li)],
        "l_tax": [0.04] * n_li,
        "l_shipdate": [_ots(1995 + i % 7, 1 + (i * 5) % 12, 1 + i % 28)
                       for i in range(n_li)],
        "l_returnflag": ["A", "N", "R"][0:1] * 0
        or [["A", "N", "R"][i % 3] for i in range(n_li)],
        "l_linestatus": [["F", "O"][i % 2] for i in range(n_li)],
    })
    # events: user_id at 2^53±k and 2^62-scale — the exact class that
    # silently collapsed the bitmap word index and the url-canonical page
    # id before their r8 integer-div fixes
    uids = [P53 - 1, P53, P53 + 1, P53 + 2, BIG, BIG + 1, BIG + 2, 7]
    n_ev = 160
    ev_ids = [P53 + 100 + i for i in range(n_ev)]
    _write(out, "events", {
        "event_id": ev_ids,
        "ts": [_ts(1 + i % 28, i % 24, i % 60, i % 60) for i in range(n_ev)],
        "user_id": [uids[i % 8] for i in range(n_ev)],
        "event_type": [["view", "click", "error", "signup", "purchase"][i % 5]
                       for i in range(n_ev)],
        "value": [float(i % 1000) / 8.0 for i in range(n_ev)],
        "props": ['{"k": %d}' % (i % 50) for i in range(n_ev)],
    })
    # documents: doc_id at the boundary (dedup_url_canonical page id =
    # doc_id div 4; curation samplers mod-reduce before the Knuth multiply)
    n_doc = 40
    dids = [P53 - 20 + i for i in range(20)] + [BIG + i for i in range(20)]
    _write(out, "documents", {
        "doc_id": dids,
        "text": [f"document body {i} with shared tokens alpha beta"
                 for i in range(n_doc)],
        "lang": [["de", "en", "es", "fr", "zh"][i % 5] for i in range(n_doc)],
        "source": [f"src{i % 4}" for i in range(n_doc)],
        "n_chars": [46 + (i > 9) for i in range(n_doc)],
    })
    # embeddings: vec_id at the boundary (minhash perms, LSH band ids,
    # IVF sampled-fit hash all key on vec_id)
    n_vec = 30
    vids = [P53 - 10 + i for i in range(15)] + [BIG + i for i in range(15)]
    _write(out, "embeddings", {
        "vec_id": vids,
        "embedding": [[((i * 31 + j * 7) % 17 - 8) / 8.0
                       for j in range(DIM)] for i in range(n_vec)],
        "label": [i % 10 for i in range(n_vec)],
    })


def gen_scale(out: str) -> None:
    """Hostile distribution at STRESS scale (VERDICT r10 item 4): the r8 CC
    truncation proved silent-wrongness classes exist that only manifest at
    scale, so this composes the hostile-gate's input classes with
    scale_stress's row counts — >=1M documents + >=1M embeddings carrying,
    simultaneously: maximal key skew (80% of docs in one source; 10% of
    the corpus sharing ONE text — every one of its shingles blows the
    stop-shingle cap; 90% of vectors in one tight blob = one hot IVF
    cell), NULL floods (text/lang/source/embedding/label), empty and
    whitespace-only texts, zero-norm vectors, and 2^53-adjacent id blocks.
    Only documents + embeddings are populated (the shuffle-heavy family
    under differential test reads nothing else); the other 8 tables are
    schema-correct empties so the gate's DuckDB views resolve.

    Deterministic structure the differential can exercise:
    - ~16.7k planted exact-dup groups of 18 docs (residues 5..7 of each
      60-block): their id-bearing shingles have df=18 (under the cap) so
      each group must come out of BOTH engines as one 18-clique component;
      the group texts' shared non-id shingles have df~300k and must be
      dropped by the cap in both engines.
    - the mega-text block (10% of corpus): every shingle hot ->
      singletons by design in both engines (the cap IS the 100 TB
      quadratic guard; this pins it at scale).
    Sizes: HS_DOCS (default 1M), HS_VECS (default 1M)."""
    import numpy as np

    n = int(os.environ.get("HS_DOCS", "1000000"))
    ids, texts, langs, sources, nchars = [], [], [], [], []
    mega = ("mega hot duplicate text shared verbatim by a tenth of the "
            "corpus blowing every shingle past the stop cap")
    p53_block = n - 50_000  # last 50k ids straddle 2^53
    for i in range(n):
        ids.append(i + 1 if i < p53_block else P53 - 25_000 + (i - p53_block))
        m = i % 10
        if m < 5:
            t = (f"unique doc {i} alpha{i % 97} beta{i % 31} "
                 f"gamma{i % 13} delta epsilon")
        elif m < 8:
            t = (f"duplicate group {i // 60} shared content block "
                 f"words repeated here")
        elif m == 8:
            t = mega
        else:
            t = (None, "", " ")[(i // 10) % 3]
        texts.append(t)
        nchars.append(len(t) if t else 0)
        langs.append(None if i % 997 == 0
                     else ("en", "de", "es", "fr", "zh")[i % 5])
        sources.append(None if i % 991 == 0
                       else ("src0" if m < 8 else f"src{i % 5}"))
    _write(out, "documents", {
        "doc_id": ids, "text": texts, "lang": langs,
        "source": sources, "n_chars": nchars,
    })
    del ids, texts, langs, sources, nchars

    # events at scale (late r10 — re-verifies the six NULL-order window
    # fixes at 1M rows): one user owns 50% of all events inside ONE hour
    # (max key + time skew through every user-partitioned window), NULL
    # ts/user/value/props floods, duplicate (user, ts) tie blocks,
    # negative values, malformed JSON, 2^53-adjacent event ids.
    ne = int(os.environ.get("HS_EVENTS", "1000000"))
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    eids, tss, uids, etypes, vals, props = [], [], [], [], [], []
    types = ("view", "click", "purchase", "error", "signup")
    p53_ev = ne - 20_000
    for i in range(ne):
        eids.append(i + 1 if i < p53_ev else P53 - 10_000 + (i - p53_ev))
        m = i % 10
        if m < 5:  # the hot block: user 0, one hour, duplicate seconds
            tss.append(base + dt.timedelta(hours=10, seconds=(i // 10) % 3600))
            uids.append(0)
            etypes.append(types[i % 2])  # view/click only: type skew too
        elif m == 5:  # NULL-ts flood INCLUDING clicks and purchases
            tss.append(None)
            uids.append(1 + (i // 10) % 500)
            etypes.append(types[i % 5])
        elif m == 6:  # NULL user
            tss.append(base + dt.timedelta(
                days=1 + (i // 10) % 28, seconds=i % 86_400))
            uids.append(None)
            etypes.append(types[i % 5])
        else:  # background: 500 normal users across the month
            tss.append(base + dt.timedelta(
                days=1 + (i // 10) % 28, seconds=(i * 7) % 86_400))
            uids.append(1 + (i // 10) % 500)
            etypes.append(types[i % 5])
        vals.append(
            None if i % 17 == 0
            else (-50.0 if i % 23 == 0 else float(i % 100) / 4.0)
        )
        props.append(
            None if i % 13 == 0
            else ("{" if i % 29 == 0 else '{"k": %d}' % (i % 9))
        )
    _write(out, "events", {
        "event_id": eids, "ts": tss, "user_id": uids,
        "event_type": etypes, "value": vals, "props": props,
    })
    del eids, tss, uids, etypes, vals, props

    nv = int(os.environ.get("HS_VECS", "1000000"))
    i = np.arange(nv, dtype=np.int64)
    vid = np.where(i < nv - 10_000, i + 1, P53 - 5_000 + (i - (nv - 10_000)))
    # 90% hot blob around e0 with id-derived jitter; 10% spread directions
    vals = np.zeros((nv, DIM), dtype=np.float32)
    hot = (i % 10) < 9
    vals[hot, 0] = 1.0
    vals[hot, (i[hot] % 8) + 1] += ((i[hot] % 101) / 1000.0).astype(
        np.float32
    )
    cold = ~hot
    vals[cold, i[cold] % DIM] = 1.0 + ((i[cold] % 17) / 10.0).astype(
        np.float32
    )
    vals[cold, (i[cold] * 7) % DIM] += ((i[cold] % 13) / 10.0).astype(
        np.float32
    )
    vals[i % 997 == 0] = 0.0  # zero-norm flood
    null_mask = (i % 1009) == 0  # NULL embedding flood
    # null list rows must be ZERO-length in the offsets (parquet writer
    # rejects non-empty null components) — cumsum of per-row lengths with
    # null rows' values excluded from the flat buffer
    lengths = np.where(null_mask, 0, DIM).astype(np.int64)
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    )
    emb = pa.ListArray.from_arrays(
        offsets, pa.array(vals[~null_mask].reshape(-1)),
        mask=pa.array(null_mask),
    )
    labels = pa.array(
        np.where((i % 499) == 0, -1, i % 16).astype(np.int32),
        mask=(i % 499) == 0,
    )
    schema = _schema("embeddings")
    tbl = pa.Table.from_arrays(
        [pa.array(vid), emb.cast(schema.field("embedding").type), labels],
        schema=schema,
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    for t in TABLES:
        if t not in ("documents", "embeddings", "events"):
            _write(out, t, {f.name: [] for f in _schema(t)})


def gen_scale10m(out: str) -> None:
    """Events-only hostile arm at >=10M rows (VERDICT r10 item 4): the
    sort-heavy user-partitioned window/lag family (lifecycle, cusum,
    interval_merge, gap_stats, fill_forward, sessionization, keyed dedup)
    under a 5M-row SINGLE-USER hot key — one window partition holding half
    the table, the spill/sort regime the 1M gate can't reach. Vectorized
    numpy generation (a Python row loop at 10M rows costs minutes).

    Structure (deterministic, index formulas):
    - 50% of rows: user 0, timestamps marching second-by-second through
      Jan 2024 with duplicate-second tie blocks every 7th row — one
      5M-row window partition with heavy ordering ties.
    - 10% NULL-ts flood, 10% NULL-user flood (both across all types).
    - 30% background: 2000 normal users across the month.
    - values: NULL every 17th, negative every 23rd, else small rationals;
      props: NULL every 13th, malformed '{' every 29th;
      event ids: last 20k straddle 2^53.
    Only events is populated; the other 9 tables are schema-correct
    empties so the gate's DuckDB views resolve."""
    import numpy as np

    ne = int(os.environ.get("HS10_EVENTS", "10000000"))
    i = np.arange(ne, dtype=np.int64)
    eid = np.where(i < ne - 20_000, i + 1, P53 - 10_000 + (i - (ne - 20_000)))
    m = i % 10

    base_ms = np.int64(1_704_067_200_000)  # 2024-01-01T00:00:00Z
    month_s = 28 * 86_400
    # hot user: consecutive seconds, every 7th row repeats the previous
    # second (tie blocks inside the 5M-row partition)
    hot_sec = (i // 2) % month_s
    hot_sec = np.maximum(hot_sec - (i % 7 == 0).astype(np.int64), 0)
    # background: 2000 users, scattered
    bg_sec = (i * 7919) % month_s
    sec = np.where(m < 5, hot_sec, bg_sec)
    # hot pairs share identical ms (exact (user, ts) ties through every
    # ordered window); background keeps sub-second spread
    ms = np.where(m < 5, (i - (i % 2)) % 1000, i % 1000)
    ts_ms = base_ms + sec * 1000 + ms
    ts_null = (m == 5) | (m == 6)

    user = np.where(m < 5, 0, 1 + (i % 2000))
    user_null = m == 7

    types = np.array(["view", "click", "purchase", "error", "signup"])
    etype = types[(i % 5).astype(np.int64)]
    etype = np.where(m < 5, types[(i % 2).astype(np.int64)], etype)

    val = np.where(i % 23 == 0, -50.0, (i % 100) / 4.0)
    val_null = i % 17 == 0

    schema = _schema("events")
    # int64→timestamp cast interprets the integer IN the target unit —
    # scale ms to whatever unit the mirrored schema carries (us or ns)
    unit_mult = {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[
        schema.field("ts").type.unit]
    ts_arr = pa.array(
        (ts_ms * unit_mult).astype("int64"), mask=ts_null, type=pa.int64()
    ).cast(schema.field("ts").type)
    props = np.where(
        i % 29 == 0, "{", np.char.add(
            np.char.add('{"k": ', (i % 9).astype(str)), "}")
    )
    tbl = pa.Table.from_arrays(
        [
            pa.array(eid),
            ts_arr,
            pa.array(user, mask=user_null, type=pa.int64()),
            pa.array(etype.astype(object), type=schema.field("event_type").type),
            pa.array(val, mask=val_null, type=pa.float64()),
            pa.array(
                props.astype(object),
                mask=i % 13 == 0,
                type=schema.field("props").type,
            ),
        ],
        schema=schema,
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/events.parquet")
    for t in TABLES:
        if t != "events":
            _write(out, t, {f.name: [] for f in _schema(t)})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hostile")
    ap.add_argument(
        "--scale", action="store_true",
        help="also write the >=1M-row scale variant (HS_DOCS/HS_VECS)",
    )
    ap.add_argument(
        "--scale10m", action="store_true",
        help="also write the >=10M-row events window-family arm "
             "(HS10_EVENTS)",
    )
    args = ap.parse_args()
    gens = [("empty", gen_empty), ("edge", gen_edge), ("bigid", gen_bigid)]
    if args.scale:
        gens.append(("scale", gen_scale))
    if args.scale10m:
        gens.append(("scale10m", gen_scale10m))
    for name, fn in gens:
        d = os.path.join(args.out, name)
        fn(d)
        print(f"wrote {d}")


if __name__ == "__main__":
    main()
