"""Shared hostile-events corpus: adversarial `events` parquet used by
both the CI differential gate (tests/test_hostile_events.py) and the
full out-of-band sweep (scripts/hostile_sweep.py).

Timestamp pathologies are the classic window/session-op killers: exact
session-gap boundaries, duplicate (user, ts) pairs, NULL ts/user/value,
NaN/±Inf values, epoch-0 / pre-1970 / far-future timestamps, identical
rows, unordered file layout, malformed props JSON.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SMOKE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_hostile_events(base: str) -> str:
    os.makedirs(base, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        if t == "events":
            continue
        if not os.path.exists(dst):
            os.symlink(f"{SMOKE}/{t}.parquet", dst)

    rng = np.random.RandomState(11)
    rows = []  # (event_id, ts_us or None, user_id, event_type, value, props)
    US = 1_000_000
    t0 = 1704067200 * US  # 2024-01-01 00:00:00 UTC in epoch micros

    eid = 0

    def add(ts_us, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, ts_us, user, etype, value, props))
        eid += 1

    # ~200 normal rows: 5 users, 3 types, randomish spacing
    types = ["signup", "purchase", "error"]
    for u in range(5):
        t = t0 + u * 37 * US
        for i in range(40):
            t += int(rng.randint(5, 4000)) * US + int(rng.randint(0, US))
            add(t, u, types[int(rng.randint(0, 3))], round(float(rng.uniform(-50, 500)), 2))

    # exact session-gap boundary: two events exactly 1800s apart,
    # and a pair 1800s + 1us apart
    add(t0, 100, "signup", 1.0)
    add(t0 + 1800 * US, 100, "purchase", 2.0)
    add(t0 + 10_000 * US, 101, "signup", 3.0)
    add(t0 + 10_000 * US + 1800 * US + 1, 101, "purchase", 4.0)

    # duplicate timestamps: same user, same ts, different event ids
    add(t0 + 50 * US, 102, "purchase", 10.0)
    add(t0 + 50 * US, 102, "error", 20.0)
    add(t0 + 50 * US, 102, "signup", 30.0)
    # identical full row content except event_id
    add(t0 + 60 * US, 102, "purchase", 10.0)
    add(t0 + 60 * US, 102, "purchase", 10.0)

    # NULL user_id (valid ts), NULL ts (valid user), both NULL
    add(t0 + 70 * US, None, "purchase", 5.5)
    add(t0 + 71 * US, None, "error", -1.0)
    add(None, 103, "signup", 7.0)
    add(None, None, None, None, None)

    # NULL / NaN / ±Inf / extreme values
    add(t0 + 80 * US, 104, "purchase", None)
    add(t0 + 81 * US, 104, "purchase", float("nan"))
    add(t0 + 82 * US, 104, "error", float("inf"))
    add(t0 + 83 * US, 104, "error", float("-inf"))
    add(t0 + 84 * US, 104, "purchase", 1e308)
    add(t0 + 85 * US, 104, "purchase", -1e308)
    add(t0 + 86 * US, 104, "purchase", 5e-324)
    add(t0 + 87 * US, 104, "purchase", -0.0)

    # timestamp extremes (inside pandas datetime64[ns] range)
    add(0, 105, "signup", 1.0)                       # epoch 0
    add(-315619200 * US, 105, "purchase", 2.0)       # 1960
    add(7258118400 * US, 105, "error", 3.0)          # 2200-01-01
    add(1 , 105, "purchase", 4.0)                    # epoch + 1us

    # event_type pathologies
    add(t0 + 90 * US, 106, None, 1.0)
    add(t0 + 91 * US, 106, "", 2.0)
    add(t0 + 92 * US, 106, "päivitys🚀", 3.0)
    add(t0 + 93 * US, 106, "x" * 500, 4.0)
    add(t0 + 94 * US, 106, "O'Reilly \"quoted\" \\type", 5.0)

    # props pathologies
    add(t0 + 95 * US, 107, "signup", 1.0, None)
    add(t0 + 96 * US, 107, "signup", 2.0, "")
    add(t0 + 97 * US, 107, "signup", 3.0, "{not json")
    add(t0 + 98 * US, 107, "signup", 4.0, '{"k": null}')
    add(t0 + 99 * US, 107, "signup", 5.0, '{"k": {"nested": [1,2]}}')
    add(t0 + 100 * US, 107, "signup", 6.0, '{"k": 3, "extra": "x\\"y"}')

    # shuffle file order so nothing can rely on write order
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(base, "events.parquet"))
    return base



def build_hostile_orders(base: str) -> str:
    """Adversarial orders + lineitem star-schema pair: NULL join keys /
    dates / measures, NaN/±Inf/1e308 money, negative and huge
    quantities, orphan and childless keys, epoch-extreme dates,
    pathological status/priority/flag strings, shuffled file order.
    Key UNIQUENESS is deliberately preserved: o_orderkey /
    (l_orderkey, l_linenumber) are the table contract (the
    profile_quality_checks op is the quarantine path for violations);
    everything else is fair game."""
    os.makedirs(base, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        if t in ("orders", "lineitem"):
            continue
        if not os.path.exists(dst):
            os.symlink(f"{SMOKE}/{t}.parquet", dst)

    rng = np.random.RandomState(13)
    US = 1_000_000
    day0 = 788918400 * US  # 1995-01-01 UTC epoch micros

    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    flags = ["A", "N", "R"]

    orders = []  # (okey, ckey, status, totalprice, odate_us, prio)
    lines = []   # (okey, pkey, skey, lno, qty, price, disc, tax, rf, ls, sdate_us)

    def odate(i):
        return day0 + int(i) * 86400 * US

    # ~120 normal orders with 1-4 lineitems each
    for ok in range(1000, 1120):
        d = odate(rng.randint(0, 900))
        orders.append(
            (ok, int(rng.randint(1, 30)), statuses[int(rng.randint(0, 3))],
             round(float(rng.uniform(100, 300000)), 2), d,
             prios[int(rng.randint(0, 5))])
        )
        for ln in range(1, int(rng.randint(2, 5))):
            lines.append(
                (ok, int(rng.randint(1, 50)), int(rng.randint(1, 20)), ln,
                 float(rng.randint(1, 50)),
                 round(float(rng.uniform(100, 90000)), 2),
                 round(float(rng.choice([0.0, 0.01, 0.05, 0.1])), 2),
                 round(float(rng.choice([0.0, 0.02, 0.08])), 2),
                 flags[int(rng.randint(0, 3))], "O",
                 d + int(rng.randint(1, 90)) * 86400 * US)
            )

    # hostile orders
    H = 2000
    orders += [
        (H + 0, None, "O", 500.0, odate(10), "1-URGENT"),      # NULL custkey
        (H + 1, 5, "O", 500.0, None, "2-HIGH"),                 # NULL orderdate
        (H + 2, 5, "O", None, odate(11), "3-MEDIUM"),           # NULL totalprice
        (H + 3, 5, "O", float("nan"), odate(12), "5-LOW"),      # NaN money
        (H + 4, 5, "O", float("inf"), odate(13), "5-LOW"),      # +Inf
        (H + 5, 5, "O", float("-inf"), odate(14), "5-LOW"),     # -Inf
        (H + 6, 5, "O", 1e308, odate(15), "5-LOW"),             # overflow money
        (H + 7, 5, "O", -1e308, odate(16), "5-LOW"),
        (H + 8, 5, "O", -0.0, odate(17), "5-LOW"),              # negative zero
        (H + 9, 5, "O", 5e-324, odate(18), "5-LOW"),            # denormal
        (H + 10, 5, None, 100.0, odate(19), "4-NOT SPECIFIED"), # NULL status
        (H + 11, 5, "", 100.0, odate(20), ""),                  # empty strings
        (H + 12, 5, "Ø🚀", 100.0, odate(21), "prio'\"\\x"),     # unicode/quotes
        (H + 13, 5, "O", 100.0, 0, "1-URGENT"),                 # epoch 0
        (H + 14, 5, "O", 100.0, -315619200 * US, "1-URGENT"),   # 1960
        (H + 15, 5, "O", 100.0, 7258118400 * US, "1-URGENT"),   # 2200
        (H + 16, 5, "O", 250.0, odate(22), "2-HIGH"),           # childless order
        (None, 5, "O", 100.0, odate(23), "1-URGENT"),           # NULL orderkey
    ]
    # hostile lineitems (children of H-block orders where sensible)
    sd = odate(30)
    lines += [
        (H + 0, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", sd),
        (H + 1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", None),   # NULL shipdate
        (H + 2, 1, 1, 1, None, 100.0, 0.05, 0.02, "N", "O", sd),    # NULL qty
        (H + 3, 1, 1, 1, float("nan"), float("nan"), 0.05, 0.02, "N", "O", sd),
        (H + 4, 1, 1, 1, 5.0, float("inf"), 0.05, 0.02, "N", "O", sd),
        (H + 5, 1, 1, 1, 5.0, float("-inf"), 0.05, 0.02, "N", "O", sd),
        (H + 6, 1, 1, 1, 5.0, 1e308, 0.05, 0.02, "N", "O", sd),
        (H + 7, 1, 1, 1, -4.0, -1e308, 0.05, 0.02, "R", "F", sd),   # negative qty
        (H + 8, 1, 1, 1, 1e12, 100.0, 0.05, 0.02, "N", "O", sd),    # huge qty
        (H + 9, 1, 1, 1, 5.0, 100.0, None, None, "N", "O", sd),     # NULL disc/tax
        (H + 10, None, None, 1, 5.0, 100.0, 0.05, 0.02, None, None, sd),  # NULL keys/flags
        (H + 11, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "", "", sd),
        (H + 12, 1, 1, 1, 5.0, 100.0, 1.0, 0.0, "Ŕ", "Ś", sd),      # 100% discount
        (H + 13, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", 0),     # epoch-0 ship
        (H + 14, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", -315619200 * US),
        (H + 15, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", 7258118400 * US),
        (9_999_999, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", sd), # orphan
        (None, 1, 1, 2, 5.0, 100.0, 0.05, 0.02, "N", "O", sd),      # NULL orderkey
    ]

    oorder = rng.permutation(len(orders))
    orders = [orders[i] for i in oorder]
    lorder = rng.permutation(len(lines))
    lines = [lines[i] for i in lorder]

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
                "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in orders], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in orders], pa.string()),
            }
        ),
        os.path.join(base, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in lines], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in lines], pa.int32()),
                "l_quantity": pa.array([r[4] for r in lines], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in lines], pa.float64()),
                "l_discount": pa.array([r[6] for r in lines], pa.float64()),
                "l_tax": pa.array([r[7] for r in lines], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in lines], pa.string()),
                "l_linestatus": pa.array([r[9] for r in lines], pa.string()),
                "l_shipdate": pa.array([r[10] for r in lines], pa.timestamp("us")),
            }
        ),
        os.path.join(base, "lineitem.parquet"),
    )
    return base

def build_hostile_dims(base: str) -> str:
    """Adversarial dimension tables joined to CLEAN facts: NULL keys and
    names, unicode case-folding traps (ß, Turkish İ/ı, combining
    diacritics), emoji/CJK, embedded newlines/tabs/quotes/backslashes
    (the CSV/JSON boundary killers), leading/trailing/interior spaces,
    500-char names, case-duplicate names, NaN/±Inf/NULL balances,
    negative and duplicate-free keys. Facts come from SMOKE so every
    dim-join chain exercises hostile dim rows against real keys."""
    os.makedirs(base, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        if t in ("customer", "supplier", "part", "nation", "region"):
            continue
        if not os.path.exists(dst):
            os.symlink(f"{SMOKE}/{t}.parquet", dst)

    rng = np.random.RandomState(17)
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    weird = [
        None, "", " ", "  padded  ", "straße", "STRASSE", "İstanbul",
        "ıstanbul", "Customer#000", "customer#000", "éclair",  # é decomposed
        "éclair", "名前🚀", "O'Reilly \"quoted\" \\ name", "line\nbreak",
        "tab\tsep", "x" * 500, "ꙮ",
    ]

    # customer: 40 normal (keys 1..40 — matching smoke fact custkeys) + hostile
    cust = [
        (k, f"Customer#{k:09d}", int(rng.randint(0, 25)),
         round(float(rng.uniform(-999, 9999)), 2), segs[int(rng.randint(0, 5))])
        for k in range(1, 41)
    ]
    hk = 500
    for i, w in enumerate(weird):
        cust.append((hk + i, w, int(rng.randint(0, 25)), 100.0, segs[i % 5]))
    cust += [
        (hk + 50, "NaN bal", 1, float("nan"), "BUILDING"),
        (hk + 51, "inf bal", 1, float("inf"), "BUILDING"),
        (hk + 52, "null bal", 1, None, "BUILDING"),
        (hk + 53, "null seg", 1, 1.0, None),
        (hk + 54, "null nation", None, 1.0, "BUILDING"),
        (None, "null key", 1, 1.0, "BUILDING"),
        (-7, "negative key", 1, 1.0, "BUILDING"),
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in cust], pa.int64()),
                "c_name": pa.array([r[1] for r in cust], pa.string()),
                "c_nationkey": pa.array([r[2] for r in cust], pa.int64()),
                "c_acctbal": pa.array([r[3] for r in cust], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in cust], pa.string()),
            }
        ),
        os.path.join(base, "customer.parquet"),
    )

    supp = [
        (k, f"Supplier#{k:09d}", int(rng.randint(0, 25)),
         round(float(rng.uniform(-999, 9999)), 2))
        for k in range(1, 21)
    ]
    supp += [
        (600, None, 1, 1.0),
        (601, "straße", None, float("nan")),
        (602, "Customer#000000001", 2, 1.0),  # name collides with customer
        (None, "null key supp", 3, 1.0),
    ]
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in supp], pa.int64()),
                "s_name": pa.array([r[1] for r in supp], pa.string()),
                "s_nationkey": pa.array([r[2] for r in supp], pa.int64()),
                "s_acctbal": pa.array([r[3] for r in supp], pa.float64()),
            }
        ),
        os.path.join(base, "supplier.parquet"),
    )

    types = ["PROMO", "STANDARD", "ECONOMY", None, "", "promo\nanodized"]
    parts = [
        (k, f"part {k} name", f"Brand#{k % 5}", types[k % len(types)],
         int(rng.randint(1, 50)), round(float(rng.uniform(900, 2000)), 2))
        for k in range(1, 51)
    ]
    parts += [
        (700, None, None, "PROMO", None, None),
        (701, "dup name part", "Brand#1", "PROMO", 1, float("inf")),
        (702, "dup name part", "Brand#1", "PROMO", 1, 1000.0),
        (None, "null key part", "Brand#2", "STANDARD", 2, 1000.0),
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_name": pa.array([r[1] for r in parts], pa.string()),
                "p_brand": pa.array([r[2] for r in parts], pa.string()),
                "p_type": pa.array([r[3] for r in parts], pa.string()),
                "p_size": pa.array([r[4] for r in parts], pa.int32()),
                "p_retailprice": pa.array([r[5] for r in parts], pa.float64()),
            }
        ),
        os.path.join(base, "part.parquet"),
    )

    nations = [
        (k, n, k % 5)
        for k, n in enumerate(
            ["NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4",
             "ülke", "ÜLKE", "nation\nwrapped", "nation,comma", 'nation"quote',
             "nation\\back", " nation pad ", ""]
        )
    ]
    nations += [(13, None, 2), (None, "null key nation", 3)]
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([r[0] for r in nations], pa.int64()),
                "n_name": pa.array([r[1] for r in nations], pa.string()),
                "n_regionkey": pa.array([r[2] for r in nations], pa.int64()),
            }
        ),
        os.path.join(base, "region_tmp.parquet") if False else os.path.join(base, "nation.parquet"),
    )

    regions = [(0, "REGION_0"), (1, "REGION_1"), (2, None), (3, "région🌍"), (4, ""), (None, "null key region")]
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([r[0] for r in regions], pa.int64()),
                "r_name": pa.array([r[1] for r in regions], pa.string()),
            }
        ),
        os.path.join(base, "region.parquet"),
    )
    return base
