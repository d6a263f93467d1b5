"""Shared hostile-events corpus: adversarial `events` parquet used by
both the CI differential gate (tests/test_hostile_events.py) and the
full out-of-band sweep (scripts/hostile_events_sweep.py).

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


