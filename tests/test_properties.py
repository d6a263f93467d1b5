"""Property-based tests (hypothesis): batch-generated inputs pushed
through the engine expressions in ONE DataFrame per property, compared
against an independent Python/pandas model."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trino_demo_spark.functions import scalars
from trino_demo_spark.operators import windows as win

_dates = st.lists(
    st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 31)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(_dates)
def test_bday_snap_property(spark, dates):
    """business_day_snap == pandas to_period('B') start for any date."""
    sdf = spark.createDataFrame(pd.DataFrame({"d": dates}))
    got = [
        r.b for r in sdf.select(win.business_day_snap(F.col("d")).alias("b")).collect()
    ]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = [pd.Timestamp(d).to_period("B").start_time.date() for d in dates]
    assert got == exp


# ASCII digits only: hypothesis found that Python float() accepts Unicode
# digits (e.g. '٠', U+0660) while Spark try_cast nulls them — a genuine
# semantic difference, out of scope for the ASCII money strings the
# reference cleans (openshift...txt:29).
_money = st.lists(
    st.one_of(
        st.from_regex(r"\$?[0-9]{1,6}(\.[0-9]{1,2})?", fullmatch=True),
        st.just("junk"),
        st.just(""),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(_money)
def test_strip_money_property(spark, vals):
    """strip_money: '$' removed, numerics parsed, garbage → NULL — never an
    exception (try-cast semantics)."""
    sdf = spark.createDataFrame(pd.DataFrame({"m": vals}).astype("string"))
    got = [r.v for r in sdf.select(scalars.strip_money(F.col("m")).alias("v")).collect()]

    def model(x):
        x = x.replace("$", "")
        try:
            return float(x)
        except ValueError:
            return None

    assert got == [model(v) for v in vals]


_nullish = st.lists(
    st.one_of(
        st.none(),
        st.just("NaN"),
        st.just("nan"),
        st.just(""),
        st.floats(allow_nan=True, allow_infinity=False, width=32).map(
            lambda f: format(f, ".6g")
        ),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(_nullish)
def test_normalize_nullish_property(spark, vals):
    """All three NULL-ish representations collapse to the fill value; real
    numerics survive."""
    sdf = spark.createDataFrame(pd.DataFrame({"v": vals}).astype("string"))
    got = [
        r.n
        for r in sdf.select(
            scalars.normalize_nullish(F.col("v"), fill=0.0).alias("n")
        ).collect()
    ]
    import math

    def model(x):
        if x is None or x in ("NaN", "nan", ""):
            return 0.0
        f = float(x)
        return 0.0 if math.isnan(f) else f

    exp = [model(v) for v in vals]
    assert all(
        (a == b) or (abs(a - b) < 1e-6 * max(1.0, abs(b))) for a, b in zip(got, exp)
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
def test_merge_rollup_any_split_matches_full(spark, rows):
    """Property: for ANY (key, value, batch-tag) assignment, merging the
    per-batch rollups in tag order equals the full rollup — the
    additive-accumulator contract merge_rollup is built on."""
    from trino_demo_spark.operators import relational as rel

    pdf = pd.DataFrame(rows, columns=["k", "v", "b"])
    sdf = spark.createDataFrame(pdf)

    def rollup(df):
        return df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").cast("long").alias("s")
        )

    merged = None
    for tag in sorted(pdf.b.unique()):
        part = rollup(sdf.filter(F.col("b") == int(tag)))
        merged = part if merged is None else rel.merge_rollup(
            merged, part, ["k"], ["n", "s"]
        )
    full = rollup(sdf)
    got = {(r.k, r.n, r.s) for r in merged.collect()}
    want = {(r.k, r.n, r.s) for r in full.collect()}
    assert got == want


_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # order key (may collide)
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],  # unique order values, arbitrary gaps
)


@settings(max_examples=10, deadline=None)
@given(_series, st.integers(min_value=1, max_value=64))
def test_prefix_sum_property(spark, rows, bucket_width):
    """partitioned_prefix_sum == plain Python running sum for any
    gap-riddled order domain and any bucket width (incl. width 1 and a
    width larger than the whole domain)."""
    from trino_demo_spark.operators.windows import partitioned_prefix_sum

    df = spark.createDataFrame(
        [("k", o, v) for o, v in rows], "k string, ord long, v long"
    )
    got = {
        r["ord"]: r["__cum"]
        for r in partitioned_prefix_sum(
            df, "k", "ord", "v", bucket_width=bucket_width
        ).collect()
    }
    acc, want = 0, {}
    for o, v in sorted(rows):
        acc += v
        want[o] = acc
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    st.floats(min_value=0.05, max_value=0.95),
    st.integers(min_value=1, max_value=16),
)
def test_ewma_chunked_property(spark, vals, alpha, chunk_width):
    """ewma_chunked == pandas ewm(adjust=False) for any series, any
    alpha, any chunk width."""
    import pytest as _pytest

    from trino_demo_spark.operators.windows import ewma_chunked

    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "k string, i int, v double",
    )
    got = [
        r["ewma"]
        for r in ewma_chunked(
            df, "k", "i", "v", alpha=alpha, chunk_width=chunk_width
        )
        .orderBy("i")
        .collect()
    ]
    want = pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().tolist()
    assert got == _pytest.approx(want, rel=1e-9, abs=1e-9)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=30, unique=True),
    st.lists(st.integers(0, 400), min_size=1, max_size=12, unique=True),
    st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
)
def test_asof_nearest_property(spark, left, right, tolerance):
    """asof_join_nearest == pandas merge_asof(direction='nearest',
    tolerance) for arbitrary key sets, including empty-overlap and
    zero tolerance."""
    from trino_demo_spark.operators import relational as rel

    left, right = sorted(left), sorted(right)
    ldf = spark.createDataFrame([(t,) for t in left], "t long")
    rdf = spark.createDataFrame(
        [(t, f"v{t}") for t in right], "t long, v string"
    )
    got = {
        r.t: r.v
        for r in rel.asof_join_nearest(
            ldf, rdf, on="t", right_value_cols=["v"], tolerance=tolerance
        ).collect()
    }
    exp_df = pd.merge_asof(
        pd.DataFrame({"t": left}),
        pd.DataFrame({"t": right, "v": [f"v{t}" for t in right]}),
        on="t",
        direction="nearest",
        tolerance=tolerance,
    )
    exp = {
        int(r.t): (None if pd.isna(r.v) else r.v)
        for r in exp_df.itertuples(index=False)
    }
    assert got == exp


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=0,
        max_size=40,
    ),
    st.integers(25, 30),
)
def test_dedup_clusters_matches_union_find(spark, edges, n_nodes):
    """Large-star/small-star connected components must agree with a
    reference union-find on arbitrary random graphs (self-loops,
    duplicate and reversed edges included): same partition into
    components, cluster id = component minimum, exactly one canonical
    node per cluster."""
    from trino_demo_spark.llm.dedup import dedup_clusters

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for v in range(n_nodes):
        r = find(v)
        expected.setdefault(r, set()).add(v)
    exp_cluster = {v: min(m) for m in expected.values() for v in m}

    ids = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    rows = dedup_clusters(ids, pairs).collect()
    # exactly one output row per doc — assert BEFORE dict-ifying, which
    # would silently collapse duplicate rows
    assert len(rows) == n_nodes
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in rows}
    assert len(got) == n_nodes
    for v in range(n_nodes):
        assert got[v][0] == exp_cluster[v], (v, got[v], exp_cluster[v])
        assert got[v][1] == (v == exp_cluster[v])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=8),
            st.integers(1, 3),  # copies of this text
        ),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([0.2, 0.5]),
)
def test_ngram_jaccard_matches_python_reference(spark, texts, threshold):
    """The identical-set collapse must be output-invisible on arbitrary
    corpora (duplicate clusters included): (id_a, id_b, jaccard) matches
    a direct pure-Python all-pairs 3-gram Jaccard."""
    from trino_demo_spark.llm.dedup import ngram_jaccard_pairs

    rows, i = [], 0
    for tokens, copies in texts:
        for _ in range(copies):
            rows.append((i, " ".join(tokens)))
            i += 1

    def shingles(tokens):
        return {" ".join(tokens[j : j + 3]) for j in range(len(tokens) - 2)}

    sets = {rid: shingles(text.split()) for rid, text in rows if text}
    sets = {rid: s for rid, s in sets.items() if s}
    expected = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            jac = round(inter / len(sets[a] | sets[b]) + 1e-9, 4)
            if jac >= threshold:
                expected[(a, b)] = jac

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcde"), min_size=3, max_size=7),
            st.integers(1, 4),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 3),
)
def test_capped_jaccard_matches_python_model(spark, texts, df_max):
    """Capped-Jaccard semantics pin: df counted over DISTINCT shingle
    sets, identical-set pairs bypass the cap at Jaccard exactly 1.0,
    cross-set Jaccard computed on cap-filtered intersections but
    uncapped union sizes."""
    from trino_demo_spark.llm.dedup import ngram_jaccard_pairs_capped

    rows, i = [], 0
    for tokens, copies in texts:
        for _ in range(copies):
            rows.append((i, " ".join(tokens)))
            i += 1

    def shingles(text):
        t = text.split()
        return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

    sets = {rid: shingles(txt) for rid, txt in rows}
    sets = {rid: s for rid, s in sets.items() if s}
    # distinct-set groups
    by_set: dict[frozenset, list] = {}
    for rid, s in sets.items():
        by_set.setdefault(frozenset(s), []).append(rid)
    expected = {}
    for members in by_set.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                expected[(ms[x], ms[y])] = 1.0
    # df over distinct sets
    df_count: dict[str, int] = {}
    for gs in by_set:
        for g in gs:
            df_count[g] = df_count.get(g, 0) + 1
    cold = {g for g, c in df_count.items() if c <= df_max}
    reps = sorted(by_set.items(), key=lambda kv: min(kv[1]))
    for x in range(len(reps)):
        for y in range(x + 1, len(reps)):
            (sa, ma), (sb, mb) = reps[x], reps[y]
            inter = len((sa & sb) & cold)
            if not inter:
                continue
            jac = round(inter / (len(sa) + len(sb) - inter) + 1e-9, 4)
            if jac >= 0.2:
                for a in ma:
                    for b in mb:
                        expected[(min(a, b), max(a, b))] = jac

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_capped(
            df, threshold=0.2, df_max=df_max
        ).collect()
    }
    assert got == expected


_q_vals = st.lists(
    st.one_of(
        st.none(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.just(-0.0),
        st.just(5e-324),
        st.just(1e308),
    ),
    min_size=1,
    max_size=40,
)
_q_keys = st.lists(
    st.one_of(st.none(), st.integers(min_value=-10, max_value=10**12)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(_q_vals, _q_keys)
def test_quarantine_contract_property(spark, vals, keys):
    """quarantine() vs an independent Python model of the same rules:
    the split is lossless, the valid side satisfies every rule, and the
    reason string is exactly the sorted list of violated rules."""
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from trino_demo_spark.operators import quality as Q

    n = max(len(vals), len(keys))
    vals = (vals * n)[:n]
    keys = (keys * n)[:n]
    # row tuples, not a pandas frame: the pandas bridge coerces NaN
    # cells to SQL NULL, which is exactly the distinction under test
    sdf = spark.createDataFrame(list(zip(keys, vals)), "k long, v double")
    contract = [("k", Q.not_null()), ("v", Q.unit_band())]
    annotated = Q.contract_check(sdf, contract).collect()
    assert len(annotated) == n

    def model_reason(k, v):
        bad = []
        if k is None:
            bad.append("k:not_null")
        u = None if v is None else v * 100
        if v is None or math.isnan(u) or not (-(2.0**63) <= u < 2.0**63):
            bad.append("v:unit_band_100")
        return ",".join(sorted(bad)) or None

    got = sorted(
        (str(r["k"]), str(r["v"]), str(r["__quarantine_reason"]))
        for r in annotated
    )
    exp = sorted(
        (
            str(k),
            str(float(v)) if v is not None else "None",
            str(model_reason(k, v)),
        )
        for k, v in zip(keys, vals)
    )
    assert got == exp


def test_quarantine_vector_rule_null_component(spark):
    """ADVICE r4 regression: a vector with a NULL component must land on
    the QUARANTINE side of a vector(dim) gate. F.forall over a NULL
    element yields NULL (not false) under three-valued logic, and an
    unguarded F.when(~rule, flag) treats that as not-violated — the row
    silently reached the valid side and could NULL-poison any geometric
    op downstream. Both layers are pinned: the element predicate is
    NULL-safe AND contract_check coalesces a NULL rule verdict to
    violation."""
    from trino_demo_spark.operators import quality as Q

    sdf = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [1.0, None]),
            (3, None),
            (4, [1.0]),
            (5, [1.0, float("nan")]),
        ],
        "id long, vec array<double>",
    )
    valid, rejected = Q.quarantine(sdf, [("vec", Q.vector(2))])
    assert {r.id for r in valid.collect()} == {1}
    got = {r.id: r["__quarantine_reason"] for r in rejected.collect()}
    assert got == {
        2: "vec:vector_2",
        3: "vec:vector_2",
        4: "vec:vector_2",
        5: "vec:vector_2",
    }

    # defense-in-depth layer alone: a custom rule returning NULL must
    # still count as a violation
    from pyspark.sql import functions as F  # noqa: F811

    annotated = Q.contract_check(
        sdf, [("vec", ("nullish", lambda c: F.lit(None).cast("boolean")))]
    )
    assert annotated.filter(F.col("__quarantine_reason").isNull()).count() == 0


_topk_facts = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 12)),  # custkey: NULL/dangling
        st.integers(-1000, 1000),                  # integer revenue units
    ),
    max_size=30,
)
_topk_customers = st.dictionaries(
    st.integers(0, 10),                            # c_custkey (unique: PK)
    st.one_of(st.none(), st.integers(0, 8)),       # c_nationkey: NULL/dangling
    max_size=10,
)
_topk_nations = st.sets(st.integers(0, 5), max_size=4)


@settings(max_examples=10, deadline=None)
@given(_topk_facts, _topk_customers, _topk_nations, st.integers(1, 5))
def test_topk_before_dim_join_matches_join_first_model(
    spark, facts, customers, nations, k
):
    """The q10/q18 restructure's correctness claim, as a property: for
    ANY dirty input — NULL/dangling fact keys, NULL/dangling dim FKs —
    aggregate-by-key + FULL FK guard (key IN customer AND nationkey IN
    nation, both keys-only semi joins) + rank + top-k + dim join equals
    the semantically obvious join-dims-first-then-rank order (what the
    driver oracle does). This generalizes the hostile-dims gate that
    caught the missing nation probe (ADVICE r5): with the guard on only
    one FK, hypothesis finds a counterexample immediately. Assumes dim
    PK uniqueness (dict/set strategies), like TPC-H and the oracle."""
    fdf = spark.createDataFrame(
        pd.DataFrame(facts, columns=["custkey", "rev"]).astype(
            {"custkey": "Int64", "rev": "int64"}
        ),
        "custkey BIGINT, rev BIGINT",
    )
    cust_pdf = pd.DataFrame(
        list(customers.items()), columns=["c_custkey", "c_nationkey"]
    ).astype({"c_custkey": "Int64", "c_nationkey": "Int64"})
    cdf = spark.createDataFrame(cust_pdf, "c_custkey BIGINT, c_nationkey BIGINT")
    # separate frame for the guard, like parity.tpch_q10 loads customer
    # twice — reusing cdf would make the final join an ambiguous self-join
    cguard = spark.createDataFrame(
        cust_pdf, "c_custkey BIGINT, c_nationkey BIGINT"
    )
    ndf = spark.createDataFrame(
        pd.DataFrame({"n_nationkey": sorted(nations)}).astype("Int64"),
        "n_nationkey BIGINT",
    )

    # engine shape (parity.tpch_q10's skeleton): agg FIRST, guard, rank
    per = fdf.groupBy("custkey").agg(F.sum("rev").alias("revenue"))
    ckeys = cguard.join(
        F.broadcast(ndf),
        cguard["c_nationkey"] == ndf["n_nationkey"],
        "left_semi",
    ).select(F.col("c_custkey").alias("ck"))
    top = (
        per.join(ckeys, per["custkey"] == F.col("ck"), "left_semi")
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(k)
    )
    got = sorted(
        map(
            tuple,
            F.broadcast(top)
            .join(cdf, top["custkey"] == cdf["c_custkey"])
            .join(
                F.broadcast(ndf), cdf["c_nationkey"] == ndf["n_nationkey"]
            )
            .select("custkey", "revenue", "n_nationkey")
            .collect(),
        )
    )

    # independent model: join dims FIRST, then aggregate, rank, top-k
    kept = [
        (ck, rev)
        for ck, rev in facts
        if ck is not None
        and ck in customers
        and customers[ck] is not None
        and customers[ck] in nations
    ]
    agg: dict[int, int] = {}
    for ck, rev in kept:
        agg[ck] = agg.get(ck, 0) + rev
    ranked = sorted(agg.items(), key=lambda t: (-t[1], t[0]))[:k]
    exp = sorted((ck, rev, customers[ck]) for ck, rev in ranked)

    assert got == exp, (facts, customers, nations, k)


# --- container-kernel roundtrip properties (r9: webm/ogg) -----------------

_frames = st.lists(
    st.binary(min_size=0, max_size=700), min_size=1, max_size=9
)


@settings(max_examples=40, deadline=None)
@given(
    frames=_frames,
    gaps=st.lists(st.integers(min_value=0, max_value=500), min_size=9, max_size=9),
    cluster_every=st.integers(min_value=1, max_value=4),
    lace_from=st.integers(min_value=0, max_value=3),
)
def test_webm_roundtrip_property(frames, gaps, cluster_every, lace_from):
    """ANY frame sizes (including empty and 255-boundary), pts spacings,
    cluster groupings, and lacing splits must slice back byte-identical
    through the EBML walk, with the documented lacing-pts rule."""
    from trino_demo_spark.llm import webm

    pts = []
    t = 0
    for g in gaps[: len(frames)]:
        pts.append(t)
        t += g
    enc = webm.encode_webm_frames(
        frames, pts, cluster_every=cluster_every, lace_from=lace_from
    )
    d = webm.webm_demux(enc)
    assert [s["data"] for s in d["samples"]] == frames
    # pts rule: within each cluster, frames [lace_from+1:] share the
    # first laced frame's pts (single-frame "laces" are written solo)
    expect = []
    for c0 in range(0, len(frames), cluster_every):
        group = list(range(c0, min(c0 + cluster_every, len(frames))))
        solo, laced = group[:lace_from], group[lace_from:]
        expect.extend(pts[j] for j in solo)
        if len(laced) == 1:
            expect.append(pts[laced[0]])
        elif laced:
            expect.extend(pts[laced[0]] for _ in laced)
    assert [s["pts"] for s in d["samples"]] == expect


@settings(max_examples=40, deadline=None)
@given(
    pkts=st.lists(st.binary(min_size=0, max_size=900), min_size=1, max_size=8),
    max_seg=st.integers(min_value=1, max_value=8),
    channels=st.integers(min_value=1, max_value=8),
)
def test_ogg_roundtrip_property(pkts, max_seg, channels):
    """ANY packet sizes (empty, 255-multiples, page-spanning) under ANY
    page cap must reassemble byte-identical with every page CRC valid
    and granules monotone over completed audio packets."""
    from trino_demo_spark.llm import ogg

    grans = [960 * (j + 1) for j in range(len(pkts))]
    enc = ogg.encode_ogg_opus(
        pkts, grans, channels=channels, max_segments_per_page=max_seg
    )
    d = ogg.ogg_demux(enc)
    assert d["channels"] == channels
    audio = d["packets"][2:]
    assert [p["data"] for p in audio] == pkts
    # every audio packet's completion granule is one of the declared
    # granules and non-decreasing in packet order
    gs = [p["granule"] for p in audio]
    assert all(g in grans for g in gs)
    assert gs == sorted(gs)
