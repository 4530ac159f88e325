"""Property-based checks for the round-4 operators: randomized inputs
against brute-force reference implementations (the asof/funnel test
strategy applied to the new surface)."""

import pytest

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_wrow = st.tuples(
    st.integers(min_value=0, max_value=2),    # group
    st.integers(min_value=-50, max_value=50), # value
    st.integers(min_value=0, max_value=9),    # weight (0 → excluded)
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_wrow, min_size=1, max_size=30))
def test_weighted_quantiles_match_bruteforce(spark, rows):
    from db_factfinder_spark.operators.median import (
        grouped_weighted_quantiles,
    )

    df = spark.createDataFrame(rows, "g int, v int, w int")
    probs = [0.25, 0.5, 0.75]
    got = {
        r["g"]: r
        for r in grouped_weighted_quantiles(
            df, ["g"], "v", "w", probs
        ).collect()
    }
    # brute force: smallest v whose cumulative weight reaches
    # ceil-compare round(p·D)·W ≤ cum·D with D = 1e6
    by_g = {}
    for g, v, w in rows:
        if w > 0:
            by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        W = sum(w for _, w in vw)
        assert got[g]["w_total"] == W
        for p in probs:
            num = round(p * 1_000_000)
            cum = 0
            want = None
            for v, w in sorted(vw):
                cum += w
                if cum * 1_000_000 >= num * W:
                    want = v
                    break
            col = f"q{int(round(p * 100))}"
            assert got[g][col] == want, (g, p, got[g][col], want)
    assert set(got) == set(by_g)


_krow = st.integers(min_value=0, max_value=15)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(_krow, min_size=1, max_size=60))
def test_countmin_upper_bounds_every_key(spark, keys):
    from db_factfinder_spark.llmdata.sketches import (
        countmin_estimate,
        countmin_partials,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k int")
    sketch = countmin_partials(df, "k", depth=3, width=4)
    probe = df.distinct()
    est = {
        r["k"]: r["cm_est"]
        for r in countmin_estimate(probe, sketch, "k", depth=3, width=4)
        .collect()
    }
    from collections import Counter

    truth = Counter(keys)
    total = len(keys)
    for k, n in truth.items():
        assert n <= est[k] <= total, (k, n, est[k])


_doc = st.lists(
    st.integers(min_value=0, max_value=7), min_size=0, max_size=12
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=2, max_size=6))
def test_containment_matches_bruteforce(spark, docs):
    from db_factfinder_spark.llmdata.dedup import containment_pairs

    texts = [" ".join(f"w{t}" for t in d) for d in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, n=2, threshold=0.5).collect()
    }

    def shingles(d):
        return {tuple(d[i : i + 2]) for i in range(len(d) - 1)}

    want = {}
    for i, a in enumerate(docs):
        sa = shingles(a)
        if not sa:
            continue
        for j, b in enumerate(docs):
            if i == j:
                continue
            sb = shingles(b)
            c = len(sa & sb) / len(sa)
            if c >= 0.5:
                want[(i, j)] = c
    assert set(got) == set(want), (got, want)
    for k in want:
        assert got[k] == pytest.approx(want[k])
