"""Independent SEMANTIC checks for the r11 statistics wave: the gate
proves Spark == DuckDB; these prove the shared algorithm == the
textbook definition, by running each query's actual ORACLE SQL over
tiny synthetic tables (views named like the fixtures) and comparing
against brute-force reference computations."""

import duckdb
import numpy as np
import pytest


def _con_with(table: str, df):
    con = duckdb.connect()
    con.register("_src", df)
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM _src")
    return con


def _tie_ranks(v):
    """Tie-averaged ranks, brute force."""
    v = np.asarray(v, dtype=float)
    out = np.empty(len(v))
    for i, x in enumerate(v):
        less = (v < x).sum()
        eq = (v == x).sum()
        out[i] = less + (eq + 1) / 2.0
    return out


def test_kendall_oracle_matches_bruteforce_pairs():
    import pandas as pd

    from etlalchemy_spark.queries.aggregates import _KENDALL_SQL

    rng = np.random.default_rng(1)
    n = 300
    x = rng.integers(1, 8, n)          # coarse, heavy ties
    y = (x + rng.integers(0, 5, n)) % 7
    df = pd.DataFrame({"l_quantity": x.astype(float), "l_discount": y / 100.0})
    got = _con_with("lineitem", df).execute(_KENDALL_SQL).fetchdf().iloc[0]

    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            conc += s > 0
            disc += s < 0
    tx = sum(c * (c - 1) for c in np.bincount(x))
    ty = sum(c * (c - 1) for c in np.bincount(y))
    n0x2 = n * (n - 1)
    expect = (conc - disc) / np.sqrt(((n0x2 - tx) / 2.0) * ((n0x2 - ty) / 2.0))
    assert got["concordant"] == conc and got["discordant"] == disc
    assert abs(got["tau_b"] - expect) < 1e-12


def test_kruskal_oracle_matches_rank_definition():
    import pandas as pd

    from etlalchemy_spark.queries.aggregates import _KW_SQL

    rng = np.random.default_rng(2)
    n = 400
    grp = rng.integers(0, 4, n)
    v = rng.integers(100, 140, n) + grp  # shifted groups, many ties
    df = pd.DataFrame(
        {"o_orderpriority": [f"G{g}" for g in grp],
         "o_totalprice": v.astype(float)}
    )
    got = _con_with("orders", df).execute(_KW_SQL).fetchdf().iloc[0]

    ranks = _tie_ranks(v)
    h = 12.0 / (n * (n + 1)) * sum(
        ranks[grp == g].sum() ** 2 / (grp == g).sum() for g in range(4)
    ) - 3 * (n + 1)
    _, t_counts = np.unique(v, return_counts=True)
    h_c = h / (1 - (t_counts**3 - t_counts).sum() / (n**3 - n))
    assert got["k_groups"] == 4 and got["n_total"] == n
    assert abs(got["h_stat"] - h_c) < 1e-9


def test_brown_forsythe_oracle_matches_definition():
    import pandas as pd

    from etlalchemy_spark.queries.aggregates import _BF_SQL

    rng = np.random.default_rng(3)
    n = 300
    grp = rng.integers(0, 3, n)
    v = np.round(rng.normal(100, 5 + 5 * grp, n), 2)  # unequal spread
    df = pd.DataFrame(
        {"o_orderpriority": [f"G{g}" for g in grp],
         "o_totalprice": v}
    )
    got = _con_with("orders", df).execute(_BF_SQL).fetchdf().iloc[0]

    cents = np.round(v * 100).astype(np.int64)
    z = np.empty(n)
    for g in range(3):
        m = cents[grp == g]
        med = np.sort(m)[(len(m) + 1) // 2 - 1]  # LOWER median, as documented
        z[grp == g] = np.abs(m - med)
    k = 3
    zbar = z.mean()
    num = sum((grp == g).sum() * (z[grp == g].mean() - zbar) ** 2 for g in range(3))
    den = sum(((z[grp == g] - z[grp == g].mean()) ** 2).sum() for g in range(3))
    w = (num / (k - 1)) / (den / (n - k))
    assert abs(got["w_stat"] - w) / w < 1e-9
    assert 0.0 <= got["p_value"] <= 1.0 and got["p_value"] < 0.05


def test_theil_sen_oracle_matches_pair_median():
    import pandas as pd

    from etlalchemy_spark.queries.aggregates import _THEILSEN_SQL

    rng = np.random.default_rng(4)
    rows = []
    # one priority class, 30 weeks, 3 orders per week
    for w in range(30):
        for _ in range(3):
            rows.append(
                {
                    "o_orderpriority": "G0",
                    "o_orderdate": np.datetime64("1992-01-01")
                    + np.timedelta64(int(w * 7 + rng.integers(0, 7)), "D"),
                    "o_totalprice": float(100 + 3 * w + rng.integers(-10, 10)),
                }
            )
    df = pd.DataFrame(rows)
    got = _con_with("orders", df).execute(_THEILSEN_SQL).fetchdf().iloc[0]

    wk = {}
    for r in rows:
        w = (r["o_orderdate"] - np.datetime64("1992-01-01")).astype(int) // 7
        wk[w] = wk.get(w, 0.0) + r["o_totalprice"]
    ks = sorted(wk)
    slopes = sorted(
        (wk[b] - wk[a]) / (b - a) for i, a in enumerate(ks) for b in ks[i + 1:]
    )
    m = len(slopes)
    expect = slopes[(m + 1) // 2 - 1]  # lower median, as documented
    assert got["n_pairs"] == m
    assert abs(got["sen_slope"] - expect) < 1e-12


def test_average_precision_oracle_matches_group_convention():
    import pandas as pd

    from etlalchemy_spark.queries.aggregates import _AP_SQL

    rng = np.random.default_rng(5)
    n = 500
    score = rng.integers(10, 60, n)
    pos = (rng.random(n) < (score / 80.0)).astype(int)  # score-correlated
    df = pd.DataFrame(
        {
            "o_totalprice": score.astype(float),
            "o_orderpriority": np.where(pos == 1, "1-URGENT", "3-MEDIUM"),
        }
    )
    got = _con_with("orders", df).execute(_AP_SQL).fetchdf().iloc[0]

    vals = sorted(set(score), reverse=True)
    nb = pb = 0
    num = 0.0
    for v in vals:
        m = score == v
        p, t_ = int(pos[m].sum()), int(m.sum())
        prec = (pb + p) / (nb + t_)
        num += p * np.floor(prec * 1e12) / 1e12
        pb += p
        nb += t_
    expect = num / pos.sum()
    assert got["n_pos"] == pos.sum()
    assert abs(got["avg_precision"] - expect) < 1e-9


def test_holt_winters_kernel_is_exact_impulse_response():
    """The 72-tap kernel must reproduce the DIRECT triple-smoothing
    recursion exactly (LTI identity): forecast at t == sum of
    kernel[i] * y[t-i] for any series, checked in exact rationals
    before the 1e-6 quantization."""
    from fractions import Fraction as Fr
    import random

    import sys
    sys.path.insert(0, "/root/repo")
    from etlalchemy_spark.queries.events import _hw_kernel, _HW_PERIOD

    # re-derive the kernel UNQUANTIZED alongside a direct recursion
    a, b_, g, m = Fr(3, 10), Fr(1, 10), Fr(1, 5), _HW_PERIOD
    random.seed(12)
    ys = [random.randint(0, 50) for _ in range(150)]
    l = Fr(0); b = Fr(0); s = {}
    direct = []
    for t_, y in enumerate(ys):
        l_prev, b_prev = l, b
        l = a * (y - s.get(t_ - m, Fr(0))) + (1 - a) * (l_prev + b_prev)
        b = b_ * (l - l_prev) + (1 - b_) * b_prev
        s[t_] = g * (y - l_prev - b_prev) + (1 - g) * s.get(t_ - m, Fr(0))
        direct.append(l + b + s.get(t_ + 1 - m, Fr(0)))
    # impulse-response kernel at full depth (t+1 taps) == direct
    lI = Fr(0); bI = Fr(0); sI = {}
    ker = []
    for t_ in range(150):
        y = Fr(1) if t_ == 0 else Fr(0)
        l_prev, b_prev = lI, bI
        lI = a * (y - sI.get(t_ - m, Fr(0))) + (1 - a) * (l_prev + b_prev)
        bI = b_ * (lI - l_prev) + (1 - b_) * bI
        sI[t_] = g * (y - l_prev - b_prev) + (1 - g) * sI.get(t_ - m, Fr(0))
        ker.append(lI + bI + sI.get(t_ + 1 - m, Fr(0)))
    for t_ in (40, 99, 149):
        assert sum(ker[i] * ys[t_ - i] for i in range(t_ + 1)) == direct[t_]
    # and the shipped quantized kernel is that response at 1e-6
    kq, K = _hw_kernel()
    assert kq == [int(k * 1_000_000) for k in ker[:72]]
    assert K == sum(kq)


def test_holt_winters_constant_series_forecasts_itself():
    """Renormalizing by the truncated kernel mass (the Brown
    convention) must make a constant series forecast EXACTLY itself:
    hw_mae == 0 on a one-event-per-hour synthetic table."""
    import pandas as pd

    import sys
    sys.path.insert(0, "/root/repo")
    from etlalchemy_spark.queries.events import _hw_sql

    hours = pd.date_range("2024-01-01", periods=200, freq="h")
    df = pd.DataFrame({"ts": hours})
    con = _con_with("events", df)
    out = con.execute(_hw_sql()).df().iloc[0]
    assert out["n_eval"] == 200 - 72
    assert out["hw_mae"] == 0.0
    assert out["last_forecast"] == 1.0


def test_holt_winters_tracks_seasonal_pattern():
    """On a pure 24-periodic series the seasonal-naive baseline is
    perfect (snaive_mae == 0) while HW carries startup bias; on a
    NOISY seasonal+trend series HW must beat seasonal-naive (the
    mae_ratio < 1 property the fixture gate also shows)."""
    import numpy as np
    import pandas as pd

    import sys
    sys.path.insert(0, "/root/repo")
    from etlalchemy_spark.queries.events import _hw_sql

    # pure period-24 pattern: n(t) = 1 + 2*(t % 24 == 0)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for t_ in range(240):
        n = 1 + 2 * (t_ % 24 == 0)
        rows += [base + pd.Timedelta(hours=t_)] * n
    con = _con_with("events", pd.DataFrame({"ts": rows}))
    out = con.execute(_hw_sql()).df().iloc[0]
    assert out["snaive_mae"] == 0.0
    assert out["hw_mae"] < 0.2  # converged after 3 warmup cycles


def test_ndcg_oracle_matches_bruteforce():
    """agg_ndcg_mrr's oracle on a tiny synthetic orders table must
    match a from-scratch nDCG@10 / MRR@10 computed with float math —
    the integer-quantized discounts may only differ below 1e-9."""
    import math

    import pandas as pd

    import sys
    sys.path.insert(0, "/root/repo")
    from etlalchemy_spark.queries.aggregates import _ndcg_sql

    rows = []
    okey = 0
    # 6 query buckets x 30 orders with a deterministic mix of grades
    for q in range(6):
        for i in range(30):
            okey += 1
            rows.append(
                {
                    "o_orderkey": okey,
                    "o_custkey": q,  # qid = custkey % 50 = q
                    "o_totalprice": float(100 + ((okey * 37) % 83)),
                    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"][
                        (okey * 7) % 3
                    ],
                }
            )
    df = pd.DataFrame(rows)
    con = _con_with("orders", df)
    got = con.execute(_ndcg_sql()).df().iloc[0]

    # brute force
    gains = {"1-URGENT": 3, "2-HIGH": 1, "3-MEDIUM": 0}
    ndcgs, rrs = [], []
    for q in range(6):
        g = df[df.o_custkey == q].copy()
        g["gain"] = g.o_orderpriority.map(gains)
        ranked = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        top = list(ranked.gain)[:10]
        ideal = sorted(g.gain, reverse=True)[:10]
        dcg = sum(x / math.log2(i + 2) for i, x in enumerate(top))
        idcg = sum(x / math.log2(i + 2) for i, x in enumerate(ideal))
        if idcg > 0:
            ndcgs.append(dcg / idcg)
        first = next((i + 1 for i, x in enumerate(top) if x > 0), None)
        rrs.append(1.0 / first if first else 0.0)
    assert got["n_queries"] == 6
    assert abs(got["mean_ndcg"] - sum(ndcgs) / len(ndcgs)) < 1e-9
    assert abs(got["mrr"] - sum(rrs) / len(rrs)) < 1e-9


def test_closeness_oracle_matches_bfs():
    """graph_closeness_landmarks' oracle on a hand-built co-purchase
    graph must equal a from-scratch BFS: orders are baskets, parts
    co-occurring in a basket are adjacent."""
    import pandas as pd

    import sys
    sys.path.insert(0, "/root/repo")
    from etlalchemy_spark.queries.graph import _CLOSENESS_SQL

    # baskets: {1,2,3}, {3,4}, {4,5}, {6,7} -> path 1-2-3-4-5 + clique{1,2,3} + edge 6-7
    baskets = [(1, [1, 2, 3]), (2, [3, 4]), (3, [4, 5]), (4, [6, 7])]
    rows = [
        {"l_orderkey": ok, "l_partkey": pk} for ok, parts in baskets for pk in parts
    ]
    con = _con_with("lineitem", pd.DataFrame(rows))
    got = con.execute(_CLOSENESS_SQL).df().set_index("landmark")

    # adjacency + BFS truncated at 3 hops
    import collections

    adj = collections.defaultdict(set)
    for _, parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    for lm in (1, 2, 3, 4):  # 4 smallest nodes
        dist = {lm: 0}
        frontier = [lm]
        for h in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        reached = {n: d for n, d in dist.items() if d > 0}
        row = got.loc[lm]
        assert row["n_reached"] == len(reached)
        assert row["sum_dist"] == sum(reached.values())
        assert abs(row["harmonic"] - sum(
            [1000000000000, 500000000000, 333333333333][d - 1] / 1e12
            for d in reached.values()
        )) < 1e-12
