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
