"""Independent ground-truth battery for the statistical operators.

The oracle battery proves Spark ≡ DuckDB on the SAME spelling — it cannot
catch a TWIN bug, where both engine spellings share one mistake and
hash-match each other while both diverge from the statistic the key
claims to compute. This layer closes that hole: every check here
recomputes the statistic from its TEXTBOOK formula in pandas/numpy,
straight off the parquet fixture, sharing no code and no SQL with either
engine spelling, and compares numerically (tolerances just above the
operators' round(6) emission granularity).

Where an operator documents a parameter choice (discrete quartile
selection, add-one PSI smoothing, the 1-hour edge window), the ground
truth implements that choice FROM THE DOCSTRING's formula — it never
reads the operator's plan. A disagreement here is either a real twin
defect or an undocumented semantic choice; both must be fixed, not
tolerated.

Complements tests/test_graph.py (PageRank vs numpy power iteration) and
tests/test_sketches.py (sketch-accuracy bounds) — this file covers the
round-8 statistics families that previously had oracle parity only.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
import pytest

from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SF_DIR = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000

load_all()


@pytest.fixture(scope="module")
def spark():
    return tune_session(get_spark("naqed-groundtruth-tests"))


def run(spark, key: str) -> pd.DataFrame:
    return QUERIES[key](spark, SF_DIR).toPandas()


def _tbl(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def cents(v) -> np.ndarray:
    """Round-half-up 2-decimal fixed point (the DECIMAL(12,2) cast both
    engines apply); fixture values are 2-dec exact so this is a no-op
    guard, not a semantic choice."""
    return np.floor(np.asarray(v, dtype=np.float64) * 100 + 0.5).astype(np.int64)


def _norm(v):
    """None-ify the NaN/None spellings a nullable column can surface as."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def close(a, b, tol=1e-6) -> bool:
    a, b = _norm(a), _norm(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (bool, np.bool_)) or isinstance(b, (bool, np.bool_)):
        return bool(a) == bool(b)
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    return abs(float(a) - float(b)) <= tol + tol * abs(float(b))


def assert_keyed(got: pd.DataFrame, want: dict, keycols, statcols, tol=1e-6):
    """Compare a keyed result frame against {key_tuple: {stat: value}}."""
    gk = {
        tuple(r[k] for k in keycols): {c: r[c] for c in statcols}
        for _, r in got.iterrows()
    }
    assert set(gk) == set(want), (
        f"key sets differ: extra={set(gk) - set(want)} "
        f"missing={set(want) - set(gk)}"
    )
    for k, stats in want.items():
        for c, v in stats.items():
            assert close(gk[k][c], v, tol), (
                f"{k} {c}: got {gk[k][c]!r} want {v!r}"
            )


# ---------------------------------------------------------------- events


def test_welch_ttest_matches_textbook(spark):
    ev = _tbl("events")
    a = ev.loc[ev.event_type == "click", "value"].to_numpy()
    b = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
    va = a.var(ddof=1) / len(a)
    vb = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    got = run(spark, "agg_welch_ttest").iloc[0]
    assert int(got.n_a) == len(a) and int(got.n_b) == len(b)
    assert close(got.t_stat, t, 1e-5)
    assert close(got.welch_dof, dof, 1e-5)


def test_chi_square_matches_textbook(spark):
    ev = _tbl("events")
    dow = ev.ts.dt.dayofweek + 1  # ISO: Monday=1
    ct = pd.crosstab(ev.event_type, dow)
    obs = ct.to_numpy(dtype=np.float64)
    total = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / total
    chi2 = ((obs - exp) ** 2 / exp)[obs + exp > 0].sum()
    got = run(spark, "agg_chi_square").iloc[0]
    assert int(got.n_rows) == ct.shape[0] and int(got.n_cols) == ct.shape[1]
    assert int(got.dof) == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert close(got.chi2, chi2, 1e-5)


def test_higher_moments_match_centered_formulas(spark):
    ev = _tbl("events")
    want = {}
    for et, grp in ev.groupby("event_type"):
        c = cents(grp.value).astype(np.float64)
        mu = c.mean()
        m2 = ((c - mu) ** 2).mean()
        m3 = ((c - mu) ** 3).mean()
        m4 = ((c - mu) ** 4).mean()
        want[(et,)] = {
            "n": len(c),
            "skew_g1": m3 / m2**1.5,
            "kurt_g2": m4 / m2**2 - 3.0,
        }
    got = run(spark, "agg_higher_moments")
    assert_keyed(got, want, ["event_type"], ["n", "skew_g1", "kurt_g2"], 5e-5)


def test_ks_statistic_matches_textbook(spark):
    ev = _tbl("events")
    a = np.sort(ev.loc[ev.event_type == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev.event_type == "purchase", "value"].to_numpy())
    support = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, support, side="right") / len(a)
    f2 = np.searchsorted(b, support, side="right") / len(b)
    d = np.abs(f1 - f2).max()
    got = run(spark, "agg_ks_statistic").iloc[0]
    assert int(got.n_a) == len(a) and int(got.n_b) == len(b)
    assert close(got.ks_d, d)


def test_psi_drift_matches_textbook(spark):
    ev = _tbl("events")
    split = np.datetime64("2024-01-16T00:00:00")
    want = {}
    for et, grp in ev.groupby("event_type"):
        bucket = np.minimum(np.floor(grp.value.to_numpy() / 40.0), 9).astype(int)
        win_a = (grp.ts.to_numpy() < split)
        cells = {}
        for bkt, ina in zip(bucket, win_a):
            ca, cb = cells.get(bkt, (0, 0))
            cells[bkt] = (ca + (1 if ina else 0), cb + (0 if ina else 1))
        ca = np.array([1 + v[0] for v in cells.values()], dtype=np.float64)
        cb = np.array([1 + v[1] for v in cells.values()], dtype=np.float64)
        pa, pb = ca / ca.sum(), cb / cb.sum()
        want[(et,)] = {"psi": ((pa - pb) * np.log(pa / pb)).sum()}
    assert_keyed(run(spark, "ts_psi_drift"), want, ["event_type"], ["psi"])


def test_mann_kendall_matches_textbook(spark):
    ev = _tbl("events")
    daily = (
        pd.DataFrame(
            {
                "event_type": ev.event_type,
                "day": ev.ts.dt.normalize(),
                "c": cents(ev.value),
            }
        )
        .groupby(["event_type", "day"], as_index=False)["c"]
        .sum()
    )
    want = {}
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        x = g.c.to_numpy()
        s = sum(
            int(np.sign(x[j] - x[i]))
            for i in range(len(x))
            for j in range(i + 1, len(x))
        )
        npairs = len(x) * (len(x) - 1) // 2
        want[(et,)] = {
            "s_stat": s,
            "n_pairs": npairs,
            "tau": s / npairs,
        }
    assert_keyed(
        run(spark, "ts_mann_kendall"),
        want,
        ["event_type"],
        ["s_stat", "n_pairs", "tau"],
    )


def test_autocorrelation_matches_textbook(spark):
    ev = _tbl("events")
    daily = (
        pd.DataFrame(
            {
                "event_type": ev.event_type,
                "day": ev.ts.dt.normalize(),
                "c": cents(ev.value),
            }
        )
        .groupby(["event_type", "day"], as_index=False)["c"]
        .sum()
    )
    want = {}
    for et, grp in daily.groupby("event_type"):
        series = dict(zip(grp.day, grp.c))
        for lag in (1, 7):
            xs, ys = [], []
            for day, c in series.items():
                prev = series.get(day - pd.Timedelta(days=lag))
                if prev is not None:
                    xs.append(float(c))
                    ys.append(float(prev))
            if not xs:
                continue
            x, y = np.array(xs), np.array(ys)
            n = len(x)
            num = n * (x * y).sum() - x.sum() * y.sum()
            den = math.sqrt(
                (n * (x * x).sum() - x.sum() ** 2)
                * (n * (y * y).sum() - y.sum() ** 2)
            )
            want[(et, lag)] = {"n": n, "acf": num / den}
    assert_keyed(
        run(spark, "ts_autocorrelation"),
        want,
        ["event_type", "lag"],
        ["n", "acf"],
        1e-5,
    )


def test_time_weighted_avg_matches_textbook(spark):
    ev = _tbl("events")
    epoch = ev.ts.astype("int64")  # µs since epoch (fixture is µs-unit)
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "t": epoch,
            "event_id": ev.event_id,
            "v": cents(ev.value) / 100.0,
        }
    ).sort_values(["user_id", "t", "event_id"])
    want = {}
    for uid, grp in df.groupby("user_id"):
        t = grp.t.to_numpy()
        v = grp.v.to_numpy()
        if len(t) < 2:
            continue
        dt = np.diff(t).astype(np.float64)
        want[(uid,)] = {
            "n_weighted": len(t) - 1,
            "total_us": int(dt.sum()),
            "twap": float((v[:-1] * dt).sum() / dt.sum()),
        }
    assert_keyed(
        run(spark, "ts_time_weighted_avg"),
        want,
        ["user_id"],
        ["n_weighted", "total_us", "twap"],
    )


# ---------------------------------------------------------------- orders


def test_gini_matches_textbook(spark):
    o = _tbl("orders")
    c = _tbl("customer")[["c_custkey", "c_mktsegment"]]
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["spend_c"] = cents(df.o_totalprice)
    s = df.groupby(["c_mktsegment", "o_custkey"], as_index=False)["spend_c"].sum()
    want = {}
    for seg, grp in s.groupby("c_mktsegment"):
        g = grp.sort_values(["spend_c", "o_custkey"])
        sc = [int(x) for x in g.spend_c]
        n, tot = len(sc), sum(sc)
        iw = sum((i + 1) * x for i, x in enumerate(sc))
        want[(seg,)] = {
            "n_cust": n,
            "gini": float(2 * iw - (n + 1) * tot) / (n * tot),
        }
    assert_keyed(
        run(spark, "agg_gini_concentration"),
        want,
        ["c_mktsegment"],
        ["n_cust", "gini"],
    )


def test_hhi_matches_textbook(spark):
    doc = _tbl("documents")
    n = doc.groupby("source").size().to_numpy(dtype=np.float64)
    hhi = ((100.0 * n / n.sum()) ** 2).sum()
    got = run(spark, "agg_hhi_index").iloc[0]
    assert int(got.n_sources) == len(n)
    assert close(got.hhi, hhi)


def test_benford_matches_textbook(spark):
    o = _tbl("orders")
    v = o.loc[o.o_totalprice >= 1, "o_totalprice"]
    digits = pd.Series([int(str(c)[0]) for c in cents(v) // 100])
    counts = digits.value_counts().sort_index()
    total = float(counts.sum())
    want = {
        (int(d),): {
            "cnt": int(cnt),
            "observed": cnt / total,
            "benford": math.log10(1 + 1 / int(d)),
        }
        for d, cnt in counts.items()
    }
    assert_keyed(
        run(spark, "agg_benford_digits"),
        want,
        ["digit"],
        ["cnt", "observed", "benford"],
    )


def test_entropy_matches_textbook(spark):
    o = _tbl("orders")
    c = _tbl("customer")[["c_custkey", "c_mktsegment"]]
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    want = {}
    for seg, grp in df.groupby("c_mktsegment"):
        p = grp.o_orderpriority.value_counts().to_numpy(dtype=np.float64)
        p = p / p.sum()
        want[(seg,)] = {
            "n_orders": len(grp),
            "entropy_nats": float(-(p * np.log(p)).sum()),
        }
    assert_keyed(
        run(spark, "agg_entropy_categorical"),
        want,
        ["c_mktsegment"],
        ["n_orders", "entropy_nats"],
    )


def test_tukey_fences_match_textbook(spark):
    o = _tbl("orders")
    c = _tbl("customer")[["c_custkey", "c_mktsegment"]]
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    want = {}
    for seg, grp in df.groupby("c_mktsegment"):
        g = grp.sort_values(["o_totalprice", "o_orderkey"])
        prices = g.o_totalprice.to_numpy()
        n = len(prices)
        q1 = prices[math.ceil(0.25 * n) - 1]
        q3 = prices[math.ceil(0.75 * n) - 1]
        iqr = q3 - q1
        want[(seg,)] = {
            "n_orders": n,
            "q1": q1,
            "q3": q3,
            "iqr": iqr,
            "n_low_outliers": int((prices < q1 - 1.5 * iqr).sum()),
            "n_high_outliers": int((prices > q3 + 1.5 * iqr).sum()),
        }
    assert_keyed(
        run(spark, "agg_tukey_fences"),
        want,
        ["c_mktsegment"],
        ["n_orders", "q1", "q3", "iqr", "n_low_outliers", "n_high_outliers"],
    )


def test_weighted_median_matches_textbook(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"])
        w = g.l_quantity.to_numpy(dtype=np.float64)
        cw = np.cumsum(w)
        tw = cw[-1]
        idx = int(np.argmax(2 * cw >= tw))  # first crossing row
        want[(flag,)] = {
            "weighted_median": g.l_extendedprice.to_numpy()[idx],
            "total_w": tw,
        }
    assert_keyed(
        run(spark, "agg_weighted_median"),
        want,
        ["l_returnflag"],
        ["weighted_median", "total_w"],
    )


# ------------------------------------------------------------- documents


def _token_lists() -> pd.DataFrame:
    doc = _tbl("documents")
    return pd.DataFrame(
        {
            "doc_id": doc.doc_id,
            "lang": doc.lang,
            "toks": doc.text.str.split(" "),
        }
    )


def test_js_divergence_matches_textbook(spark):
    tl = _token_lists()
    dists = {}
    for lang, grp in tl.groupby("lang"):
        cnt: dict = {}
        for toks in grp.toks:
            for t in toks:
                cnt[t] = cnt.get(t, 0) + 1
        tot = float(sum(cnt.values()))
        dists[lang] = {t: c / tot for t, c in cnt.items()}
    langs = sorted(dists)
    want = {}
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            pa, pb = dists[la], dists[lb]
            jsd = 0.0
            for t in set(pa) | set(pb):
                p, q = pa.get(t, 0.0), pb.get(t, 0.0)
                m = (p + q) / 2
                if p > 0:
                    jsd += 0.5 * p * math.log(p / m)
                if q > 0:
                    jsd += 0.5 * q * math.log(q / m)
            want[(la, lb)] = {"jsd": jsd}
    assert_keyed(
        run(spark, "llm_js_divergence"), want, ["lang_a", "lang_b"], ["jsd"]
    )


def test_zipf_fit_matches_textbook(spark):
    tl = _token_lists()
    cnt: dict = {}
    for toks in tl.toks:
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    y = np.log([c for _, c in top])
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    got = run(spark, "llm_zipf_fit").iloc[0]
    assert int(got.n_points) == len(top)
    assert close(got.slope, slope, 1e-5)
    assert close(got.intercept, intercept, 1e-5)


def test_collocation_pmi_matches_textbook(spark):
    tl = _token_lists()
    uni: dict = {}
    big: dict = {}
    nb = nu = 0
    for toks in tl.toks:
        nu += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for w1, w2 in zip(toks, toks[1:]):
            nb += 1
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
    scored = [
        (
            round(
                math.log((c2 / nb) / ((uni[w1] / nu) * (uni[w2] / nu))), 6
            ),
            w1,
            w2,
            c2,
        )
        for (w1, w2), c2 in big.items()
        if c2 >= 5
    ]
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = {
        (w1, w2): {"c2": c2, "pmi": pmi} for pmi, w1, w2, c2 in scored[:20]
    }
    assert_keyed(
        run(spark, "llm_collocation_pmi"), want, ["w1", "w2"], ["c2", "pmi"]
    )


# ----------------------------------------------------------------- graph


def _edges(sf_dir: str = SF_DIR) -> set:
    """Directed user→user edges from the documented definition: same
    props.k, 0 < Δt ≤ 1h, src ≠ dst, distinct."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    rows = sorted(
        zip(
            ev.props.map(lambda p: json.loads(p).get("k")),
            ev.ts.astype("int64"),
            ev.user_id,
        )
    )
    edges = set()
    by_k: dict = {}
    for k, t, u in rows:
        by_k.setdefault(k, []).append((t, u))
    for k, evs in by_k.items():
        if k is None:
            continue
        for i, (ta, ua) in enumerate(evs):
            for tb, ub in evs[i + 1 :]:
                if tb - ta > HOUR_US:
                    break
                if tb > ta and ua != ub:
                    edges.add((ua, ub))
    return edges


def test_assortativity_matches_textbook(spark):
    edges = _edges()
    outd: dict = {}
    ind: dict = {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    x = np.array([outd[s] for s, _ in edges], dtype=np.float64)
    y = np.array([ind[d] for _, d in edges], dtype=np.float64)
    n = len(x)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = math.sqrt(
        (n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2)
    )
    got = run(spark, "graph_assortativity").iloc[0]
    assert int(got.n_edges) == n
    assert close(got.assortativity, num / den, 1e-5)


def test_clustering_coefficient_matches_textbook(spark):
    edges = _edges()
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        tri = 0
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                if b in adj.get(a, ()):
                    tri += 1
        want[(v,)] = {
            "degree": d,
            "n_triangles": tri,
            "clustering": 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0,
        }
    assert_keyed(
        run(spark, "graph_clustering_coefficient"),
        want,
        ["user_id"],
        ["degree", "n_triangles", "clustering"],
    )


def test_adamic_adar_matches_textbook(spark):
    edges = _edges()
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    kept = {v: len(n) for v, n in adj.items() if len(n) <= 25}
    want = {}
    verts = sorted(kept)
    for i, u in enumerate(verts):
        for w in verts[i + 1 :]:
            common = [
                z for z in adj[u] & adj[w] if z in kept
            ]
            if len(common) >= 3:
                want[(u, w)] = {
                    "cn": len(common),
                    "aa_score": sum(1.0 / math.log(kept[z]) for z in common),
                }
    assert_keyed(
        run(spark, "graph_adamic_adar"), want, ["u", "w"], ["cn", "aa_score"]
    )


def test_modularity_matches_textbook(spark):
    edges = _edges()
    und = {(min(a, b), max(a, b)) for a, b in edges}
    m = float(len(und))
    ev = _tbl("events")
    kc: dict = {}
    for u, p in zip(ev.user_id, ev.props):
        k = json.loads(p).get("k")
        kc.setdefault(u, {})[k] = kc.setdefault(u, {}).get(k, 0) + 1
    comm = {
        u: min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for u, cnts in kc.items()
    }
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    within: dict = {}
    for a, b in und:
        if comm[a] == comm[b]:
            within[comm[a]] = within.get(comm[a], 0) + 1
    dc: dict = {}
    for v, d in deg.items():
        dc[comm[v]] = dc.get(comm[v], 0) + d
    q = sum(
        within.get(c, 0) / m - (d / (2 * m)) ** 2 for c, d in dc.items()
    )
    got = run(spark, "graph_modularity").iloc[0]
    assert int(got.n_communities) == len(dc)
    assert int(got.n_edges) == int(m)
    assert close(got.modularity, q, 1e-5)


# ---------------------------------------------------- as-of joins (wave 2)
# pandas.merge_asof is an industry-standard INDEPENDENT as-of
# implementation — the strongest possible twin-bug reference for the
# backward and tolerance variants; the nearest variant's tiebreak
# (earlier order, lower key on equidistance) is spelled manually because
# pandas' own equidistance rule is not the documented one.


def _asof_frames():
    ev = _tbl("events")
    o = _tbl("orders")
    left = pd.DataFrame(
        {
            "event_id": ev.event_id,
            "user_id": ev.user_id,
            "ev_us": ev.ts.astype("int64"),
        }
    ).sort_values("ev_us", kind="mergesort")
    right = pd.DataFrame(
        {
            "o_custkey": o.o_custkey,
            "o_orderkey": o.o_orderkey,
            "order_us": pd.to_datetime(o.o_orderdate).astype("int64"),
        }
    ).sort_values(["order_us", "o_orderkey"], kind="mergesort")
    return left, right


def test_join_asof_matches_pandas_merge_asof(spark):
    left, right = _asof_frames()
    m = pd.merge_asof(
        left,
        right,
        left_on="ev_us",
        right_on="order_us",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
    ).dropna(subset=["o_orderkey"])
    want = {
        (int(r.event_id),): {
            "user_id": int(r.user_id),
            "o_orderkey": int(r.o_orderkey),
            "order_us": int(r.order_us),
        }
        for _, r in m.iterrows()
    }
    assert_keyed(
        run(spark, "join_asof"),
        want,
        ["event_id"],
        ["user_id", "o_orderkey", "order_us"],
    )


def test_join_asof_tolerance_matches_pandas_merge_asof(spark):
    left, right = _asof_frames()
    m = pd.merge_asof(
        left,
        right,
        left_on="ev_us",
        right_on="order_us",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
        tolerance=2_592_000_000_000,  # 30 days in µs
    )
    want = {
        (int(r.event_id),): {
            "user_id": int(r.user_id),
            "o_orderkey": None if pd.isna(r.o_orderkey) else int(r.o_orderkey),
            "order_us": None if pd.isna(r.order_us) else int(r.order_us),
        }
        for _, r in m.iterrows()
    }
    assert_keyed(
        run(spark, "join_asof_tolerance"),
        want,
        ["event_id"],
        ["user_id", "o_orderkey", "order_us"],
    )


def test_join_asof_nearest_matches_manual(spark):
    left, right = _asof_frames()
    by_user: dict = {}
    for _, r in right.iterrows():
        by_user.setdefault(r.o_custkey, []).append(
            (int(r.order_us), int(r.o_orderkey))
        )
    want = {}
    for _, e in left.iterrows():
        orders = by_user.get(e.user_id)
        if not orders:
            continue
        best = min(
            orders, key=lambda ok: (abs(ok[0] - e.ev_us), ok[0], ok[1])
        )
        want[(int(e.event_id),)] = {
            "user_id": int(e.user_id),
            "o_orderkey": best[1],
            "dt_us": abs(best[0] - int(e.ev_us)),
        }
    assert_keyed(
        run(spark, "join_asof_nearest"),
        want,
        ["event_id"],
        ["user_id", "o_orderkey", "dt_us"],
    )


# ------------------------------------------------ rolling family (wave 2)


def _daily_type_cents() -> pd.DataFrame:
    ev = _tbl("events")
    return (
        pd.DataFrame(
            {
                "event_type": ev.event_type,
                "day": ev.ts.dt.normalize(),
                "c": cents(ev.value),
            }
        )
        .groupby(["event_type", "day"], as_index=False)["c"]
        .sum()
    )


def test_rolling_corr_matches_textbook(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "day": ev.ts.dt.normalize(),
            "x": np.where(ev.event_type == "click", cents(ev.value), 0),
            "y": np.where(ev.event_type == "purchase", cents(ev.value), 0),
        }
    ).groupby("day", as_index=False).sum().sort_values("day")
    x = df.x.to_numpy(dtype=np.float64)
    y = df.y.to_numpy(dtype=np.float64)
    days = df.day.astype("int64").to_numpy()
    want = {}
    for i in range(len(x)):
        lo = max(0, i - 6)
        xs, ys = x[lo : i + 1], y[lo : i + 1]
        n = len(xs)
        num = n * (xs * ys).sum() - xs.sum() * ys.sum()
        den2 = (n * (xs * xs).sum() - xs.sum() ** 2) * (
            n * (ys * ys).sum() - ys.sum() ** 2
        )
        r = None if den2 <= 0 else num / math.sqrt(den2)
        want[(days[i],)] = {"n": n, "rolling_r": r}
    assert_keyed(
        run(spark, "win_rolling_corr"), want, ["day_us"], ["n", "rolling_r"]
    )


def test_weighted_moving_avg_matches_textbook(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "event_id": ev.event_id,
            "ts_us": ev.ts.astype("int64"),
            "c": cents(ev.value),
        }
    ).sort_values(["user_id", "ts_us", "event_id"])
    want = {}
    for _, grp in df.groupby("user_id"):
        c = grp.c.to_numpy()
        for i, (_, r) in enumerate(grp.iterrows()):
            wma = (
                None
                if i < 2
                else (3 * c[i] + 2 * c[i - 1] + c[i - 2]) / 6.0
            )
            want[(int(r.user_id), int(r.event_id))] = {
                "ts_us": int(r.ts_us),
                "wma_cents": wma,
            }
    assert_keyed(
        run(spark, "win_weighted_moving_avg"),
        want,
        ["user_id", "event_id"],
        ["ts_us", "wma_cents"],
    )


def test_ewma_bounded_matches_textbook(spark):
    ev = _tbl("events")
    df = ev.loc[ev.user_id <= 30, ["user_id", "event_id", "ts", "value"]]
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = {}
    for _, grp in df.groupby("user_id"):
        v = grp.value.to_numpy()
        for i, (_, r) in enumerate(grp.iterrows()):
            lo = max(0, i - 9)
            w = 0.7 ** np.arange(i - lo, -1, -1, dtype=np.float64)
            want[(int(r.user_id), int(r.event_id))] = {
                "value": r.value,
                "ewma": float((w * v[lo : i + 1]).sum() / w.sum()),
            }
    assert_keyed(
        run(spark, "ts_ewma_bounded"),
        want,
        ["user_id", "event_id"],
        ["value", "ewma"],
    )


def test_max_drawdown_matches_textbook(spark):
    daily = _daily_type_cents()
    want = {}
    for et, grp in daily.groupby("event_type"):
        cum = np.cumsum(grp.sort_values("day").c.to_numpy())
        peak = np.maximum.accumulate(cum)
        want[(et,)] = {
            "max_drawdown": float((peak - cum).max()) / 100.0,
            "final_peak": float(peak.max()) / 100.0,
        }
    assert_keyed(
        run(spark, "ts_max_drawdown"),
        want,
        ["event_type"],
        ["max_drawdown", "final_peak"],
    )


def test_bollinger_bands_match_textbook(spark):
    daily = _daily_type_cents()
    want = {}
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        rev = g.c.to_numpy(dtype=np.float64) / 100.0
        days = g.day.dt.strftime("%Y-%m-%d").to_numpy()
        for i in range(6, len(rev)):
            win = rev[i - 6 : i + 1]
            mid = win.mean()
            var = win.var(ddof=1)
            if var <= 0:
                continue
            sd = math.sqrt(var)
            want[(et, days[i])] = {
                "rev": rev[i],
                "mid": mid,
                "lower_band": mid - 2 * sd,
                "upper_band": mid + 2 * sd,
                "above_upper": rev[i] > mid + 2 * sd,
                "below_lower": rev[i] < mid - 2 * sd,
            }
    assert_keyed(
        run(spark, "ts_bollinger_bands"),
        want,
        ["event_type", "day_s"],
        ["rev", "mid", "lower_band", "upper_band", "above_upper", "below_lower"],
        1e-5,
    )


def test_changepoint_cusum_matches_textbook(spark):
    daily = _daily_type_cents()
    want = {}
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        c = [int(x) for x in g.c]
        days = g.day.astype("int64").to_numpy()
        total, nd = sum(c), len(c)
        run_sum, best = 0, None
        for day, ci in zip(days, c):
            run_sum += ci * nd - total
            if best is None or abs(run_sum) > abs(best[1]):
                best = (int(day), run_sum)
        want[(et,)] = {
            "changepoint_day_us": best[0],
            "peak_cusum": best[1],
        }
    assert_keyed(
        run(spark, "ts_changepoint_cusum"),
        want,
        ["event_type"],
        ["changepoint_day_us", "peak_cusum"],
    )


def _rhu6(x: float) -> float:
    """round-half-up to 6 decimals (both engines' round() on positives)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_outlier_mad_matches_textbook(spark):
    ev = _tbl("events")
    flagged = {}
    for et, grp in ev.groupby("event_type"):
        v = grp.value.to_numpy()
        med = _rhu6(float(np.median(v)))
        ad = np.abs(v - med)
        mad = _rhu6(float(np.median(ad)))
        thresh = 3 * 1.4826 * mad
        for eid, vi, adi in zip(grp.event_id, v, ad):
            if adi > thresh:
                flagged[(int(eid),)] = {
                    "event_type": et,
                    "value": vi,
                    "robust_z": adi / (1.4826 * mad),
                }
    assert_keyed(
        run(spark, "ts_outlier_mad"),
        flagged,
        ["event_id"],
        ["event_type", "value", "robust_z"],
        1e-5,
    )


def test_interpolate_linear_matches_textbook(spark):
    ev = _tbl("events")
    df = ev.loc[ev.user_id <= 50]
    hourly = (
        pd.DataFrame(
            {
                "user_id": df.user_id,
                "h": df.ts.dt.floor("h"),
                "c": cents(df.value),
            }
        )
        .groupby(["user_id", "h"], as_index=False)["c"]
        .sum()
    )
    want = {}
    for uid, grp in hourly.groupby("user_id"):
        obs = dict(zip(grp.h.astype("int64") // HOUR_US, grp.c))
        hidxs = sorted(obs)
        for hidx in range(hidxs[0], hidxs[-1] + 1):
            if hidx in obs:
                val = float(obs[hidx])
            else:
                pt = max(h for h in hidxs if h < hidx)
                nt = min(h for h in hidxs if h > hidx)
                pv, nv = obs[pt], obs[nt]
                val = pv + (nv - pv) * (hidx - pt) / (nt - pt)
            want[(uid, hidx * HOUR_US)] = {
                "cents": obs.get(hidx),
                "cents_interp": val,
            }
    assert_keyed(
        run(spark, "ts_interpolate_linear"),
        want,
        ["user_id", "hour_us"],
        ["cents", "cents_interp"],
        1e-5,
    )


def test_corr_regr_matches_numpy(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, grp in li.groupby("l_returnflag"):
        q = grp.l_quantity.to_numpy(dtype=np.float64)
        p = grp.l_extendedprice.to_numpy(dtype=np.float64)
        cov = (q * p).mean() - q.mean() * p.mean()
        want[(flag,)] = {
            "qp_corr": float(np.corrcoef(q, p)[0, 1]),
            "qp_covar": cov,
            "price_per_qty": cov / q.var(),
        }
    assert_keyed(
        run(spark, "agg_corr_regr"),
        want,
        ["l_returnflag"],
        ["qp_corr", "qp_covar", "price_per_qty"],
        1e-4,
    )


# ------------------------------------------- graph structure (wave 3)


def _und_adj(edges=None) -> dict:
    adj: dict = {}
    for s, d in (edges if edges is not None else _edges()):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def test_kcore_matches_converged_peeling(spark):
    """Peel to CONVERGENCE (not a fixed round count) — also proves the
    operator's 8 rounds reach the fixture's fixpoint."""
    adj = {v: set(n) for v, n in _und_adj().items()}
    changed = True
    while changed:
        drop = {v for v, n in adj.items() if len(n) < 12}
        changed = bool(drop)
        for v in drop:
            del adj[v]
        for v in adj:
            adj[v] -= drop
    adj = {v: n for v, n in adj.items() if n}
    want = {(v,): {"core_degree": len(n)} for v, n in adj.items()}
    assert_keyed(run(spark, "graph_kcore"), want, ["v"], ["core_degree"])


def test_harmonic_centrality_matches_bfs(spark):
    adj = _und_adj()
    seeds = [v for v in adj if v % 15 == 0]
    reach: dict = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in (1, 2, 3):
            nxt = []
            for v in frontier:
                for n in adj[v]:
                    if n not in dist:
                        dist[n] = d
                        nxt.append(n)
            frontier = nxt
        for v, d in dist.items():
            if v != s:
                cnt, h = reach.get(v, (0, 0.0))
                reach[v] = (cnt + 1, h + 1.0 / d)
    want = {
        (v,): {"n_seeds_reaching": c, "harmonic": h}
        for v, (c, h) in reach.items()
    }
    assert_keyed(
        run(spark, "graph_harmonic_centrality"),
        want,
        ["user_id"],
        ["n_seeds_reaching", "harmonic"],
    )


def test_reciprocity_matches_textbook(spark):
    edges = _edges()
    mutual = sum(1 for s, d in edges if (d, s) in edges)
    got = run(spark, "graph_reciprocity").iloc[0]
    assert int(got.n_edges) == len(edges)
    assert int(got.n_mutual) == mutual
    assert close(got.reciprocity, mutual / len(edges))


def test_centralization_matches_textbook(spark):
    adj = _und_adj()
    degs = np.array([len(n) for n in adj.values()], dtype=np.float64)
    n = len(degs)
    want = (degs.max() - degs).sum() / ((n - 1) * (n - 2))
    got = run(spark, "graph_centralization").iloc[0]
    assert int(got.n_vertices) == n
    assert int(got.d_max) == int(degs.max())
    assert close(got.centralization, want)


def test_degree_powerlaw_matches_numpy_ols(spark):
    adj = _und_adj()
    degs = pd.Series([len(n) for n in adj.values()])
    hist = degs.value_counts()
    x = np.log(hist.index.to_numpy(dtype=np.float64))
    y = np.log(hist.to_numpy(dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    got = run(spark, "graph_degree_powerlaw").iloc[0]
    assert int(got.n_points) == len(hist)
    assert close(got.slope, slope, 1e-4)
    assert close(got.intercept, intercept, 1e-4)


def _kept_adj() -> dict:
    """Hub-capped adjacency (degree ≤ 25, both endpoints kept)."""
    adj = _und_adj()
    kept = {v for v, n in adj.items() if len(n) <= 25}
    return {
        v: {n for n in adj[v] if n in kept} for v in kept
    }


def test_edge_support_matches_textbook(spark):
    ka = _kept_adj()
    want = {}
    for a in sorted(ka):
        for b in ka[a]:
            if a < b:
                sup = len((ka[a] & ka[b]) - {a, b})
                if sup > 0:
                    want[(a, b)] = {"support": sup}
    assert_keyed(
        run(spark, "graph_edge_support"), want, ["a", "b"], ["support"]
    )


def test_common_neighbors_matches_textbook(spark):
    adj = _und_adj()
    kept = {v: len(adj[v]) for v in adj if len(adj[v]) <= 25}
    ka = {v: {n for n in adj[v] if n in kept} for v in kept}
    want = {}
    verts = sorted(ka)
    for i, u in enumerate(verts):
        for w in verts[i + 1 :]:
            cn = len(ka[u] & ka[w])
            if cn >= 3:
                want[(u, w)] = {
                    "cn": cn,
                    "jaccard": cn / (kept[u] + kept[w] - cn),
                }
    assert_keyed(
        run(spark, "graph_common_neighbors"),
        want,
        ["u", "w"],
        ["cn", "jaccard"],
    )


# --------------------------------------------- lexical scores (wave 3)


def test_word_entropy_matches_textbook(spark):
    tl = _token_lists()
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        cnt: dict = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        n = len(toks)
        want[(doc_id,)] = {
            "n_toks": n,
            "ttr": len(cnt) / n,
            "entropy": math.log(n)
            - sum(c * math.log(c) for c in cnt.values()) / n,
        }
    assert_keyed(
        run(spark, "llm_word_entropy"),
        want,
        ["doc_id"],
        ["n_toks", "ttr", "entropy"],
    )


def test_hapax_ratio_matches_textbook(spark):
    tl = _token_lists()
    want = {}
    for lang, grp in tl.groupby("lang"):
        cnt: dict = {}
        for toks in grp.toks:
            for t in toks:
                cnt[t] = cnt.get(t, 0) + 1
        hapax = sum(1 for c in cnt.values() if c == 1)
        want[(lang,)] = {
            "vocab": len(cnt),
            "hapax": hapax,
            "total_tokens": sum(cnt.values()),
            "hapax_share": hapax / len(cnt),
        }
    assert_keyed(
        run(spark, "llm_hapax_ratio"),
        want,
        ["lang"],
        ["vocab", "hapax", "total_tokens", "hapax_share"],
    )


def test_unigram_logprob_matches_textbook(spark):
    tl = _token_lists()
    vocab: dict = {}
    for toks in tl.toks:
        for t in toks:
            vocab[t] = vocab.get(t, 0) + 1
    total, v = float(sum(vocab.values())), float(len(vocab))
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        nll = [-math.log((vocab[t] + 1.0) / (total + v)) for t in toks]
        want[(doc_id,)] = {
            "n_toks": len(toks),
            "mean_nll": sum(nll) / len(nll),
        }
    assert_keyed(
        run(spark, "llm_unigram_logprob"),
        want,
        ["doc_id"],
        ["n_toks", "mean_nll"],
    )


def test_bigram_logprob_matches_textbook(spark):
    tl = _token_lists()
    uni: dict = {}
    bc: dict = {}
    for toks in tl.toks:
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for w1, w2 in zip(toks, toks[1:]):
            bc[(w1, w2)] = bc.get((w1, w2), 0) + 1
    v = float(len(uni))
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        lls = [
            math.log((bc[(w1, w2)] + 1.0) / (uni[w1] + v))
            for w1, w2 in zip(toks, toks[1:])
        ]
        if lls:
            want[(doc_id,)] = {
                "n_bigrams": len(lls),
                "mean_ll": sum(lls) / len(lls),
            }
    assert_keyed(
        run(spark, "llm_bigram_logprob"),
        want,
        ["doc_id"],
        ["n_bigrams", "mean_ll"],
    )


def test_bm25_matches_textbook(spark):
    tl = _token_lists()
    terms = ["scan", "agg", "fast"]
    n_docs = len(tl)
    dl = {d: len(t) for d, t in zip(tl.doc_id, tl.toks)}
    avgdl = sum(dl.values()) / len(dl)
    tf = {
        d: {t: toks.count(t) for t in terms if t in toks}
        for d, toks in zip(tl.doc_id, tl.toks)
    }
    df = {t: sum(1 for d in tf if t in tf[d]) for t in terms}
    idf = {
        t: math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        for t in terms
    }
    k1, b = 1.2, 0.75
    want = {}
    for d, tfs in tf.items():
        if not tfs:
            continue
        score = sum(
            idf[t]
            * f
            * (k1 + 1)
            / (f + k1 * (1 - b + b * dl[d] / avgdl))
            for t, f in tfs.items()
        )
        want[(d,)] = {"bm25": score}
    assert_keyed(run(spark, "llm_bm25_score"), want, ["doc_id"], ["bm25"])


def test_tfidf_matches_textbook(spark):
    tl = _token_lists()
    n_corpus = len(tl)
    df: dict = {}
    for toks in tl.toks:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        n = len(toks)
        cnt: dict = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        for t, c in cnt.items():
            want[(doc_id, t)] = {
                "tfidf": (c / n) * math.log(n_corpus / df[t])
            }
    assert_keyed(
        run(spark, "llm_tfidf"), want, ["doc_id", "word"], ["tfidf"]
    )


def test_repetition_score_matches_textbook(spark):
    tl = _token_lists()
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        if len(toks) < 2:
            continue
        cnt: dict = {}
        for w1, w2 in zip(toks, toks[1:]):
            bg = f"{w1} {w2}"
            cnt[bg] = cnt.get(bg, 0) + 1
        top = max(cnt.values())
        total = sum(cnt.values())
        want[(doc_id,)] = {
            "top_cnt": top,
            "n_bigrams": total,
            "n_distinct": len(cnt),
            "rep_ratio": top / total,
            "distinct_ratio": len(cnt) / total,
        }
    assert_keyed(
        run(spark, "llm_repetition_score"),
        want,
        ["doc_id"],
        ["top_cnt", "n_bigrams", "n_distinct", "rep_ratio", "distinct_ratio"],
    )


def test_source_concentration_matches_textbook(spark):
    doc = _tbl("documents")
    s = doc.groupby("source").agg(
        n_docs=("doc_id", "size"), n_chars=("n_chars", "sum")
    )
    s = s.sort_values(
        ["n_docs", "source"], ascending=[False, True], key=None
    ).reset_index()
    tot = float(s.n_docs.sum())
    cum = 0
    want = {}
    for _, r in s.iterrows():
        cum += r.n_docs
        want[(r.source,)] = {
            "n_docs": int(r.n_docs),
            "n_chars": int(r.n_chars),
            "share": r.n_docs / tot,
            "cum_share": cum / tot,
            "in_top80": cum / tot <= 0.8,
        }
    assert_keyed(
        run(spark, "llm_source_concentration"),
        want,
        ["source"],
        ["n_docs", "n_chars", "share", "cum_share", "in_top80"],
    )


# ------------------------------------------ vector kernels (wave 4)
# Full-matrix numpy is the independent reference: the operators use a
# blocked-broadcast kernel (llm.py `_blocked_union`) or relational
# explode/agg spellings — none of which share code with a dense
# M @ M.T over the whole table.


def _emb():
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    return e.vec_id.to_numpy(), e.label.to_numpy(), m


def test_knn_bruteforce_matches_dense_numpy(spark):
    ids, _, m = _emb()
    nrm = np.sqrt((m * m).sum(axis=1))
    sims = (m @ m.T) / np.outer(nrm, nrm)
    want = {}
    for i, src in enumerate(ids):
        cand = [
            (-round(float(sims[i, j]), 6), int(ids[j]), float(sims[i, j]))
            for j in range(len(ids))
            if ids[j] != src
        ]
        cand.sort(key=lambda t: (t[0], t[1]))
        for rnk, (_, nbr, raw) in enumerate(cand[:5], start=1):
            want[(int(src), rnk)] = {"nbr": nbr, "sim": raw}
    assert_keyed(
        run(spark, "llm_knn_bruteforce"),
        want,
        ["src", "rnk"],
        ["nbr", "sim"],
        1e-5,
    )


def test_knn_centroid_matches_dense_numpy(spark):
    ids, labels, m = _emb()
    cents = {
        lab: np.round(m[labels == lab].mean(axis=0), 6)
        for lab in np.unique(labels)
    }
    want = {}
    for i, vid in enumerate(ids):
        d2 = {
            int(lab): float(((m[i] - c) ** 2).sum())
            for lab, c in cents.items()
        }
        assigned = min(d2, key=lambda lab: (d2[lab], lab))
        want[(int(vid),)] = {
            "label": int(labels[i]),
            "assigned_label": assigned,
            "d2": d2[assigned],
        }
    assert_keyed(
        run(spark, "llm_knn_centroid"),
        want,
        ["vec_id"],
        ["label", "assigned_label", "d2"],
        1e-4,
    )


def test_embed_normalize_matches_numpy(spark):
    ids, _, m = _emb()
    nrm = np.sqrt((m * m).sum(axis=1))
    want = {}
    for i, vid in enumerate(ids):
        for pos in range(m.shape[1]):
            want[(int(vid), pos + 1)] = {
                "nval": m[i, pos] / nrm[i],
                "l2_norm": nrm[i],
            }
    assert_keyed(
        run(spark, "llm_embed_normalize"),
        want,
        ["vec_id", "pos"],
        ["nval", "l2_norm"],
        1e-5,
    )


def test_embedding_pool_mean_matches_numpy(spark):
    ids, _, m = _emb()
    docs = ids // 10
    want = {}
    for doc in np.unique(docs):
        rows = m[docs == doc]
        pooled = np.round(rows.mean(axis=0), 6)
        l2 = math.sqrt(float((pooled * pooled).sum()))
        for pos in range(m.shape[1]):
            want[(int(doc), pos + 1)] = {
                "n_chunks": rows.shape[0],
                "pooled_norm": None if l2 == 0 else pooled[pos] / l2,
            }
    assert_keyed(
        run(spark, "llm_embedding_pool_mean"),
        want,
        ["doc", "pos"],
        ["n_chunks", "pooled_norm"],
        1e-5,
    )


def test_embedding_quantize_int8_matches_numpy(spark):
    ids, _, m = _emb()
    want = {}
    for i, vid in enumerate(ids):
        mx = np.abs(m[i]).max()
        if mx == 0:
            continue
        scale = 127.0 / mx
        q = np.floor(m[i] * scale + 0.5)
        want[(int(vid),)] = {
            "scale_r": scale,
            "qsum": int(q.sum()),
            "q_l1": int(np.abs(q).sum()),
            "max_abs_err": float(np.abs(m[i] - q / scale).max()),
        }
    got = run(spark, "llm_embedding_quantize_int8")
    # the integer checksums must match EXACTLY — floor on identical IEEE
    # doubles is bit-deterministic across numpy and the JVM
    gk = {int(r.vec_id): r for _, r in got.iterrows()}
    assert set(gk) == {k[0] for k in want}
    for (vid,), w in want.items():
        r = gk[vid]
        assert int(r.qsum) == w["qsum"], vid
        assert int(r.q_l1) == w["q_l1"], vid
        assert close(r.scale_r, w["scale_r"], 1e-5)
        assert close(r.max_abs_err, w["max_abs_err"], 1e-4)


def test_similarity_threshold_join_matches_dense_numpy(spark):
    ids, _, m = _emb()
    doc = _tbl("documents")[["doc_id", "lang"]]
    lang = dict(zip(doc.doc_id, doc.lang))
    nrm = np.sqrt((m * m).sum(axis=1))
    sims = (m @ m.T) / np.outer(nrm, nrm)
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
                s = float(sims[j, i])
            else:
                s = float(sims[i, j])
            if s > 0.3 and lang.get(a) == lang.get(b):
                want[(a, b)] = {"sim": s, "lang": lang[a]}
    assert_keyed(
        run(spark, "llm_similarity_threshold_join"),
        want,
        ["id_a", "id_b"],
        ["sim", "lang"],
        1e-5,
    )


# ------------------------------------------------ ts analytics (wave 4b)


def test_seasonal_profile_matches_textbook(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "dow": ev.ts.dt.dayofweek + 1,
            "hod": ev.ts.dt.hour,
            "c": cents(ev.value),
        }
    )
    want = {}
    for (dow, hod), grp in df.groupby(["dow", "hod"]):
        want[(dow, hod)] = {
            "n_events": len(grp),
            "mean_value": grp.c.sum() / 100.0 / len(grp),
        }
    assert_keyed(
        run(spark, "ts_seasonal_profile"),
        want,
        ["dow", "hod"],
        ["n_events", "mean_value"],
    )


def test_forecast_naive_eval_matches_textbook(spark):
    daily = _daily_type_cents()
    want = {}
    for et, grp in daily.groupby("event_type"):
        series = dict(zip(grp.day, grp.c))
        errs, mapes = [], []
        for day, c in series.items():
            prev = series.get(day - pd.Timedelta(days=7))
            if prev is None:
                continue
            err = abs(int(c) - int(prev))
            errs.append(err)
            if c != 0:
                mapes.append(err / float(c))
        if errs:
            want[(et,)] = {
                "n_days": len(errs),
                "abs_err_cents": sum(errs),
                "mae_cents": sum(errs) / len(errs),
                "mape": sum(mapes) / len(mapes) if mapes else None,
            }
    assert_keyed(
        run(spark, "ts_forecast_naive_eval"),
        want,
        ["event_type"],
        ["n_days", "abs_err_cents", "mae_cents", "mape"],
    )


def test_inter_event_stats_match_textbook(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "t": ev.ts.astype("int64"),
            "event_id": ev.event_id,
        }
    ).sort_values(["user_id", "t", "event_id"])
    want = {}
    for uid, grp in df.groupby("user_id"):
        gaps = sorted(np.diff(grp.t.to_numpy()))
        if not gaps:
            continue
        n = len(gaps)
        want[(uid,)] = {
            "n_gaps": n,
            "median_gap_us": gaps[math.ceil(0.5 * n) - 1],
            "p90_gap_us": gaps[math.ceil(0.9 * n) - 1],
            "max_gap_us": gaps[-1],
        }
    assert_keyed(
        run(spark, "ts_inter_event_stats"),
        want,
        ["user_id"],
        ["n_gaps", "median_gap_us", "p90_gap_us", "max_gap_us"],
    )


def test_coverage_ratio_matches_textbook(spark):
    ev = _tbl("events")
    hours = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "h": ev.ts.dt.floor("h").astype("int64"),
        }
    ).drop_duplicates()
    want = {}
    for uid, grp in hours.groupby("user_id"):
        span = (grp.h.max() - grp.h.min()) // HOUR_US + 1
        want[(uid,)] = {
            "hours_with_data": len(grp),
            "span_hours": int(span),
            "coverage": len(grp) / float(span),
        }
    assert_keyed(
        run(spark, "ts_coverage_ratio"),
        want,
        ["user_id"],
        ["hours_with_data", "span_hours", "coverage"],
    )


def test_histogram_equi_width_matches_textbook(spark):
    ev = _tbl("events")
    c = cents(ev.value)
    df = pd.DataFrame(
        {
            "event_type": ev.event_type,
            "bin": np.minimum(c // 5000, 9),
            "c": c,
        }
    )
    want = {}
    for (et, b), grp in df.groupby(["event_type", "bin"]):
        want[(et, b)] = {
            "n": len(grp),
            "min_cents": int(grp.c.min()),
            "max_cents": int(grp.c.max()),
        }
    assert_keyed(
        run(spark, "ts_histogram_equi_width"),
        want,
        ["event_type", "bin"],
        ["n", "min_cents", "max_cents"],
    )


def test_rolling_active_users_matches_textbook(spark):
    ev = _tbl("events")
    du = pd.DataFrame(
        {
            "day": ev.ts.dt.normalize().astype("int64"),
            "user_id": ev.user_id,
        }
    ).drop_duplicates()
    days = sorted(du.day.unique())
    want = {}
    for d in days:
        in_win = du[(du.day >= d - 518_400_000_000) & (du.day <= d)]
        want[(d,)] = {
            "wau": in_win.user_id.nunique(),
            "dau": du[du.day == d].user_id.nunique(),
        }
    assert_keyed(
        run(spark, "ts_rolling_active_users"),
        want,
        ["day_us"],
        ["wau", "dau"],
    )


def test_period_over_period_matches_textbook(spark):
    daily = _daily_type_cents()
    want = {}
    for et, grp in daily.groupby("event_type"):
        series = dict(zip(grp.day.astype("int64"), grp.c))  # µs-unit fixture
        for day, c in series.items():
            prev = series.get(day - 604_800_000_000)  # 7 days in µs
            want[(et, day)] = {
                "cents": int(c),
                "cents_prev_week": None if prev is None else int(prev),
                "wow_growth": None if prev is None else c / float(prev) - 1.0,
            }
    assert_keyed(
        run(spark, "ts_period_over_period"),
        want,
        ["event_type", "day_us"],
        ["cents", "cents_prev_week", "wow_growth"],
    )


# ------------------------------------- classic sweep algorithms (wave 5)
# Sessionization, gaps-and-islands, interval union, forward fill: the
# operators spell these as window tricks (day − row_number anchors,
# running-max sweeps, IGNORE NULLS frames); the ground truths are plain
# single-pass Python sweeps — the textbook form of each algorithm.


def test_sessionize_matches_manual_sweep(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "event_id": ev.event_id,
            "t": ev.ts.astype("int64"),
        }
    ).sort_values(["user_id", "t", "event_id"])
    want = {}
    for uid, grp in df.groupby("user_id"):
        sid, prev = 0, None
        for _, r in grp.iterrows():
            if prev is None or r.t - prev > 1_800_000_000:
                sid += 1
            prev = r.t
            k = (uid, sid)
            if k not in want:
                want[k] = {"n_events": 0, "session_start_us": r.t,
                           "session_end_us": r.t}
            want[k]["n_events"] += 1
            want[k]["session_end_us"] = r.t
    assert_keyed(
        run(spark, "win_sessionize"),
        want,
        ["user_id", "session_id"],
        ["n_events", "session_start_us", "session_end_us"],
    )


def test_anomaly_zscore_matches_manual_trailing_window(spark):
    ev = _tbl("events")
    df = ev[["event_id", "event_type", "ts", "value"]].sort_values(
        ["event_type", "ts", "event_id"]
    )
    want = {}
    for _, grp in df.groupby("event_type"):
        v = grp.value.to_numpy()
        ids = grp.event_id.to_numpy()
        for i in range(len(v)):
            win = v[max(0, i - 50) : i]
            n = len(win)
            if n < 10:
                continue
            mean = win.mean()
            var = win.var(ddof=1)
            if var <= 0:
                continue
            want[(int(ids[i]),)] = {
                "event_type": grp.event_type.iloc[0],
                "value": v[i],
                "z": (v[i] - mean) / math.sqrt(var),
            }
    assert_keyed(
        run(spark, "ts_anomaly_zscore"),
        want,
        ["event_id"],
        ["event_type", "value", "z"],
        1e-5,
    )


def test_gaps_islands_matches_manual_sweep(spark):
    ev = _tbl("events")
    act = ev[ev.event_type.isin(["click", "view", "purchase"])]
    days = (
        pd.DataFrame(
            {"user_id": act.user_id, "d": act.ts.dt.normalize()}
        )
        .drop_duplicates()
        .sort_values(["user_id", "d"])
    )
    want = {}
    for uid, grp in days.groupby("user_id"):
        ds = list(grp.d)
        start = prev = ds[0]
        n = 1
        for d in ds[1:]:
            if (d - prev).days == 1:
                n += 1
            else:
                want[(uid, start.strftime("%Y-%m-%d"))] = {
                    "streak_end": prev.strftime("%Y-%m-%d"),
                    "streak_days": n,
                }
                start, n = d, 1
            prev = d
        want[(uid, start.strftime("%Y-%m-%d"))] = {
            "streak_end": prev.strftime("%Y-%m-%d"),
            "streak_days": n,
        }
    assert_keyed(
        run(spark, "ts_gaps_islands"),
        want,
        ["user_id", "streak_start"],
        ["streak_end", "streak_days"],
    )


def test_interval_merge_matches_manual_sweep(spark):
    o = _tbl("orders")
    iv = pd.DataFrame(
        {
            "cust": o.o_custkey,
            "s": pd.to_datetime(o.o_orderdate).astype("int64"),
        }
    )
    iv["e"] = iv.s + 604_800_000_000
    iv = iv.sort_values(["cust", "s", "e"])
    want = {}
    for cust, grp in iv.groupby("cust"):
        span_id, max_e, start, n = 0, None, None, 0
        for _, r in grp.iterrows():
            if max_e is None or r.s > max_e:
                if span_id:
                    want[(cust, span_id)] = {
                        "span_start_us": start,
                        "span_end_us": max_e,
                        "n_intervals": n,
                    }
                span_id += 1
                start, max_e, n = r.s, r.e, 1
            else:
                max_e = max(max_e, r.e)
                n += 1
        want[(cust, span_id)] = {
            "span_start_us": start,
            "span_end_us": max_e,
            "n_intervals": n,
        }
    assert_keyed(
        run(spark, "ts_interval_merge"),
        want,
        ["o_custkey", "span_id"],
        ["span_start_us", "span_end_us", "n_intervals"],
    )


def test_gap_fill_ffill_matches_manual_sweep(spark):
    ev = _tbl("events")
    df = ev[ev.user_id <= 50]
    hourly = (
        pd.DataFrame(
            {
                "user_id": df.user_id,
                "h": df.ts.dt.floor("h").astype("int64"),
                "c": cents(df.value),
            }
        )
        .groupby(["user_id", "h"])
        .agg(n_events=("c", "size"), cents=("c", "sum"))
        .reset_index()
    )
    want = {}
    for uid, grp in hourly.groupby("user_id"):
        obs = {
            h: (n, c)
            for h, n, c in zip(grp.h, grp.n_events, grp.cents)
        }
        last = None
        for h in range(min(obs), max(obs) + HOUR_US, HOUR_US):
            if h in obs:
                n, c = obs[h]
                last = c
                want[(uid, h)] = {
                    "n_events": n, "cents_ffill": int(c), "is_gap": 0,
                }
            else:
                want[(uid, h)] = {
                    "n_events": 0,
                    "cents_ffill": None if last is None else int(last),
                    "is_gap": 1,
                }
    assert_keyed(
        run(spark, "ts_gap_fill_ffill"),
        want,
        ["user_id", "hour_us"],
        ["n_events", "cents_ffill", "is_gap"],
    )


def test_time_bucket_arbitrary_matches_manual(spark):
    ev = _tbl("events")
    us = ev.ts.astype("int64")
    df = pd.DataFrame(
        {
            "b6": (us // 21_600_000_000) * 21_600_000_000,
            "b15": us // 900_000_000,
            "event_type": ev.event_type,
            "c": cents(ev.value),
        }
    )
    want = {}
    for (b6, et), grp in df.groupby(["b6", "event_type"]):
        want[(b6, et)] = {
            "n_events": len(grp),
            "n_active_15m": grp.b15.nunique(),
            "cents": int(grp.c.sum()),
        }
    assert_keyed(
        run(spark, "ts_time_bucket_arbitrary"),
        want,
        ["bucket6h_us", "event_type"],
        ["n_events", "n_active_15m", "cents"],
    )


# ----------------------------------- cohorts, funnel, ABC, heuristics


def test_cohort_retention_matches_manual(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {"user_id": ev.user_id, "d": ev.ts.dt.normalize()}
    ).drop_duplicates()
    cohort = df.groupby("user_id")["d"].min()
    want = {}
    for _, r in df.iterrows():
        c = cohort[r.user_id]
        off = (r.d - c).days
        if 0 <= off <= 7:
            k = (c.strftime("%Y-%m-%d"), off)
            want.setdefault(k, {"n_active": 0})["n_active"] += 1
    assert_keyed(
        run(spark, "ts_cohort_retention"),
        want,
        ["cohort_day", "day_offset"],
        ["n_active"],
    )


def test_funnel_stages_match_manual(spark):
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "event_type": ev.event_type,
            "t": ev.ts.astype("int64"),
        }
    )
    want = {}
    for uid, grp in df.groupby("user_id"):
        views = grp.loc[grp.event_type == "view", "t"]
        if views.empty:
            continue
        t1 = int(views.min())
        clicks = grp.loc[(grp.event_type == "click") & (grp.t > t1), "t"]
        t2 = None if clicks.empty else int(clicks.min())
        t3 = None
        if t2 is not None:
            buys = grp.loc[
                (grp.event_type == "purchase") & (grp.t > t2), "t"
            ]
            t3 = None if buys.empty else int(buys.min())
        want[(uid,)] = {
            "stage": 1 + (t2 is not None) + (t3 is not None),
            "view_us": t1,
            "click_us": t2,
            "purchase_us": t3,
        }
    assert_keyed(
        run(spark, "ts_funnel_stages"),
        want,
        ["user_id"],
        ["stage", "view_us", "click_us", "purchase_us"],
    )


def test_cohort_ltv_matches_manual(spark):
    WEEK = 604_800_000_000
    ev = _tbl("events")
    df = pd.DataFrame(
        {
            "user_id": ev.user_id,
            "w": ev.ts.astype("int64") // WEEK,
            "c": cents(ev.value),
        }
    )
    first = df.groupby("user_id")["w"].min()
    sized = first.value_counts()
    cell = (
        pd.DataFrame(
            {
                "cohort_w": first[df.user_id].to_numpy(),
                "w_off": df.w.to_numpy() - first[df.user_id].to_numpy(),
                "c": df.c.to_numpy(),
            }
        )
        .groupby(["cohort_w", "w_off"])["c"]
        .sum()
    )
    want = {}
    for cw, grp in cell.groupby(level=0):
        cum = 0
        for (_, off), rev in grp.sort_index().items():
            cum += int(rev)
            want[(cw, off)] = {
                "cohort_users": int(sized[cw]),
                "ltv_per_user": cum / 100.0 / sized[cw],
            }
    assert_keyed(
        run(spark, "ts_cohort_ltv"),
        want,
        ["cohort_w", "w_off"],
        ["cohort_users", "ltv_per_user"],
    )


def test_abc_classification_matches_manual(spark):
    li = _tbl("lineitem")
    pc = cents(li.l_extendedprice)
    dc = cents(li.l_discount)  # discount in hundredths
    rev_u = pc * (100 - dc)  # exact integer, 1e-4-dollar units
    per_part = (
        pd.DataFrame({"part": li.l_partkey, "rev": rev_u})
        .groupby("part")["rev"]
        .sum()
        .sort_index()
    )
    total = float(per_part.sum())
    ranked = sorted(
        per_part.items(), key=lambda kv: (-kv[1], kv[0])
    )
    classes = {"A": [0, 0.0], "B": [0, 0.0], "C": [0, 0.0]}
    cum_before = 0.0
    for part, rev in ranked:
        share_before = cum_before / total
        cls = "A" if share_before < 0.80 else ("B" if share_before < 0.95 else "C")
        classes[cls][0] += 1
        classes[cls][1] += rev / total
        cum_before += rev
    want = {
        (cls,): {"n_parts": n, "revenue_share": share}
        for cls, (n, share) in classes.items()
        if n
    }
    assert_keyed(
        run(spark, "agg_abc_classification"),
        want,
        ["abc"],
        ["n_parts", "revenue_share"],
    )


def test_langid_matches_manual(spark):
    tl = _token_lists()
    profile: dict = {}
    for lang, toks in zip(tl.lang, tl.toks):
        for t in toks:
            profile[(lang, t)] = profile.get((lang, t), 0) + 1
    langs = sorted(tl.lang.unique())
    want = {}
    for doc_id, toks in zip(tl.doc_id, tl.toks):
        cnt: dict = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        scores = {
            lang: sum(
                c * profile.get((lang, t), 0) for t, c in cnt.items()
            )
            for lang in langs
        }
        scores = {lang: s for lang, s in scores.items() if s > 0}
        best = min(scores, key=lambda lang: (-scores[lang], lang))
        want[(doc_id,)] = {"pred_lang": best, "score": scores[best]}
    assert_keyed(
        run(spark, "llm_langid_ngram"),
        want,
        ["doc_id"],
        ["pred_lang", "score"],
    )


def test_quality_score_matches_manual(spark):
    doc = _tbl("documents")
    stop = {"the", "a", "of", "and", "to"}
    want = {}
    for doc_id, text in zip(doc.doc_id, doc.text):
        if text is None:
            continue
        words = text.split(" ")
        nw = len(words)
        nc = len(text)
        ns = sum(1 for w in words if w in stop)
        ppm = (
            4000 * min(nw, 100)
            + (300000 - (ns * 300000) // nw)
            + min(((nc - (nw - 1)) * 300000) // (8 * nw), 300000)
        )
        want[(doc_id,)] = {
            "n_words": nw,
            "stop_ratio": ns / nw,
            "avg_word_len": (nc - (nw - 1)) / nw,
            "quality_ppm": ppm,
        }
    assert_keyed(
        run(spark, "llm_quality_score"),
        want,
        ["doc_id"],
        ["n_words", "stop_ratio", "avg_word_len", "quality_ppm"],
    )


# ------------------------- hash-deterministic ops via hashlib (wave 6)
# The md5-ranked walk/sampling/minhash operators are deterministic BY
# md5 — so Python's hashlib (an independent implementation of the same
# public standard) can recompute the full result, not just invariants.


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_random_walks_match_hashlib_replay(spark):
    edges = _edges()
    out: dict = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    roots = sorted({s for s, _ in edges if s % 5 == 0})
    want = {}
    for root in roots:
        path = [root]
        cur = root
        alive = True
        for t in range(1, 5):  # _WALK_LEN = 4
            nbrs = out.get(cur)
            if not nbrs:
                alive = False
                break
            cur = min(nbrs, key=lambda d: (_md5(f"{root}|{t}|{d}"), d))
            path.append(cur)
        if alive:
            want[(root,)] = {"path": "-".join(str(v) for v in path)}
    assert_keyed(run(spark, "graph_random_walks"), want, ["root"], ["path"])


def test_neighborhood_sampling_matches_hashlib_replay(spark):
    edges = _edges()
    out: dict = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    want = {}
    for root, nbrs in out.items():
        hop1s = sorted(nbrs, key=lambda d: (_md5(f"{root}_{d}"), d))[:5]
        for h1 in hop1s:
            cands = [d for d in out.get(h1, []) if d != root]
            for h2 in sorted(
                cands, key=lambda d: (_md5(f"{h1}_{d}"), d)
            )[:3]:
                want[(root, h1, h2)] = {}
    got = run(spark, "graph_neighborhood_sampling")
    gk = {
        (int(r.root), int(r.hop1), int(r.hop2)) for _, r in got.iterrows()
    }
    assert gk == set(want)


def test_minhash_jaccard_estimate_matches_hashlib_replay(spark):
    doc = _tbl("documents")
    ssets = {}
    for doc_id, text in zip(doc.doc_id, doc.text):
        words = text.split(" ")
        if len(words) >= 5:
            ssets[doc_id] = {
                " ".join(words[i : i + 5]) for i in range(len(words) - 4)
            }
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    buckets: dict = {}
    for d, sg in sigs.items():
        for band in range(4):
            bh = _md5(sg[2 * band] + sg[2 * band + 1])
            buckets.setdefault((band, bh), []).append(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cand.add((a, b))
    want = {}
    for a, b in cand:
        n_match = sum(1 for k in range(8) if sigs[a][k] == sigs[b][k])
        inter = len(ssets[a] & ssets[b])
        union = len(ssets[a] | ssets[b])
        want[(a, b)] = {
            "n_sig_match": n_match,
            "est_jaccard": n_match / 8.0,
            "exact_jaccard": inter / union,
        }
    assert_keyed(
        run(spark, "llm_minhash_jaccard_estimate"),
        want,
        ["id_a", "id_b"],
        ["n_sig_match", "est_jaccard", "exact_jaccard"],
    )


def test_simhash_matches_hashlib_replay(spark):
    doc = _tbl("documents")
    want = {}
    for doc_id, text in zip(doc.doc_id, doc.text):
        acc = [0] * 60
        for tok in set(text.split(" ")):
            h = _md5(tok)
            for p in range(1, 16):
                d = int(h[p - 1], 16)
                for b in range(4):
                    acc[(p - 1) * 4 + b] += 1 if (d >> b) & 1 else -1
        want[(doc_id,)] = {
            "simhash": "".join("1" if a >= 0 else "0" for a in acc)
        }
    assert_keyed(run(spark, "llm_simhash"), want, ["doc_id"], ["simhash"])


def test_doc_fingerprint_matches_hashlib_replay(spark):
    doc = _tbl("documents")
    want = {}
    for doc_id, text in zip(doc.doc_id, doc.text):
        fp = 0
        for pos, tok in enumerate(text.split(" "), start=1):
            h = _md5(tok)
            v = (
                int(h[0], 16) * 4096
                + int(h[1], 16) * 256
                + int(h[2], 16) * 16
                + int(h[3], 16)
            )
            fp += v * ((pos * 2654435761) % 1000003)
        want[(doc_id,)] = {"fingerprint": fp}
    assert_keyed(
        run(spark, "llm_doc_fingerprint"), want, ["doc_id"], ["fingerprint"]
    )


# ------------------------------------------------- graph core (wave 8)


def test_degree_matches_python_edges(spark):
    edges = _edges()
    outd: dict = {}
    ind: dict = {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    want = {
        (v,): {"out_degree": outd.get(v, 0), "in_degree": ind.get(v, 0)}
        for v in set(outd) | set(ind)
    }
    assert_keyed(
        run(spark, "graph_degree"), want, ["user_id"],
        ["out_degree", "in_degree"],
    )


def _adj(edges) -> dict:
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    return adj


def test_khop_fixed_matches_python(spark):
    # at sf0.001 vertex 0's 3-hop set is legitimately empty (0→7 is its
    # only path and 7 is a sink), so this check runs at sf0.01 where the
    # graph has ~1.3k edges and the composition is non-trivial.
    sf = "/root/testdata/sf0.01"
    adj = _adj(_edges(sf))
    s = {0}
    for _ in range(3):
        s = set().union(*(adj.get(v, set()) for v in s)) if s else set()
    got = set(QUERIES["graph_khop_fixed"](spark, sf).toPandas().user_id)
    assert got == s and got


def test_reachability_bfs_matches_python(spark):
    adj = _adj(_edges())
    dist = {0: 0}
    frontier = [0]
    for d in range(1, 11):
        nxt = []
        for v in frontier:
            for w in adj.get(v, set()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        if not nxt:
            break
        frontier = nxt
    want = {(v,): {"dist": d} for v, d in dist.items()}
    assert_keyed(run(spark, "graph_reachability_bfs"), want,
                 ["user_id"], ["dist"])


def test_shortest_path_matches_dijkstra(spark):
    import heapq

    nat = _tbl("nation")
    wadj: dict = {}
    for _, a in nat.iterrows():
        for _, b in nat.iterrows():
            if a.n_regionkey == b.n_regionkey and a.n_nationkey != b.n_nationkey:
                wadj.setdefault(a.n_nationkey, []).append(
                    (b.n_nationkey, abs(a.n_nationkey - b.n_nationkey))
                )
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        c, v = heapq.heappop(pq)
        if c > dist.get(v, float("inf")):
            continue
        for w, wt in wadj.get(v, []):
            nc = c + wt
            if nc < dist.get(w, float("inf")):
                dist[w] = nc
                heapq.heappush(pq, (nc, w))
    want = {(v,): {"dist": c} for v, c in dist.items()}
    assert_keyed(run(spark, "graph_shortest_path_weighted"), want,
                 ["nationkey"], ["dist"])


def test_connected_components_matches_union_find(spark):
    edges = _edges()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    verts = {v for e in edges for v in e}
    comps: dict = {}
    for v in verts:
        comps.setdefault(find(v), []).append(v)
    want = {}
    for members in comps.values():
        lab = min(members)
        for v in members:
            want[(v,)] = {"component": lab}
    assert_keyed(run(spark, "graph_connected_components"), want,
                 ["user_id"], ["component"])


def test_scc_matches_tarjan(spark):
    edges = _edges()
    adj = _adj(edges)
    verts = sorted({v for e in edges for v in e})
    # iterative Tarjan (explicit stack; the fixture graph is small but
    # recursion depth is O(|V|) in the worst case)
    index: dict = {}
    low: dict = {}
    onstk: set = set()
    stk: list = []
    counter = [0]
    scc_of: dict = {}
    for root in verts:
        if root in index:
            continue
        work = [(root, iter(sorted(adj.get(root, set()))))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stk.append(root)
        onstk.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stk.append(w)
                    onstk.add(w)
                    work.append((w, iter(sorted(adj.get(w, set())))))
                    advanced = True
                    break
                if w in onstk:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    members.append(w)
                    if w == v:
                        break
                lab = min(members)
                for w in members:
                    scc_of[w] = lab
    want = {(v,): {"scc": scc_of[v]} for v in verts}
    assert_keyed(run(spark, "graph_scc"), want, ["user_id"], ["scc"])


def test_triangle_count_matches_python(spark):
    und: dict = {}
    for s, d in _edges():
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)
    tri: dict = {}
    for a in und:
        for b in und[a]:
            if b <= a:
                continue
            for c in und[a] & und[b]:
                if c > b:
                    for v in (a, b, c):
                        tri[v] = tri.get(v, 0) + 1
    want = {(v,): {"n_triangles": c} for v, c in tri.items()}
    assert_keyed(run(spark, "graph_triangle_count"), want,
                 ["user_id"], ["n_triangles"])


def test_aggregate_messages_matches_pandas(spark):
    ev = _tbl("events")
    vmap = (
        pd.DataFrame({"u": ev.user_id, "c": cents(ev.value)})
        .groupby("u")["c"].sum().to_dict()
    )
    n_msgs: dict = {}
    tot: dict = {}
    for s, d in _edges():
        if s in vmap:
            n_msgs[d] = n_msgs.get(d, 0) + 1
            tot[d] = tot.get(d, 0) + vmap[s]
    want = {
        (v,): {"n_msgs": n_msgs[v], "neighbor_value_sum": tot[v] / 100.0}
        for v in n_msgs
    }
    assert_keyed(run(spark, "graph_aggregate_messages"), want,
                 ["user_id"], ["n_msgs", "neighbor_value_sum"])


def test_copurchase_matches_python(spark):
    li = _tbl("lineitem")
    baskets: dict = {}
    for ok, pk in set(zip(li.l_orderkey, li.l_partkey)):
        baskets.setdefault(ok, set()).add(pk)
    pairs: dict = {}
    for parts in baskets.values():
        if len(parts) > 15:  # _BASKET_CAP, from the operator's contract
            continue
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = {k: {"n_orders": c} for k, c in pairs.items()}
    assert_keyed(run(spark, "graph_copurchase"), want,
                 ["part_a", "part_b"], ["n_orders"])


def test_personalized_pagerank_matches_replay(spark):
    edges = sorted(_edges())
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    ind = np.array([1.0 if v % 10 == 0 else 0.0 for v in verts])
    k = ind.sum()
    pr = ind / k
    for _ in range(8):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += pr[idx[s]] / outdeg[idx[s]]
        dangling = pr[outdeg == 0].sum()
        pr = 0.15 * ind / k + 0.85 * (inflow + dangling * ind / k)
        pr = np.floor(pr * 1e6 + 0.5) / 1e6  # per-iteration round-half-up
    want = {
        (v,): {"ppr": pr[idx[v]]} for v in verts if pr[idx[v]] > 0.0
    }
    assert_keyed(run(spark, "graph_personalized_pagerank"), want,
                 ["v"], ["ppr"], tol=2e-6)


# ------------------------------------------- sketch replays (wave 9)


def test_hll_from_scratch_matches_hashlib_replay(spark):
    ev = _tbl("events")
    regs: dict = {}
    exact: dict = {}
    for et, uid in zip(ev.event_type, ev.user_id):
        exact.setdefault(et, set()).add(uid)
        v = int(_md5(str(uid))[:10], 16)
        bucket, w = v // 2**32, v % 2**32
        rho = 33 if w == 0 else 33 - w.bit_length()
        r = regs.setdefault(et, {})
        r[bucket] = max(r.get(bucket, 0), rho)
    alpha = 0.7213 / (1.0 + 1.079 / 256)
    want = {}
    for et, r in regs.items():
        zz = sum(2.0 ** -m for m in r.values()) + (256 - len(r))
        v_empty = 256 - len(r)
        e = alpha * 256 * 256 / zz
        if e <= 640.0 and v_empty > 0:
            e = 256.0 * math.log(256.0 / v_empty)
        n = len(exact[et])
        want[(et,)] = {
            "n_exact": n,
            "hll_estimate": e,
            "rel_err": (e - n) / n,
        }
    assert_keyed(
        run(spark, "agg_hll_from_scratch"), want, ["event_type"],
        ["n_exact", "hll_estimate", "rel_err"], tol=2e-6,
    )


def test_countmin_sketch_matches_hashlib_replay(spark):
    doc = _tbl("documents")
    freq: dict = {}
    for text in doc.text:
        for tok in text.split(" "):
            freq[tok] = freq.get(tok, 0) + 1
    sketch = [dict() for _ in range(4)]
    cell_of: dict = {}
    for tok, cnt in freq.items():
        for i in range(4):
            cell = int(_md5(f"{i}:{tok}")[:8], 16) % 256
            cell_of[(i, tok)] = cell
            sketch[i][cell] = sketch[i].get(cell, 0) + cnt
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {}
    for tok, cnt in top:
        est = min(sketch[i][cell_of[(i, tok)]] for i in range(4))
        want[(tok,)] = {
            "exact_cnt": cnt, "cm_estimate": est, "overcount": est - cnt,
        }
    assert_keyed(
        run(spark, "agg_countmin_sketch"), want, ["tok"],
        ["exact_cnt", "cm_estimate", "overcount"],
    )


def test_bloom_from_scratch_matches_hashlib_replay(spark):
    cust = _tbl("customer")
    build = [k for k, s in zip(cust.c_custkey, cust.c_mktsegment)
             if s == "BUILDING"]
    probe = [k for k, s in zip(cust.c_custkey, cust.c_mktsegment)
             if s == "MACHINERY"]

    def bits3(key):
        return {int(_md5(f"{i}:{key}")[:8], 16) % 4096 for i in range(3)}

    bits = set().union(*(bits3(k) for k in build)) if build else set()
    # textbook membership: positive iff EVERY one of the probe key's own
    # (distinct) bits is set — a key whose 3 hashes collide to 2 bits is
    # still positive when both are set
    positives = sum(1 for k in probe if bits3(k) <= bits)
    got = run(spark, "agg_bloom_from_scratch").iloc[0]
    assert int(got.n_build) == len(build)
    assert int(got.n_probe) == len(probe)
    assert int(got.bits_set) == len(bits)
    assert int(got.bloom_positives) == positives


# --------------------------- deterministic md5 ops, wave 10 (hashlib)


def test_sample_hash_deterministic_matches_hashlib(spark):
    o = _tbl("orders")
    want = {
        (int(r.o_orderkey),): {
            "o_custkey": r.o_custkey, "o_totalprice": r.o_totalprice,
        }
        for _, r in o.iterrows()
        if _md5(str(r.o_orderkey))[0] in "0123"
    }
    assert_keyed(run(spark, "sample_hash_deterministic"), want,
                 ["o_orderkey"], ["o_custkey", "o_totalprice"])


def test_sample_stratified_hash_matches_hashlib(spark):
    c = _tbl("customer")
    by_seg: dict = {}
    for _, r in c.iterrows():
        by_seg.setdefault(r.c_mktsegment, []).append(int(r.c_custkey))
    want = {}
    for seg, keys in by_seg.items():
        for k in sorted(keys, key=lambda k: (_md5(str(k)), k))[:20]:
            want[(k,)] = {"c_mktsegment": seg}
    assert_keyed(run(spark, "sample_stratified_hash"), want,
                 ["c_custkey"], ["c_mktsegment"])


def test_train_split_matches_hashlib(spark):
    doc = _tbl("documents")
    want = {}
    for d in doc.doc_id:
        b = int(_md5(str(d))[:2], 16) % 100
        want[(d,)] = {
            "bucket": b,
            "split": "train" if b < 80 else ("val" if b < 90 else "test"),
        }
    assert_keyed(run(spark, "llm_train_split"), want,
                 ["doc_id"], ["bucket", "split"])


def test_shuffle_shard_matches_hashlib(spark):
    doc = _tbl("documents")
    rows = [(d, _md5(str(d))) for d in doc.doc_id]
    shards: dict = {}
    for d, hk in rows:
        shards.setdefault(int(hk[:2], 16) % 8, []).append((hk, d))
    want = {}
    for shard, members in shards.items():
        for pos, (hk, d) in enumerate(sorted(members), start=1):
            want[(d,)] = {"shard": shard, "pos": pos}
    assert_keyed(run(spark, "llm_shuffle_shard"), want,
                 ["doc_id"], ["shard", "pos"])


def test_mixture_sample_matches_hashlib(spark):
    doc = _tbl("documents")
    thr = {"en": 102, "zh": 205}
    want = {}
    for _, r in doc.iterrows():
        if int(_md5(str(r.doc_id))[:2], 16) < thr.get(r.lang, 256):
            want[(r.doc_id,)] = {"lang": r.lang, "source": r.source}
    assert_keyed(run(spark, "llm_mixture_sample"), want,
                 ["doc_id"], ["lang", "source"])


def test_feature_hashing_matches_hashlib(spark):
    ev = _tbl("events")
    want = {
        (e,): {
            "type_idx": int(_md5(t)[:4], 16) % 1024,
            "cohort_idx": int(_md5(str(u % 50))[:4], 16) % 1024,
        }
        for e, t, u in zip(ev.event_id, ev.event_type, ev.user_id)
    }
    assert_keyed(run(spark, "llm_feature_hashing"), want,
                 ["event_id"], ["type_idx", "cohort_idx"])


def _shingle_sets_py(texts: dict) -> dict:
    """doc_id -> distinct 5-word shingle set, for docs with >= 5 words."""
    out = {}
    for d, text in texts.items():
        w = text.split(" ")
        if len(w) >= 5:
            out[d] = {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}
    return out


def test_shingle_minhash_matches_hashlib(spark):
    doc = _tbl("documents")
    ssets = _shingle_sets_py(dict(zip(doc.doc_id, doc.text)))
    want = {}
    for d, ss in ssets.items():
        row = {"n_shingles": len(ss)}
        for k in range(8):
            row[f"sig{k}"] = min(_md5(f"s{k}|" + s) for s in ss)
        want[(d,)] = row
    assert_keyed(
        run(spark, "llm_shingle_minhash"), want, ["doc_id"],
        ["n_shingles"] + [f"sig{k}" for k in range(8)],
    )


def test_neardup_lsh_matches_hashlib(spark):
    doc = _tbl("documents")
    ssets = _shingle_sets_py(dict(zip(doc.doc_id, doc.text)))
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    buckets: dict = {}
    for d, sg in sigs.items():
        for b in range(4):
            buckets.setdefault((b, _md5(sg[2 * b] + sg[2 * b + 1])),
                               []).append(d)
    want = {}
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                j = len(ssets[a] & ssets[b]) / len(ssets[a] | ssets[b])
                if j >= 0.2:
                    want[(a, b)] = {"jaccard": _rhu6(j)}
    assert_keyed(run(spark, "llm_neardup_lsh"), want,
                 ["id_a", "id_b"], ["jaccard"])


def _simhash_py(text: str) -> str:
    acc = [0] * 60
    for tok in set(text.split(" ")):
        h = _md5(tok)
        for p in range(1, 16):
            d = int(h[p - 1], 16)
            for b in range(4):
                acc[(p - 1) * 4 + b] += 1 if (d >> b) & 1 else -1
    return "".join("1" if a >= 0 else "0" for a in acc)


def test_simhash_neardup_matches_hashlib(spark):
    doc = _tbl("documents")
    corpus = dict(zip(doc.doc_id, doc.text))
    for d, text in list(corpus.items()):
        w = text.split(" ")
        corpus[d + 1000000] = " ".join(w[:-1])
    sh = {d: _simhash_py(t) for d, t in corpus.items()}
    buckets: dict = {}
    for d, s in sh.items():
        for b in range(4):
            buckets.setdefault((b, s[15 * b:15 * b + 15]), []).append(d)
    want = {}
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                ham = sum(1 for x, y in zip(sh[a], sh[b]) if x != y)
                if ham <= 3:
                    want[(a, b)] = {"hamming": ham}
    assert_keyed(run(spark, "llm_simhash_neardup"), want,
                 ["id_a", "id_b"], ["hamming"])


def test_winnowing_fingerprint_matches_hashlib(spark):
    doc = _tbl("documents")
    want = {}
    for d, text in zip(doc.doc_id, doc.text):
        if text is None:
            continue
        np_ = min(len(text), 200) - 8 + 1
        hs = [_md5(text[p:p + 8])[:8] for p in range(np_)]
        wmins = {min(hs[p:p + 4]) for p in range(np_ - 3)}
        want[(d,)] = {
            "fingerprint": ",".join(sorted(wmins)),
            "n_marks": len(wmins),
        }
    assert_keyed(run(spark, "llm_winnowing_fingerprint"), want,
                 ["doc_id"], ["fingerprint", "n_marks"])


def test_containment_dedup_matches_hashlib(spark):
    doc = _tbl("documents")
    corpus = dict(zip(doc.doc_id, doc.text))
    for d, text in list(corpus.items()):
        if d % 4 == 0:
            w = text.split(" ")
            corpus[d + 100000] = " ".join(w[:(3 * len(w)) // 5])
    ch: dict = {}  # doc -> set of chunk hashes (distinct)
    for d, text in corpus.items():
        w = text.split(" ")
        hs = set()
        s = 0
        while s <= len(w) - 8:
            hs.add(_md5(" ".join(w[s:s + 8])))
            s += 4
        ch[d] = hs
    df: dict = {}
    for hs in ch.values():
        for h in hs:
            df[h] = df.get(h, 0) + 1
    hot = {h for h, c in df.items() if c > 20}
    cf = {d: hs - hot for d, hs in ch.items()}
    want = {}
    for a in cf:
        for b in cf:
            if a == b or not cf[a]:
                continue
            shared = len(cf[a] & cf[b])
            cont = shared / len(cf[a])
            if cont >= 0.5:
                want[(a, b)] = {
                    "shared": shared, "n_src": len(cf[a]),
                    "containment": _rhu6(cont),
                }
    assert_keyed(run(spark, "llm_containment_dedup"), want,
                 ["src_doc", "dst_doc"], ["shared", "n_src", "containment"])


# ----------------------- text / tokenization replays (wave 11)


def test_langid_ngram_matches_python(spark):
    doc = _tbl("documents")
    profile: dict = {}
    doc_tok: dict = {}
    for d, lang, text in zip(doc.doc_id, doc.lang, doc.text):
        for tok in text.split(" "):
            profile.setdefault(lang, {})
            profile[lang][tok] = profile[lang].get(tok, 0) + 1
            dt = doc_tok.setdefault(d, {})
            dt[tok] = dt.get(tok, 0) + 1
    want = {}
    for d, toks in doc_tok.items():
        scores = {
            lang: sum(c * p[tok] for tok, c in toks.items() if tok in p)
            for lang, p in profile.items()
        }
        best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] > 0:
            want[(d,)] = {"pred_lang": best[0], "score": best[1]}
        else:
            # zero-score languages still produce rows via the join only
            # when a token matches; recompute rows that exist
            nz = {k: v for k, v in scores.items() if v > 0}
            b = min(nz.items(), key=lambda kv: (-kv[1], kv[0]))
            want[(d,)] = {"pred_lang": b[0], "score": b[1]}
    assert_keyed(run(spark, "llm_langid_ngram"), want,
                 ["doc_id"], ["pred_lang", "score"])


def test_quality_score_matches_python(spark):
    doc = _tbl("documents")
    stop = {"the", "a", "of", "and", "to"}
    want = {}
    for d, text in zip(doc.doc_id, doc.text):
        if text is None:
            continue
        w = text.split(" ")
        nw, nc = len(w), len(text)
        ns = sum(1 for t in w if t in stop)
        ppm = (
            4000 * min(nw, 100)
            + (300000 - ns * 300000 // nw)
            + min((nc - (nw - 1)) * 300000 // (8 * nw), 300000)
        )
        want[(d,)] = {
            "n_words": nw,
            "stop_ratio": _rhu6(ns / nw),
            "avg_word_len": _rhu6((nc - (nw - 1)) / nw),
            "quality_ppm": ppm,
        }
    assert_keyed(
        run(spark, "llm_quality_score"), want, ["doc_id"],
        ["n_words", "stop_ratio", "avg_word_len", "quality_ppm"],
    )


def test_tokenize_bpe_regex_matches_python(spark):
    import re

    pat = re.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
    doc = _tbl("documents")
    want = {
        (d,): {"n_pieces": len(pat.findall(t)), "n_chars_m": len(t)}
        for d, t in zip(doc.doc_id, doc.text) if t is not None
    }
    assert_keyed(run(spark, "llm_tokenize_bpe_regex"), want,
                 ["doc_id"], ["n_pieces", "n_chars_m"])


def test_pii_scrub_matches_python(spark):
    import re

    email = re.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}")
    num = re.compile("[0-9]{9,}")
    doc = _tbl("documents")
    want = {}
    for d, text in zip(doc.doc_id, doc.text):
        if text is None:
            continue
        t = f"{text} contact-{d}@example.com ph 555123{4000000 + d}"
        clean = num.sub("[NUM]", email.sub("[EMAIL]", t))
        want[(d,)] = {
            "n_emails": len(email.findall(t)),
            "n_longnums": len(num.findall(t)),
            "clean_md5": _md5(clean),
            "clean_len": len(clean),
        }
    assert_keyed(
        run(spark, "llm_pii_scrub"), want, ["doc_id"],
        ["n_emails", "n_longnums", "clean_md5", "clean_len"],
    )


def test_text_stats_matches_pandas(spark):
    doc = _tbl("documents")
    want = {}
    for (lang, src), g in doc.groupby(["lang", "source"]):
        texts = [t for t in g.text if t is not None]
        want[(lang, src)] = {
            "n_docs": len(g),
            "total_chars": int(g.n_chars.sum()),
            "avg_words": sum(len(t.split(" ")) for t in texts) / len(g),
            "n_bad_nchars": int(
                sum(1 for nc, t in zip(g.n_chars, g.text)
                    if t is not None and nc != len(t))
            ),
        }
    assert_keyed(
        run(spark, "llm_text_stats"), want, ["lang", "source"],
        ["n_docs", "total_chars", "avg_words", "n_bad_nchars"],
    )


def test_tokenize_wordcount_matches_python(spark):
    doc = _tbl("documents")
    tot: dict = {}
    docs: dict = {}
    for d, text in zip(doc.doc_id, doc.text):
        for w in text.split(" "):
            tot[w] = tot.get(w, 0) + 1
            docs.setdefault(w, set()).add(d)
    want = {(w,): {"n_total": c, "n_docs": len(docs[w])}
            for w, c in tot.items()}
    assert_keyed(run(spark, "llm_tokenize_wordcount"), want,
                 ["word"], ["n_total", "n_docs"])


def test_exact_dedup_matches_python(spark):
    # round 12: the key is sha256(text) (32-byte collision-resistant
    # shuffle keys at 100 TB — md5 collisions are constructible); the
    # replay hashes with hashlib, independent of both engines
    import hashlib

    doc = _tbl("documents")
    want: dict = {}
    for d, text in zip(doc.doc_id, doc.text):
        key = (
            hashlib.sha256(text.encode()).hexdigest()
            if text is not None else None
        )
        cur = want.setdefault((key,), {"keep_id": d, "n_copies": 0})
        cur["keep_id"] = min(cur["keep_id"], d)
        cur["n_copies"] += 2  # corpus = documents UNION ALL documents
    assert_keyed(run(spark, "llm_exact_dedup"), want,
                 ["text_sha"], ["keep_id", "n_copies"])


def test_repetition_score_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, text in zip(doc.doc_id, doc.text):
        w = text.split(" ")
        if len(w) < 2:
            continue
        cnt: dict = {}
        for i in range(len(w) - 1):
            bg = w[i] + " " + w[i + 1]
            cnt[bg] = cnt.get(bg, 0) + 1
        top = max(cnt.values())
        nb = len(w) - 1
        want[(d,)] = {
            "top_cnt": top,
            "n_bigrams": nb,
            "n_distinct": len(cnt),
            "rep_ratio": _rhu6(top / nb),
            "distinct_ratio": _rhu6(len(cnt) / nb),
        }
    assert_keyed(
        run(spark, "llm_repetition_score"), want, ["doc_id"],
        ["top_cnt", "n_bigrams", "n_distinct", "rep_ratio",
         "distinct_ratio"],
    )


# ------------------------- dedup pipeline replays (wave 12)

import re as _re


def _norm_hash(text: str) -> str:
    t = _re.sub(" +", " ", _re.sub("[^a-z0-9 ]", "", text.lower()))
    return _md5(t.strip(" "))


def test_normalized_dedup_matches_python(spark):
    doc = _tbl("documents")
    corpus = dict(zip(doc.doc_id, doc.text))
    for d, t in list(corpus.items()):
        if d % 5 == 0:
            corpus[d + 200000] = t.upper() + " !!"
    want: dict = {}
    for d, t in corpus.items():
        k = (_norm_hash(t),)
        cur = want.setdefault(k, {"keep_id": d, "n_variants": 0})
        cur["keep_id"] = min(cur["keep_id"], d)
        cur["n_variants"] += 1
    assert_keyed(run(spark, "llm_normalized_dedup"), want,
                 ["nh"], ["keep_id", "n_variants"])


def test_dedup_keep_best_matches_python(spark):
    doc = _tbl("documents")
    corpus = {d: t for d, t in zip(doc.doc_id, doc.text) if t is not None}
    for d, t in list(corpus.items()):
        if d % 5 == 0:
            corpus[d + 200000] = t.upper() + " !!"
    groups: dict = {}
    for d, t in corpus.items():
        groups.setdefault(_norm_hash(t), []).append((d, len(t)))
    want = {}
    for nh, members in groups.items():
        best = min(members, key=lambda m: (-m[1], m[0]))
        want[(nh,)] = {
            "keep_id": best[0], "keep_chars": best[1],
            "n_variants": len(members),
        }
    assert_keyed(run(spark, "llm_dedup_keep_best"), want,
                 ["nh"], ["keep_id", "keep_chars", "n_variants"])


def test_cross_source_overlap_matches_python(spark):
    doc = _tbl("documents")
    rows = list(zip(doc.doc_id, doc.text, doc.source))
    rows += [(d, t, "refresh") for d, t, _ in rows if d % 3 == 0]
    agg: dict = {}
    for d, t, s in rows:
        cur = agg.setdefault(_md5(t), {"n": 0, "srcs": set(), "first": d})
        cur["n"] += 1
        cur["srcs"].add(s)
        cur["first"] = min(cur["first"], d)
    want = {
        (h,): {"n_docs": c["n"], "n_sources": len(c["srcs"]),
               "first_doc": c["first"]}
        for h, c in agg.items() if len(c["srcs"]) > 1
    }
    assert_keyed(run(spark, "llm_cross_source_overlap"), want,
                 ["text_md5"], ["n_docs", "n_sources", "first_doc"])


def test_snapshot_diff_matches_python(spark):
    doc = _tbl("documents")
    a = {d: _md5(t) for d, t in zip(doc.doc_id, doc.text)}
    b = {
        d: _md5(t + " EDIT") if d % 9 == 0 else _md5(t)
        for d, t in zip(doc.doc_id, doc.text) if d % 11 != 0
    }
    for i in range(1, 51):
        b[900000 + i] = _md5(f"new doc {i}")
    want = {}
    for d in set(a) | set(b):
        if d not in a:
            st = "added"
        elif d not in b:
            st = "removed"
        elif a[d] != b[d]:
            st = "changed"
        else:
            st = "unchanged"
        want[(d,)] = {"status": st}
    assert_keyed(run(spark, "llm_snapshot_diff"), want,
                 ["doc_id"], ["status"])


def test_chunk_windows_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, t in zip(doc.doc_id, doc.text):
        if t is None:
            continue
        w = t.split(" ")
        for s in range(0, len(w), 48):
            chunk = w[s:s + 64]
            want[(d, s // 48)] = {
                "n_toks": len(chunk),
                "chunk_md5": _md5(" ".join(chunk)),
            }
    assert_keyed(run(spark, "llm_chunk_windows"), want,
                 ["doc_id", "chunk_idx"], ["n_toks", "chunk_md5"])


def test_pack_sequences_matches_python(spark):
    doc = _tbl("documents")
    by_src: dict = {}
    for d, t, s in zip(doc.doc_id, doc.text, doc.source):
        if t is not None:
            by_src.setdefault(s, []).append((d, len(t.split(" "))))
    want = {}
    for s, docs in by_src.items():
        start = 0
        for d, n in sorted(docs):
            want[(d,)] = {
                "source": s, "n_tok": n,
                "pack_id": start // 512, "pack_offset": start % 512,
            }
            start += n
    assert_keyed(run(spark, "llm_pack_sequences"), want, ["doc_id"],
                 ["source", "n_tok", "pack_id", "pack_offset"])


def _trigram_sets(texts: dict) -> dict:
    out = {}
    for d, t in texts.items():
        w = t.split(" ")
        if len(w) >= 3:
            out[d] = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    return out


def test_contamination_ngram_matches_python(spark):
    doc = _tbl("documents")
    tri = _trigram_sets(dict(zip(doc.doc_id, doc.text)))
    ev = set().union(*(s for d, s in tri.items() if d % 97 == 0))
    want = {}
    for d, s in tri.items():
        if d % 97 == 0:
            continue
        hit = len(s & ev)
        if hit:
            want[(d,)] = {
                "n_tri": len(s), "n_hit": hit,
                "contamination": _rhu6(hit / len(s)),
            }
    assert_keyed(run(spark, "llm_contamination_ngram"), want,
                 ["doc_id"], ["n_tri", "n_hit", "contamination"])


def test_ngram_jaccard_matches_python(spark):
    doc = _tbl("documents")
    corpus = dict(zip(doc.doc_id, doc.text))
    for d, t in list(corpus.items()):
        w = t.split(" ")
        corpus[d + 1000000] = " ".join(w[:-1])
    ssets = _shingle_sets_py(corpus)
    df: dict = {}
    for ss in ssets.values():
        for s in ss:
            df[s] = df.get(s, 0) + 1
    kept = {s for s, c in df.items() if c <= 64}
    posting: dict = {}
    for d, ss in ssets.items():
        for s in ss & kept:
            posting.setdefault(s, []).append(d)
    cand = set()
    for docs in posting.values():
        ds = sorted(docs)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    want = {}
    for a, b in cand:
        inter = len(ssets[a] & ssets[b])
        jac = inter / (len(ssets[a]) + len(ssets[b]) - inter)
        if jac >= 0.5:
            want[(a, b)] = {"jac": _rhu6(jac)}
    assert_keyed(run(spark, "llm_ngram_jaccard"), want,
                 ["id_a", "id_b"], ["jac"])


def test_dedup_groups_matches_python(spark):
    doc = _tbl("documents")
    ssets = _shingle_sets_py(dict(zip(doc.doc_id, doc.text)))
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    buckets: dict = {}
    for d, sg in sigs.items():
        for b in range(4):
            buckets.setdefault((b, _md5(sg[2 * b] + sg[2 * b + 1])),
                               []).append(d)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                j = len(ssets[a] & ssets[b]) / len(ssets[a] | ssets[b])
                if j >= 0.2:
                    pairs.add((a, b))
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps: dict = {}
    for v in {v for p in pairs for v in p}:
        comps.setdefault(find(v), []).append(v)
    want = {}
    for members in comps.values():
        keep = min(members)
        for v in members:
            want[(v,)] = {"keep_id": keep, "n_members": len(members)}
    assert_keyed(run(spark, "llm_dedup_groups"), want,
                 ["doc_id"], ["keep_id", "n_members"])


# ------------------------------ mixing / weighting ops (wave 13)


def test_length_filter_percentile_matches_numpy(spark):
    doc = _tbl("documents")
    bounds = {}
    for lang, g in doc.groupby("lang"):
        v = g.n_chars.to_numpy(dtype=np.float64)
        bounds[lang] = (
            math.ceil(_rhu6(float(np.percentile(v, 5, method="linear")))),
            math.floor(_rhu6(float(np.percentile(v, 95, method="linear")))),
        )
    want = {
        (r.doc_id,): {"lang": r.lang, "n_chars": r.n_chars}
        for _, r in doc.iterrows()
        if bounds[r.lang][0] <= r.n_chars <= bounds[r.lang][1]
    }
    assert_keyed(run(spark, "llm_length_filter_percentile"), want,
                 ["doc_id"], ["lang", "n_chars"])


def test_vocab_coverage_matches_python(spark):
    doc = _tbl("documents")
    cnt: dict = {}
    for t in doc.text:
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
    vocab = {w for w, _ in
             sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
    want = {}
    for d, t in zip(doc.doc_id, doc.text):
        ws = t.split(" ")
        oov = sum(1 for w in ws if w not in vocab)
        want[(d,)] = {
            "n_toks": len(ws), "n_oov": oov,
            "oov_rate": _rhu6(oov / len(ws)),
        }
    assert_keyed(run(spark, "llm_vocab_coverage"), want,
                 ["doc_id"], ["n_toks", "n_oov", "oov_rate"])


def test_bpe_pair_counts_matches_python(spark):
    doc = _tbl("documents")
    freq: dict = {}
    for t in doc.text:
        for w in t.split(" "):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    pairs: dict = {}
    for w, f in freq.items():
        for i in range(len(w) - 1):
            p = w[i:i + 2]
            pairs[p] = pairs.get(p, 0) + f
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {(p,): {"n": n} for p, n in top}
    assert_keyed(run(spark, "llm_bpe_pair_counts"), want, ["pair"], ["n"])


def _unigram_nll_py(doc) -> dict:
    cnt: dict = {}
    total = 0
    for t in doc.text:
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
            total += 1
    v = len(cnt)
    out = {}
    for d, t in zip(doc.doc_id, doc.text):
        ws = t.split(" ")
        nll = sum(-math.log((cnt[w] + 1.0) / (total + v)) for w in ws)
        out[d] = _rhu6(nll / len(ws))
    return out


def test_perplexity_bucket_matches_python(spark):
    doc = _tbl("documents")
    nll = _unigram_nll_py(doc)
    lang_of = dict(zip(doc.doc_id, doc.lang))
    by_lang: dict = {}
    for d, s in nll.items():
        by_lang.setdefault(lang_of[d], []).append(s)
    cuts = {
        lang: (
            _rhu6(float(np.percentile(v, 100 / 3, method="linear"))),
            _rhu6(float(np.percentile(v, 200 / 3, method="linear"))),
        )
        for lang, v in by_lang.items()
    }
    want = {}
    for d, s in nll.items():
        t1, t2 = cuts[lang_of[d]]
        b = "head" if s <= t1 else ("middle" if s <= t2 else "tail")
        want[(d,)] = {"lang": lang_of[d], "mean_nll": s, "bucket": b}
    assert_keyed(
        run(spark, "llm_perplexity_bucket"), want, ["doc_id"],
        ["lang", "mean_nll", "bucket"], tol=2e-6,
    )


def test_importance_resample_matches_python(spark):
    doc = _tbl("documents")
    raw: dict = {}
    tgt: dict = {}
    total_r = total_t = 0
    for t, lang in zip(doc.text, doc.lang):
        for w in t.split(" "):
            raw[w] = raw.get(w, 0) + 1
            total_r += 1
            if lang == "en":
                tgt[w] = tgt.get(w, 0) + 1
                total_t += 1
    v = len(raw)
    ws = {}
    for d, t in zip(doc.doc_id, doc.text):
        toks = t.split(" ")
        s = sum(
            math.log((tgt.get(w, 0) + 1.0) / (total_t + v))
            - math.log((raw[w] + 1.0) / (total_r + v))
            for w in toks
        )
        ws[d] = _rhu6(s / len(toks))
    vals = np.array(sorted(ws.values()))
    t7, t8, t9 = (
        _rhu6(float(np.percentile(vals, q, method="linear")))
        for q in (70, 80, 90)
    )
    want = {}
    for d, w in ws.items():
        if w > t7:
            want[(d,)] = {
                "w": w, "decile": 8 if w <= t8 else (9 if w <= t9 else 10),
            }
    assert_keyed(run(spark, "llm_importance_resample"), want,
                 ["doc_id"], ["w", "decile"], tol=2e-6)


# --------------------------------- TPC-H recomputation (wave 14)


def test_tpch_q16_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    sup = _tbl("supplier")
    bad = set(sup.s_suppkey[sup.s_acctbal < 1500])
    pf = p[
        (p.p_brand != "Brand#1")
        & ~p.p_type.str.startswith("PROMO")
        & p.p_size.isin([1, 5, 10, 15, 20, 25])
    ]
    attrs = {
        r.p_partkey: (r.p_brand, r.p_type, r.p_size)
        for _, r in pf.iterrows()
    }
    got_suppliers: dict = {}
    for pk, sk in zip(li.l_partkey, li.l_suppkey):
        if pk in attrs and sk not in bad:
            got_suppliers.setdefault(attrs[pk], set()).add(sk)
    want = {k: {"supplier_cnt": len(v)} for k, v in got_suppliers.items()}
    assert_keyed(run(spark, "tpch_q16_supplier_cnt"), want,
                 ["p_brand", "p_type", "p_size"], ["supplier_cnt"])


def test_tpch_q17_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    half = {
        pk: 0.5 * (g.sum() / len(g))
        for pk, g in li.groupby("l_partkey")["l_quantity"]
    }
    brand7 = set(p.p_partkey[p.p_brand == "Brand#7"])
    tot_cents = sum(
        int(c) for pk, q, c in
        zip(li.l_partkey, li.l_quantity, cents(li.l_extendedprice))
        if pk in brand7 and q < half[pk]
    )
    got = run(spark, "tpch_q17_small_qty_revenue").iloc[0]
    assert close(got.avg_yearly, _rhu6(tot_cents / 100 / 7.0), 1e-6)


def test_tpch_q18_matches_pandas(spark):
    li = _tbl("lineitem")
    o = _tbl("orders")
    c = _tbl("customer")
    qty = li.groupby("l_orderkey")["l_quantity"].sum()
    big = set(qty[qty > 250].index)
    names = dict(zip(c.c_custkey, c.c_name))
    rows = []
    for _, r in o[o.o_orderkey.isin(big)].iterrows():
        rows.append((
            r.o_custkey, names[r.o_custkey], r.o_orderkey,
            pd.Timestamp(r.o_orderdate).strftime("%Y-%m-%d"),
            r.o_totalprice, float(qty[r.o_orderkey]),
        ))
    rows.sort(key=lambda t: (-t[4], t[2]))
    want = {
        (t[2],): {
            "c_custkey": t[0], "c_name": t[1], "o_orderdate_s": t[3],
            "o_totalprice": t[4], "total_qty": t[5],
        }
        for t in rows[:20]
    }
    assert_keyed(
        run(spark, "tpch_q18_large_orders"), want, ["o_orderkey"],
        ["c_custkey", "c_name", "o_orderdate_s", "o_totalprice",
         "total_qty"],
    )


def test_tpch_q20_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    sup = _tbl("supplier")
    widget = set(p.p_partkey[p.p_name.str.contains("widget")])
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    q: dict = {}
    for pk, sk, qt, sd in zip(li.l_partkey, li.l_suppkey,
                              li.l_quantity, li.l_shipdate):
        if pk in widget and lo <= sd < hi:
            q[(pk, sk)] = q.get((pk, sk), 0) + qt
    per_part: dict = {}
    for (pk, _), sq in q.items():
        per_part.setdefault(pk, []).append(sq)
    hot = {
        sk for (pk, sk), sq in q.items()
        if sq > 1.5 * (sum(per_part[pk]) / len(per_part[pk]))
    }
    names = dict(zip(sup.s_suppkey, sup.s_name))
    want = {(sk,): {"s_name": names[sk]} for sk in hot}
    assert_keyed(run(spark, "tpch_q20_part_promotion"), want,
                 ["s_suppkey"], ["s_name"])


def test_tpch_q21_matches_pandas(spark):
    li = _tbl("lineitem")
    o = _tbl("orders")
    sup = _tbl("supplier")
    f_orders = set(o.o_orderkey[o.o_orderstatus == "F"])
    ms: dict = {}
    for ok, sk, sd in zip(li.l_orderkey, li.l_suppkey, li.l_shipdate):
        if ok in f_orders:
            k = (ok, sk)
            ms[k] = max(ms.get(k, sd), sd)
    per_order: dict = {}
    for (ok, sk), d in ms.items():
        per_order.setdefault(ok, []).append((sk, d))
    waits: dict = {}
    names = dict(zip(sup.s_suppkey, sup.s_name))
    for ok, lst in per_order.items():
        if len(lst) < 2:
            continue
        m = max(d for _, d in lst)
        last = [sk for sk, d in lst if d == m]
        if len(last) == 1:
            nm = names[last[0]]
            waits[nm] = waits.get(nm, 0) + 1
    top = sorted(waits.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {(nm,): {"numwait": n} for nm, n in top}
    assert_keyed(run(spark, "tpch_q21_waiting_supplier"), want,
                 ["s_name"], ["numwait"])


def test_tpch_q22_matches_pandas(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    sel = c[(c.c_nationkey % 7).isin([0, 1, 2, 3])]
    pos = sel[sel.c_acctbal > 0.0]
    ab = (int(cents(pos.c_acctbal).sum()) / 100) / len(pos)
    recent = set(
        o.o_custkey[o.o_orderdate >= pd.Timestamp("1999-01-01")]
    )
    agg: dict = {}
    for _, r in sel.iterrows():
        if r.c_acctbal > ab and r.c_custkey not in recent:
            code = int(r.c_nationkey % 7)
            cur = agg.setdefault(code, [0, 0])
            cur[0] += 1
            cur[1] += int(cents([r.c_acctbal])[0])
    want = {
        (code,): {"numcust": n, "totacctbal": tc / 100}
        for code, (n, tc) in agg.items()
    }
    assert_keyed(run(spark, "tpch_q22_prospects"), want,
                 ["cntrycode"], ["numcust", "totacctbal"])


# --------------------------- training-prep replays (wave 15)


def test_sft_format_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, lang, src, text in zip(doc.doc_id, doc.lang, doc.source,
                                  doc.text):
        if len(text) <= 240:
            body = text
        else:
            p = text[:240]
            idx = p.rfind(" ")
            body = p[:idx] if idx >= 0 else p
        want[(d,)] = {
            "sample": (
                f"<|system|>summarize<|user|>{lang}:{src}"
                f"<|assistant|>{body}<|end|>"
            ),
            "body_chars": len(body),
            "truncated": len(text) > 240,
        }
    assert_keyed(run(spark, "llm_sft_format"), want, ["doc_id"],
                 ["sample", "body_chars", "truncated"])


def test_span_corruption_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, text in zip(doc.doc_id, doc.text):
        w = text.split(" ")
        i = 0
        while 5 + 10 * i + 2 <= len(w):
            start = 5 + 10 * i + 1
            want[(d, i)] = {
                "start_pos": start,
                "masked_text": " ".join(w[start - 1:start + 1]),
            }
            i += 1
    assert_keyed(run(spark, "llm_span_corruption"), want,
                 ["doc_id", "span_idx"], ["start_pos", "masked_text"])


def test_sampling_temperature_matches_python(spark):
    doc = _tbl("documents")
    n = doc.groupby("lang").size().to_dict()
    total = float(sum(n.values()))
    q = {lang: (c / total) ** 0.7 for lang, c in n.items()}
    zq = sum(q.values())
    want = {
        (lang,): {
            "n_docs": c,
            "sample_weight": q[lang] / zq,
            "doc_multiplier": (q[lang] / zq) / (c / total),
        }
        for lang, c in n.items()
    }
    assert_keyed(run(spark, "llm_sampling_temperature"), want, ["lang"],
                 ["n_docs", "sample_weight", "doc_multiplier"], tol=2e-6)


def test_target_encoding_matches_python(spark):
    ev = _tbl("events")
    cs = cents(ev.value)
    stats: dict = {}
    for t, c in zip(ev.event_type, cs):
        cur = stats.setdefault(t, [0, 0])
        cur[0] += int(c)
        cur[1] += 1
    want = {}
    for e, t, c in zip(ev.event_id, ev.event_type, cs):
        s, n = stats[t]
        want[(e,)] = {
            "event_type": t,
            "loo_enc": None if n == 1 else (s - int(c)) / (n - 1),
        }
    assert_keyed(run(spark, "llm_target_encoding"), want, ["event_id"],
                 ["event_type", "loo_enc"], tol=2e-6)


def test_contribution_bounding_matches_python(spark):
    ev = _tbl("events")
    by_user: dict = {}
    for e, u, t in zip(ev.event_id, ev.user_id, ev.event_type):
        by_user.setdefault(u, []).append((_md5(str(e)), e, u, t))
    raw: dict = {}
    for t in ev.event_type:
        raw[t] = raw.get(t, 0) + 1
    agg: dict = {}
    for u, rows in by_user.items():
        for _, e, _, t in sorted(rows)[:20]:
            cur = agg.setdefault(t, [0, set()])
            cur[0] += 1
            cur[1].add(u)
    want = {
        (t,): {"bounded_count": c, "raw_count": raw[t],
               "n_users": len(us)}
        for t, (c, us) in agg.items()
    }
    assert_keyed(run(spark, "llm_contribution_bounding"), want,
                 ["event_type"], ["bounded_count", "raw_count", "n_users"])


def test_token_budget_mixture_matches_python(spark):
    doc = _tbl("documents")
    toks: dict = {}
    docs = []
    for d, lang, text in zip(doc.doc_id, doc.lang, doc.text):
        if text is None:
            continue
        nt = len(text.split(" "))
        toks[lang] = toks.get(lang, 0) + nt
        docs.append((d, lang, nt))
    mn = min(toks.values())
    thr = {lang: min(256, (256 * mn) // t) for lang, t in toks.items()}
    want = {
        (d,): {"lang": lang, "keep_buckets": thr[lang], "n_toks": nt}
        for d, lang, nt in docs
        if int(_md5(str(d))[:2], 16) < thr[lang]
    }
    assert_keyed(run(spark, "llm_token_budget_mixture"), want,
                 ["doc_id"], ["lang", "keep_buckets", "n_toks"])


# ------------------------------- vector / ANN replays (wave 16)


def _emb_f64() -> dict:
    e = _tbl("embeddings")
    return {
        int(v): [float(x) for x in emb]
        for v, emb in zip(e.vec_id, e.embedding)
    }


def _fold_dot(a, b) -> float:
    """Sequential left-fold dot product — the exact op order of the
    engines' aggregate(zip_with(...)) spelling."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_semdedup_cluster_matches_python(spark):
    e = _tbl("embeddings")
    vecs = _emb_f64()
    labels = dict(zip((int(v) for v in e.vec_id), e.label))
    nrm = {v: math.sqrt(_fold_dot(a, a)) for v, a in vecs.items()}
    by_label: dict = {}
    for v, lab in labels.items():
        by_label.setdefault(lab, []).append(v)
    dup_of: dict = {}
    for members in by_label.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                sim = _fold_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b])
                if sim > 0.3:
                    dup_of[b] = min(dup_of.get(b, a), a)
    want = {
        (v,): {
            "label": labels[v],
            "is_dup": v in dup_of,
            "dup_of": dup_of.get(v),
        }
        for v in vecs
    }
    assert_keyed(run(spark, "llm_semdedup_cluster"), want,
                 ["vec_id"], ["label", "is_dup", "dup_of"])


def test_ann_hyperplane_lsh_matches_python(spark):
    vecs = _emb_f64()
    nrm = {v: math.sqrt(_fold_dot(a, a)) for v, a in vecs.items()}
    planes = [
        [1.0 if (int(_md5(f"hp:{b}:{i}")[0], 16) & 1) else -1.0
         for i in range(64)]
        for b in range(16)
    ]
    buckets: dict = {}
    for v, a in vecs.items():
        for band in range(4):
            bv = 0
            for j in range(4):
                if _fold_dot(a, planes[4 * band + j]) >= 0:
                    bv += 1 << (3 - j)
            buckets.setdefault((band, bv), []).append(v)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    want = {}
    for a, b in cand:
        sim = _fold_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b])
        if sim > 0.3:
            want[(a, b)] = {"sim": _rhu6(sim)}
    assert_keyed(run(spark, "llm_ann_hyperplane_lsh"), want,
                 ["id_a", "id_b"], ["sim"])


def test_knn_ivf_matches_python(spark):
    vecs = _emb_f64()
    n = len(vecs)
    k = math.ceil(math.sqrt(n))
    seeds = sorted(vecs, key=lambda v: (_md5(str(v)), v))[:k]
    cells = {cell: vecs[v] for cell, v in enumerate(seeds, start=1)}

    def d2(a, c):
        return _rhu6(sum((x - y) * (x - y) for x, y in zip(a, c)))

    assign0 = {
        v: min(cells, key=lambda cell: (d2(a, cells[cell]), cell))
        for v, a in vecs.items()
    }
    cent: dict = {}
    for cell in cells:
        members = [vecs[v] for v, c in assign0.items() if c == cell]
        cent[cell] = [
            _rhu6(sum(col) / len(members)) for col in zip(*members)
        ]
    ranked = {
        v: sorted(cent, key=lambda cell: (d2(a, cent[cell]), cell))
        for v, a in vecs.items()
    }
    assigned: dict = {}
    for v, order in ranked.items():
        assigned.setdefault(order[0], []).append(v)
    nrm = {v: math.sqrt(_fold_dot(a, a)) for v, a in vecs.items()}
    want = {}
    for src, order in ranked.items():
        cand = {
            nbr for cell in order[:2] for nbr in assigned.get(cell, [])
            if nbr != src
        }
        sims = sorted(
            ((_rhu6(_fold_dot(vecs[src], vecs[nbr])
                    / (nrm[src] * nrm[nbr])), nbr) for nbr in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rnk, (sim, nbr) in enumerate(sims[:3], start=1):
            want[(src, rnk)] = {"nbr": nbr, "sim": sim}
    assert_keyed(run(spark, "llm_knn_ivf"), want,
                 ["src", "rnk"], ["nbr", "sim"])


# ---------------------------- streaming semantics (wave 17)


def test_stream_tumbling_window_matches_pandas(spark):
    ev = _tbl("events")
    agg: dict = {}
    for ts, et, c in zip(ev.ts.astype("int64"), ev.event_type,
                         cents(ev.value)):
        k = (ts - ts % HOUR_US, et)
        cur = agg.setdefault(k, [0, 0])
        cur[0] += 1
        cur[1] += int(c)
    want = {
        k: {"n_events": n, "sum_value": tc / 100}
        for k, (n, tc) in agg.items()
    }
    assert_keyed(run(spark, "stream_tumbling_window"), want,
                 ["win_start_us", "event_type"], ["n_events", "sum_value"])


def test_stream_sliding_window_matches_pandas(spark):
    ev = _tbl("events")
    q = 900_000_000  # 15 min in us
    agg: dict = {}
    for ts, c in zip(ev.ts.astype("int64"), cents(ev.value)):
        for k in range(4):
            w = (ts // q) * q - k * q
            cur = agg.setdefault(w, [0, 0])
            cur[0] += 1
            cur[1] += int(c)
    want = {
        (w,): {"n_events": n, "sum_value": tc / 100}
        for w, (n, tc) in agg.items()
    }
    assert_keyed(run(spark, "stream_sliding_window"), want,
                 ["win_start_us"], ["n_events", "sum_value"])


def test_stream_session_window_matches_python(spark):
    ev = _tbl("events")
    by_user: dict = {}
    for u, ts, e in zip(ev.user_id, ev.ts.astype("int64"), ev.event_id):
        by_user.setdefault(u, []).append((ts, e))
    want = {}
    for u, rows in by_user.items():
        rows.sort()
        start, n, prev = rows[0][0], 0, None
        for ts, _ in rows:
            if prev is not None and ts - prev >= 1_800_000_000:
                want[(u, start)] = {"n_events": n}
                start, n = ts, 0
            n += 1
            prev = ts
        want[(u, start)] = {"n_events": n}
    assert_keyed(run(spark, "stream_session_window"), want,
                 ["user_id", "session_start_us"], ["n_events"])


def test_stream_dedup_matches_base_table(spark):
    ev = _tbl("events")
    want = {
        (e,): {
            "ts_us": ts, "user_id": u, "event_type": t,
            "value": v, "props": p,
        }
        for e, ts, u, t, v, p in zip(
            ev.event_id, ev.ts.astype("int64"), ev.user_id,
            ev.event_type, ev.value, ev.props,
        )
    }
    assert_keyed(
        run(spark, "stream_dedup"), want, ["event_id"],
        ["ts_us", "user_id", "event_type", "value", "props"],
    )


def test_stream_stateful_count_matches_pandas(spark):
    ev = _tbl("events")
    agg: dict = {}
    for u, v in zip(ev.user_id, ev.value):
        cur = agg.setdefault(u, [0, 0, 0])
        cur[0] += 1
        if not (v is None or (isinstance(v, float) and math.isnan(v))):
            cur[1] += 1
            cur[2] += int(cents([v])[0])
    want = {
        (u,): {"n_events": n, "total_cents": tc if nv else None}
        for u, (n, nv, tc) in agg.items()
    }
    assert_keyed(run(spark, "stream_stateful_count"), want,
                 ["user_id"], ["n_events", "total_cents"])


# --------------------------- LSH audits / novelty (wave 18)


def test_lsh_bucket_audit_matches_python(spark):
    doc = _tbl("documents")
    ssets = _shingle_sets_py(dict(zip(doc.doc_id, doc.text)))
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    buckets: dict = {}
    for d, sg in sigs.items():
        for band in range(4):
            bh = _md5(sg[2 * band] + sg[2 * band + 1])
            buckets.setdefault((band, bh), []).append(d)
    per_band: dict = {}
    for (band, _), members in buckets.items():
        per_band.setdefault(band, []).append(len(members))
    want = {}
    for band, cs in per_band.items():
        mx = max(cs)
        pairs = sum(c * (c - 1) // 2 for c in cs)
        want[(band,)] = {
            "n_buckets": len(cs),
            "max_bucket": mx,
            "cand_pairs": pairs,
            "top_pair_share": _rhu6(mx * (mx - 1) / 2 / max(pairs, 1)),
        }
    assert_keyed(
        run(spark, "llm_lsh_bucket_audit"), want, ["band"],
        ["n_buckets", "max_bucket", "cand_pairs", "top_pair_share"],
    )


def test_lsh_precision_recall_matches_python(spark):
    doc = _tbl("documents")
    corpus = {d: t.split(" ") for d, t in zip(doc.doc_id, doc.text)}
    for d, w in list(corpus.items()):
        if d % 5 == 0:
            corpus[d + 300000] = [
                x for i, x in enumerate(w, start=1) if i % 7 != 0
            ]
    ssets = {
        d: {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}
        for d, w in corpus.items() if len(w) >= 5
    }
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    buckets: dict = {}
    for d, sg in sigs.items():
        for band in range(4):
            buckets.setdefault((band, _md5(sg[2 * band] + sg[2 * band + 1])),
                               []).append(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    planted = {(d, d + 300000) for d in ssets if d + 300000 in ssets
               and d < 300000}
    n_recalled = len(planted & cand)
    n_precise = sum(
        1 for a, b in cand
        if len(ssets[a] & ssets[b]) * 1.0 / len(ssets[a] | ssets[b]) >= 0.5
    )
    got = run(spark, "llm_lsh_precision_recall").iloc[0]
    assert int(got.n_planted) == len(planted)
    assert int(got.n_recalled) == n_recalled
    assert close(got.recall, _rhu6(n_recalled / len(planted)), 1e-6)
    assert int(got.n_candidates) == len(cand)
    assert int(got.n_precise) == n_precise
    assert close(got.precision, _rhu6(n_precise / max(len(cand), 1)), 1e-6)


def test_ngram_novelty_matches_python(spark):
    doc = _tbl("documents")
    tri: dict = {}
    for d, t in zip(doc.doc_id, doc.text):
        w = t.split(" ")
        if len(w) >= 3:
            tri[d] = {_md5(" ".join(w[i:i + 3])) for i in range(len(w) - 2)}
    first: dict = {}
    for d in sorted(tri):
        for h in tri[d]:
            first.setdefault(h, d)
    want = {}
    for d, hs in tri.items():
        novel = sum(1 for h in hs if first[h] == d)
        want[(d,)] = {
            "n_ngrams": len(hs), "n_novel": novel,
            "novelty": _rhu6(novel / len(hs)),
        }
    assert_keyed(run(spark, "llm_ngram_novelty"), want,
                 ["doc_id"], ["n_ngrams", "n_novel", "novelty"])


def test_quality_ensemble_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, nc, t in zip(doc.doc_id, doc.n_chars, doc.text):
        cnt: dict = {}
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
        n = sum(cnt.values())
        ttr = _rhu6(len(cnt) / n)
        top = _rhu6(max(cnt.values()) / n)
        ent = _rhu6(
            math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        )
        want[(d,)] = {
            "n_toks": n, "ttr": ttr, "top_share": top, "entropy": ent,
            "keep": (100 <= nc <= 500 and ttr >= 0.35
                     and top <= 0.12 and ent >= 2.5),
        }
    assert_keyed(
        run(spark, "llm_quality_ensemble"), want, ["doc_id"],
        ["n_toks", "ttr", "top_share", "entropy", "keep"], tol=2e-6,
    )


# ------------------------- two-phase window rewrites (wave 19)


def test_win_rank_dense_matches_python(spark):
    # fixture lineitem carries fully duplicate (flag, orderkey,
    # linenumber) rows, so compare the row MULTISET, not a keyed dict
    li = _tbl("lineitem")
    li = li[li.l_quantity >= 48]
    by_flag: dict = {}
    for f, q in zip(li.l_returnflag, li.l_quantity):
        by_flag.setdefault(f, []).append(q)
    want = []
    for _, r in li.iterrows():
        qs = by_flag[r.l_returnflag]
        want.append((
            r.l_returnflag, r.l_orderkey, r.l_linenumber, r.l_quantity,
            1 + sum(1 for q in qs if q > r.l_quantity),
            1 + len({q for q in qs if q > r.l_quantity}),
        ))
    got = sorted(
        (r.l_returnflag, r.l_orderkey, r.l_linenumber, r.l_quantity,
         r.rnk, r.drnk)
        for _, r in run(spark, "win_rank_dense").iterrows()
    )
    assert got == sorted(want)


def test_win_ntile_matches_python(spark):
    # duplicate sort keys make per-row tile assignment ambiguous between
    # engines; the row MULTISET (including tiles) is the invariant
    li = _tbl("lineitem")
    li = li[li.l_quantity >= 48]
    by_flag: dict = {}
    for _, r in li.iterrows():
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_orderkey, r.l_linenumber)
        )
    want = []
    for f, rows in by_flag.items():
        rows.sort()
        n, k = len(rows), 4
        q, rm = n // k, n % k
        for pos, (qty, ok, ln) in enumerate(rows, start=1):
            if pos <= rm * (q + 1):
                tile = 1 + (pos - 1) // (q + 1)
            else:
                tile = rm + 1 + (pos - rm * (q + 1) - 1) // max(q, 1)
            want.append((f, ok, ln, qty, tile))
    got = sorted(
        (r.l_returnflag, r.l_orderkey, r.l_linenumber, r.l_quantity,
         r.quartile)
        for _, r in run(spark, "win_ntile").iterrows()
    )
    assert got == sorted(want)


def test_win_percent_cume_matches_python(spark):
    c = _tbl("customer")
    c = c[c.c_acctbal.notna()]
    by_nat: dict = {}
    for n, b in zip(c.c_nationkey, c.c_acctbal):
        by_nat.setdefault(n, []).append(b)
    want = {}
    for _, r in c.iterrows():
        bals = by_nat[r.c_nationkey]
        n = len(bals)
        less = sum(1 for b in bals if b < r.c_acctbal)
        at_or_below = sum(1 for b in bals if b <= r.c_acctbal)
        want[(r.c_custkey,)] = {
            "c_nationkey": r.c_nationkey, "c_acctbal": r.c_acctbal,
            "pr": 0.0 if n == 1 else less / (n - 1),
            "cd": at_or_below / n,
        }
    assert_keyed(
        run(spark, "win_percent_cume"), want, ["c_custkey"],
        ["c_nationkey", "c_acctbal", "pr", "cd"], tol=1e-12,
    )


def test_win_median_over_matches_numpy(spark):
    ev = _tbl("events")
    med = {
        t: _rhu6(float(np.percentile(
            g.dropna().to_numpy(dtype=np.float64), 50, method="linear")))
        for t, g in ev.groupby("event_type", dropna=False)["value"]
    }
    want = {}
    for e, t, v in zip(ev.event_id, ev.event_type, ev.value):
        m = med[t]
        want[(e,)] = {
            "event_type": t, "value": v, "type_median": m,
            "dev": None if v is None or (isinstance(v, float)
                                         and math.isnan(v))
            else _rhu6(v - m),
        }
    assert_keyed(
        run(spark, "win_median_over"), want, ["event_id"],
        ["event_type", "value", "type_median", "dev"], tol=2e-6,
    )


def test_win_count_distinct_over_matches_python(spark):
    o = _tbl("orders")
    nd = {
        ck: len(set(g))
        for ck, g in o.groupby("o_custkey")["o_orderpriority"]
    }
    want = {
        (ok,): {"o_custkey": ck, "o_orderpriority": p,
                "n_distinct_prio": nd[ck]}
        for ok, ck, p in zip(o.o_orderkey, o.o_custkey, o.o_orderpriority)
    }
    assert_keyed(
        run(spark, "win_count_distinct_over"), want, ["o_orderkey"],
        ["o_custkey", "o_orderpriority", "n_distinct_prio"],
    )


def test_win_cumulative_distinct_matches_python(spark):
    ev = _tbl("events")
    by_user: dict = {}
    for e, u, t, ts in zip(ev.event_id, ev.user_id, ev.event_type,
                           ev.ts.astype("int64")):
        by_user.setdefault(u, []).append((ts, e, t))
    want = {}
    for u, rows in by_user.items():
        rows.sort()
        seen: set = set()
        for ts, e, t in rows:
            seen.add(t)
            want[(e,)] = {"user_id": u, "ts_us": ts,
                          "n_types_seen": len(seen)}
    assert_keyed(
        run(spark, "win_cumulative_distinct"), want, ["event_id"],
        ["user_id", "ts_us", "n_types_seen"],
    )


# ------------------------------ multimodal plumbing (wave 20)


def test_multimodal_binary_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, t in zip(doc.doc_id, doc.text):
        b = t.encode("utf-8")
        want[(d,)] = {
            "n_bytes": len(b),
            "first_byte": b[0] if b else -1,
            "n_frames": 1 + len(b) // 256,
            "feat_hash": (len(b) * 2654435761) % 1000003,
        }
    assert_keyed(
        run(spark, "llm_multimodal_binary"), want, ["doc_id"],
        ["n_bytes", "first_byte", "n_frames", "feat_hash"],
    )


def test_multimodal_resize_spec_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d in doc.doc_id:
        w = 320 + (d * 7) % 1280
        h = 240 + (d * 13) % 720
        mx = max(w, h)
        ow, oh = w * 224 // mx, h * 224 // mx
        want[(d,)] = {
            "w": w, "h": h, "out_w": ow, "out_h": oh,
            "pad_x": (224 - ow) // 2, "pad_y": (224 - oh) // 2,
        }
    assert_keyed(
        run(spark, "llm_multimodal_resize_spec"), want, ["doc_id"],
        ["w", "h", "out_w", "out_h", "pad_x", "pad_y"],
    )


def test_multimodal_audio_chunks_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, nc in zip(doc.doc_id, doc.n_chars):
        dur = (nc * 160 * 1000) // 16000
        if dur <= 0:
            continue
        for i in range((dur + 999) // 1000):
            end = min((i + 1) * 1000, dur)
            want[(d, i)] = {
                "start_ms": i * 1000, "end_ms": end,
                "chunk_samples": (end - i * 1000) * 16,
            }
    assert_keyed(
        run(spark, "llm_multimodal_audio_chunks"), want,
        ["doc_id", "chunk_idx"], ["start_ms", "end_ms", "chunk_samples"],
    )


def test_multimodal_struct_matches_python(spark):
    doc = _tbl("documents")
    emb = _tbl("embeddings")
    dim = {int(v): len(e) for v, e in zip(emb.vec_id, emb.embedding)}
    want = {
        (d,): {"s_lang": lang, "s_chars": nc, "s_dim": dim[d]}
        for d, lang, nc in zip(doc.doc_id, doc.lang, doc.n_chars)
        if d in dim
    }
    assert_keyed(run(spark, "llm_multimodal_struct"), want,
                 ["doc_id"], ["s_lang", "s_chars", "s_dim"])


def test_multimodal_dedup_matches_python(spark):
    doc = _tbl("documents")
    corpus = {d: t.encode("utf-8") for d, t in zip(doc.doc_id, doc.text)}
    for d, b in list(corpus.items()):
        if d % 6 == 0:
            corpus[d + 400000] = b
    want: dict = {}
    for d, b in corpus.items():
        hx = b.hex()
        pm = _md5(hx)
        tail_start = max(len(hx) - 64, 0)
        sketch = _md5(
            hx[:64] + hx[tail_start:tail_start + 64] + str(len(hx) // 128)
        )
        cur = want.setdefault(
            (pm,), {"edge_sketch": sketch, "keep_id": d, "n_copies": 0}
        )
        cur["keep_id"] = min(cur["keep_id"], d)
        cur["n_copies"] += 1
    assert_keyed(run(spark, "llm_multimodal_dedup"), want,
                 ["payload_md5"], ["edge_sketch", "keep_id", "n_copies"])


def test_multimodal_frame_sample_matches_python(spark):
    doc = _tbl("documents")
    want = {}
    for d, t in zip(doc.doc_id, doc.text):
        if len(t.encode("utf-8")) != len(t):
            continue
        for i in range(4):
            if i * 64 + 32 <= len(t):
                want[(d, i)] = {
                    "frame_off": i * 64,
                    "frame_md5": _md5(t[i * 64:i * 64 + 32]),
                }
    assert_keyed(run(spark, "llm_multimodal_frame_sample"), want,
                 ["doc_id", "frame_idx"], ["frame_off", "frame_md5"])


# ---------------------------- k-NN eval family (wave 21)


def _knn_top5_py():
    """(src -> [(sim_r6, nbr), ...top5]) by (rounded sim desc, id asc)."""
    vecs = _emb_f64()
    nrm = {v: math.sqrt(_fold_dot(a, a)) for v, a in vecs.items()}
    out = {}
    for src in vecs:
        sims = sorted(
            ((_rhu6(_fold_dot(vecs[src], vecs[n]) / (nrm[src] * nrm[n])), n)
             for n in vecs if n != src),
            key=lambda t: (-t[0], t[1]),
        )
        out[src] = sims[:5]
    return out


def test_knn_label_eval_matches_python(spark):
    e = _tbl("embeddings")
    labels = dict(zip((int(v) for v in e.vec_id), e.label))
    top5 = _knn_top5_py()
    per_label: dict = {}
    for src, nbrs in top5.items():
        votes: dict = {}
        for _, n in nbrs:
            votes[labels[n]] = votes.get(labels[n], 0) + 1
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        cur = per_label.setdefault(labels[src], [0, 0])
        cur[0] += 1
        cur[1] += pred == labels[src]
    want = {
        (lab,): {"n_queries": n, "n_correct": c,
                 "accuracy": _rhu6(c / n)}
        for lab, (n, c) in per_label.items()
    }
    assert_keyed(run(spark, "llm_knn_label_eval"), want, ["label"],
                 ["n_queries", "n_correct", "accuracy"])


def test_ivf_recall_at_k_matches_python(spark):
    vecs = _emb_f64()
    n = len(vecs)
    k = math.ceil(math.sqrt(n))
    seeds = sorted(vecs, key=lambda v: (_md5(str(v)), v))[:k]
    cells = {cell: vecs[v] for cell, v in enumerate(seeds, start=1)}

    def d2(a, c):
        return _rhu6(sum((x - y) * (x - y) for x, y in zip(a, c)))

    assign0 = {
        v: min(cells, key=lambda cell: (d2(a, cells[cell]), cell))
        for v, a in vecs.items()
    }
    cent: dict = {}
    for cell in cells:
        members = [vecs[v] for v, c in assign0.items() if c == cell]
        cent[cell] = [_rhu6(sum(col) / len(members))
                      for col in zip(*members)]
    ranked = {
        v: sorted(cent, key=lambda cell: (d2(a, cent[cell]), cell))
        for v, a in vecs.items()
    }
    assigned: dict = {}
    for v, order in ranked.items():
        assigned.setdefault(order[0], []).append(v)
    nrm = {v: math.sqrt(_fold_dot(a, a)) for v, a in vecs.items()}

    def topk(src, cand, kk):
        sims = sorted(
            ((_rhu6(_fold_dot(vecs[src], vecs[c]) / (nrm[src] * nrm[c])),
              c) for c in cand),
            key=lambda t: (-t[0], t[1]),
        )
        return {c for _, c in sims[:kk]}

    total_hits = 0
    for src, order in ranked.items():
        cand = {c for cell in order[:2] for c in assigned.get(cell, [])
                if c != src}
        ivf3 = topk(src, cand, 3)
        bf3 = topk(src, set(vecs) - {src}, 3)
        total_hits += len(ivf3 & bf3)
    got = run(spark, "llm_ivf_recall_at_k").iloc[0]
    assert int(got.n_queries) == n
    assert int(got.total_hits) == total_hits
    assert close(got.recall_at_3, _rhu6(total_hits / (3.0 * n)), 1e-6)


def test_hard_negatives_matches_python(spark):
    e = _tbl("embeddings")
    labels = dict(zip((int(v) for v in e.vec_id), e.label))
    top5 = _knn_top5_py()
    want = {}
    for src, nbrs in top5.items():
        for rnk, (sim, nbr) in enumerate(nbrs, start=1):
            if labels[nbr] != labels[src]:
                want[(src,)] = {
                    "src_label": labels[src], "hard_negative": nbr,
                    "nbr_label": labels[nbr], "sim": sim, "rnk": rnk,
                }
                break
    assert_keyed(
        run(spark, "llm_hard_negatives"), want, ["src"],
        ["src_label", "hard_negative", "nbr_label", "sim", "rnk"],
    )


def test_prototype_selection_matches_python(spark):
    e = _tbl("embeddings")
    vecs = _emb_f64()
    labels = dict(zip((int(v) for v in e.vec_id), e.label))
    by_label: dict = {}
    for v, lab in labels.items():
        by_label.setdefault(lab, []).append(v)
    want = {}
    for lab, members in by_label.items():
        cent = [_rhu6(sum(vecs[v][p] for v in members) / len(members))
                for p in range(64)]
        d2s = sorted(
            (_rhu6(sum((vecs[v][p] - cent[p]) ** 2 for p in range(64))), v)
            for v in members
        )
        for rank, (d2, v) in enumerate(d2s[:3], start=1):
            want[(lab, rank)] = {"vec_id": v, "d2": d2}
    assert_keyed(run(spark, "llm_prototype_selection"), want,
                 ["label", "rank"], ["vec_id", "d2"])


# ----------------------- preference / corpus reports (wave 22)


def test_preference_pairs_matches_python(spark):
    doc = _tbl("documents")
    groups: dict = {}
    for d, lang, src, nc, t in zip(doc.doc_id, doc.lang, doc.source,
                                   doc.n_chars, doc.text):
        if t is None:
            continue
        q = _rhu6(math.log(1 + nc) * 0.5 + len(t.split(" ")) * 0.01)
        groups.setdefault((lang, src), []).append((q, d))
    want = {}
    for (lang, src), rows in groups.items():
        if len(rows) < 2:
            continue
        best = min(rows, key=lambda r: (-r[0], r[1]))
        worst = min(rows, key=lambda r: (r[0], r[1]))
        if best[1] == worst[1]:
            continue
        want[(lang, src)] = {
            "chosen_doc": best[1], "rejected_doc": worst[1],
            "margin": _rhu6(best[0] - worst[0]),
        }
    assert_keyed(run(spark, "llm_preference_pairs"), want,
                 ["lang", "source"],
                 ["chosen_doc", "rejected_doc", "margin"])


def test_prefix_clusters_matches_python(spark):
    doc = _tbl("documents")
    groups: dict = {}
    for d, src, t in zip(doc.doc_id, doc.source, doc.text):
        w = t.split(" ")
        if len(w) >= 8:
            key = _md5(" ".join(w[:8]))
            groups.setdefault(key, []).append((d, src))
    want = {}
    for key, rows in groups.items():
        if len(rows) < 2:
            continue
        srcs = {s for _, s in rows}
        want[(key,)] = {
            "n_docs": len(rows),
            "keep_doc": min(d for d, _ in rows),
            "n_sources": len(srcs),
            "cross_source": len(srcs) > 1,
        }
    assert_keyed(run(spark, "llm_prefix_clusters"), want, ["prefix_key"],
                 ["n_docs", "keep_doc", "n_sources", "cross_source"])


def test_dataset_card_stats_matches_pandas(spark):
    doc = _tbl("documents")
    want = {}
    for (src, lang), g in doc.groupby(["source", "lang"]):
        nc = g.n_chars.to_numpy(dtype=np.float64)
        toks = sum(len(t.split(" ")) for t in g.text if t is not None)
        want[(src, lang)] = {
            "n_docs": len(g),
            "total_chars": int(g.n_chars.sum()),
            "median_chars": _rhu6(
                float(np.percentile(nc, 50, method="linear"))),
            "total_toks": toks,
            "short_share": _rhu6(float((nc < 200).sum()) / len(g)),
        }
    assert_keyed(
        run(spark, "llm_dataset_card_stats"), want, ["source", "lang"],
        ["n_docs", "total_chars", "median_chars", "total_toks",
         "short_share"], tol=2e-6,
    )


def test_corpus_health_report_matches_python(spark):
    doc = _tbl("documents")
    per_lang: dict = {}
    for lang, nc, t in zip(doc.lang, doc.n_chars, doc.text):
        cnt: dict = {}
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
        n = sum(cnt.values())
        ttr = _rhu6(len(cnt) / n)
        top = _rhu6(max(cnt.values()) / n)
        ent = _rhu6(
            math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        )
        keep = (100 <= nc <= 500 and ttr >= 0.35
                and top <= 0.12 and ent >= 2.5)
        cur = per_lang.setdefault(lang, [0, 0, 0.0])
        cur[0] += 1
        cur[1] += keep
        cur[2] += ent
    want = {
        (lang,): {
            "n_docs": n, "n_keep": k,
            "keep_share": _rhu6(k / n),
            "mean_entropy": _rhu6(tot_ent / n),
        }
        for lang, (n, k, tot_ent) in per_lang.items()
    }
    assert_keyed(
        run(spark, "llm_corpus_health_report"), want, ["lang"],
        ["n_docs", "n_keep", "keep_share", "mean_entropy"], tol=2e-6,
    )


def test_corpus_prep_pipeline_matches_python(spark):
    doc = _tbl("documents")
    stop = {"the", "a", "of", "and", "to"}
    kept = []
    for d, lang, t in zip(doc.doc_id, doc.lang, doc.text):
        w = t.split(" ")
        nw, nc = len(w), len(t)
        ns = sum(1 for x in w if x in stop)
        ppm = (4000 * min(nw, 100)
               + (300000 - ns * 300000 // nw)
               + min((nc - (nw - 1)) * 300000 // (8 * nw), 300000))
        if ppm >= 550000:
            kept.append((d, lang, nw, t))
    seen_text: dict = {}
    for d, lang, nw, t in sorted(kept):
        seen_text.setdefault(t, (d, lang, nw))
    agg: dict = {}
    for d, lang, nw in seen_text.values():
        b = int(_md5(str(d))[:2], 16) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        cur = agg.setdefault((split, lang), [0, 0])
        cur[0] += 1
        cur[1] += nw
    want = {
        k: {"n_docs": n, "n_tokens": tt} for k, (n, tt) in agg.items()
    }
    assert_keyed(run(spark, "llm_corpus_prep_pipeline"), want,
                 ["split", "lang"], ["n_docs", "n_tokens"])


# ------------------------------ last logic-heavy ops (wave 23)


def test_skyline_pareto_matches_python(spark):
    o = _tbl("orders")
    pts: dict = {}
    for p, d in zip(o.o_totalprice, o.o_orderdate.astype("int64")):
        pts[(p, d)] = pts.get((p, d), 0) + 1
    front = {}
    prev_max = None
    for (p, d), n in sorted(pts.items(), key=lambda kv: (-kv[0][0],
                                                         -kv[0][1])):
        if prev_max is None or d > prev_max:
            front[(p, d)] = {"n_orders": n}
        prev_max = d if prev_max is None else max(prev_max, d)
    assert_keyed(run(spark, "agg_skyline_pareto"), front,
                 ["price", "order_date_us"], ["n_orders"])


def test_product_rewrite_matches_python(spark):
    li = _tbl("lineitem")
    ln10 = 2.302585092994046
    groups: dict = {}
    for f, disc in zip(li.l_returnflag, li.l_discount):
        # decimal(4,2) cast = exact 2-dec value; 1 + d exact in double
        d2 = int(cents([disc])[0]) / 100
        groups.setdefault(f, []).append(math.log(1.0 + d2))
    want = {}
    for f, lns in groups.items():
        rs = _rhu6(sum(lns))
        ra = _rhu6(sum(lns) / len(lns))
        want[(f,)] = {
            "n": len(lns),
            "product_mantissa": _rhu6(
                10 ** (rs / ln10 - math.floor(rs / ln10))),
            "product_exp10": math.floor(rs / ln10),
            "geo_mean_factor": _rhu6(math.exp(ra)),
        }
    assert_keyed(
        run(spark, "agg_product_rewrite"), want, ["l_returnflag"],
        ["n", "product_mantissa", "product_exp10", "geo_mean_factor"],
        tol=2e-6,
    )


def test_association_rules_matches_python(spark):
    li = _tbl("lineitem")
    baskets: dict = {}
    for ok, pk in set(zip(li.l_orderkey, li.l_partkey)):
        baskets.setdefault(ok, set()).add(pk)
    kept = {ok: ps for ok, ps in baskets.items() if len(ps) <= 15}
    nb = float(len(kept))
    item_n: dict = {}
    pairs: dict = {}
    for ps in kept.values():
        s = sorted(ps)
        for p in s:
            item_n[p] = item_n.get(p, 0) + 1
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = {}
    for (a, b), c in pairs.items():
        if c < 5:
            continue
        want[(a, b)] = {
            "c_ab": c,
            "support": _rhu6(c / nb),
            "conf_a_to_b": _rhu6(c / item_n[a]),
            "conf_b_to_a": _rhu6(c / item_n[b]),
            "lift": _rhu6((c / nb) / ((item_n[a] / nb) * (item_n[b] / nb))),
        }
    assert_keyed(
        run(spark, "agg_association_rules"), want, ["part_a", "part_b"],
        ["c_ab", "support", "conf_a_to_b", "conf_b_to_a", "lift"],
        tol=2e-6,
    )


def test_seasonal_anomaly_matches_python(spark):
    ev = _tbl("events")
    dow = (ev.ts.dt.dayofweek + 1).to_numpy()
    hod = ev.ts.dt.hour.to_numpy()
    cs = cents(ev.value)
    cells: dict = {}
    for d, h, c in zip(dow, hod, cs):
        cur = cells.setdefault((int(d), int(h)), [0, 0, 0])
        cur[0] += 1
        cur[1] += int(c)
        cur[2] += int(c) * int(c)
    model = {}
    for k, (n, sc, scc) in cells.items():
        if n < 10:
            continue
        sx = sc / 100
        sxx = scc / 1e4
        if (sxx - sx * sx / n) > 0:
            mean = sx / n
            sd = math.sqrt((sxx - sx * sx / n) / (n - 1))
            model[k] = (mean, sd)
    want = {}
    for e, v, d, h in zip(ev.event_id, ev.value, dow, hod):
        k = (int(d), int(h))
        if k not in model or v is None:
            continue
        mean, sd = model[k]
        if abs(v - mean) > 2 * sd:
            want[(e,)] = {
                "value": v, "dow": k[0], "hod": k[1],
                "cell_mean": _rhu6(mean), "z": _rhu6((v - mean) / sd),
            }
    assert_keyed(
        run(spark, "ts_seasonal_anomaly"), want, ["event_id"],
        ["value", "dow", "hod", "cell_mean", "z"], tol=2e-6,
    )


def test_rollup_incremental_merge_matches_pandas(spark):
    ev = _tbl("events")
    agg: dict = {}
    for u, ts, c in zip(ev.user_id, ev.ts.astype("int64"), cents(ev.value)):
        k = (u, ts - ts % HOUR_US)
        cur = agg.setdefault(k, [0, 0])
        cur[0] += 1
        cur[1] += int(c)
    want = {k: {"n_events": n, "cents": tc} for k, (n, tc) in agg.items()}
    assert_keyed(run(spark, "ts_rollup_incremental_merge"), want,
                 ["user_id", "hour_us"], ["n_events", "cents"])


def test_lsh_banding_sweep_matches_python(spark):
    doc = _tbl("documents")
    corpus = {d: t.split(" ") for d, t in zip(doc.doc_id, doc.text)}
    for d, w in list(corpus.items()):
        if d % 5 == 0:
            corpus[d + 300000] = [
                x for i, x in enumerate(w, start=1) if i % 7 != 0
            ]
    ssets = {
        d: {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}
        for d, w in corpus.items() if len(w) >= 5
    }
    sigs = {
        d: [min(_md5(f"s{k}|" + s) for s in ss) for k in range(8)]
        for d, ss in ssets.items()
    }
    planted = {(d, d + 300000) for d in ssets
               if d < 300000 and d + 300000 in ssets}
    want = {}
    for bands, rows in ((8, 1), (4, 2), (2, 4)):
        buckets: dict = {}
        for d, sg in sigs.items():
            for b in range(bands):
                bh = _md5("".join(sg[b * rows:(b + 1) * rows]))
                buckets.setdefault((b, bh), []).append(d)
        cand = set()
        for members in buckets.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b2 in ms[i + 1:]:
                    cand.add((a, b2))
        want[(bands, rows)] = {
            "n_candidates": len(cand),
            "recall": _rhu6(len(planted & cand) / len(planted)),
        }
    assert_keyed(run(spark, "llm_lsh_banding_sweep"), want,
                 ["bands", "rows_per_band"], ["n_candidates", "recall"])


# ------------------------------ TPC-H replays, part 2 (wave 24)


def _rev_units(ext, disc):
    """Revenue in exact 1e-4 units: cents(ext) * (100 - cents(disc))."""
    return int(cents([ext])[0]) * (100 - int(cents([disc])[0]))


def test_tpch_q8_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    sup = _tbl("supplier")
    o = _tbl("orders")
    c = _tbl("customer")
    nat = _tbl("nation")
    reg = _tbl("region")
    econ = set(p.p_partkey[p.p_type == "ECONOMY"])
    sup_nat = dict(zip(sup.s_suppkey, sup.s_nationkey))
    nat_name = dict(zip(nat.n_nationkey, nat.n_name))
    asia = set(reg.r_regionkey[reg.r_name == "ASIA"])
    asia_nations = set(nat.n_nationkey[nat.n_regionkey.isin(asia)])
    cust_nat = dict(zip(c.c_custkey, c.c_nationkey))
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    ord_info = {
        r.o_orderkey: (r.o_custkey, pd.Timestamp(r.o_orderdate).year)
        for _, r in o.iterrows() if lo <= r.o_orderdate < hi
    }
    agg: dict = {}
    for ok, pk, sk, ext, disc in zip(li.l_orderkey, li.l_partkey,
                                     li.l_suppkey, li.l_extendedprice,
                                     li.l_discount):
        if pk not in econ or ok not in ord_info:
            continue
        ck, yr = ord_info[ok]
        if cust_nat[ck] not in asia_nations:
            continue
        vol = _rev_units(ext, disc)
        cur = agg.setdefault(yr, [0, 0, False])
        cur[1] += vol
        if nat_name[sup_nat[sk]] == "NATION_5":
            cur[0] += vol
            cur[2] = True  # sum(CASE WHEN ...) is NULL when no row matches
    want = {
        (yr,): {"mkt_share": _rhu6((num / 1e4) / (tot / 1e4)) if seen
                else None}
        for yr, (num, tot, seen) in agg.items()
    }
    assert_keyed(run(spark, "tpch_q8_market_share"), want,
                 ["o_year"], ["mkt_share"], tol=2e-6)


def test_tpch_q11_matches_pandas(spark):
    li = _tbl("lineitem")
    sup = _tbl("supplier")
    nat = _tbl("nation")
    n3 = set(nat.n_nationkey[nat.n_name == "NATION_3"])
    sks = set(sup.s_suppkey[sup.s_nationkey.isin(n3)])
    per_part: dict = {}
    for pk, sk, ext, disc in zip(li.l_partkey, li.l_suppkey,
                                 li.l_extendedprice, li.l_discount):
        if sk in sks:
            per_part[pk] = per_part.get(pk, 0) + _rev_units(ext, disc)
    thr = (sum(per_part.values()) / 1e4) * 0.001
    want = {
        (pk,): {"value": v / 1e4}
        for pk, v in per_part.items() if v / 1e4 > thr
    }
    assert_keyed(run(spark, "tpch_q11_important_values"), want,
                 ["p_partkey"], ["value"], tol=1e-6)


def test_tpch_q2_matches_pandas(spark):
    li = _tbl("lineitem")
    sup = _tbl("supplier")
    nat = _tbl("nation")
    reg = _tbl("region")
    p = _tbl("part")
    europe = set(reg.r_regionkey[reg.r_name == "EUROPE"])
    eur_nations = {
        r.n_nationkey: r.n_name for _, r in nat.iterrows()
        if r.n_regionkey in europe
    }
    eur_sup = {
        r.s_suppkey: (r.s_name, r.s_acctbal, eur_nations[r.s_nationkey])
        for _, r in sup.iterrows() if r.s_nationkey in eur_nations
    }
    qual = set(p.p_partkey[(p.p_type == "STANDARD") & (p.p_size < 10)])
    pc: dict = {}
    for pk, sk, ext, qty in zip(li.l_partkey, li.l_suppkey,
                                li.l_extendedprice, li.l_quantity):
        if pk in qual:
            k = (pk, sk)
            u = ext / qty
            pc[k] = min(pc.get(k, u), u)
    pce = [(pk, u, sk) for (pk, sk), u in pc.items() if sk in eur_sup]
    mc: dict = {}
    for pk, u, _ in pce:
        mc[pk] = min(mc.get(pk, u), u)
    rows = []
    for pk, u, sk in pce:
        if u == mc[pk]:
            nm, bal, nn = eur_sup[sk]
            rows.append((bal, nm, nn, pk, _rhu6(u)))
    rows.sort(key=lambda t: (-t[0], t[2], t[1], t[3]))
    rows = rows[:100]
    want = {
        (t[3], t[1]): {"s_acctbal": t[0], "n_name": t[2],
                       "unit_cost": t[4]}
        for t in rows
    }
    assert_keyed(
        run(spark, "tpch_q2_min_cost_supplier"), want,
        ["p_partkey", "s_name"], ["s_acctbal", "n_name", "unit_cost"],
    )


# --------------------------------- final completeness (wave 25)


def test_fn_hash_matches_hashlib(spark):
    import hashlib

    c = _tbl("customer")
    want = {}
    for ck, nm, seg in zip(c.c_custkey, c.c_name, c.c_mktsegment):
        sha = hashlib.sha256(nm.encode()).hexdigest()
        want[(ck,)] = {
            "name_md5": _md5(nm),
            "name_sha256": sha,
            "seg_bucket": _md5(seg)[:8],
            "sha_len": len(sha),
        }
    assert_keyed(
        run(spark, "fn_hash"), want, ["c_custkey"],
        ["name_md5", "name_sha256", "seg_bucket", "sha_len"],
    )


def test_ts_ohlc_hourly_matches_python(spark):
    ev = _tbl("events")
    groups: dict = {}
    for e, ts, t, v in zip(ev.event_id, ev.ts.astype("int64"),
                           ev.event_type, ev.value):
        groups.setdefault((ts - ts % HOUR_US, t), []).append((ts, e, v))
    want = {}
    for k, rows in groups.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        want[k] = {
            "open_cents": int(cents([rows[0][2]])[0]),
            "high_cents": int(cents([max(vals)])[0]),
            "low_cents": int(cents([min(vals)])[0]),
            "close_cents": int(cents([rows[-1][2]])[0]),
            "n_trades": len(rows),
        }
    assert_keyed(
        run(spark, "ts_ohlc_hourly"), want, ["hour_us", "event_type"],
        ["open_cents", "high_cents", "low_cents", "close_cents",
         "n_trades"],
    )


def test_ts_scd2_ranges_matches_python(spark):
    o = _tbl("orders")
    by_cust: dict = {}
    for ck, pr, dt, ok in zip(o.o_custkey, o.o_orderpriority,
                              o.o_orderdate.astype("int64"), o.o_orderkey):
        by_cust.setdefault(ck, []).append((dt, ok, pr))
    want = {}
    for ck, rows in by_cust.items():
        rows.sort()
        ranges = []  # (vf, prio, n)
        for dt, ok, pr in rows:
            if ranges and ranges[-1][1] == pr:
                ranges[-1][2] += 1
            else:
                ranges.append([dt, pr, 1])
        for i, (vf, pr, n) in enumerate(ranges):
            nxt = ranges[i + 1][0] if i + 1 < len(ranges) else None
            want[(ck, i)] = {
                "o_orderpriority": pr, "valid_from_us": vf,
                "valid_to_us": nxt, "n_orders": n,
                "is_current": 1 if nxt is None else 0,
            }
    got = run(spark, "ts_scd2_ranges")
    got = got.sort_values(["o_custkey", "valid_from_us"])
    gk = {}
    idx: dict = {}
    for _, r in got.iterrows():
        i = idx.get(r.o_custkey, 0)
        idx[r.o_custkey] = i + 1
        gk[(r.o_custkey, i)] = r
    assert set(gk) == set(want)
    for k, exp in want.items():
        r = gk[k]
        assert r.o_orderpriority == exp["o_orderpriority"], k
        assert r.valid_from_us == exp["valid_from_us"], k
        assert (None if pd.isna(r.valid_to_us) else int(r.valid_to_us)) \
            == exp["valid_to_us"], k
        assert r.n_orders == exp["n_orders"], k
        assert r.is_current == exp["is_current"], k


def test_tpch_q6_matches_pandas(spark):
    li = _tbl("lineitem")
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    units = 0
    for sd, disc, qty, ext in zip(li.l_shipdate, li.l_discount,
                                  li.l_quantity, li.l_extendedprice):
        if (lo <= sd < hi and 0.05 <= disc <= 0.07 and qty < 24):
            units += int(cents([ext])[0]) * int(cents([disc])[0])
    got = run(spark, "tpch_q6_revenue_change").iloc[0]
    assert close(got.revenue, units / 1e4, 1e-9)


# --------------------- TPC-H replays, suite completion (wave 26)


def test_tpch_q4_matches_pandas(spark):
    o = _tbl("orders")
    li = _tbl("lineitem")
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    max_ship = li.groupby("l_orderkey")["l_shipdate"].max()
    agg: dict = {}
    for _, r in o.iterrows():
        if not (lo <= r.o_orderdate < hi):
            continue
        ms = max_ship.get(r.o_orderkey)
        if ms is not None and ms > r.o_orderdate + pd.Timedelta(days=90):
            agg[r.o_orderpriority] = agg.get(r.o_orderpriority, 0) + 1
    want = {(p,): {"order_count": n} for p, n in agg.items()}
    assert_keyed(run(spark, "tpch_q4_order_priority"), want,
                 ["o_orderpriority"], ["order_count"])


def test_tpch_q7_matches_pandas(spark):
    li = _tbl("lineitem")
    sup = _tbl("supplier")
    o = _tbl("orders")
    c = _tbl("customer")
    nat = _tbl("nation")
    nn = dict(zip(nat.n_nationkey, nat.n_name))
    sup_n = {k: nn[v] for k, v in zip(sup.s_suppkey, sup.s_nationkey)}
    cust_n = {k: nn[v] for k, v in zip(c.c_custkey, c.c_nationkey)}
    ord_c = dict(zip(o.o_orderkey, o.o_custkey))
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    agg: dict = {}
    for ok, sk, sd, ext, disc in zip(li.l_orderkey, li.l_suppkey,
                                     li.l_shipdate, li.l_extendedprice,
                                     li.l_discount):
        if not (lo <= sd < hi):
            continue
        sn, cn = sup_n[sk], cust_n[ord_c[ok]]
        if {sn, cn} != {"NATION_1", "NATION_2"}:
            continue
        k = (sn, cn, sd.year)
        agg[k] = agg.get(k, 0) + _rev_units(ext, disc)
    want = {k: {"revenue": u / 1e4} for k, u in agg.items()}
    assert_keyed(run(spark, "tpch_q7_volume_shipping"), want,
                 ["supp_nation", "cust_nation", "l_year"], ["revenue"],
                 tol=1e-9)


def test_tpch_q9_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    sup = _tbl("supplier")
    nat = _tbl("nation")
    nn = dict(zip(nat.n_nationkey, nat.n_name))
    sup_n = {k: nn[v] for k, v in zip(sup.s_suppkey, sup.s_nationkey)}
    retail = {
        r.p_partkey: int(cents([r.p_retailprice])[0])
        for _, r in p.iterrows() if "widget" in r.p_name
    }
    agg: dict = {}
    for pk, sk, sd, ext, disc, qty in zip(
            li.l_partkey, li.l_suppkey, li.l_shipdate,
            li.l_extendedprice, li.l_discount, li.l_quantity):
        if pk not in retail:
            continue
        # profit in exact 1e-6 decimal units: rev scale 4 → ×100; cost
        # = retail(s2) × qty(s2) × 0.10(s2) → scale 6 directly
        units = (_rev_units(ext, disc) * 100
                 - retail[pk] * int(cents([qty])[0]) * 10)
        k = (sup_n[sk], sd.year)
        agg[k] = agg.get(k, 0) + units
    want = {k: {"sum_profit": u / 1e6} for k, u in agg.items()}
    assert_keyed(run(spark, "tpch_q9_product_profit"), want,
                 ["nation", "o_year"], ["sum_profit"], tol=1e-9)


def test_tpch_q10_matches_pandas(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    li = _tbl("lineitem")
    nat = _tbl("nation")
    nn = dict(zip(nat.n_nationkey, nat.n_name))
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    ord_c = {
        r.o_orderkey: r.o_custkey for _, r in o.iterrows()
        if lo <= r.o_orderdate < hi
    }
    rev: dict = {}
    for ok, rf, ext, disc in zip(li.l_orderkey, li.l_returnflag,
                                 li.l_extendedprice, li.l_discount):
        if rf == "R" and ok in ord_c:
            ck = ord_c[ok]
            rev[ck] = rev.get(ck, 0) + _rev_units(ext, disc)
    info = {r.c_custkey: (r.c_name, r.c_acctbal, nn[r.c_nationkey])
            for _, r in c.iterrows()}
    rows = sorted(((u / 1e4, ck) for ck, u in rev.items()),
                  key=lambda t: (-t[0], t[1]))[:20]
    want = {}
    for r, ck in rows:
        nm, bal, natname = info[ck]
        want[(ck,)] = {"c_name": nm, "revenue": r, "c_acctbal": bal,
                       "n_name": natname}
    assert_keyed(run(spark, "tpch_q10_returned_items"), want,
                 ["c_custkey"], ["c_name", "revenue", "c_acctbal",
                                 "n_name"], tol=1e-9)


def test_tpch_q12_matches_pandas(spark):
    o = _tbl("orders")
    li = _tbl("lineitem")
    prio = dict(zip(o.o_orderkey, o.o_orderpriority))
    odate = dict(zip(o.o_orderkey, o.o_orderdate))
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    agg: dict = {}
    for ok, ls, sd in zip(li.l_orderkey, li.l_linestatus, li.l_shipdate):
        if not (lo <= sd < hi):
            continue
        if sd <= odate[ok] + pd.Timedelta(days=30):
            continue
        hi_p = prio[ok] in ("1-URGENT", "2-HIGH")
        cur = agg.setdefault(ls, [0, 0])
        cur[0 if hi_p else 1] += 1
    want = {(ls,): {"high_line_count": h, "low_line_count": l}
            for ls, (h, l) in agg.items()}
    assert_keyed(run(spark, "tpch_q12_priority_class"), want,
                 ["l_linestatus"], ["high_line_count", "low_line_count"])


def test_tpch_q14_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    ptype = dict(zip(p.p_partkey, p.p_type))
    lo, hi = pd.Timestamp("1997-09-01"), pd.Timestamp("1997-10-01")
    promo = total = 0
    seen_promo = False
    for pk, sd, ext, disc in zip(li.l_partkey, li.l_shipdate,
                                 li.l_extendedprice, li.l_discount):
        if not (lo <= sd < hi):
            continue
        u = _rev_units(ext, disc)
        total += u
        if ptype[pk] == "PROMO":
            promo += u
            seen_promo = True
    got = run(spark, "tpch_q14_promo_effect").iloc[0]
    want = (_rhu6(100.0 * (promo / 1e4) / (total / 1e4))
            if seen_promo else None)
    assert close(got.promo_revenue, want, 1e-6)


def test_tpch_q15_matches_pandas(spark):
    li = _tbl("lineitem")
    sup = _tbl("supplier")
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    rev: dict = {}
    for sk, sd, ext, disc in zip(li.l_suppkey, li.l_shipdate,
                                 li.l_extendedprice, li.l_discount):
        if lo <= sd < hi:
            rev[sk] = rev.get(sk, 0) + _rev_units(ext, disc)
    mx = max(u / 1e4 for u in rev.values())
    names = dict(zip(sup.s_suppkey, sup.s_name))
    want = {
        (sk,): {"s_name": names[sk], "total_revenue": u / 1e4}
        for sk, u in rev.items() if u / 1e4 == mx
    }
    assert_keyed(run(spark, "tpch_q15_top_supplier"), want,
                 ["s_suppkey"], ["s_name", "total_revenue"], tol=1e-9)


def test_tpch_q19_matches_pandas(spark):
    li = _tbl("lineitem")
    p = _tbl("part")
    attrs = {r.p_partkey: (r.p_brand, r.p_size) for _, r in p.iterrows()}
    arms = (("Brand#5", 15, 1, 11), ("Brand#13", 25, 10, 20),
            ("Brand#20", 35, 20, 30))
    units = 0
    for pk, qty, ext, disc in zip(li.l_partkey, li.l_quantity,
                                  li.l_extendedprice, li.l_discount):
        brand, size = attrs[pk]
        if any(brand == b and 1 <= size <= smax and qlo <= qty <= qhi
               for b, smax, qlo, qhi in arms):
            units += _rev_units(ext, disc)
    got = run(spark, "tpch_q19_disjunctive_pred").iloc[0]
    assert close(got.revenue, units / 1e4, 1e-9)


# ----------------- subqueries / audit joins replays (wave 27)


def test_sub_any_all_matches_ansi(spark):
    s = _tbl("supplier")
    c = _tbl("customer")
    by_nat: dict = {}
    for nk, bal in zip(c.c_nationkey, c.c_acctbal):
        by_nat.setdefault(nk, []).append(bal)
    want = {}
    for sk, nk, bal in zip(s.s_suppkey, s.s_nationkey, s.s_acctbal):
        vals = by_nat.get(nk, [])
        nn = [v for v in vals if not pd.isna(v)]
        has_null = len(nn) < len(vals)
        x = None if pd.isna(bal) else bal
        if not vals:
            any_, all_ = False, True
        elif x is None:
            any_ = all_ = None
        else:
            # ANSI three-valued quantifiers
            any_ = (True if any(x > v for v in nn)
                    else (None if has_null else False))
            all_ = (False if any(x <= v for v in nn)
                    else (None if has_null else True))
        want[(sk,)] = {"beats_any": any_, "beats_all": all_}
    assert_keyed(run(spark, "sub_any_all"), want, ["s_suppkey"],
                 ["beats_any", "beats_all"])


def test_sub_division_forall_matches_python(spark):
    o = _tbl("orders")
    per: dict = {}
    for ck, p in zip(o.o_custkey, o.o_orderpriority):
        per.setdefault(ck, set()).add(p)
    k = len(set(o.o_orderpriority))
    want = {(ck,): {"n_prio": len(ps)} for ck, ps in per.items()
            if len(ps) == k}
    assert_keyed(run(spark, "sub_division_forall"), want,
                 ["o_custkey"], ["n_prio"])


def test_sub_exists_aggregated_matches_python(spark):
    o = _tbl("orders")
    c = _tbl("customer")
    n_urgent: dict = {}
    for ck, p in zip(o.o_custkey, o.o_orderpriority):
        if p == "1-URGENT":
            n_urgent[ck] = n_urgent.get(ck, 0) + 1
    heavy = {ck for ck, n in n_urgent.items() if n > 5}
    want = {
        (ck,): {"c_mktsegment": seg}
        for ck, seg in zip(c.c_custkey, c.c_mktsegment) if ck in heavy
    }
    assert_keyed(run(spark, "sub_exists_aggregated"), want,
                 ["c_custkey"], ["c_mktsegment"])


def test_sub_in_tuple_matches_python(spark):
    o = _tbl("orders")
    od = o.o_orderdate.astype("int64")
    urgent = {
        (ck, d) for ck, d, p in zip(o.o_custkey, od, o.o_orderpriority)
        if p == "1-URGENT"
    }
    want = {
        (ok,): {"o_custkey": ck, "od_us": d}
        for ok, ck, d, p in zip(o.o_orderkey, o.o_custkey, od,
                                o.o_orderpriority)
        if p != "1-URGENT" and (ck, d) in urgent
    }
    assert_keyed(run(spark, "sub_in_tuple"), want, ["o_orderkey"],
                 ["o_custkey", "od_us"])


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_entity_resolution_matches_python(spark):
    c = _tbl("customer")
    names = dict(zip(c.c_custkey, c.c_name))
    want = {}
    for pk, nm in names.items():
        if pk % 50 != 0:
            continue
        p_name = nm[:10] + "X" + nm[11:]
        cand = sorted(
            (d, mk) for mk, mn in names.items()
            if (d := _lev(p_name, mn)) <= 2
        )
        if cand:
            d, mk = cand[0]
            want[(pk,)] = {"p_name": p_name, "matched_key": mk, "dist": d}
    assert_keyed(run(spark, "join_fuzzy_entity_resolution"), want,
                 ["p_key"], ["p_name", "matched_key", "dist"])


def test_scd2_point_in_time_matches_python(spark):
    o = _tbl("orders")
    ev = _tbl("events")
    by_cust: dict = {}
    for ck, pr, dt, ok in zip(o.o_custkey, o.o_orderpriority,
                              o.o_orderdate.astype("int64"), o.o_orderkey):
        by_cust.setdefault(ck, []).append((dt, ok, pr))
    ranges: dict = {}  # cust -> [(vf, run_id, prio)]
    for ck, rows in by_cust.items():
        rows.sort()
        rs = []
        for dt, ok, pr in rows:
            if not rs or rs[-1][2] != pr:
                rs.append((dt, len(rs), pr))
        ranges[ck] = rs
    want = {}
    for e, u, ts in zip(ev.event_id, ev.user_id, ev.ts.astype("int64")):
        cand = [(vf, rid, pr) for vf, rid, pr in ranges.get(u, [])
                if vf <= ts]
        if cand:
            vf, _, pr = max(cand)
            want[(e,)] = {"user_id": u, "ev_us": ts,
                          "prio_at_event": pr, "vf": vf}
    assert_keyed(run(spark, "join_scd2_point_in_time"), want,
                 ["event_id"], ["user_id", "ev_us", "prio_at_event", "vf"])


def test_fk_orphan_audit_matches_python(spark):
    li = _tbl("lineitem")
    o = _tbl("orders")
    c = _tbl("customer")
    p = _tbl("part")
    s = _tbl("supplier")
    n = _tbl("nation")
    edges = {
        "lineitem->orders": (li.l_orderkey, set(o.o_orderkey)),
        "orders->customer": (o.o_custkey, set(c.c_custkey)),
        "lineitem->part": (li.l_partkey, set(p.p_partkey)),
        "lineitem->supplier": (li.l_suppkey, set(s.s_suppkey)),
        "customer->nation": (c.c_nationkey, set(n.n_nationkey)),
    }
    want = {
        (fk,): {
            "n_child": len(child),
            "n_orphans": int(sum(1 for v in child if v not in parents)),
        }
        for fk, (child, parents) in edges.items()
    }
    assert_keyed(run(spark, "join_fk_orphan_audit"), want,
                 ["fk"], ["n_child", "n_orphans"])


def test_lateral_topn_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    per: dict = {}
    for ck, ok, tp in zip(o.o_custkey, o.o_orderkey, o.o_totalprice):
        if seg.get(ck) == "BUILDING":
            per.setdefault(ck, []).append((-tp, ok, tp))
    want = {}
    for ck, rows in per.items():
        for _, ok, tp in sorted(rows)[:2]:
            want[(ck, ok)] = {"c_mktsegment": "BUILDING",
                              "o_totalprice": tp}
    assert_keyed(run(spark, "join_lateral_topn"), want,
                 ["c_custkey", "o_orderkey"],
                 ["c_mktsegment", "o_totalprice"])


def test_existence_mark_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    urgent = {ck for ck, p in zip(o.o_custkey, o.o_orderpriority)
              if p == "1-URGENT"}
    want = {
        (ck,): {"c_mktsegment": seg, "has_urgent_order": ck in urgent}
        for ck, seg in zip(c.c_custkey, c.c_mktsegment)
    }
    assert_keyed(run(spark, "join_existence_mark"), want,
                 ["c_custkey"], ["c_mktsegment", "has_urgent_order"])


# ---------------------- grouping sets / basics closeout (wave 28)


def test_agg_rollup_matches_python(spark):
    li = _tbl("lineitem")
    agg: dict = {}
    for f, ls, q in zip(li.l_returnflag, li.l_linestatus, li.l_quantity):
        for key in ((f, ls), (f, None), (None, None)):
            cur = agg.setdefault(key, [0.0, 0])
            cur[0] += q
            cur[1] += 1
    want = {k: {"sum_qty": s, "n": n} for k, (s, n) in agg.items()}
    assert_keyed(run(spark, "agg_rollup"), want,
                 ["l_returnflag", "l_linestatus"], ["sum_qty", "n"],
                 tol=1e-6)


def test_agg_cube_matches_python(spark):
    o = _tbl("orders")
    agg: dict = {}
    for st, pr, c in zip(o.o_orderstatus, o.o_orderpriority,
                         cents(o.o_totalprice)):
        for key in ((st, pr), (st, None), (None, pr), (None, None)):
            cur = agg.setdefault(key, [0, 0])
            cur[0] += 1
            cur[1] += int(c)
    want = {k: {"n": n, "total": tc / 100} for k, (n, tc) in agg.items()}
    assert_keyed(run(spark, "agg_cube"), want,
                 ["o_orderstatus", "o_orderpriority"], ["n", "total"])


def test_agg_grouping_sets_matches_python(spark):
    li = _tbl("lineitem")
    agg: dict = {}
    for f, ls, q in zip(li.l_returnflag, li.l_linestatus, li.l_quantity):
        for key, gf, gs in (((f, None), 0, 1), ((None, ls), 1, 0),
                            ((None, None), 1, 1)):
            cur = agg.setdefault((key, gf, gs), 0.0)
            agg[(key, gf, gs)] = cur + q
    want = {
        (k[0], k[1], gf, gs): {"sum_qty": s}
        for (k, gf, gs), s in agg.items()
    }
    assert_keyed(run(spark, "agg_grouping_sets"), want,
                 ["l_returnflag", "l_linestatus", "g_flag", "g_status"],
                 ["sum_qty"], tol=1e-6)


def test_agg_mode_matches_python(spark):
    c = _tbl("customer")
    counts: dict = {}
    for seg, nk in zip(c.c_mktsegment, c.c_nationkey):
        counts[(seg, nk)] = counts.get((seg, nk), 0) + 1
    best: dict = {}
    for (seg, nk), n in counts.items():
        cur = best.get(seg)
        if cur is None or (-n, nk) < (-cur[1], cur[0]):
            best[seg] = (nk, n)
    want = {(seg,): {"mode_nation": nk, "n": n}
            for seg, (nk, n) in best.items()}
    assert_keyed(run(spark, "agg_mode"), want, ["c_mktsegment"],
                 ["mode_nation", "n"])


def test_agg_percentile_exact_matches_numpy(spark):
    li = _tbl("lineitem")
    want = {}
    for f, g in li.groupby("l_returnflag")["l_quantity"]:
        v = g.to_numpy(dtype=np.float64)
        want[(f,)] = {
            "median_qty": float(np.percentile(v, 50, method="linear")),
            "p90_qty": float(np.percentile(v, 90, method="linear")),
        }
    assert_keyed(run(spark, "agg_percentile_exact"), want,
                 ["l_returnflag"], ["median_qty", "p90_qty"], tol=1e-4)


def test_agg_string_concat_ordered_matches_python(spark):
    c = _tbl("customer")
    groups: dict = {}
    for ck, nk, nm in zip(c.c_custkey, c.c_nationkey, c.c_name):
        if ck <= 200:
            groups.setdefault(nk, []).append((ck, nm))
    want = {
        (nk,): {"names": ",".join(nm for _, nm in sorted(rows))}
        for nk, rows in groups.items()
    }
    assert_keyed(run(spark, "agg_string_concat_ordered"), want,
                 ["c_nationkey"], ["names"])


def test_limit_topk_global_matches_python(spark):
    o = _tbl("orders")
    rows = sorted(
        zip(o.o_totalprice, o.o_orderkey, o.o_custkey),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    want = {(ok,): {"o_custkey": ck, "o_totalprice": tp}
            for tp, ok, ck in rows}
    assert_keyed(run(spark, "limit_topk_global"), want,
                 ["o_orderkey"], ["o_custkey", "o_totalprice"])


def test_win_row_number_topk_matches_python(spark):
    got = run(spark, "win_row_number_topk")
    o = _tbl("orders")
    per: dict = {}
    for ck, ok, tp in zip(o.o_custkey, o.o_orderkey, o.o_totalprice):
        per.setdefault(ck, []).append((-tp, ok, tp))
    want = {}
    for ck, rows in per.items():
        for rn, (_, ok, tp) in enumerate(sorted(rows)[:3], start=1):
            want[(ck, ok)] = {"o_totalprice": tp, "rn": rn}
    gk = {(r.o_custkey, r.o_orderkey): r for _, r in got.iterrows()}
    assert set(gk) == set(want)
    for k, exp in want.items():
        assert gk[k].o_totalprice == exp["o_totalprice"], k
        assert gk[k].rn == exp["rn"], k


# ----------------- round-10 E1 DSL surface replays (wave 29)
# VERDICT r9 item 6: the two round-9 compiler keys ($asof, $window)
# rested on oracle + property tests only — a twin bug in the DSL
# lowering would hash-match the hand-written oracle. These replays
# recompute the same results via pandas.merge_asof and a pure-Python
# rolling sweep, sharing nothing with the compiler or either engine.


def test_compiler_asof_hop_matches_merge_asof(spark):
    ev = _tbl("events")[["event_id", "user_id", "ts"]].copy()
    od = _tbl("orders")[
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ].copy()
    ev["t"] = pd.to_datetime(ev.ts)
    od["t"] = pd.to_datetime(od.o_orderdate)
    ev = ev.sort_values("t", kind="mergesort")
    # merge_asof takes the LAST qualifying right row in sort order, so
    # sorting by (t, o_orderkey) realizes the documented max-o_orderkey
    # tiebreak independently of the engine's row_number spelling.
    od = od.sort_values(["t", "o_orderkey"], kind="mergesort")
    m = pd.merge_asof(
        ev, od, on="t",
        left_by="user_id", right_by="o_custkey",
        direction="backward", allow_exact_matches=True,
    ).dropna(subset=["o_orderkey"])
    want = {
        (r.event_id,): {
            "user_id": r.user_id,
            "o_orderkey": int(r.o_orderkey),
            "o_totalprice": r.o_totalprice,
        }
        for _, r in m.iterrows()
    }
    assert_keyed(
        run(spark, "compiler_asof_hop"), want,
        ["event_id"], ["user_id", "o_orderkey", "o_totalprice"],
    )


def test_compiler_window_frame_matches_rolling_sweep(spark):
    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"].sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
    )
    want = {}
    for ck, g in f.groupby("o_custkey"):
        prices = list(g.o_totalprice)
        keys = list(g.o_orderkey)
        run_cents = 0
        for i, (ok, p) in enumerate(zip(keys, prices)):
            # the running total is DECIMAL(12,2)-exact inside the frame
            # (docstring contract): integer cents, divided at emission
            run_cents += int(cents(p))
            want[(ck, ok)] = {
                "o_totalprice": p,
                "run_total": run_cents / 100.0,
                "mov_min3": min(prices[max(0, i - 2): i + 1]),
                "prev_price": prices[i - 1] if i else 0.0,
            }
    assert_keyed(
        run(spark, "compiler_window_frame"), want,
        ["o_custkey", "o_orderkey"],
        ["o_totalprice", "run_total", "mov_min3", "prev_price"],
    )


# -------- order/window/ratio/compiler-TPC-H replays (wave 30)
# Round-10 closing sweep over the highest-twin-risk keys that still
# rested on oracle parity alone. Two checks here are ORDER-sensitive —
# the driver's value hash is order-insensitive, so a globally-ordered
# result could silently come back unsorted and still hash-green; these
# assert the emitted row SEQUENCE.


def test_sort_global_range_partitioned_emits_sorted_sequence(spark):
    got = QUERIES["sort_global_range_partitioned"](spark, SF_DIR).toPandas()
    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"]
    want = sorted(
        zip(f.o_orderkey, f.o_custkey, f.o_totalprice),
        key=lambda t: (-t[2], t[0]),
    )
    got_rows = list(zip(got.o_orderkey, got.o_custkey, got.o_totalprice))
    assert got_rows == want  # exact sequence, not just the multiset


def test_sort_multikey_rank_matches_python(spark):
    li = _tbl("lineitem")
    f = li[li.l_quantity >= 49]
    rows = sorted(
        zip(f.l_orderkey, f.l_linenumber, f.l_returnflag,
            f.l_linestatus, f.l_quantity),
        key=lambda t: (
            # l_returnflag DESC (no nulls in the base fixture), rest ASC
            tuple(-ord(c) for c in t[2]), t[3], t[0], t[1], t[4],
        ),
    )
    want = [r + (i,) for i, r in enumerate(rows, start=1)]
    got = QUERIES["sort_multikey"](spark, SF_DIR).toPandas()
    got_rows = sorted(
        zip(got.l_orderkey, got.l_linenumber, got.l_returnflag,
            got.l_linestatus, got.l_quantity, got.rnk),
        key=lambda t: t[5],
    )
    assert got_rows == want


def test_win_lag_lead_matches_python(spark):
    ev = _tbl("events")
    ev = ev.assign(ts_us=ev.ts.astype("int64"))  # datetime64[us] -> us
    want = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        vals = list(g.value)
        for i, (_, r) in enumerate(g.iterrows()):
            want[(r.event_id,)] = {
                "user_id": r.user_id,
                "value": r.value,
                "prev_value": vals[i - 1] if i else None,
                "next_value": vals[i + 1] if i + 1 < len(vals) else None,
            }
    assert_keyed(run(spark, "win_lag_lead"), want, ["event_id"],
                 ["user_id", "value", "prev_value", "next_value"])


def _daily_cents():
    o = _tbl("orders")
    day = o.o_orderdate.dt.strftime("%Y-%m-%d")
    return (
        pd.DataFrame({"d": day, "c": cents(o.o_totalprice)})
        .groupby("d")["c"].sum().sort_index()
    )


def test_win_running_sum_matches_python(spark):
    daily = _daily_cents()
    cum = daily.cumsum()
    want = {
        (d,): {"daily_revenue": daily[d] / 100.0, "cum_revenue": cum[d] / 100.0}
        for d in daily.index
    }
    assert_keyed(run(spark, "win_running_sum"), want, ["order_date"],
                 ["daily_revenue", "cum_revenue"])


def test_win_moving_avg_matches_python(spark):
    daily = _daily_cents()
    vals = list(daily)
    want = {}
    for i, d in enumerate(daily.index):
        window = vals[max(0, i - 6): i + 1]
        want[(d,)] = {"ma7_revenue": (sum(window) / 100.0) / len(window)}
    assert_keyed(run(spark, "win_moving_avg"), want, ["order_date"],
                 ["ma7_revenue"])


def test_win_range_frame_matches_python(spark):
    o = _tbl("orders")
    day_s = o.o_orderdate.astype("int64") // 1_000_000  # us -> s (UTC)
    daily = (
        pd.DataFrame({"s": day_s, "c": cents(o.o_totalprice)})
        .groupby("s")["c"].sum().sort_index()
    )
    want = {}
    for s in daily.index:
        win = daily[(daily.index >= s - 518400) & (daily.index <= s)]
        want[(s,)] = {"trailing_7d": win.sum() / 100.0}
    assert_keyed(run(spark, "win_range_frame"), want, ["day_s"],
                 ["trailing_7d"])


def test_win_first_last_nth_matches_python(spark):
    o = _tbl("orders")
    want = {}
    for ck, g in o.groupby("o_custkey"):
        ordered = sorted(zip(g.o_totalprice, g.o_orderkey),
                         key=lambda t: (-t[0], t[1]))
        keys = [ok for _, ok in ordered]
        for ok in keys:
            want[(ck, ok)] = {
                "first_ok": keys[0],
                "last_ok": keys[-1],
                "second_ok": keys[1] if len(keys) > 1 else None,
            }
    assert_keyed(run(spark, "win_first_last_nth"), want,
                 ["o_custkey", "o_orderkey"],
                 ["first_ok", "last_ok", "second_ok"])


def test_join_interval_overlap_matches_python(spark):
    ev = _tbl("events")
    us = ev.ts.astype("int64")
    a = [(u, e, t, t + HOUR_US) for u, e, t, k in
         zip(ev.user_id, ev.event_id, us, ev.event_type) if k == "click"]
    b = [(u, e, t, t + HOUR_US) for u, e, t, k in
         zip(ev.user_id, ev.event_id, us, ev.event_type) if k == "purchase"]
    by_user: dict = {}
    for u, e, s, t in b:
        by_user.setdefault(u, []).append((e, s, t))
    want = set()
    for u, ae, as_, aend in a:
        for be, bs, bend in by_user.get(u, []):
            if as_ < bend and bs < aend:  # docstring: half-open overlap
                want.add((u, ae, be))
    got = run(spark, "join_interval_overlap")
    got_set = set(zip(got.user_id, got.a_id, got.b_id))
    assert got_set == want and len(got) == len(want)


def test_agg_hist_orders_per_cust_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    per = o.groupby("o_custkey").size()
    n_orders = [int(per.get(ck, 0)) for ck in c.c_custkey]
    hist = pd.Series(n_orders).value_counts()
    want = {(int(k),): {"n_customers": int(v)} for k, v in hist.items()}
    assert_keyed(run(spark, "agg_hist_orders_per_cust"), want,
                 ["n_orders"], ["n_customers"])


def test_agg_conditional_ratio_matches_python(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, g in li.groupby("l_returnflag"):
        n = len(g)
        disc = g.l_discount > 0.05
        nd = int(disc.sum())
        rev = cents(g.l_extendedprice).sum()
        rev_d = cents(g.l_extendedprice[disc]).sum()
        want[(flag,)] = {
            "n_rows": n, "n_disc": nd,
            "disc_row_share": round(nd / n, 6),
            "rev_total": rev / 100.0, "rev_disc": rev_d / 100.0,
            "disc_rev_share": round((rev_d / 100.0) / (rev / 100.0), 6),
        }
    assert_keyed(run(spark, "agg_conditional_ratio"), want,
                 ["l_returnflag"],
                 ["n_rows", "n_disc", "disc_row_share",
                  "rev_total", "rev_disc", "disc_rev_share"])


def test_agg_percent_of_total_matches_python(spark):
    li = _tbl("lineitem")
    cell = {}
    for (f_, s_), g in li.groupby(["l_returnflag", "l_linestatus"]):
        cell[(f_, s_)] = cents(g.l_extendedprice).sum() / 100.0
    flag_rev = {}
    for (f_, _), v in cell.items():
        flag_rev[f_] = flag_rev.get(f_, 0.0) + v
    total = sum(flag_rev.values())
    want = {
        k: {
            "rev": round(v, 4),
            "pct_of_flag": round(v / flag_rev[k[0]], 6),
            "pct_of_total": round(v / total, 6),
        }
        for k, v in cell.items()
    }
    assert_keyed(run(spark, "agg_percent_of_total"), want,
                 ["l_returnflag", "l_linestatus"],
                 ["rev", "pct_of_flag", "pct_of_total"])


def _q1_frames():
    li = _tbl("lineitem")
    f = li[li.l_shipdate <= pd.Timestamp("1998-09-01")]
    pc = cents(f.l_extendedprice)
    dc = cents(f.l_discount)   # 2-dec discounts -> integer cents
    tc = cents(f.l_tax)
    return f, pc, dc, tc


def test_compiler_q1_full_matches_pandas(spark):
    f, pc, dc, tc = _q1_frames()
    df = pd.DataFrame({
        "flag": f.l_returnflag.to_numpy(), "st": f.l_linestatus.to_numpy(),
        "qty": f.l_quantity.to_numpy(), "pc": pc,
        "disc_e4": pc * (100 - dc), "charge_e6": pc * (100 - dc) * (100 + tc),
    })
    want = {}
    for (flag, st), g in df.groupby(["flag", "st"]):
        n = len(g)
        want[(flag, st)] = {
            "sum_qty": g.qty.sum(),
            "sum_base_price": g.pc.sum() / 1e2,
            "sum_disc_price": g.disc_e4.sum() / 1e4,
            "sum_charge": g.charge_e6.sum() / 1e6,
            "avg_qty": g.qty.sum() / n,
            "avg_price": (g.pc.sum() / 1e2) / n,
            "count_order": n,
        }
    assert_keyed(run(spark, "compiler_q1_full"), want,
                 ["l_returnflag", "l_linestatus"],
                 ["sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge", "avg_qty", "avg_price", "count_order"])


def test_compiler_q3_full_matches_pandas(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    li = _tbl("lineitem")
    cut = pd.Timestamp("1996-07-01")
    cks = set(c.loc[c.c_mktsegment == "BUILDING", "c_custkey"])
    od = o[(o.o_orderdate < cut) & o.o_custkey.isin(cks)]
    ls = li[li.l_shipdate > cut]
    m = ls.merge(
        od[["o_orderkey", "o_orderpriority"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    rev_e4 = cents(m.l_extendedprice) * (100 - cents(m.l_discount))
    agg = (
        pd.DataFrame({"ok": m.o_orderkey, "pr": m.o_orderpriority,
                      "r": rev_e4})
        .groupby(["ok", "pr"])["r"].sum()
    )
    top = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0][0]))[:10]
    want = {
        (int(ok),): {"o_orderpriority": pr, "revenue": r / 1e4}
        for (ok, pr), r in top
    }
    assert_keyed(run(spark, "compiler_q3_full"), want,
                 ["o_orderkey"], ["o_orderpriority", "revenue"])


def test_compiler_q6_full_matches_pandas(spark):
    li = _tbl("lineitem")
    f = li[
        (li.l_shipdate >= pd.Timestamp("1997-01-01"))
        & (li.l_shipdate < pd.Timestamp("1998-01-01"))
        & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ]
    rev = (cents(f.l_extendedprice) * cents(f.l_discount)).sum() / 1e4
    got = run(spark, "compiler_q6_full").iloc[0]
    assert close(got.revenue, rev)


# -------- multiset / null-semantics / salting replays (wave 31)
# The ANSI corners where a twin bug is most plausible: bag-algebra
# multiplicities, NOT-IN/null-safe matching, argmin/argmax tiebreaks,
# skew-salting as a provable no-op. Each recomputed from first
# principles (collections.Counter bag math, explicit None matching).


def _bag(df_or_rows):
    from collections import Counter

    if isinstance(df_or_rows, pd.DataFrame):
        return Counter(tuple(r) for r in df_or_rows.itertuples(index=False))
    return Counter(tuple(r) for r in df_or_rows)


def _orders_ab():
    o = _tbl("orders")
    a = list(zip(o.o_custkey, o.o_orderstatus))
    hv = o[o.o_totalprice > 250000]
    b = list(zip(hv.o_custkey, hv.o_orderstatus))
    return a, b


def test_set_intersect_all_bag_multiplicity(spark):
    a, b = _orders_ab()
    ca, cb = _bag(a), _bag(b)
    want = {k: min(ca[k], cb[k]) for k in ca if k in cb}
    got = _bag(run(spark, "set_intersect_all"))
    assert got == {k: v for k, v in want.items() if v > 0}


def test_set_except_all_bag_multiplicity(spark):
    a, b = _orders_ab()
    ca, cb = _bag(a), _bag(b)
    want = {k: ca[k] - cb.get(k, 0) for k in ca}
    got = _bag(run(spark, "set_except_all"))
    assert got == {k: v for k, v in want.items() if v > 0}


def test_set_intersect_except_are_distinct(spark):
    a, b = _orders_ab()
    sa, sb = set(a), set(b)
    assert _bag(run(spark, "set_intersect")) == {k: 1 for k in sa & sb}
    assert _bag(run(spark, "set_except")) == {k: 1 for k in sa - sb}


def test_set_symmetric_diff_matches_python(spark):
    c = _tbl("customer")
    building = set(c.loc[c.c_mktsegment == "BUILDING", "c_custkey"])
    rich = set(c.loc[c.c_acctbal > 5000, "c_custkey"])
    want = {(k,): {} for k in building ^ rich}
    got = run(spark, "set_symmetric_diff")
    assert set((k,) for k in got.c_custkey) == set(want)
    assert len(got) == len(want)


def test_sub_in_and_not_in_match_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    n = _tbl("nation")
    s = _tbl("supplier")
    inset = set(o.loc[o.o_totalprice > 300000, "o_custkey"])
    want_in = {
        (r.c_custkey,): {"c_name": r.c_name, "c_mktsegment": r.c_mktsegment}
        for _, r in c.iterrows() if r.c_custkey in inset
    }
    assert_keyed(run(spark, "sub_in"), want_in, ["c_custkey"],
                 ["c_name", "c_mktsegment"])
    have_supp = set(s.s_nationkey)
    want_ni = {
        (r.n_nationkey,): {"n_name": r.n_name}
        for _, r in n.iterrows() if r.n_nationkey not in have_supp
    }
    assert_keyed(run(spark, "sub_not_in"), want_ni, ["n_nationkey"],
                 ["n_name"])


def test_sub_correlated_scalar_matches_python(spark):
    li = _tbl("lineitem")
    avg = {}
    for pk, g in li.groupby("l_partkey"):
        avg[pk] = (cents(g.l_quantity).sum() / 100.0) / len(g)
    keep = [
        (ok, pk, q)
        for ok, pk, q in zip(li.l_orderkey, li.l_partkey, li.l_quantity)
        if q < 0.4 * avg[pk]
    ]
    got = run(spark, "sub_correlated_scalar")
    assert _bag(got) == _bag(keep)


def test_join_null_safe_matches_python(spark):
    c = _tbl("customer")
    s = _tbl("supplier")
    ck = [
        (r.c_custkey,
         None if r.c_mktsegment == "AUTOMOBILE" else r.c_nationkey)
        for _, r in c.iterrows()
    ]
    sk = [
        (r.s_suppkey, None if r.s_acctbal < 0 else r.s_nationkey)
        for _, r in s.iterrows()
    ]
    want = [
        (ckey, skey, nk)
        for ckey, nk in ck
        for skey, snk in sk
        if nk == snk or (nk is None and snk is None)
    ]
    got = run(spark, "join_null_safe")
    got_rows = [
        (a, b, None if pd.isna(v) else v)
        for a, b, v in zip(got.c_custkey, got.s_suppkey, got.nk)
    ]
    assert _bag(got_rows) == _bag(want)


def test_join_existence_mark_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    urgent = set(o.loc[o.o_orderpriority == "1-URGENT", "o_custkey"])
    want = {
        (r.c_custkey,): {
            "c_mktsegment": r.c_mktsegment,
            "has_urgent_order": r.c_custkey in urgent,
        }
        for _, r in c.iterrows()
    }
    assert_keyed(run(spark, "join_existence_mark"), want, ["c_custkey"],
                 ["c_mktsegment", "has_urgent_order"])


def test_join_skew_salted_equals_plain_join(spark):
    ev = _tbl("events")
    c = _tbl("customer")
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    want = [
        (e, u, seg[u])
        for e, u in zip(ev.event_id, ev.user_id) if u in seg
    ]
    got = run(spark, "join_skew_salted")
    assert _bag(got) == _bag(want)  # salting must be a bag-exact no-op


def test_join_runtime_bloom_filter_matches_python(spark):
    li = _tbl("lineitem")
    o = _tbl("orders")
    pkeys = set(o.loc[o.o_orderstatus == "P", "o_orderkey"])
    m = li[li.l_orderkey.isin(pkeys)]
    want = {
        (int(ok),): {
            "n_lines": len(g),
            "qty": cents(g.l_quantity).sum() / 100.0,
        }
        for ok, g in m.groupby("l_orderkey")
    }
    assert_keyed(run(spark, "join_runtime_bloom_filter"), want,
                 ["l_orderkey"], ["n_lines", "qty"])


def test_agg_min_max_by_tiebreak_matches_python(spark):
    o = _tbl("orders")
    want = {}
    for pr, g in o.groupby("o_orderpriority"):
        by = [(tp * 100000 + ok, ok, tp)
              for ok, tp in zip(g.o_orderkey, g.o_totalprice)]
        want[(pr,)] = {
            "biggest_order": max(by)[1],
            "smallest_order": min(by)[1],
            "max_price": g.o_totalprice.max(),
            "min_price": g.o_totalprice.min(),
        }
    assert_keyed(run(spark, "agg_min_max_by"), want, ["o_orderpriority"],
                 ["biggest_order", "smallest_order",
                  "max_price", "min_price"])


def test_agg_listagg_and_collect_set_matches_python(spark):
    o = _tbl("orders")
    want = {}
    for ck, g in o.groupby("o_custkey"):
        ps = sorted(set(g.o_orderpriority))
        want[(ck,)] = {"prios": "|".join(ps), "n_prios": len(ps)}
    assert_keyed(run(spark, "agg_listagg_distinct"), want, ["o_custkey"],
                 ["prios", "n_prios"])
    c = _tbl("customer")
    want2 = {
        (nk,): {"segments": ",".join(sorted(set(g.c_mktsegment)))}
        for nk, g in c.groupby("c_nationkey")
    }
    assert_keyed(run(spark, "agg_collect_set"), want2, ["c_nationkey"],
                 ["segments"])


def test_agg_profile_columns_matches_python(spark):
    li = _tbl("lineitem")
    got = run(spark, "agg_profile_columns").iloc[0]
    assert int(got.n_rows) == len(li)
    assert int(got.rf_non_null) == int(li.l_returnflag.notna().sum())
    assert int(got.rf_distinct) == li.l_returnflag.nunique()
    assert int(got.status_distinct) == li.l_linestatus.nunique()
    assert close(got.qty_min, li.l_quantity.min())
    assert close(got.qty_max, li.l_quantity.max())
    assert int(got.key_distinct) == li.l_orderkey.nunique()
    assert int(got.qty_nulls) == int(li.l_quantity.isna().sum())


def test_filter_null_semantics_matches_python(spark):
    ev = _tbl("events")
    want = {}
    for eid, et in zip(ev.event_id, ev.event_type):
        v = None if et == "error" else et
        want[(eid,)] = {
            "et_or_null": v,
            "is_err": v is None,
            "nse_click": v == "click",  # null-safe: None == 'click' is False
        }
    assert_keyed(run(spark, "filter_null_semantics"), want, ["event_id"],
                 ["et_or_null", "is_err", "nse_click"])


# -------- scalar-function family stdlib replays (wave 32)
# Every check recomputes a fn_* family with the Python standard library
# (hashlib, re, urllib.parse, calendar/datetime, math, int bit ops) —
# a third implementation that shares nothing with either engine, so a
# shared misreading of a function contract (parse_url components, ISO
# week/dow, mask classes, regex token splitting) cannot hash-match
# its way through.


def test_fn_bitwise_matches_python_ints(spark):
    o = _tbl("orders")
    f = o[o.o_orderkey <= 20000]
    want = {
        (int(k),): {
            "k_and": int(k) & 255,
            "k_or": int(k) | 4096,
            "k_xor": int(k) ^ int(c),
            "k_shl": int(k) << 3,
            "k_shr": int(k) >> 2,
            "k_pop": bin(int(k)).count("1"),
        }
        for k, c in zip(f.o_orderkey, f.o_custkey)
    }
    assert_keyed(run(spark, "fn_bitwise"), want, ["o_orderkey"],
                 ["k_and", "k_or", "k_xor", "k_shl", "k_shr", "k_pop"])


def test_fn_hash_matches_hashlib(spark):
    import hashlib

    c = _tbl("customer")
    want = {}
    for ck, name, seg in zip(c.c_custkey, c.c_name, c.c_mktsegment):
        md5 = hashlib.md5(name.encode()).hexdigest()
        sha = hashlib.sha256(name.encode()).hexdigest()
        want[(ck,)] = {
            "name_md5": md5,
            "name_sha256": sha,
            "seg_bucket": hashlib.md5(seg.encode()).hexdigest()[:8],
            "sha_len": len(sha),
        }
    assert_keyed(run(spark, "fn_hash"), want, ["c_custkey"],
                 ["name_md5", "name_sha256", "seg_bucket", "sha_len"])


def test_fn_url_matches_urllib(spark):
    from urllib.parse import parse_qs, urlparse

    d = _tbl("documents")
    want = {}
    for did, src, lang, n in zip(d.doc_id, d.source, d.lang, d.n_chars):
        u = urlparse(f"https://{src}.example.com/docs/{did}?lang={lang}&n={n}")
        q = parse_qs(u.query)
        want[(did,)] = {
            "host": u.hostname,
            "path": u.path,
            "query": u.query,
            "q_lang": q["lang"][0],
            "q_n": q["n"][0],
        }
    assert_keyed(run(spark, "fn_url"), want, ["doc_id"],
                 ["host", "path", "query", "q_lang", "q_n"])


def test_fn_regex_matches_python_re(spark):
    import re

    d = _tbl("documents")
    want = {}
    for did, text in zip(d.doc_id, d.text):
        m = re.match(r"^(\w+)", text)
        want[(did,)] = {
            "first_word": m.group(1) if m else "",
            "n_vowel_words": len(
                re.findall(r"(?<![A-Za-z0-9_])[aeiou][a-z]*", text)
            ),
            "masked_len": len(re.sub("[aeiou]", "*", text)),
            "n_tokens": len(re.split(r"\s+", text)),
            "has_aggscan": 1 if re.search("agg.*scan", text) else 0,
        }
    assert_keyed(run(spark, "fn_regex"), want, ["doc_id"],
                 ["first_word", "n_vowel_words", "masked_len",
                  "n_tokens", "has_aggscan"])


def test_fn_try_safe_matches_python(spark):
    ev = _tbl("events")
    want = {}
    for eid, props, v in zip(ev.event_id, ev.props, ev.value):
        k = json.loads(props).get("k")
        m = int(math.floor(v * 100 + 0.5)) % 7  # round-half-up cents
        want[(eid,)] = {
            "k_int": k if isinstance(k, int) else None,
            "bogus_int": None,  # words never cast to int
            "div7": round(v / m, 6) if m else None,
            "first_char_int": None,
        }
    assert_keyed(run(spark, "fn_try_safe"), want, ["event_id"],
                 ["k_int", "bogus_int", "div7", "first_char_int"])


def test_fn_date_arith_matches_python_calendar(spark):
    import calendar
    import datetime as dt

    o = _tbl("orders")
    horizon = dt.date(2025, 1, 1)

    def add_months(d, n):
        y, m = divmod(d.month - 1 + n, 12)
        y, m = d.year + y, m + 1
        return dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))

    want = {}
    for ok, ts in zip(o.o_orderkey, o.o_orderdate):
        d = ts.date()
        last = dt.date(d.year, d.month,
                       calendar.monthrange(d.year, d.month)[1])
        want[(ok,)] = {
            "month_end": last.strftime("%Y-%m-%d"),
            "plus3m": add_months(d, 3).strftime("%Y-%m-%d"),
            "qtr": (d.month - 1) // 3 + 1,
            "iso_week": d.isocalendar()[1],
            "iso_dow": d.isoweekday(),
            "days_to_2025": (horizon - d).days,
        }
    assert_keyed(run(spark, "fn_date_arith"), want, ["o_orderkey"],
                 ["month_end", "plus3m", "qtr", "iso_week", "iso_dow",
                  "days_to_2025"])


def test_fn_struct_matches_python(spark):
    o = _tbl("orders")
    want = {}
    for ck, g in o.groupby("o_custkey"):
        rows = sorted(
            (d.strftime("%Y-%m-%d"), int(k))
            for d, k in zip(g.o_orderdate, g.o_orderkey)
        )
        want[(ck,)] = {
            "n_orders": len(rows),
            "first_date": rows[0][0], "first_key": rows[0][1],
            "last_date": rows[-1][0], "last_key": rows[-1][1],
        }
    assert_keyed(run(spark, "fn_struct"), want, ["o_custkey"],
                 ["n_orders", "first_date", "first_key",
                  "last_date", "last_key"])


def test_fn_string_extra_matches_python(spark):
    c = _tbl("customer")
    want = {}
    for ck, name, seg in zip(c.c_custkey, c.c_name, c.c_mktsegment):
        want[(ck,)] = {
            "padded_id": str(ck).rjust(12, "0"),
            "padded_seg": seg.ljust(12, "."),
            "translated": name.translate(str.maketrans("#0", "_X")),
            "replaced": name.replace("Customer", "Acct"),
            "rev_seg": seg[::-1],
            "stars": "*" * (ck % 5),
            "l8": name[:8],
            "r4": name[-4:] if len(name) >= 4 else name,
        }
    assert_keyed(run(spark, "fn_string_extra"), want, ["c_custkey"],
                 ["padded_id", "padded_seg", "translated", "replaced",
                  "rev_seg", "stars", "l8", "r4"])


def test_fn_json_roundtrip_matches_python(spark):
    o = _tbl("orders")
    want = {
        (ok,): {
            "status": st,
            "prio_len": len(pr),
            "key2": 2 * int(ok),
        }
        for ok, st, pr in zip(o.o_orderkey, o.o_orderstatus,
                              o.o_orderpriority)
    }
    assert_keyed(run(spark, "fn_json_roundtrip"), want, ["o_orderkey"],
                 ["status", "prio_len", "key2"])


def test_fn_mask_redact_matches_python(spark):
    import re

    c = _tbl("customer")
    want = {}
    for ck, name in zip(c.c_custkey, c.c_name):
        masked = re.sub("[0-9]", "n",
                        re.sub("[a-z]", "x", re.sub("[A-Z]", "X", name)))
        want[(ck,)] = {
            "masked_name": masked,
            "digits_starred": re.sub("[0-9]", "*", name),
        }
    assert_keyed(run(spark, "fn_mask_redact"), want, ["c_custkey"],
                 ["masked_name", "digits_starred"])


def test_fn_trig_matches_math(spark):
    want = {}
    for ck in _tbl("customer").c_custkey:
        deg = (ck % 360) + 0.5
        r = math.radians(deg)
        want[(ck,)] = {
            "rad": r, "s": math.sin(r), "c": math.cos(r),
            "t": math.tan(r),
            "theta": math.atan2(math.sin(r), math.cos(r)),
            "unit": 1.0,
        }
    assert_keyed(run(spark, "fn_trig"), want, ["c_custkey"],
                 ["rad", "s", "c", "t", "theta", "unit"], tol=2e-6)


def test_fn_higher_order_lambdas_matches_python(spark):
    e = _tbl("embeddings")
    want = {}
    for vid, emb in zip(e.vec_id, e.embedding):
        v = [float(x) for x in emb]  # float32 -> exact double
        acc = 0.0
        for x in v:
            acc += x * x  # sequential left-to-right fold, like aggregate()
        dot = 0.0
        for a, b in zip(v, v[::-1]):
            dot += a * b
        want[(vid,)] = {
            "sum_sq": acc,
            "n_positive": sum(1 for x in v if x > 0.0),
            "any_large": any(abs(x) > 0.9 for x in v),
            "dot_reversed": dot,
        }
    assert_keyed(run(spark, "fn_higher_order_lambdas"), want, ["vec_id"],
                 ["sum_sq", "n_positive", "any_large", "dot_reversed"])


# -------- §2-A/B basics + relationship hops closeout (wave 33)
# The foundational aggregate/filter/hop keys carried driver-green
# signals but no independent recomputation; this wave replays them in
# pandas/numpy so even the basics cannot hide a shared spelling
# mistake (FILTER-clause aggregates, grouping flags, pivot defaults,
# the Q17/Q18 decorrelations, the banded user-edge construction).


def test_agg_global_matches_pandas(spark):
    li = _tbl("lineitem")
    got = run(spark, "agg_global").iloc[0]
    sp = cents(li.l_extendedprice).sum() / 100.0
    assert int(got.n) == len(li)
    assert close(got.sum_qty, li.l_quantity.sum())
    assert close(got.avg_qty, li.l_quantity.mean())
    assert close(got.min_price, li.l_extendedprice.min())
    assert close(got.max_price, li.l_extendedprice.max())
    assert close(got.sum_price, sp)
    assert close(got.avg_price, sp / len(li))


def test_agg_groupby_hash_matches_pandas(spark):
    li = _tbl("lineitem")
    f = li[li.l_shipdate <= pd.Timestamp("1998-09-01")]
    want = {}
    for (flag, st), g in f.groupby(["l_returnflag", "l_linestatus"]):
        pc, dc, tc = cents(g.l_extendedprice), cents(g.l_discount), cents(g.l_tax)
        n = len(g)
        want[(flag, st)] = {
            "sum_qty": g.l_quantity.sum(),
            "sum_base_price": pc.sum() / 1e2,
            "sum_disc_price": (pc * (100 - dc)).sum() / 1e4,
            "sum_charge": (pc * (100 - dc) * (100 + tc)).sum() / 1e6,
            "avg_qty": g.l_quantity.mean(),
            "avg_price": pc.sum() / 1e2 / n,
            "avg_disc": dc.sum() / 1e2 / n,
            "count_order": n,
        }
    assert_keyed(run(spark, "agg_groupby_hash"), want,
                 ["l_returnflag", "l_linestatus"],
                 ["sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge", "avg_qty", "avg_price", "avg_disc",
                  "count_order"])


def test_agg_count_distinct_and_having_matches_pandas(spark):
    ev = _tbl("events")
    want = {
        (t,): {"n_users": g.user_id.nunique(), "n_events": len(g)}
        for t, g in ev.groupby("event_type")
    }
    assert_keyed(run(spark, "agg_count_distinct"), want, ["event_type"],
                 ["n_users", "n_events"])
    c = _tbl("customer")
    want2 = {
        (nk,): {"n_cust": len(g),
                "total_bal": cents(g.c_acctbal).sum() / 100.0}
        for nk, g in c.groupby("c_nationkey") if len(g) > 50
    }
    assert_keyed(run(spark, "agg_having"), want2, ["c_nationkey"],
                 ["n_cust", "total_bal"])


def test_agg_filtered_matches_pandas(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, g in li.groupby("l_returnflag"):
        qf = g.loc[g.l_linestatus == "F", "l_quantity"].sum()
        qo = g.loc[g.l_linestatus == "O", "l_quantity"].sum()
        want[(flag,)] = {
            # FILTER over an empty set is NULL, not 0
            "qty_f": qf if (g.l_linestatus == "F").any() else None,
            "qty_o": qo if (g.l_linestatus == "O").any() else None,
            "n_high_disc": int((g.l_discount > 0.05).sum()),
            "n": len(g),
        }
    assert_keyed(run(spark, "agg_filtered"), want, ["l_returnflag"],
                 ["qty_f", "qty_o", "n_high_disc", "n"])


def test_agg_stats_matches_numpy(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, g in li.groupby("l_returnflag"):
        q = g.l_quantity.to_numpy(dtype=np.float64)
        d = g.l_discount.to_numpy(dtype=np.float64)
        t = g.l_tax.to_numpy(dtype=np.float64)
        want[(flag,)] = {
            "sd_qty": q.std(ddof=1),
            "var_qty": q.var(ddof=1),
            "corr_disc_tax": np.corrcoef(d, t)[0, 1],
            "cov_qty_disc": np.cov(q, d, ddof=1)[0, 1],
        }
    assert_keyed(run(spark, "agg_stats"), want, ["l_returnflag"],
                 ["sd_qty", "var_qty", "corr_disc_tax", "cov_qty_disc"],
                 tol=1e-4)


def test_agg_bool_matches_pandas(spark):
    o = _tbl("orders")
    want = {
        (st,): {
            "all_over_1k": bool((g.o_totalprice > 1000).all()),
            "any_over_400k": bool((g.o_totalprice > 400000).any()),
            "n_urgent": int((g.o_orderpriority == "1-URGENT").sum()),
        }
        for st, g in o.groupby("o_orderstatus")
    }
    assert_keyed(run(spark, "agg_bool"), want, ["o_orderstatus"],
                 ["all_over_1k", "any_over_400k", "n_urgent"])


def test_agg_grouping_id_matches_pandas(spark):
    li = _tbl("lineitem")
    want = {}
    for (flag, st), g in li.groupby(["l_returnflag", "l_linestatus"]):
        want[(flag, st, 0, 0)] = {
            "n": len(g), "qty": cents(g.l_quantity).sum() / 100.0}
    for flag, g in li.groupby("l_returnflag"):
        want[(flag, None, 0, 1)] = {
            "n": len(g), "qty": cents(g.l_quantity).sum() / 100.0}
    want[(None, None, 1, 1)] = {
        "n": len(li), "qty": cents(li.l_quantity).sum() / 100.0}
    assert_keyed(run(spark, "agg_grouping_id"), want,
                 ["l_returnflag", "l_linestatus", "g_flag", "g_status"],
                 ["n", "qty"])


def test_agg_pivot_and_unpivot_match_pandas(spark):
    ev = _tbl("events")
    types = ["click", "error", "purchase", "signup", "view"]
    want = {}
    for u, g in ev.groupby("user_id"):
        vc = g.event_type.value_counts()
        want[(u,)] = {t: int(vc.get(t, 0)) for t in types}
    assert_keyed(run(spark, "agg_pivot"), want, ["user_id"], types)

    o = _tbl("orders")
    rows = [(ok, "totalprice", tp) for ok, tp in
            zip(o.o_orderkey, o.o_totalprice)]
    rows += [(ok, "custkey", float(ck)) for ok, ck in
             zip(o.o_orderkey, o.o_custkey)]
    assert _bag(run(spark, "agg_unpivot")) == _bag(rows)


def test_project_and_filters_match_pandas(spark):
    li = _tbl("lineitem")
    # net price = exact integer ten-thousandths (2-dec price x 2-dec disc)
    net = cents(li.l_extendedprice) * (100 - cents(li.l_discount))
    rows = [(ok, ln, q, ne / 1e4) for ok, ln, q, ne in
            zip(li.l_orderkey, li.l_linenumber, li.l_quantity, net)]
    assert _bag(run(spark, "project_select_alias")) == _bag(rows)

    f = li[
        (li.l_shipdate <= pd.Timestamp("1998-09-01"))
        & (li.l_quantity > 45) & (li.l_returnflag != "A")
        & (li.l_discount >= 0.05)
    ]
    rows2 = [(ok, ln, d.strftime("%Y-%m-%d")) for ok, ln, d in
             zip(f.l_orderkey, f.l_linenumber, f.l_shipdate)]
    assert _bag(run(spark, "filter_comparison")) == _bag(rows2)

    o = _tbl("orders")
    m = o[
        ((o.o_orderstatus == "F") & (o.o_totalprice > 150000))
        | ((o.o_orderpriority != "5-LOW") & (o.o_totalprice <= 25000))
    ]
    rows3 = list(zip(m.o_orderkey, m.o_orderstatus, m.o_orderpriority))
    assert _bag(run(spark, "filter_boolean_logic")) == _bag(rows3)

    p = _tbl("part")
    pf = p[
        p.p_type.isin(["PROMO", "ECONOMY", "STANDARD"])
        & (p.p_size >= 10) & (p.p_size <= 30)
        & p.p_brand.str.startswith("Brand#1")
    ]
    rows4 = list(zip(pf.p_partkey, pf.p_brand, pf.p_type, pf.p_size))
    assert _bag(run(spark, "filter_in_between_like")) == _bag(rows4)

    c = _tbl("customer")
    cf = c[
        (c.c_mktsegment == "BUILDING") & (c.c_acctbal > 1000.0)
        & c.c_nationkey.isin([1, 2, 3, 4, 5])
    ]
    rows5 = list(zip(cf.c_custkey, cf.c_name, cf.c_acctbal))
    assert _bag(run(spark, "filter_dynamic_args")) == _bag(rows5)


def test_graph_hops_match_pandas(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    n1 = c[c.c_nationkey == 1]
    m = n1.merge(o, left_on="c_custkey", right_on="o_custkey")
    rows = list(zip(m.c_custkey, m.c_name, m.o_orderkey, m.o_totalprice))
    assert _bag(run(spark, "graph_1hop")) == _bag(rows)

    r = _tbl("region")
    n = _tbl("nation")
    j = (r.merge(n, left_on="r_regionkey", right_on="n_regionkey")
          .merge(c, left_on="n_nationkey", right_on="c_nationkey"))
    want = {
        (rn,): {"n_customers": len(g),
                "total_bal": cents(g.c_acctbal).sum() / 100.0}
        for rn, g in j.groupby("r_name")
    }
    assert_keyed(run(spark, "graph_2hop"), want, ["r_name"],
                 ["n_customers", "total_bal"])


def test_graph_degree_matches_banded_edge_construction(spark):
    ev = _tbl("events")
    ks = [json.loads(p).get("k") for p in ev.props]
    us = ev.ts.astype("int64")
    by_k: dict = {}
    for u, k, t in zip(ev.user_id, ks, us):
        by_k.setdefault(k, []).append((u, t))
    edges = set()
    for rows in by_k.values():
        for ua, ta in rows:
            for ub, tb in rows:
                if ua != ub and ta < tb <= ta + HOUR_US:
                    edges.add((ua, ub))
    verts = {v for e in edges for v in e}
    want = {
        (v,): {
            "out_degree": sum(1 for s, _ in edges if s == v),
            "in_degree": sum(1 for _, d in edges if d == v),
        }
        for v in verts
    }
    assert_keyed(run(spark, "graph_degree"), want, ["user_id"],
                 ["out_degree", "in_degree"])


def test_sub_exists_and_in_grouped_having_match_pandas(spark):
    s = _tbl("supplier")
    li = _tbl("lineitem")
    big = set(li.loc[li.l_quantity > 49, "l_suppkey"])
    want = {
        (r.s_suppkey,): {"s_name": r.s_name}
        for _, r in s.iterrows() if r.s_suppkey in big
    }
    assert_keyed(run(spark, "sub_exists_correlated"), want,
                 ["s_suppkey"], ["s_name"])

    o = _tbl("orders")
    per_ok = {
        ok: cents(g.l_quantity).sum() / 100.0
        for ok, g in li.groupby("l_orderkey")
    }
    heavy = {ok for ok, q in per_ok.items() if q > 150}
    want2 = {}
    for _, r in o[o.o_orderkey.isin(heavy)].iterrows():
        want2[(r.o_orderkey,)] = {
            "o_custkey": r.o_custkey,
            "o_totalprice": r.o_totalprice,
            "total_qty": per_ok[r.o_orderkey],
        }
    assert_keyed(run(spark, "sub_in_grouped_having"), want2,
                 ["o_orderkey"], ["o_custkey", "o_totalprice", "total_qty"])


# -------- E1 compiler-surface replays (wave 34)
# Every remaining compiler_* key recomputed in pandas/pure Python from
# the QuerySpec's documented semantics — a third opinion fully outside
# both the DSL lowering and the hand-written SQL oracles, completing
# independent coverage of the E1 surface (q1/q3/q6/$asof/$window were
# waves 29-30).


def test_compiler_select_computed_matches_python(spark):
    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"]
    want = {
        (ok,): {
            "prio_tag": pr.lower() + "/" + st,
            "prio_len": len(pr),
            "order_year": d.year,
            "double_price": tp * 2,
        }
        for ok, pr, st, d, tp in zip(f.o_orderkey, f.o_orderpriority,
                                     f.o_orderstatus, f.o_orderdate,
                                     f.o_totalprice)
    }
    assert_keyed(run(spark, "compiler_select_computed"), want,
                 ["o_orderkey"],
                 ["prio_tag", "prio_len", "order_year", "double_price"])


def test_compiler_window_rank_matches_python(spark):
    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"]
    want = {}
    for ck, g in f.groupby("o_custkey"):
        total = cents(g.o_totalprice).sum() / 100.0
        ordered = sorted(zip(g.o_totalprice, g.o_orderkey),
                         key=lambda t: (-t[0], t[1]))
        for rk, (tp, ok) in enumerate(ordered[:3], start=1):
            want[(ck, ok)] = {"o_totalprice": tp, "rk": rk,
                              "cust_total": total}
    assert_keyed(run(spark, "compiler_window_rank"), want,
                 ["o_custkey", "o_orderkey"],
                 ["o_totalprice", "rk", "cust_total"])


def test_compiler_collect_nested_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    per = {}
    for ck, g in o[o.o_orderstatus != "P"].groupby("o_custkey"):
        per[ck] = sorted(int(k) for k in g.o_orderkey)
    want = {}
    for _, r in c[c.c_mktsegment == "BUILDING"].iterrows():
        ks = per.get(r.c_custkey, [])
        want[(r.c_custkey,)] = {
            "c_name": r.c_name,
            "orders": ",".join(str(k) for k in ks),
            "n_orders": len(ks),
        }
    assert_keyed(run(spark, "compiler_collect_nested"), want,
                 ["c_custkey"], ["c_name", "orders", "n_orders"])


def test_compiler_pagination_and_params_match_python(spark):
    o = _tbl("orders")
    ordered = sorted(zip(o.o_totalprice, o.o_orderkey, o.o_custkey),
                     key=lambda t: (-t[0], t[1]))
    page = ordered[40:60]
    want = {(ok,): {"o_custkey": ck, "o_totalprice": tp}
            for tp, ok, ck in page}
    assert_keyed(run(spark, "compiler_pagination"), want,
                 ["o_orderkey"], ["o_custkey", "o_totalprice"])

    f = o[o.o_orderstatus.isin(["F", "O"]) & (o.o_totalprice > 250000.0)]
    top = sorted(zip(f.o_totalprice, f.o_orderkey, f.o_custkey),
                 key=lambda t: (-t[0], t[1]))[:25]
    want2 = {(ok,): {"o_custkey": ck, "o_totalprice": tp}
             for tp, ok, ck in top}
    assert_keyed(run(spark, "compiler_params"), want2,
                 ["o_orderkey"], ["o_custkey", "o_totalprice"])


def test_compiler_composite_topk_matches_python(spark):
    c = _tbl("customer")
    o = _tbl("orders")
    m = (c[c.c_acctbal > 0]
         .merge(o[o.o_orderstatus == "F"],
                left_on="c_custkey", right_on="o_custkey"))
    counts = m.groupby(["c_nationkey", "c_custkey"]).size()
    want = {}
    for nk in counts.index.get_level_values(0).unique():
        g = counts[nk]
        ordered = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))
        for rk, (ck, n) in enumerate(ordered[:2], start=1):
            want[(nk, ck)] = {"n_orders": n, "rk": rk}
    assert_keyed(run(spark, "compiler_composite_topk"), want,
                 ["c_nationkey", "c_custkey"], ["n_orders", "rk"])


def test_compiler_set_ops_and_exists_child_match_python(spark):
    c = _tbl("customer")
    building = set(zip(c.loc[c.c_mktsegment == "BUILDING", "c_custkey"],
                       c.loc[c.c_mktsegment == "BUILDING", "c_name"]))
    rich = set(zip(c.loc[c.c_acctbal > 9000.0, "c_custkey"],
                   c.loc[c.c_acctbal > 9000.0, "c_name"]))
    low = set(zip(c.loc[c.c_nationkey.isin([1, 2, 3]), "c_custkey"],
                  c.loc[c.c_nationkey.isin([1, 2, 3]), "c_name"]))
    want = (building | rich) - low
    assert _bag(run(spark, "compiler_set_ops")) == {k: 1 for k in want}

    o = _tbl("orders")
    big = set(o.loc[o.o_totalprice > 200000.0, "o_custkey"])
    want2 = {
        (r.c_custkey,): {"c_name": r.c_name}
        for _, r in c[c.c_mktsegment == "BUILDING"].iterrows()
        if r.c_custkey in big
    }
    assert_keyed(run(spark, "compiler_exists_child"), want2,
                 ["c_custkey"], ["c_name"])


def test_compiler_agg_having_and_minmax_by_match_python(spark):
    o = _tbl("orders")
    want = {}
    for ck, g in o[o.o_orderstatus == "F"].groupby("o_custkey"):
        if len(g) >= 8:
            want[(ck,)] = {"n_orders": len(g),
                           "max_price": g.o_totalprice.max()}
    assert_keyed(run(spark, "compiler_agg_having"), want,
                 ["o_custkey"], ["n_orders", "max_price"])

    c = _tbl("customer")
    name_by_key = dict(zip(c.c_custkey, c.c_name))
    want2 = {}
    for nk, g in c.groupby("c_nationkey"):
        want2[(nk,)] = {
            "n_cust": len(g),
            "newest_cust": name_by_key[g.c_custkey.max()],
            "oldest_cust": name_by_key[g.c_custkey.min()],
        }
    assert_keyed(run(spark, "compiler_agg_minmax_by"), want2,
                 ["c_nationkey"], ["n_cust", "newest_cust", "oldest_cust"])


def test_compiler_sample_matches_hashlib(spark):
    import hashlib

    o = _tbl("orders")
    c = _tbl("customer")
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    want = {}
    for _, r in o[o.o_orderstatus == "O"].iterrows():
        h = hashlib.md5(str(r.o_orderkey).encode()).hexdigest()
        if int(h[:2], 16) % 10 < 3:
            want[(r.o_orderkey,)] = {
                "o_totalprice": r.o_totalprice,
                "c_mktsegment": seg[r.o_custkey],
            }
    assert_keyed(run(spark, "compiler_sample"), want,
                 ["o_orderkey"], ["o_totalprice", "c_mktsegment"])


def test_compiler_distinct_conditional_filter_or_match_python(spark):
    c = _tbl("customer")
    want = {(s, nk % 5) for s, nk in zip(c.c_mktsegment, c.c_nationkey)}
    assert _bag(run(spark, "compiler_distinct_values")) == {
        k: 1 for k in want}

    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"]
    want2 = {
        (ok,): {
            "o_totalprice": tp,
            "band": ("high" if tp > 250000.0
                     else "mid" if tp > 100000.0 else "low"),
        }
        for ok, tp in zip(f.o_orderkey, f.o_totalprice)
    }
    assert_keyed(run(spark, "compiler_conditional"), want2,
                 ["o_orderkey"], ["o_totalprice", "band"])

    m = o[(o.o_orderstatus == "P")
          | ((o.o_totalprice > 300000.0)
             & (o.o_orderpriority == "1-URGENT"))]
    rows = list(zip(m.o_orderkey, m.o_orderstatus, m.o_totalprice))
    assert _bag(run(spark, "compiler_filter_or")) == _bag(rows)


def test_compiler_child_rollup_matches_python(spark):
    o = _tbl("orders")
    c = _tbl("customer")
    m = o[o.o_orderstatus == "O"].merge(
        c, left_on="o_custkey", right_on="c_custkey")
    want = {
        (s,): {"n_orders": len(g),
               "total_cents": int(cents(g.o_totalprice).sum())}
        for s, g in m.groupby("c_mktsegment")
    }
    assert_keyed(run(spark, "compiler_child_rollup"), want,
                 ["c_mktsegment"], ["n_orders", "total_cents"])


def test_compiler_deep_traversal_matches_python(spark):
    r = _tbl("region")
    n = _tbl("nation")
    c = _tbl("customer")
    j = (r[r.r_name.isin(["ASIA", "EUROPE"])]
         .merge(n, left_on="r_regionkey", right_on="n_regionkey")
         .merge(c[c.c_acctbal > 9000.0],
                left_on="n_nationkey", right_on="c_nationkey"))
    rows = list(zip(j.r_name, j.n_name, j.c_name, j.c_acctbal))
    assert _bag(run(spark, "compiler_deep_traversal")) == _bag(rows)


def test_compiler_orderby_computed_matches_hashlib(spark):
    import hashlib

    o = _tbl("orders")
    f = o[o.o_orderstatus == "P"]
    rows = sorted(
        ((hashlib.md5(str(ok).encode()).hexdigest(), int(ok))
         for ok in f.o_orderkey),
        key=lambda t: (t[0], t[1]),
    )[:50]
    want = {(ok,): {"shuffle_key": h} for h, ok in rows}
    assert_keyed(run(spark, "compiler_orderby_computed"), want,
                 ["o_orderkey"], ["shuffle_key"])


def test_compiler_multi_child_matches_python(spark):
    o = _tbl("orders")
    c = _tbl("customer")
    li = _tbl("lineitem")
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    per = {ok: sorted(g.l_linestatus.dropna())
           for ok, g in li.groupby("l_orderkey")}
    want = {}
    for _, r in o[o.o_orderstatus == "P"].iterrows():
        sts = per.get(r.o_orderkey, [])
        want[(r.o_orderkey,)] = {
            "c_mktsegment": seg[r.o_custkey],
            "n_items": len(sts),
            "lineitems": ",".join(sts),
        }
    assert_keyed(run(spark, "compiler_multi_child"), want,
                 ["o_orderkey"], ["c_mktsegment", "n_items", "lineitems"])


def test_compiler_json_field_matches_python(spark):
    ev = _tbl("events")
    f = ev[ev.event_type == "click"]
    per: dict = {}
    for p, u in zip(f.props, f.user_id):
        k = json.loads(p).get("k")
        ks = None if k is None else str(k)
        per.setdefault(ks, []).append(u)
    want = {(k,): {"n": len(us), "users": len(set(us))}
            for k, us in per.items()}
    assert_keyed(run(spark, "compiler_json_field"), want,
                 ["k"], ["n", "users"])


# -------- join-algebra + core function closeout (wave 35)
# Inner/outer/semi/anti/cross/theta/self/star joins and the
# set-union pair recomputed as explicit Python set/bag constructions
# (including the NULL-padded outer sides), plus the core string/math
# function families — finishing independent coverage of §2-C/G.


def test_join_inner_left_semi_anti_match_python(spark):
    o = _tbl("orders")
    c = _tbl("customer")
    cust = {r.c_custkey: r for _, r in c.iterrows()}
    rows = [
        (r.o_orderkey, r.o_totalprice, r.o_custkey,
         cust[r.o_custkey].c_name, cust[r.o_custkey].c_mktsegment)
        for _, r in o.iterrows() if r.o_custkey in cust
    ]
    assert _bag(run(spark, "join_inner_equi")) == _bag(rows)

    urgent = set(o.loc[o.o_orderpriority == "1-URGENT", "o_custkey"])
    rows2 = [(ck, r.c_name) for ck, r in cust.items() if ck in urgent]
    assert _bag(run(spark, "join_left_semi")) == _bag(rows2)

    big = set(o.loc[o.o_totalprice > 200000, "o_custkey"])
    rows3 = [(ck, r.c_mktsegment) for ck, r in cust.items()
             if ck not in big]
    assert _bag(run(spark, "join_left_anti")) == _bag(rows3)


def test_join_outer_sides_match_python(spark):
    o = _tbl("orders")
    c = _tbl("customer")
    hi = o[o.o_totalprice > 400000]
    per: dict = {}
    for _, r in hi.iterrows():
        per.setdefault(r.o_custkey, []).append((r.o_orderkey,
                                                r.o_totalprice))
    rows = []
    for _, r in c.iterrows():
        for ok, tp in per.get(r.c_custkey, [(None, None)]):
            rows.append((r.c_custkey, r.c_mktsegment, ok, tp))
    got = run(spark, "join_left_outer")
    got_rows = [
        (a, b, None if pd.isna(k) else int(k), None if pd.isna(t) else t)
        for a, b, k, t in zip(got.c_custkey, got.c_mktsegment,
                              got.o_orderkey, got.o_totalprice)
    ]
    assert _bag(got_rows) == _bag(rows)

    cf = c[c.c_acctbal > 9000]
    of = o[o.o_totalprice > 350000]
    per2: dict = {}
    for _, r in of.iterrows():
        per2.setdefault(r.o_custkey, []).append(r)
    want = []
    matched_orders = set()
    for _, r in cf.iterrows():
        hits = per2.get(r.c_custkey, [])
        if not hits:
            want.append((r.c_custkey, r.c_acctbal, None, None, None))
        for h in hits:
            want.append((r.c_custkey, r.c_acctbal, h.o_orderkey,
                         h.o_custkey, h.o_totalprice))
            matched_orders.add(h.o_orderkey)
    ckeys = set(cf.c_custkey)
    for _, r in of.iterrows():
        if r.o_custkey not in ckeys:
            want.append((None, None, r.o_orderkey, r.o_custkey,
                         r.o_totalprice))
    got2 = run(spark, "join_full_outer")
    got2_rows = [
        tuple(None if pd.isna(v) else v for v in t)
        for t in zip(got2.c_custkey, got2.c_acctbal, got2.o_orderkey,
                     got2.o_custkey, got2.o_totalprice)
    ]
    want_f = [tuple(None if v is None else float(v) if isinstance(v, (int, np.integer)) else v for v in t) for t in want]
    got2_f = [tuple(None if v is None else float(v) if isinstance(v, (int, np.integer)) else v for v in t) for t in got2_rows]
    assert _bag(got2_f) == _bag(want_f)


def test_join_cross_theta_self_match_python(spark):
    r = _tbl("region")
    n = _tbl("nation")
    rows = [(a, b) for a in r.r_name for b in n.n_name]
    assert _bag(run(spark, "join_cross")) == _bag(rows)

    o = _tbl("orders")
    want = {}
    for band in r.r_regionkey:
        lo, hi = band * 100000.0, band * 100000.0 + 50000.0
        g = o[(o.o_totalprice >= lo) & (o.o_totalprice < hi)]
        if len(g):
            want[(band,)] = {"n_orders": len(g),
                             "band_total": cents(g.o_totalprice).sum() / 100.0}
    assert_keyed(run(spark, "join_theta_range"), want, ["band"],
                 ["n_orders", "band_total"])

    li = _tbl("lineitem")
    f = li[li.l_quantity > 40]
    per: dict = {}
    for _, x in f.iterrows():
        per.setdefault(x.l_orderkey, []).append((x.l_linenumber,
                                                 x.l_partkey))
    rows3 = []
    for ok, items in per.items():
        for la, pa in items:
            for lb, pb in items:
                if la < lb:
                    rows3.append((ok, la, lb, pa, pb))
    assert _bag(run(spark, "join_self")) == _bag(rows3)


def test_join_multiway_star_matches_pandas(spark):
    li = _tbl("lineitem")
    o = _tbl("orders")
    c = _tbl("customer")
    s = _tbl("supplier")
    n = _tbl("nation")
    r = _tbl("region")
    of = o[(o.o_orderdate >= pd.Timestamp("1996-01-01"))
           & (o.o_orderdate < pd.Timestamp("1997-01-01"))]
    asia = r[r.r_name == "ASIA"]
    j = (li.merge(of, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on=["l_suppkey", "c_nationkey"],
                  right_on=["s_suppkey", "s_nationkey"])
           .merge(n, left_on="s_nationkey", right_on="n_nationkey")
           .merge(asia, left_on="n_regionkey", right_on="r_regionkey"))
    rev = cents(j.l_extendedprice) * (100 - cents(j.l_discount))
    agg = pd.DataFrame({"n_name": j.n_name.to_numpy(), "r": rev}).groupby(
        "n_name")["r"].sum()
    want = {(k,): {"revenue": v / 1e4} for k, v in agg.items()}
    assert_keyed(run(spark, "join_multiway_star"), want, ["n_name"],
                 ["revenue"])


def test_set_union_all_and_distinct_match_python(spark):
    a, b = _orders_ab()
    assert _bag(run(spark, "set_union_all")) == _bag(a + b)
    assert _bag(run(spark, "set_union_distinct")) == {
        k: 1 for k in set(a) | set(b)}


def test_fn_string_matches_python(spark):
    import re

    c = _tbl("customer")
    want = {}
    for ck, name, seg in zip(c.c_custkey, c.c_name, c.c_mktsegment):
        m = re.search("([0-9]+)", name)
        want[(ck,)] = {
            "lname": name.lower(),
            "useg": seg.upper(),
            "prefix": name[:8],
            "trimmed": name,
            "joined": name + "/" + seg,
            "name_len": len(name),
            "first_part": name.split("#")[0],
            "digits": m.group(1) if m else "",
            "masked": re.sub("[0-9]", "#", name),
        }
    assert_keyed(run(spark, "fn_string"), want, ["c_custkey"],
                 ["lname", "useg", "prefix", "trimmed", "joined",
                  "name_len", "first_part", "digits", "masked"])


def test_fn_math_matches_python(spark):
    li = _tbl("lineitem")
    want = {}
    for ok, ln, q, pr, dc in zip(li.l_orderkey, li.l_linenumber,
                                 li.l_quantity, li.l_extendedprice,
                                 li.l_discount):
        want[(ok, ln)] = {
            "l_quantity": q,
            "qty_r1": math.floor(q * 10 + 0.5) / 10,  # round-half-up .1
            "qty_dev": abs(q - 25),
            "qty_ceil7": math.ceil(q / 7),
            "qty_floor7": math.floor(q / 7),
            "qty_sqrt": math.sqrt(q),
            "price_ln": math.log(pr),
            "disc_exp": math.exp(dc),
            "disc_pow2": (1 + dc) ** 2,
            "key_mod7": int(ok) % 7,
            "qty_sign": (q > 25) - (q < 25),
        }
    assert_keyed(run(spark, "fn_math"), want, ["l_orderkey", "l_linenumber"],
                 ["l_quantity", "qty_r1", "qty_dev", "qty_ceil7",
                  "qty_floor7", "qty_sqrt", "price_ln", "disc_exp",
                  "disc_pow2", "key_mod7", "qty_sign"], tol=2e-6)


# -------- collection/date/cast families + Python-UDF surface (wave 36)
# The last fn_* families and the UDF demo keys, recomputed with Python
# datetime/json/str primitives and numpy.polyfit — the UDAF trend in
# particular gets a genuinely different estimator implementation
# (least-squares fit vs the closed-form slope both engines use).


def test_fn_date_matches_python(spark):
    import datetime as dt

    o = _tbl("orders")
    y2k = dt.date(2000, 1, 1)
    want = {}
    for ok, ts in zip(o.o_orderkey, o.o_orderdate):
        d = ts.date()
        import calendar
        last = dt.date(d.year, d.month,
                       calendar.monthrange(d.year, d.month)[1])
        want[(ok,)] = {
            "yr": d.year, "mo": d.month, "dy": d.day,
            "month_start": d.replace(day=1).strftime("%Y-%m-%d"),
            "days_to_y2k": (y2k - d).days,
            "plus_30d": (d + dt.timedelta(days=30)).strftime("%Y-%m-%d"),
            "month_end": last.strftime("%Y-%m-%d"),
            # Timestamp.value is ALWAYS epoch-ns (unlike Series.astype,
            # which is unit-scaled) -> ns // 1000 = microseconds
            "order_us": int(ts.value) // 1000,
        }
    assert_keyed(run(spark, "fn_date"), want, ["o_orderkey"],
                 ["yr", "mo", "dy", "month_start", "days_to_y2k",
                  "plus_30d", "month_end", "order_us"])


def test_fn_conditional_matches_python(spark):
    o = _tbl("orders")
    want = {}
    for ok, st, tp in zip(o.o_orderkey, o.o_orderstatus, o.o_totalprice):
        want[(ok,)] = {
            "status_word": {"F": "finished", "O": "open"}.get(st, "other"),
            "size_band": ("big" if tp > 300000
                          else "mid" if tp > 100000 else "small"),
            "status_or_pending": "PENDING" if st == "P" else st,
            "at_least_200k": max(tp, 200000.0),
            "at_most_200k": min(tp, 200000.0),
        }
    assert_keyed(run(spark, "fn_conditional"), want, ["o_orderkey"],
                 ["status_word", "size_band", "status_or_pending",
                  "at_least_200k", "at_most_200k"])


def test_fn_array_and_explode_match_python(spark):
    d = _tbl("documents")
    e = _tbl("embeddings")
    emb = dict(zip(e.vec_id, e.embedding))
    want = {}
    for did, text in zip(d.doc_id, d.text):
        if did not in emb:
            continue
        words = text.split(" ")
        v = [float(x) for x in emb[did]]
        s2 = 0.0
        for x in v:
            s2 += x * 2
        want[(did,)] = {
            "n_words": len(words),
            "n_distinct_words": len(set(words)),
            "first3_sorted": " ".join(sorted(words)[:3]),
            "has_scan": "scan" in words,
            "n_words_x2": 2 * len(words),
            "dim": len(v),
            "sum2": s2,
            "n_pos": sum(1 for x in v if x > 0),
        }
    assert_keyed(run(spark, "fn_array"), want, ["doc_id"],
                 ["n_words", "n_distinct_words", "first3_sorted",
                  "has_scan", "n_words_x2", "dim", "sum2", "n_pos"])

    rows = [
        (did, i + 1, w)
        for did, text in zip(d.doc_id, d.text)
        for i, w in enumerate(text.split(" "))
    ]
    assert _bag(run(spark, "fn_explode")) == _bag(rows)


def test_fn_map_json_cast_match_python(spark):
    import re

    ev = _tbl("events")
    want = {}
    for eid, props, et in zip(ev.event_id, ev.props, ev.event_type):
        obj = json.loads(props)
        k = obj.get("k")
        want[(eid,)] = {
            "prop_keys": ",".join(obj.keys()),
            "k_val": k, "has_k": k is not None, "has_missing": False,
        }
    assert_keyed(run(spark, "fn_map"), want, ["event_id"],
                 ["prop_keys", "k_val", "has_k", "has_missing"])

    want2 = {}
    for eid, props, et in zip(ev.event_id, ev.props, ev.event_type):
        k = json.loads(props).get("k")
        want2[(eid,)] = {
            "k": k,
            "nested_k": None if k is None else str(k),
            "nested_tag": None if k is None else et,
        }
    assert_keyed(run(spark, "fn_json"), want2, ["event_id"],
                 ["k", "nested_k", "nested_tag"])

    o = _tbl("orders")
    want3 = {}
    for ok, pr, tp in zip(o.o_orderkey, o.o_orderpriority, o.o_totalprice):
        m = re.search("([0-9]+)", pr)
        want3[(ok,)] = {
            "key_str": str(ok),
            "prio_num": int(m.group(1)) if m else None,
            "bad_int": None,
            "overflow_int": None,
            "price_trunc": math.floor(tp),
            "never_true": False,
            "date_roundtrip": True,
        }
    assert_keyed(run(spark, "fn_cast"), want3, ["o_orderkey"],
                 ["key_str", "prio_num", "bad_int", "overflow_int",
                  "price_trunc", "never_true", "date_roundtrip"])


def test_fn_variant_json_matches_python(spark):
    ev = _tbl("events")
    want = {}
    for eid, props in zip(ev.event_id, ev.props):
        k = json.loads(props).get("k")
        want[(eid,)] = {
            "k_int": k,
            "k_str": None if k is None else str(k),
            "has_k": 0 if k is None else 1,
        }
    assert_keyed(run(spark, "fn_variant_json"), want, ["event_id"],
                 ["k_int", "k_str", "has_k"])


def test_udf_scalar_and_vectorized_match_python(spark):
    import re

    c = _tbl("customer")
    want = {
        (ck,): {"slug": re.sub(r"[^a-z0-9]+", "-", n.lower()).strip("-")}
        for ck, n in zip(c.c_custkey, c.c_name)
    }
    assert_keyed(run(spark, "udf_python_scalar"), want,
                 ["c_custkey"], ["slug"])

    d = _tbl("documents")
    want2 = {
        (did,): {"quality": math.log1p(n) * 0.5
                 + len(t.split(" ")) * 0.01}
        for did, n, t in zip(d.doc_id, d.n_chars, d.text)
    }
    assert_keyed(run(spark, "udf_pandas_vectorized"), want2,
                 ["doc_id"], ["quality"], tol=2e-6)


def test_udaf_trend_matches_numpy_polyfit(spark):
    ev = _tbl("events")
    ev = ev.assign(ts_us=ev.ts.astype("int64"))
    want = {}
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        y = g.value.to_numpy(dtype=np.float64)
        x = np.arange(len(y), dtype=np.float64)
        m = ~np.isnan(y)
        slope = (float(np.polyfit(x[m], y[m], 1)[0])
                 if m.sum() >= 2 and np.ptp(x[m]) > 0 else None)
        want[(u,)] = {"n_events": len(g), "trend": slope}
    assert_keyed(run(spark, "udaf_applyinpandas"), want, ["user_id"],
                 ["n_events", "trend"], tol=1e-3)


# -------- storage-variant joins, UDF tail, scan reports (wave 37)
# The storage-layout joins (bucketed, dynamic-partition-pruned,
# hour-bucketed range) must be RESULT-identical to their naive
# spellings — the layout is a physical optimization, never a semantic
# one — so each is recomputed as the plain Python join it optimizes.
# Plus the UDTF chunker, the Arrow/iterator UDFs, and the scan-level
# count/expectation reports.


def test_agg_bitmap_and_multi_distinct_match_pandas(spark):
    li = _tbl("lineitem")
    want = {
        (f_,): {"n_distinct_orders": g.l_orderkey.nunique()}
        for f_, g in li.groupby("l_returnflag")
    }
    assert_keyed(run(spark, "agg_bitmap_distinct"), want,
                 ["l_returnflag"], ["n_distinct_orders"])

    o = _tbl("orders")
    want2 = {}
    for st, g in o.groupby("o_orderstatus"):
        want2[(st,)] = {
            "cust_date_combos": len(set(zip(g.o_custkey, g.o_orderdate))),
            "n_custs": g.o_custkey.nunique(),
            "n_dates": g.o_orderdate.nunique(),
            "n_rows": len(g),
        }
    assert_keyed(run(spark, "agg_count_distinct_multi"), want2,
                 ["o_orderstatus"],
                 ["cust_date_combos", "n_custs", "n_dates", "n_rows"])


def test_join_bucketed_colocated_matches_plain_join(spark):
    o = _tbl("orders")
    li = _tbl("lineitem")
    f = o[o.o_orderstatus == "F"]
    m = f.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    want = {
        (ok,): {"o_custkey": g.o_custkey.iloc[0],
                "qty": cents(g.l_quantity).sum() / 100.0}
        for ok, g in m.groupby("o_orderkey")
    }
    assert_keyed(run(spark, "join_bucketed_colocated"), want,
                 ["o_orderkey"], ["o_custkey", "qty"])


def test_join_dpp_matches_plain_join(spark):
    ev = _tbl("events")
    stage = {"view": 1, "click": 2, "purchase": 3, "signup": 0, "error": 0}
    rows = [
        (r.event_id, r.user_id, r.value, r.event_type,
         stage[r.event_type])
        for _, r in ev.iterrows() if stage.get(r.event_type, 0) > 0
    ]
    assert _bag(run(spark, "join_dpp_partition_pruned")) == _bag(rows)


def test_join_range_bucketed_matches_sweep(spark):
    ev = _tbl("events")
    us = ev.ts.astype("int64")
    HOUR = HOUR_US
    hours = sorted({(t // HOUR) * HOUR for t in us})
    windows = [(h, h + 600_000_000, h + 1_800_000_000) for h in hours]
    want = set()
    for eid, t in zip(ev.event_id, us):
        for wid, lo, hi in windows:
            if lo <= t < hi:
                want.add((wid, eid))
    got = run(spark, "join_range_bucketed")
    assert set(zip(got.w_id, got.event_id)) == want
    assert len(got) == len(want)


def test_udtf_chunker_matches_python(spark):
    d = _tbl("documents")
    rows = []
    for did, text in zip(d.doc_id, d.text):
        words = text.split(" ")
        for i in range(0, (len(words) + 4) // 5):
            rows.append((did, i, " ".join(words[i * 5: i * 5 + 5])))
    assert _bag(run(spark, "udtf_python")) == _bag(rows)


def test_udf_arrow_and_iterator_match_python(spark):
    import re

    s = _tbl("supplier")
    want = {
        (sk,): {"slug": re.sub(r"[^a-z0-9]+", "-", n.lower()).strip("-")}
        for sk, n in zip(s.s_suppkey, s.s_name)
    }
    assert_keyed(run(spark, "udf_arrow_optimized"), want,
                 ["s_suppkey"], ["slug"])

    d = _tbl("documents")
    weights = {"de": 0.25, "en": 0.5, "es": 0.75, "fr": 1.0, "zh": 1.25}
    want2 = {
        (did,): {"model_score": n * weights.get(lang, 0.0)}
        for did, n, lang in zip(d.doc_id, d.n_chars, d.lang)
    }
    assert_keyed(run(spark, "udf_pandas_iterator_model"), want2,
                 ["doc_id"], ["model_score"], tol=1e-4)


def test_scan_counts_and_expectations_match_pandas(spark):
    from naqed_spark.catalog import TABLES

    sizes = {t: len(_tbl(t)) for t in TABLES}
    want = {(t,): {"n": n} for t, n in sizes.items()}
    assert_keyed(run(spark, "scan_all_entities"), want, ["entity"], ["n"])

    want2 = {(t,): {"n": sizes[t]} for t in ("lineitem", "orders", "customer")}
    assert_keyed(run(spark, "scan_count_star_metadata"), want2,
                 ["tbl"], ["n"])

    li = _tbl("lineitem")
    got = run(spark, "scan_parquet").iloc[0]
    assert int(got.n_rows) == len(li)
    assert int(got.n_orders) == li.l_orderkey.nunique()

    o = _tbl("orders")
    viol = {
        "custkey_not_null": int(o.o_custkey.isna().sum()),
        "totalprice_positive": int((o.o_totalprice <= 0).sum()),
        "status_in_domain": int((~o.o_orderstatus.isin(
            ["O", "F", "P"])).sum()),
        "orderdate_in_range": int(
            ((o.o_orderdate < pd.Timestamp("1990-01-01"))
             | (o.o_orderdate >= pd.Timestamp("2005-01-01"))).sum()),
    }
    want3 = {
        (rule,): {"n_violations": v, "passed": v == 0, "n_rows": len(o)}
        for rule, v in viol.items()
    }
    assert_keyed(run(spark, "scan_expectations_check"), want3,
                 ["rule"], ["n_violations", "passed", "n_rows"])

    ev = _tbl("events")
    want4 = {(eid,): {"k": json.loads(p).get("k")}
             for eid, p in zip(ev.event_id, ev.props)}
    assert_keyed(run(spark, "scan_json_props"), want4,
                 ["event_id"], ["k"])


# -------- round-11 compiler registrations: $pivot / $unpivot /
# stratified $sample (wave 38) — the mandatory twin-bug replays for the
# new DSL surface (VERDICT r10 item 3): conditional-count recomputation
# in pandas for the pivot, a pure-python stack for the unpivot, and a
# hashlib md5 rank replay for the stratified sample. None of these share
# a line of SQL or Column code with either engine spelling.


def test_compiler_pivot_matches_conditional_counts(spark):
    ev = _tbl("events")
    types = ["click", "error", "purchase", "signup", "view"]
    want = {}
    for uid, grp in ev.groupby("user_id"):
        counts = {t: int((grp.event_type == t).sum()) for t in types}
        counts["engaged"] = counts["click"] + counts["view"]
        want[(uid,)] = counts
    assert_keyed(run(spark, "compiler_pivot"), want,
                 ["user_id"], types + ["engaged"])


def test_compiler_unpivot_matches_python_stack(spark):
    o = _tbl("orders")
    f = o[o.o_orderstatus == "F"]
    rows = []
    for ok, tp, ck in zip(f.o_orderkey, f.o_totalprice, f.o_custkey):
        rows.append((ok, "o_totalprice", float(tp)))
        rows.append((ok, "o_custkey", float(ck)))
    assert _bag(run(spark, "compiler_unpivot")) == _bag(rows)


def test_compiler_sample_stratified_matches_hashlib_rank(spark):
    import hashlib

    c = _tbl("customer")
    want = {}
    for seg, grp in c.groupby("c_mktsegment", dropna=False):
        ranked = sorted(
            zip(grp.c_custkey, grp.c_nationkey),
            key=lambda r: (
                hashlib.md5(str(r[0]).encode()).hexdigest(),
                r[0],
            ),
        )
        for ck, nk in ranked[:7]:
            want[(ck,)] = {"c_mktsegment": seg, "c_nationkey": nk}
    assert_keyed(run(spark, "compiler_sample_stratified"), want,
                 ["c_custkey"], ["c_mktsegment", "c_nationkey"])


# -------- round-12 registrations (wave 39): the $asof nearest /
# tolerance driver keys replayed per event in pure python — argmin over
# |Δµs| and a bounded backward max, straight off the parquet, no Spark
# Columns and no SQL shared with either engine spelling. These promote
# the r11 engine-level recompute (test_compiler) to the REGISTERED keys.


def _orders_by_user():
    o = _tbl("orders")
    by_user: dict = {}
    for ok, ck, od in zip(o.o_orderkey, o.o_custkey, o.o_orderdate):
        us = pd.Timestamp(od).value // 1000  # ns -> µs (dates are midnight)
        by_user.setdefault(ck, []).append((int(ok), us, od))
    return by_user


def test_compiler_asof_nearest_matches_python_argmin(spark):
    ev = _tbl("events")
    by_user = _orders_by_user()
    want = {}
    for eid, uid, ts in zip(ev.event_id, ev.user_id, ev.ts):
        if pd.isna(ts):
            continue
        e_us = pd.Timestamp(ts).value // 1000
        cands = by_user.get(uid, [])
        if not cands:
            continue
        ok, _, od = min(
            cands, key=lambda c: (abs(c[1] - e_us), c[1], c[0])
        )
        want[(eid,)] = {
            "user_id": uid,
            "o_orderkey": ok,
            # ISO string: close() compares str/num/None, not date objects
            "o_orderdate": str(pd.Timestamp(od).date()),
        }
    got = run(spark, "compiler_asof_nearest")
    got["o_orderdate"] = [
        str(pd.Timestamp(v).date()) for v in got["o_orderdate"]
    ]
    assert_keyed(got, want, ["event_id"],
                 ["user_id", "o_orderkey", "o_orderdate"])


def test_compiler_asof_tolerance_matches_python_bounded_max(spark):
    from naqed_spark.queries.compiler_ops import _ASOF_TOL_US

    ev = _tbl("events")
    by_user = _orders_by_user()
    want = {}
    n_stale = 0
    for eid, uid, ts in zip(ev.event_id, ev.user_id, ev.ts):
        e_us = pd.Timestamp(ts).value // 1000 if not pd.isna(ts) else None
        best = None
        if e_us is not None:
            fresh = [
                c for c in by_user.get(uid, [])
                if c[1] <= e_us and c[1] >= e_us - _ASOF_TOL_US
            ]
            if fresh:
                best = max(fresh, key=lambda c: (c[1], c[0]))[0]
        if best is None:
            n_stale += 1
        # LEFT semantics: every event keeps its row; stale -> NULL key
        want[(eid,)] = {"user_id": uid, "o_orderkey": best}
    got = run(spark, "compiler_asof_tolerance")
    assert_keyed(got, want, ["event_id"], ["user_id", "o_orderkey"])
    # the bound must actually bite mid-fixture, or this replay is vacuous
    assert 0 < n_stale < len(want)


# -------- round-12 subtotal grids (wave 40): $rollup / $cube /
# $grouping_sets replayed as explicit per-set pandas groupbys — the grid
# is constructed set by set from the textbook definition (ROLLUP =
# prefixes, CUBE = all subsets, GROUPING SETS = the listed sets), never
# via any engine's rollup primitive. Grouping flags ride in the KEY so a
# subtotal row can never alias a NULL-data group.


def _grid_want(df, cols, sets, stats):
    want = {}
    for s in sets:
        keep = [c for c in cols if c in s]
        groups = (
            df.groupby(keep, dropna=False) if keep else [((), df)]
        )
        for kv, grp in groups:
            if keep and not isinstance(kv, tuple):
                kv = (kv,)
            kmap = dict(zip(keep, kv))
            key = tuple(
                [kmap.get(c) for c in cols]
                + [0 if c in s else 1 for c in cols]
            )
            want[key] = stats(grp)
    return want


def test_compiler_rollup_matches_pandas_grid(spark):
    li = _tbl("lineitem")
    cols = ["l_returnflag", "l_linestatus"]
    sets = [set(cols), {"l_returnflag"}, set()]
    want = _grid_want(
        li, cols, sets,
        lambda g: {"sum_qty": float(g.l_quantity.sum()), "n": len(g)},
    )
    got = run(spark, "compiler_rollup")
    assert_keyed(got, want,
                 cols + ["g_flag", "g_status"], ["sum_qty", "n"])


def test_compiler_cube_matches_pandas_grid(spark):
    o = _tbl("orders")
    cols = ["o_orderstatus", "o_orderpriority"]
    sets = [set(cols), {"o_orderstatus"}, {"o_orderpriority"}, set()]
    want = {}
    for key, stats in _grid_want(
        o, cols, sets,
        lambda g: {
            "n": len(g),
            "total": float(cents(g.o_totalprice).sum()) / 100.0,
        },
    ).items():
        # the key carries ONLY g_status (the registered key emits one
        # flag); fold g_priority into disambiguation via the priority
        # value itself — no fixture priority is NULL, asserted below
        want[key[:2] + (key[2],)] = stats
    assert o.o_orderpriority.notna().all()
    got = run(spark, "compiler_cube")
    assert_keyed(got, want, cols + ["g_status"], ["n", "total"])


def test_compiler_grouping_sets_matches_pandas_grid(spark):
    li = _tbl("lineitem")
    cols = ["l_returnflag", "l_linestatus"]
    sets = [{"l_returnflag"}, {"l_linestatus"}, set()]
    want = _grid_want(
        li, cols, sets,
        lambda g: {"sum_qty": float(g.l_quantity.sum())},
    )
    got = run(spark, "compiler_grouping_sets")
    assert_keyed(got, want,
                 cols + ["g_flag", "g_status"], ["sum_qty"])


# -------- round-12 decode seam (wave 41): llm_multimodal_decode
# replayed by ENCODING each doc's PPM in pure python (the same generating
# formula), DECODING it with functions/multimodal.decode_ppm directly
# (no Spark, no Arrow, no SQL), and recomputing the channel means from
# the decoded raster bytes — so the registered key's oracle (closed-form
# sums) and this replay (actual decode) triangulate the decoder from two
# independent directions.


def test_llm_multimodal_decode_matches_python_decode(spark):
    from naqed_spark.functions.multimodal import decode_ppm, encode_ppm

    doc = _tbl("documents")
    want = {}
    for did in doc.doc_id:
        if pd.isna(did):
            continue
        did = int(did)
        k = abs(did)
        w, h = 4 + k % 5, 3 + k % 3
        raster = bytes((k * 31 + i) % 256 for i in range(3 * w * h))
        # independence (round-12 self-review pass 2): expected values
        # come from the GENERATING FORMULA (w, h, raster) directly —
        # never through decode_ppm, which the Spark path under test
        # runs, so a symmetric encode/decode twin bug cannot satisfy
        # this test. The decoder round-trip is asserted SEPARATELY.
        img = decode_ppm(encode_ppm(w, h, raster))
        assert (img.width, img.height, img.raster) == (w, h, raster)
        n = w * h
        sums = [sum(raster[c::3]) for c in range(3)]
        want[(did,)] = {
            "width": w,
            "height": h,
            "n_px": n,
            "mean_r": sums[0] / n,
            "mean_g": sums[1] / n,
            "mean_b": sums[2] / n,
        }
    assert_keyed(
        run(spark, "llm_multimodal_decode"), want, ["doc_id"],
        ["width", "height", "n_px", "mean_r", "mean_g", "mean_b"],
        tol=0,
    )


# -------- round-13 registrations (wave 42): the M11 statistical-agg
# driver keys and the $asof forward strategy, each recomputed from the
# textbook definition in pure python — explicit Σ(x-x̄)² moments (never
# numpy's var), a hand-rolled (n-1)p linear-interpolation quantile
# (never np.quantile), and a per-order argmin scan over the at-or-after
# candidate set. None shares code or SQL with either engine spelling,
# so a twin bug in the DSL lowering and its DuckDB oracle cannot
# satisfy these.


def _moments(x: np.ndarray) -> dict:
    n = len(x)
    mean = float(x.sum()) / n
    ss = float(((x - mean) ** 2).sum())
    var_samp = ss / (n - 1)
    var_pop = ss / n
    return {
        "sd_qty": math.sqrt(var_samp),
        "sd_pop_qty": math.sqrt(var_pop),
        "var_qty": var_samp,
        "var_pop_qty": var_pop,
    }


def test_compiler_agg_stats_matches_textbook_moments(spark):
    li = _tbl("lineitem")
    want = {
        (flag,): _moments(grp.l_quantity.to_numpy(dtype=np.float64))
        for flag, grp in li.groupby("l_returnflag")
    }
    got = run(spark, "compiler_agg_stats")
    # the key emits round(4); the textbook values are unrounded, so the
    # tolerance sits just above the 0.5e-4 rounding grain
    assert_keyed(got, want, ["l_returnflag"],
                 ["sd_qty", "sd_pop_qty", "var_qty", "var_pop_qty"],
                 tol=1e-4)


def _quantile_cont(sorted_vals: np.ndarray, p: float) -> float:
    """The textbook (n-1)p linear interpolation — quantile_cont /
    type-7, written out rather than delegated to np.quantile."""
    h = (len(sorted_vals) - 1) * p
    lo = math.floor(h)
    hi = math.ceil(h)
    return float(
        sorted_vals[lo] + (h - lo) * (sorted_vals[hi] - sorted_vals[lo])
    )


def test_compiler_percentile_matches_textbook_interpolation(spark):
    li = _tbl("lineitem")
    want = {}
    for flag, grp in li.groupby("l_returnflag"):
        v = np.sort(grp.l_quantity.to_numpy(dtype=np.float64))
        want[(flag,)] = {
            "median_qty": _quantile_cont(v, 0.5),
            "p90_qty": _quantile_cont(v, 0.9),
        }
    got = run(spark, "compiler_percentile")
    # 0.25-step values → interpolants on exact 0.125 grids; round(4) is
    # an identity there, so the default tolerance suffices
    assert_keyed(got, want, ["l_returnflag"], ["median_qty", "p90_qty"])


def test_compiler_asof_forward_matches_python_argmin(spark):
    ev = _tbl("events")
    by_user: dict = {}
    for eid, uid, ts in zip(ev.event_id, ev.user_id, ev.ts):
        if pd.isna(ts):
            continue
        by_user.setdefault(uid, []).append(
            (pd.Timestamp(ts).value // 1000, int(eid))
        )
    o = _tbl("orders")
    want = {}
    n_dropped = 0
    for ok, ck, od in zip(o.o_orderkey, o.o_custkey, o.o_orderdate):
        o_us = pd.Timestamp(od).value // 1000
        cands = [c for c in by_user.get(ck, []) if c[0] >= o_us]
        if not cands:
            n_dropped += 1  # INNER semantics: no at-or-after match
            continue
        want[(int(ok),)] = {
            "o_custkey": ck,
            "event_id": min(cands)[1],  # (ts ASC, event_id ASC)
        }
    got = run(spark, "compiler_asof_forward")
    assert_keyed(got, want, ["o_orderkey"], ["o_custkey", "event_id"])
    # fixture sanity: matched and dropped orders BOTH occur, or the
    # inner-join semantics assertion is vacuous
    assert want and n_dropped > 0


# --- wave 43 (round 13): M12 vector similarity through the DSL ----------


def test_compiler_vector_similarity_matches_numpy(spark):
    """Textbook recompute of all three metrics straight off the parquet
    fixture: dot = Σaᵢbᵢ, cosine = dot/(‖a‖‖b‖), euclidean = √Σ(aᵢ-bᵢ)²
    — numpy vectorized forms, no HOFs, no SQL, no shared spelling with
    either engine. The key emits round(6); tolerance sits above that
    grain."""
    from naqed_spark.queries.compiler_ops import _QV

    emb = _tbl("embeddings")
    q = np.asarray(_QV, dtype=np.float64)
    want = {}
    for vid, vec in zip(emb.vec_id, emb.embedding):
        a = np.asarray(list(vec), dtype=np.float64)
        dot = float(a @ q)
        want[(int(vid),)] = {
            "dot_q": dot,
            "cos_q": dot / (np.linalg.norm(a) * np.linalg.norm(q)),
            "dist_q": float(np.linalg.norm(a - q)),
        }
    got = run(spark, "compiler_vector_similarity")
    assert len(got) == len(emb)
    assert_keyed(got, want, ["vec_id"], ["dot_q", "cos_q", "dist_q"],
                 tol=1e-5)


def test_compiler_vector_topk_matches_numpy_argsort(spark):
    """Independent top-20: score every vector in numpy, rank by
    (-rounded_cosine, vec_id) — the key's documented deterministic order
    — and compare membership AND order. Rounded cosine is used for the
    rank exactly as the key documents (§7.3 topk discipline)."""
    from naqed_spark.queries.compiler_ops import _QV

    emb = _tbl("embeddings")
    q = np.asarray(_QV, dtype=np.float64)
    scored = []
    for vid, vec, lab in zip(emb.vec_id, emb.embedding, emb.label):
        a = np.asarray(list(vec), dtype=np.float64)
        cos = round(float(a @ q) / (np.linalg.norm(a) * np.linalg.norm(q)), 6)
        scored.append((-cos, int(vid), int(lab)))
    scored.sort()
    want = scored[:20]
    got = run(spark, "compiler_vector_topk")
    assert len(got) == 20
    got_rows = list(zip(got.vec_id, got.label, got.cos_q))
    for (ncos, vid, lab), (gvid, glab, gcos) in zip(want, got_rows):
        assert int(gvid) == vid and int(glab) == lab
        assert abs(float(gcos) - (-ncos)) <= 1e-5


# --- wave 44 (round 13): M13 $split / $explode -----------------------


def test_compiler_split_explode_wordcount_matches_python(spark):
    """Plain-python recompute: str.split(' ') token counts off the
    parquet fixture, ranked by the key's documented (-count, token)
    total order, top 100 — no Spark, no SQL, no regex."""
    docs = _tbl("documents")
    counts: dict = {}
    for text in docs.text:
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        for t in str(text).split(" "):
            counts[t] = counts.get(t, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = run(spark, "compiler_split_explode_wordcount")
    assert list(zip(got.token, got.cnt)) == want


def test_compiler_explode_pos_outer_matches_python_enumerate(spark):
    """Plain-python enumerate replay of the pos+outer semantics: every
    doc_id < 50 appears; non-NULL text yields (i, token) per element in
    order; NULL text yields exactly one (None, None) row."""
    docs = _tbl("documents")
    want = set()
    n_padded = 0
    for did, text in zip(docs.doc_id, docs.text):
        if did >= 50:
            continue
        if text is None or (isinstance(text, float) and pd.isna(text)):
            want.add((int(did), None, None))
            n_padded += 1
        else:
            for i, t in enumerate(str(text).split(" ")):
                want.add((int(did), i, t))
    got = run(spark, "compiler_explode_pos_outer")
    got_set = {
        (int(d), None if pd.isna(i) else int(i), t if isinstance(t, str) else None)
        for d, i, t in zip(got.doc_id, got.idx, got.token)
    }
    assert got_set == want
    # base fixture has no NULL text < 50; the padded path is pinned by
    # the null battery (text nulled every 7th row), so don't assert
    # n_padded > 0 here — just that the sets agree exactly


# --- wave 45 (round 13): M14 $where / $collect_list / $collect_set ----


def test_compiler_where_distinct_docs_matches_python(spark):
    """Plain-python replay: token → (distinct docs, total count) over
    non-empty tokens, ranked by the key's documented
    (-ndocs, -cnt, token) total order, top 50."""
    docs = _tbl("documents")
    ndocs: dict = {}
    cnt: dict = {}
    for did, text in zip(docs.doc_id, docs.text):
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        toks = [t for t in str(text).split(" ") if t != ""]
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        for t in set(toks):
            ndocs.setdefault(t, set()).add(int(did))
    ranked = sorted(
        ((t, len(ndocs[t]), cnt[t]) for t in cnt),
        key=lambda x: (-x[1], -x[2], x[0]),
    )[:50]
    got = run(spark, "compiler_where_distinct_docs")
    assert list(zip(got.token, got.ndocs, got.cnt)) == ranked


def test_compiler_collect_segments_matches_python(spark):
    """Plain-python replay of the collection contract: NULLs skipped,
    sorted, comma-joined — set and bag forms."""
    cust = _tbl("customer")
    want: dict = {}
    for nk, seg in zip(cust.c_nationkey, cust.c_mktsegment):
        if seg is None or (isinstance(seg, float) and pd.isna(seg)):
            continue
        want.setdefault(int(nk), []).append(seg)
    got = run(spark, "compiler_collect_segments")
    assert len(got) == cust.c_nationkey.nunique()
    for _, r in got.iterrows():
        vals = want.get(int(r["c_nationkey"]), [])
        assert r["seg_bag"] == ",".join(sorted(vals))
        assert r["segs"] == ",".join(sorted(set(vals)))


# --- wave 46 (round 13): M15 $corr / $covar --------------------------


def test_compiler_corr_covar_matches_textbook(spark):
    """Explicit-formula recompute: corr = (E[xy]-E[x]E[y]) /
    (σₓ·σᵧ) with population σ (the ratio is scale-invariant so
    sample-vs-population cancels), covariances from Σ(x-x̄)(y-ȳ) over
    n-1 and n — never numpy's cov/corrcoef."""
    li = _tbl("lineitem")
    want = {}
    for flag, grp in li.groupby("l_returnflag"):
        d = grp.l_discount.to_numpy(dtype=np.float64)
        t = grp.l_tax.to_numpy(dtype=np.float64)
        q = grp.l_quantity.to_numpy(dtype=np.float64)
        n = len(grp)
        exy = (d * t).mean() - d.mean() * t.mean()
        sx = math.sqrt((d * d).mean() - d.mean() ** 2)
        sy = math.sqrt((t * t).mean() - t.mean() ** 2)
        sxy = float(((q - q.mean()) * (d - d.mean())).sum())
        want[(flag,)] = {
            "corr_disc_tax": exy / (sx * sy),
            "cov_qty_disc": sxy / (n - 1),
            "covp_qty_disc": sxy / n,
        }
    got = run(spark, "compiler_corr_covar")
    assert_keyed(got, want, ["l_returnflag"],
                 ["corr_disc_tax", "cov_qty_disc", "covp_qty_disc"],
                 tol=1e-5)


# --- wave 47 (round 13): M16 calendar ops ------------------------------


def test_compiler_calendar_rollup_matches_python_datetime(spark):
    """datetime.date replay: month floors via replace(day=1), day of
    month, (d - 1995-01-01).days — stdlib calendar arithmetic, no
    Spark, no SQL, no pandas datetime ops."""
    import datetime as dt

    orders = _tbl("orders")
    epoch = dt.date(1995, 1, 1)
    want: dict = {}
    for od in orders.o_orderdate:
        d = pd.Timestamp(od).date()
        k = (d.replace(day=1),)
        agg = want.setdefault(k, {"n": 0, "dom": 0, "age": 0})
        agg["n"] += 1
        agg["dom"] += d.day
        agg["age"] += (d - epoch).days
    want = {
        k: {
            "n_orders": v["n"],
            "avg_dom": v["dom"] / v["n"],
            "avg_age": v["age"] / v["n"],
        }
        for k, v in want.items()
    }
    got = run(spark, "compiler_calendar_rollup")
    assert_keyed(got, want, ["omonth"],
                 ["n_orders", "avg_dom", "avg_age"], tol=1e-4)


# --- wave 48 (round 13): M17 string ops --------------------------------


def test_compiler_string_normalize_matches_python(spark):
    """Python str replay: replace('-',' ').strip().upper() grouping with
    a distinct 8-char-prefix count — NULL source is its own group, NULL
    text never contributes a prefix."""
    docs = _tbl("documents")
    want: dict = {}
    for src, text in zip(docs.source, docs.text):
        null_src = src is None or (isinstance(src, float) and pd.isna(src))
        key = (None if null_src
               else str(src).replace("-", " ").strip().upper(),)
        agg = want.setdefault(key, {"n_docs": 0, "heads": set()})
        agg["n_docs"] += 1
        if not (text is None or (isinstance(text, float) and pd.isna(text))):
            agg["heads"].add(str(text)[:8])
    want = {
        k: {"n_docs": v["n_docs"], "n_heads": len(v["heads"])}
        for k, v in want.items()
    }
    got = run(spark, "compiler_string_normalize")
    assert_keyed(got, want, ["src_norm"], ["n_docs", "n_heads"])


# --- wave 49 (round 14): M18 null combinators --------------------------


def test_compiler_null_combinators_matches_python(spark):
    """Python replay of the combinator semantics FROM THE DOCSTRING:
    segment key = first non-NULL of (NULL-on-MACHINERY segment, 'OTHER');
    greatest/least SKIP NULLs (clamp constants win when the balance is
    NULL); coalesce fills NULL balances with 0. Sums accumulate in
    integer cents (the DECIMAL(12,2) discipline) so the replay carries
    no float-order term of its own."""
    cust = _tbl("customer")

    def _cents(v: float) -> int:
        return int(math.floor(v * 100 + 0.5))

    want: dict = {}
    for seg, bal in zip(cust.c_mktsegment, cust.c_acctbal):
        seg, bal = _norm(seg), _norm(bal)
        key = ("OTHER" if seg is None or seg == "MACHINERY" else seg,)
        agg = want.setdefault(
            key, {"n_cust": 0, "sum_hi": 0, "sum_lo": 0, "sum_fill": 0}
        )
        agg["n_cust"] += 1
        agg["sum_hi"] += _cents(0.0 if bal is None else max(bal, 0.0))
        agg["sum_lo"] += _cents(1000.0 if bal is None else min(bal, 1000.0))
        agg["sum_fill"] += _cents(0.0 if bal is None else bal)
    want = {
        k: {
            "n_cust": v["n_cust"],
            "sum_hi": v["sum_hi"] / 100.0,
            "sum_lo": v["sum_lo"] / 100.0,
            "sum_fill": v["sum_fill"] / 100.0,
        }
        for k, v in want.items()
    }
    got = run(spark, "compiler_null_combinators")
    assert_keyed(got, want, ["seg"],
                 ["n_cust", "sum_hi", "sum_lo", "sum_fill"])


# --- wave 50 (round 14): M19 $traverse reachability --------------------


def test_compiler_traverse_reachable_matches_python(spark):
    """Python BFS replay of the fixpoint traversal: adjacency from the
    same-region pairs recomputed with dict/set scans off the parquet
    fixture — no join, no CTE, no shared code with either engine."""
    import collections

    nat = _tbl("nation")
    by_region = collections.defaultdict(list)
    for nk, rk in zip(nat.n_nationkey, nat.n_regionkey):
        by_region[int(rk)].append(int(nk))
    adj = {int(nk): by_region[int(rk)]
           for nk, rk in zip(nat.n_nationkey, nat.n_regionkey)}
    names = {int(nk): nm for nk, nm in zip(nat.n_nationkey, nat.n_name)}
    dist = {0: 0, 14: 0}
    frontier = [0, 14]
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    nxt.append(w)
        frontier = nxt
    want = {(v, names[v]): {"dist": d} for v, d in dist.items()}
    got = run(spark, "compiler_traverse_reachable")
    assert_keyed(got, want, ["n_nationkey", "n_name"], ["dist"])


def test_compiler_traverse_edges_matches_python(spark):
    """Python BFS replay of the depth-bounded tree walk: the edge
    formula (parent (k - k%2)//2 → k) re-derived in pure integer
    python; depths must be exactly d(0)=0, d(k)=d(k//2)+1, cut at 6."""
    cust = _tbl("customer")
    seg = {int(k): s for k, s in zip(cust.c_custkey, cust.c_mktsegment)}
    depth = {0: 0}
    for k in sorted(int(k) for k in cust.c_custkey if int(k) > 0):
        p = (k - k % 2) // 2
        if p in depth and depth[p] < 6:
            depth[k] = depth[p] + 1
    want = {(k, seg[k]): {"dist": d} for k, d in depth.items()}
    got = run(spark, "compiler_traverse_edges")
    assert_keyed(got, want, ["c_custkey", "c_mktsegment"], ["dist"])


# --- wave 51 (round 14): M20 JSON map introspection ---------------------


def test_compiler_json_keys_histogram_matches_python(spark):
    """Python json.loads replay: per top-level property key, the event
    count and the mean property-count of carrying events — recomputed
    with dict scans, no SQL, no map type, NULL props skipped."""
    ev = _tbl("events")
    cnt: dict = {}
    tot: dict = {}
    for props in ev.props:
        if props is None or (isinstance(props, float) and pd.isna(props)):
            continue
        obj = json.loads(props)
        for k in obj:
            cnt[k] = cnt.get(k, 0) + 1
            tot[k] = tot.get(k, 0) + len(obj)
    want = {
        (k,): {"n_events": cnt[k],
               "avg_props": round(tot[k] / cnt[k], 4)}
        for k in cnt
    }
    got = run(spark, "compiler_json_keys_histogram")
    assert_keyed(got, want, ["k"], ["n_events", "avg_props"], tol=1e-4)


# --- waves 52-54 (round 14): M21 $stream + M22 weighted $traverse -------


def test_compiler_stream_tumbling_matches_python(spark):
    """Python replay of the streamed tumbling window: hour-floored
    event time (pandas datetime arithmetic — no Spark window, no SQL),
    counts + integer-cents sums; NULL values skipped, NULL event_type
    a kept group."""
    ev = _tbl("events")
    want: dict = {}
    for ts, et, val in zip(ev.ts, ev.event_type, ev.value):
        t = pd.Timestamp(ts)
        us = (t.value // 1000 // 3_600_000_000) * 3_600_000_000
        key = (us, _norm(et))
        agg = want.setdefault(key, {"n_events": 0, "cents": 0,
                                    "has": False})
        agg["n_events"] += 1
        v = _norm(val)
        if v is not None:
            agg["cents"] += int(math.floor(v * 100 + 0.5))
            agg["has"] = True
    want = {
        k: {"n_events": v["n_events"],
            "sum_value": v["cents"] / 100.0 if v["has"] else None}
        for k, v in want.items()
    }
    got = run(spark, "compiler_stream_tumbling")
    assert_keyed(got, want, ["win_start_us", "event_type"],
                 ["n_events", "sum_value"])


def test_compiler_stream_session_matches_python(spark):
    """Python sessionization replay: per user, sort by event time and
    split at >=30-min gaps (Spark session windows are [start,
    last+gap) end-exclusive: an event exactly gap after the previous
    starts a new session) — plain list scans, no window function, no
    state store."""
    ev = _tbl("events")
    gap_us = 30 * 60 * 1_000_000
    per_user: dict = {}
    for ts, uid, val in zip(ev.ts, ev.user_id, ev.value):
        per_user.setdefault(int(uid), []).append(
            (pd.Timestamp(ts).value // 1000, _norm(val)))
    want: dict = {}
    for uid, rows in per_user.items():
        rows.sort(key=lambda r: r[0])
        start, n, cents, has, prev = None, 0, 0, False, None
        for ts_us, val in rows + [(None, None)]:
            if ts_us is None or (prev is not None
                                 and ts_us - prev >= gap_us):
                if start is not None:
                    want[(start, uid)] = {
                        "n_events": n,
                        "sum_value": cents / 100.0 if has else None,
                    }
                if ts_us is None:
                    break
                start, n, cents, has = ts_us, 0, 0, False
            if start is None:
                start = ts_us
            n += 1
            if val is not None:
                cents += int(math.floor(val * 100 + 0.5))
                has = True
            prev = ts_us
    got = run(spark, "compiler_stream_session")
    assert_keyed(got, want, ["win_start_us", "user_id"],
                 ["n_events", "sum_value"])


def test_compiler_traverse_cheapest_matches_python(spark):
    """Python Bellman-Ford replay over the multi-edge line graph: the
    cheapest of ~100 parallel edges per hop, walked from custkey 0,
    ≤ 12 edges."""
    orders = _tbl("orders")
    cust = set(int(c) for c in _tbl("customer").c_custkey)
    cheapest: dict = {}
    for ck, ok in zip(orders.o_custkey, orders.o_orderkey):
        k, w = int(ck), int(ok) % 10 + 1
        if k not in cheapest or w < cheapest[k]:
            cheapest[k] = w
    want = {(0,): {"cost": 0}}
    cost, k = 0, 0
    for _ in range(12):
        if k not in cheapest or (k + 1) not in cust:
            break
        cost += cheapest[k]
        k += 1
        want[(k,)] = {"cost": cost}
    got = run(spark, "compiler_traverse_cheapest")
    assert_keyed(got, want, ["c_custkey"], ["cost"])


# --- wave 55 (round 14): M23 $scalar threshold --------------------------


def test_compiler_scalar_threshold_matches_python(spark):
    """Python replay: the integer half-threshold recomputed with plain
    // arithmetic, the rollup with dict scans and integer-cents sums —
    no SQL, no subquery machinery."""
    cust = _tbl("customer")
    orders = _tbl("orders")
    m = int(cust.c_custkey.max())
    half = (m - m % 2) // 2
    want: dict = {}
    for ck, pri, tp in zip(orders.o_custkey, orders.o_orderpriority,
                           orders.o_totalprice):
        if int(ck) > half:
            continue
        key = (_norm(pri),)
        agg = want.setdefault(key, {"n_orders": 0, "cents": 0})
        agg["n_orders"] += 1
        agg["cents"] += int(math.floor(float(tp) * 100 + 0.5))
    want = {
        k: {"n_orders": v["n_orders"], "sum_price": v["cents"] / 100.0}
        for k, v in want.items()
    }
    got = run(spark, "compiler_scalar_threshold")
    assert_keyed(got, want, ["o_orderpriority"], ["n_orders", "sum_price"])


# --- wave 56 (round 15): M21 completion — $stream sliding windows -------


def test_compiler_stream_sliding_matches_python(spark):
    """Python replay of the streamed sliding window: each event lands
    in exactly window/slide = 4 windows whose epoch-aligned starts are
    its 15-min bucket minus k*15 min (k in 0..3) — pandas timestamp
    arithmetic, no Spark window, no SQL. Counts + integer-cents sums
    per (window, event_type); NULL values skipped, NULL event_type a
    kept group."""
    ev = _tbl("events")
    slide_us = 15 * 60 * 1_000_000
    want: dict = {}
    for ts, et, val in zip(ev.ts, ev.event_type, ev.value):
        us = pd.Timestamp(ts).value // 1000
        bucket = (us // slide_us) * slide_us
        v = _norm(val)
        for k in range(4):
            key = (bucket - k * slide_us, _norm(et))
            agg = want.setdefault(key, {"n_events": 0, "cents": 0,
                                        "has": False})
            agg["n_events"] += 1
            if v is not None:
                agg["cents"] += int(math.floor(v * 100 + 0.5))
                agg["has"] = True
    want = {
        k: {"n_events": v["n_events"],
            "sum_value": v["cents"] / 100.0 if v["has"] else None}
        for k, v in want.items()
    }
    got = run(spark, "compiler_stream_sliding")
    assert_keyed(got, want, ["win_start_us", "event_type"],
                 ["n_events", "sum_value"])


# --- wave 57 (round 15): M24 approximate-sketch DSL surface -------------


def test_compiler_approx_count_distinct_matches_python(spark):
    """Python replay of the CONTRACT emission: n_exact = plain Python
    set cardinality of non-null users per event_type; sketch_ok must
    be True for every group — the claim under test is that a
    calibrated HLL++ (rsd 0.01) sits within the 5% contract band on
    real groups, which plain Python asserts WITHOUT trusting either
    engine's sketch."""
    ev = _tbl("events")
    want: dict = {}
    for et, uid in zip(ev.event_type, ev.user_id):
        key = (_norm(et),)
        s = want.setdefault(key, set())
        u = _norm(uid)
        if u is not None:
            s.add(int(u))
    want = {k: {"n_exact": len(s), "sketch_ok": True}
            for k, s in want.items()}
    got = run(spark, "compiler_approx_count_distinct")
    assert_keyed(got, want, ["event_type"], ["n_exact", "sketch_ok"])


def test_compiler_approx_percentile_matches_python(spark):
    """Python replay of the exact-regime discrete quantile: per
    priority, sort the prices and take sorted[max(0, ceil(p*n)-1)] —
    the quantile_disc rank rule derived from first principles on tiny
    lists (even/odd/ties/single), no SQL, no sketch."""
    orders = _tbl("orders")
    per: dict = {}
    for pri, tp in zip(orders.o_orderpriority, orders.o_totalprice):
        per.setdefault(_norm(pri), []).append(float(tp))
    want: dict = {}
    for pri, vals in per.items():
        vals.sort()
        n = len(vals)

        def q(p):
            return vals[max(0, math.ceil(p * n) - 1)]

        want[(pri,)] = {"p50_price": q(0.5), "p90_price": q(0.9),
                        "n_orders": n}
    got = run(spark, "compiler_approx_percentile")
    assert_keyed(got, want, ["o_orderpriority"],
                 ["p50_price", "p90_price", "n_orders"])


# --- wave 58 (round 15): M25 correlated $scalar --------------------------


def test_compiler_scalar_correlated_matches_python(spark):
    """Python replay of the Q17 shape: per-part mean quantity from a
    plain dict scan (integer-exact sums), then per return flag count
    the lineitems strictly below half their part's mean + integer-cents
    price sums — no SQL, no join machinery."""
    li = _tbl("lineitem")
    sums: dict = {}
    for pk, q in zip(li.l_partkey, li.l_quantity):
        qn = _norm(q)
        if _norm(pk) is None or qn is None:
            continue
        s = sums.setdefault(int(pk), [0.0, 0])
        s[0] += qn
        s[1] += 1
    thr = {pk: 0.5 * (s / n) for pk, (s, n) in sums.items()}
    want: dict = {}
    for pk, q, rf, ep in zip(li.l_partkey, li.l_quantity,
                             li.l_returnflag, li.l_extendedprice):
        qn = _norm(q)
        if (_norm(pk) is None or qn is None
                or int(pk) not in thr or not qn < thr[int(pk)]):
            continue
        key = (_norm(rf),)
        agg = want.setdefault(key, {"n_items": 0, "cents": 0})
        agg["n_items"] += 1
        agg["cents"] += int(math.floor(float(ep) * 100 + 0.5))
    want = {
        k: {"n_items": v["n_items"], "sum_price": v["cents"] / 100.0}
        for k, v in want.items()
    }
    got = run(spark, "compiler_scalar_correlated")
    assert_keyed(got, want, ["l_returnflag"], ["n_items", "sum_price"])


# --- wave 59 (round 15): M26 streaming approx-distinct -------------------


def test_compiler_stream_approx_distinct_matches_python(spark):
    """Python replay of the contract emission: hour-floored windows ×
    event_type from pandas arithmetic, n_exact = plain set cardinality
    of non-null users, sketch_ok asserted True (a calibrated rsd-0.01
    sketch within the 5% band on real groups) — no Spark window, no
    state store, no sketch."""
    ev = _tbl("events")
    want: dict = {}
    for ts, et, uid in zip(ev.ts, ev.event_type, ev.user_id):
        us = (pd.Timestamp(ts).value // 1000
              // 3_600_000_000) * 3_600_000_000
        key = (us, _norm(et))
        s = want.setdefault(key, set())
        u = _norm(uid)
        if u is not None:
            s.add(int(u))
    want = {k: {"n_exact": len(s), "sketch_ok": True}
            for k, s in want.items()}
    got = run(spark, "compiler_stream_approx_distinct")
    assert_keyed(got, want, ["win_start_us", "event_type"],
                 ["n_exact", "sketch_ok"])


# --- wave 60 (round 15): M27 streaming quantile ---------------------------


def test_compiler_stream_approx_percentile_matches_python(spark):
    """Python replay: hour-floored windows x event_type from pandas
    arithmetic, the median as the discrete-quantile rank rule
    sorted[max(0, ceil(p*n)-1)] over plain lists (NULL values skipped,
    all-NULL group -> None) — no Spark window, no sketch, no SQL."""
    ev = _tbl("events")
    per: dict = {}
    for ts, et, val in zip(ev.ts, ev.event_type, ev.value):
        us = (pd.Timestamp(ts).value // 1000
              // 3_600_000_000) * 3_600_000_000
        key = (us, _norm(et))
        agg = per.setdefault(key, {"vals": [], "n": 0})
        agg["n"] += 1
        v = _norm(val)
        if v is not None:
            agg["vals"].append(v)
    want: dict = {}
    for k, agg in per.items():
        vals = sorted(agg["vals"])
        p50 = (vals[max(0, math.ceil(0.5 * len(vals)) - 1)]
               if vals else None)
        want[k] = {"p50_value": p50, "n_events": agg["n"]}
    got = run(spark, "compiler_stream_approx_percentile")
    assert_keyed(got, want, ["win_start_us", "event_type"],
                 ["p50_value", "n_events"])


# --- wave 61 (round 15): M28 multi-fraction quantiles ---------------------


def test_compiler_approx_percentile_multi_matches_python(spark):
    """Python replay: per status, sort prices once and read all four
    discrete quantiles by the derived rank rule, quantize to cents
    with the half-up floor and join with ',' — plain lists, no sketch,
    no SQL."""
    orders = _tbl("orders")
    per: dict = {}
    for st, tp in zip(orders.o_orderstatus, orders.o_totalprice):
        per.setdefault(_norm(st), []).append(float(tp))
    want: dict = {}
    for st, vals in per.items():
        vals.sort()
        n = len(vals)
        cents = [str(int(math.floor(
            vals[max(0, math.ceil(p * n) - 1)] * 100 + 0.5)))
            for p in (0.25, 0.5, 0.75, 0.99)]
        want[(st,)] = {"quartile_cents": ",".join(cents), "n_orders": n}
    got = run(spark, "compiler_approx_percentile_multi")
    assert_keyed(got, want, ["o_orderstatus"],
                 ["quartile_cents", "n_orders"])


# --- wave 62 (round 16): M29 $stream.$join + M30 $stream.$distinct -------


def test_compiler_stream_static_join_matches_python(spark):
    """Python replay of the streamed dim-enrich aggregation: customer
    key → segment dict lookup (the broadcast join), hour-floored event
    time, counts + integer-cents sums per (window, segment); inner
    join semantics — events without a customer row drop (none in the
    fixture, but the replay spells the rule)."""
    ev = _tbl("events")
    cust = _tbl("customer")
    seg = {int(k): _norm(s)
           for k, s in zip(cust.c_custkey, cust.c_mktsegment)}
    want: dict = {}
    for ts, uid, val in zip(ev.ts, ev.user_id, ev.value):
        if int(uid) not in seg:
            continue  # inner join drops unmatched events
        t = pd.Timestamp(ts)
        us = (t.value // 1000 // 3_600_000_000) * 3_600_000_000
        key = (us, seg[int(uid)])
        agg = want.setdefault(key, {"n_events": 0, "cents": 0,
                                    "has": False})
        agg["n_events"] += 1
        v = _norm(val)
        if v is not None:
            agg["cents"] += int(math.floor(v * 100 + 0.5))
            agg["has"] = True
    want = {
        k: {"n_events": v["n_events"],
            "sum_value": v["cents"] / 100.0 if v["has"] else None}
        for k, v in want.items()
    }
    got = run(spark, "compiler_stream_static_join")
    assert_keyed(got, want, ["win_start_us", "c_mktsegment"],
                 ["n_events", "sum_value"])


def test_compiler_stream_dedup_matches_python(spark):
    """Python replay of the dedup pass-through: the doubled delivery
    collapses to exactly one row per event_id, and every surviving
    row's columns equal the entity's (event_id is unique in the
    fixture, so the expected set is just the entity projection with
    ts as epoch µs)."""
    ev = _tbl("events")
    want: dict = {}
    for eid, ts, uid, et, val, pr in zip(
        ev.event_id, ev.ts, ev.user_id, ev.event_type, ev.value,
        ev.props,
    ):
        key = (int(eid),)
        assert key not in want  # uniqueness premise of the batch twin
        want[key] = {
            "ts_us": pd.Timestamp(ts).value // 1000,
            "user_id": _norm(uid),
            "event_type": _norm(et),
            "value": _norm(val),
            "props": _norm(pr),
        }
    got = run(spark, "compiler_stream_dedup")
    assert len(got) == len(want)  # one survivor per id, no dup leaked
    assert_keyed(got, want, ["event_id"],
                 ["ts_us", "user_id", "event_type", "value", "props"])


# --- wave 63 (round 16): M31 regex verbs + M32 window navigation ---------


def test_compiler_regex_text_matches_python(spark):
    """Python-re replay (a THIRD regex engine next to Java and RE2 —
    the portable subset must agree on all three): first [A-Za-z]+ run's
    group 1, partial-match digit flag, global digit masking length.
    No-match extract is '' (the probed Spark/DuckDB convention)."""
    import re as _re

    docs = _tbl("documents")
    want: dict = {}
    pat_w = _re.compile("([A-Za-z]+)")
    pat_d = _re.compile("[0-9][0-9]*")
    for did, text in zip(docs.doc_id, docs.text):
        t = _norm(text)
        if t is None:
            want[(int(did),)] = {"first_word": None, "has_number": None,
                                 "masked_len": None, "n_words": None}
            continue
        m = pat_w.search(t)
        want[(int(did),)] = {
            "first_word": m.group(1) if m else "",
            "has_number": pat_d.search(t) is not None,
            "masked_len": len(_re.sub("[0-9]+", "#", t)),
            "n_words": len(_re.findall("[A-Za-z]+", t)),
        }
    got = run(spark, "compiler_regex_text")
    assert_keyed(got, want, ["doc_id"],
                 ["first_word", "has_number", "masked_len", "n_words"])


def test_compiler_window_nav_matches_python(spark):
    """Python replay: per customer sort orders by (price desc, key
    asc) with plain list sorts, read first/last/nth(2) off the FULL
    sorted list (the pinned full-partition frame), emit the top-2
    rows (the $qualify bound)."""
    orders = _tbl("orders")
    per: dict = {}
    for ck, ok, tp in zip(orders.o_custkey, orders.o_orderkey,
                          orders.o_totalprice):
        per.setdefault(int(ck), []).append((float(tp), int(ok)))
    want: dict = {}
    for ck, rows in per.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        keys = [ok for _, ok in rows]
        first, last = keys[0], keys[-1]
        second = keys[1] if len(keys) >= 2 else None
        for rk, (tp, ok) in enumerate(rows[:2], start=1):
            want[(ck, ok)] = {
                "o_totalprice": tp, "first_ok": first, "last_ok": last,
                "second_ok": second, "rk": rk,
            }
    got = run(spark, "compiler_window_nav")
    assert_keyed(got, want, ["o_custkey", "o_orderkey"],
                 ["o_totalprice", "first_ok", "last_ok", "second_ok",
                  "rk"])


def test_compiler_regex_filter_matches_python(spark):
    """Python-re replay of the $regex FILTER: the row SET itself is
    pattern-driven, so the third-engine check re-derives which docs
    match \\bthe\\b and re-aggregates with dict scans."""
    import re as _re

    docs = _tbl("documents")
    pat = _re.compile(r"\bthe\b")
    want: dict = {}
    for lang, text, nc in zip(docs.lang, docs.text, docs.n_chars):
        t = _norm(text)
        if t is None or not pat.search(t):
            continue
        key = (_norm(lang),)
        agg = want.setdefault(key, {"n_docs": 0, "sum_chars": 0})
        agg["n_docs"] += 1
        agg["sum_chars"] += int(nc)
    got = run(spark, "compiler_regex_filter")
    assert_keyed(got, want, ["lang"], ["n_docs", "sum_chars"])


def test_compiler_stream_stream_join_matches_python(spark):
    """Python replay of the interval join: per user, every (click,
    purchase) pair with purchase ts in (click ts, click ts + 1 h] —
    plain nested list scans, no state store, no SQL."""
    ev = _tbl("events")
    clicks: dict = {}
    purchases: dict = {}
    for eid, ts, uid, et in zip(ev.event_id, ev.ts, ev.user_id,
                                ev.event_type):
        us = pd.Timestamp(ts).value // 1000
        if _norm(et) == "click":
            clicks.setdefault(int(uid), []).append((int(eid), us))
        elif _norm(et) == "purchase":
            purchases.setdefault(int(uid), []).append((int(eid), us))
    hour_us = 3_600_000_000
    want: dict = {}
    for uid, cs in clicks.items():
        for cid, cus in cs:
            for pid, pus in purchases.get(uid, []):
                if cus < pus <= cus + hour_us:
                    want[(cid, pid)] = {
                        "user_id": uid, "left_us": cus,
                        "right_us": pus,
                    }
    got = run(spark, "compiler_stream_stream_join")
    assert len(want) > 0
    assert_keyed(got, want, ["left_id", "right_id"],
                 ["user_id", "left_us", "right_us"])


def test_compiler_window_nav_nulls_matches_python(spark):
    """Python replay of IGNORE NULLS navigation: per user, sort events
    by event_id, keep only values >= 50 (the $if mask) and read
    first / second / last off that filtered list — plain list scans,
    no window machinery."""
    ev = _tbl("events")
    per: dict = {}
    rows = []
    for eid, uid, val in zip(ev.event_id, ev.user_id, ev.value):
        rows.append((int(eid), int(uid), _norm(val)))
        per.setdefault(int(uid), []).append((int(eid), _norm(val)))
    want: dict = {}
    nav: dict = {}
    for uid, evs in per.items():
        evs.sort()
        keep = [v for _, v in evs if v is not None and v >= 50]
        nav[uid] = {
            "first_hi": keep[0] if keep else None,
            "second_hi": keep[1] if len(keep) >= 2 else None,
            "last_hi": keep[-1] if keep else None,
        }
    for eid, uid, val in rows:
        want[(eid,)] = dict(nav[uid], user_id=uid, value=val)
    got = run(spark, "compiler_window_nav_nulls")
    assert_keyed(got, want, ["event_id"],
                 ["user_id", "value", "first_hi", "second_hi",
                  "last_hi"])


def test_compiler_calendar_parts_matches_python(spark):
    """Python-datetime replay of the (quarter × isodow) seasonality
    grid: isocalendar() for the ISO fields, manual epoch-µs — no
    engine shares this code path."""
    import datetime as dt

    ev = _tbl("events")
    want: dict = {}
    epoch = dt.datetime(1970, 1, 1)
    for ts in ev.ts:
        py = ts.to_pydatetime()
        q = (py.month - 1) // 3 + 1
        dow = py.isocalendar()[2]
        k = (q, dow)
        us = round((py - epoch).total_seconds() * 1_000_000)
        in_hour = py.minute * 60 + py.second
        cur = want.setdefault(k, {"n": 0, "hr_min": 99, "hr_max": -1,
                                  "wk_max": -1, "doy_min": 999,
                                  "us_max": -1, "in_hour_s": 0})
        cur["n"] += 1
        cur["hr_min"] = min(cur["hr_min"], py.hour)
        cur["hr_max"] = max(cur["hr_max"], py.hour)
        cur["wk_max"] = max(cur["wk_max"], py.isocalendar()[1])
        cur["doy_min"] = min(cur["doy_min"], py.timetuple().tm_yday)
        cur["us_max"] = max(cur["us_max"], us)
        cur["in_hour_s"] += in_hour
    got = run(spark, "compiler_calendar_parts")
    assert_keyed(got, want, ["q", "dow"],
                 ["n", "hr_min", "hr_max", "wk_max", "doy_min",
                  "us_max", "in_hour_s"])


def test_compiler_math_scalar_matches_python(spark):
    """math-module replay of the numeric verb emission (row-keyed by
    the synthetic line identity via sorted multiset compare — the
    fixture's (orderkey, linenumber) is not unique)."""
    li = _tbl("lineitem")
    want = sorted(
        (int(ok), int(ln_), math.floor(ep), math.ceil(d * 10.0),
         (0 if abs(d - 0.05) < 1e-18 else (1 if d > 0.05 else -1)),
         round(math.sqrt(q), 12), round(q * q, 6), round(math.log(ep), 6))
        for ok, ln_, ep, d, q in zip(li.l_orderkey, li.l_linenumber,
                                     li.l_extendedprice, li.l_discount,
                                     li.l_quantity)
    )
    got_df = run(spark, "compiler_math_scalar")
    got = sorted(
        (int(r.l_orderkey), int(r.l_linenumber), int(r.price_fl),
         int(r.disc_decile), int(r.disc_side), round(float(r.qty_rt), 12),
         round(float(r.qty_sq), 6), round(float(r.price_ln), 6))
        for r in got_df.itertuples()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5], (g, w)
        for gv, wv in zip(g[5:], w[5:]):
            assert abs(gv - wv) <= 1e-6 * max(1.0, abs(wv)), (g, w)


def test_compiler_array_hof_matches_python(spark):
    """str.split replay of the token-pipeline key — no engine shares
    this code path. NULL text → every stat NULL (the probed NULL-array
    contract)."""
    docs = _tbl("documents")
    want: dict = {}
    for did, text in zip(docs.doc_id, docs.text):
        t = _norm(text)
        if t is None:
            want[(int(did),)] = {c: None for c in
                                 ("n_words", "n_long", "head_up",
                                  "has_the", "n_uniq")}
            continue
        words = t.split(" ")
        want[(int(did),)] = {
            "n_words": len(words),
            "n_long": sum(1 for w in words if len(w) > 5),
            "head_up": "|".join(w.upper() for w in words[:3]),
            "has_the": "the" in words,
            "n_uniq": len(set(words)),
        }
    got = run(spark, "compiler_array_hof")
    assert_keyed(got, want, ["doc_id"],
                 ["n_words", "n_long", "head_up", "has_the", "n_uniq"])


def test_compiler_array_vector_matches_python(spark):
    """float64 sequential-fold replay of the numeric array verbs
    (python sum() folds left-to-right like both engines; numpy's
    pairwise sum would NOT be the right ground truth at bit level,
    so plain Python floats carry the replay)."""
    emb = _tbl("embeddings")
    want: dict = {}
    for vid, lab, vec in zip(emb.vec_id, emb.label, emb.embedding):
        if vec is None:
            want[(int(vid),)] = {"label": int(lab), "vsum": None,
                                 "vmin": None, "vmax": None,
                                 "head8": None, "energy": None}
            continue
        xs = [float(x) for x in vec]
        acc = 0.0
        for x in xs:
            acc += x
        h = 0.0
        for x in xs[:8]:
            h += x
        e = 0.0
        for x in xs:
            e += x * x
        want[(int(vid),)] = {
            "label": int(lab), "vsum": acc,
            "vmin": min(xs), "vmax": max(xs), "head8": h, "energy": e,
        }
    got = run(spark, "compiler_array_vector")
    assert_keyed(got, want, ["vec_id"],
                 ["label", "vsum", "vmin", "vmax", "head8", "energy"])


def test_compiler_from_agg_of_agg_matches_python(spark):
    """pandas two-level replay with exact cents arithmetic (int64
    cents, so the ground truth is order-independent like the DECIMAL
    spelling): per-customer spend, then segment count/total/max/avg."""
    cust = _tbl("customer")[["c_custkey", "c_mktsegment"]]
    orders = _tbl("orders")[["o_custkey", "o_totalprice"]]
    orders = orders.assign(cents=cents(orders.o_totalprice))
    spend = (orders.groupby("o_custkey")["cents"].sum().rename("spend_c")
             .reset_index())
    j = spend.merge(cust, left_on="o_custkey", right_on="c_custkey")
    want: dict = {}
    for seg, g in j.groupby("c_mktsegment"):
        total = float(g.spend_c.sum()) / 100.0
        want[(seg,)] = {
            "n_cust": len(g),
            "total": total,
            "top": float(g.spend_c.max()) / 100.0,
            "avg_spend": total / len(g),
        }
    got = run(spark, "compiler_from_agg_of_agg")
    assert_keyed(got, want, ["c_mktsegment"],
                 ["n_cust", "total", "top", "avg_spend"])


def test_compiler_from_unpivot_filter_matches_python(spark):
    """pandas long-form replay: stack qty+price, filter > 30, count and
    exact-cents sum per measure."""
    li = _tbl("lineitem")[["l_quantity", "l_extendedprice"]]
    want: dict = {}
    for name, col in (("qty", li.l_quantity), ("price", li.l_extendedprice)):
        kept = col[col > 30.0]
        want[(name,)] = {
            "n_rows": int(kept.size),
            "total": float(cents(kept).sum()) / 100.0,
        }
    got = run(spark, "compiler_from_unpivot_filter")
    assert_keyed(got, want, ["measure"], ["n_rows", "total"])


def test_compiler_string_search_pad_matches_python(spark):
    """Pure-Python string replay of every search/pad/shape verb."""
    docs = _tbl("documents")
    cols = ["padded", "rpadded", "tail_rev", "lll", "has_data",
            "the_start", "dot_end", "first_a"]
    want: dict = {}
    for did, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        t, lg = _norm(text), _norm(lang)
        row = dict.fromkeys(cols, None)
        if lg is not None:
            row["padded"] = lg[:2].rjust(5, "*")[:5]
            row["rpadded"] = lg.ljust(4, "-")[:4]
            row["lll"] = lg[:1] * 3
        if t is not None:
            row["tail_rev"] = (t[-12:] if len(t) >= 12 else t)[::-1]
            row["has_data"] = "data" in t
            row["the_start"] = t.startswith("The")
            row["dot_end"] = t.endswith(".")
            row["first_a"] = t.find("a") + 1
        want[(int(did),)] = row
    got = run(spark, "compiler_string_search_pad")
    assert_keyed(got, want, ["doc_id"], cols)


def test_compiler_bool_distinct_agg_matches_python(spark):
    """Set-arithmetic replay of the boolean/distinct aggregates."""
    li = _tbl("lineitem")
    want: dict = {}
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        qty = g.l_quantity
        distinct = sorted({int(q) for q in qty})
        want[(rf, ls)] = {
            "all_heavy": bool((qty > 25.0).all()),
            "any_vheavy": bool((qty > 45.0).any()),
            "n_heavy": int((qty > 25.0).sum()),
            "qty_dsum": sum(distinct),
            "qty_davg": sum(distinct) / len(distinct),
        }
    got = run(spark, "compiler_bool_distinct_agg")
    assert_keyed(got, want, ["l_returnflag", "l_linestatus"],
                 ["all_heavy", "any_vheavy", "n_heavy", "qty_dsum",
                  "qty_davg"])


def test_compiler_in_query_membership_matches_python(spark):
    """Set-algebra replay: custkeys with a >200k order, minus custkeys
    with a pending ('P') order — pure Python sets, no SQL shared with
    either engine."""
    cust = _tbl("customer")
    orders = _tbl("orders")
    hi = set(orders.loc[orders.o_totalprice > 200000.0, "o_custkey"])
    pending = set(orders.loc[orders.o_orderstatus == "P", "o_custkey"])
    keep = hi - pending
    want = {
        (int(ck),): {"c_name": nm, "c_mktsegment": seg}
        for ck, nm, seg in zip(cust.c_custkey, cust.c_name,
                               cust.c_mktsegment)
        if int(ck) in keep
    }
    got = run(spark, "compiler_in_query_membership")
    assert_keyed(got, want, ["c_custkey"], ["c_name", "c_mktsegment"])


def test_compiler_set_bag_ops_matches_python(spark):
    """Counter-arithmetic replay of the nested bag ops: multiset
    subtract of (F custkeys) minus (min-count of high-value and urgent
    custkeys)."""
    from collections import Counter

    orders = _tbl("orders")
    a = Counter(orders.loc[orders.o_orderstatus == "F", "o_custkey"])
    b1 = Counter(orders.loc[orders.o_totalprice > 100000.0, "o_custkey"])
    b2 = Counter(orders.loc[orders.o_orderpriority == "1-URGENT",
                            "o_custkey"])
    inter = Counter({k: min(b1[k], b2[k]) for k in b1 if k in b2})
    want = a - inter  # Counter subtraction floors at 0 = EXCEPT ALL
    got = Counter(run(spark, "compiler_set_bag_ops").k)
    assert Counter({int(k): v for k, v in got.items()}) == \
        Counter({int(k): v for k, v in want.items()})


def test_compiler_order_nulls_matches_python(spark):
    """Sorted-window replay: smallest 100 non-NULL measures win the
    limit window (NULLS LAST), tiebreak on the unique key."""
    orders = _tbl("orders")
    pool = sorted(
        (float(tp), int(ok))
        for tp, ok, st in zip(orders.o_totalprice, orders.o_orderkey,
                              orders.o_orderstatus)
        if st != "P"
    )[:100]
    got = run(spark, "compiler_order_nulls")
    assert sorted((float(v), int(k)) for v, k in zip(got.v, got.k)) == pool


def test_compiler_join_frames_matches_python(spark):
    """pandas two-frame replay: per-segment order counts (via the
    customer dim) joined with per-segment customer counts."""
    cust = _tbl("customer")
    orders = _tbl("orders")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    n_orders = j.groupby("c_mktsegment").size()
    n_cust = cust.groupby("c_mktsegment").size()
    want = {
        (seg,): {"n_orders": int(n_orders[seg]),
                 "n_cust": int(n_cust[seg]),
                 "orders_per_cust": int(n_orders[seg]) / int(n_cust[seg])}
        for seg in n_orders.index
    }
    got = run(spark, "compiler_join_frames")
    assert_keyed(got, want, ["c_mktsegment"],
                 ["n_orders", "n_cust", "orders_per_cust"])


def test_compiler_join_frames_full_matches_python(spark):
    """dict full-outer replay with key coalescing."""
    orders = _tbl("orders")
    np_ = orders[orders.o_orderstatus == "P"].groupby("o_custkey").size()
    nf = orders[orders.o_orderstatus == "F"].groupby("o_custkey").size()
    keys = set(np_.index) | set(nf.index)
    want = {
        (int(k),): {"np": int(np_[k]) if k in np_.index else None,
                    "nf": int(nf[k]) if k in nf.index else None}
        for k in keys
    }
    got = run(spark, "compiler_join_frames_full")
    assert_keyed(got, want, ["k"], ["np", "nf"])


def test_compiler_ilike_filter_matches_python(spark):
    """str.lower substring replay of the case-insensitive pattern."""
    docs = _tbl("documents")
    want: dict = {}
    for lang, text in zip(docs.lang, docs.text):
        t = _norm(text)
        if t is not None and "the " in t.lower():
            k = (_norm(lang),)
            want.setdefault(k, {"n": 0})
            want[k]["n"] += 1
    got = run(spark, "compiler_ilike_filter")
    assert_keyed(got, want, ["lang"], ["n"])


def test_compiler_exists_query_corr_matches_python(spark):
    """Set-of-pairs replay: the (custkey, priority) pairs of fulfilled
    orders, membership-tested against open orders."""
    orders = _tbl("orders")
    f_pairs = {
        (int(c), p)
        for c, p, s in zip(orders.o_custkey, orders.o_orderpriority,
                           orders.o_orderstatus) if s == "F"
    }
    want = {
        (int(ok),): {"o_custkey": int(c), "o_orderpriority": p}
        for ok, c, p, s in zip(orders.o_orderkey, orders.o_custkey,
                               orders.o_orderpriority,
                               orders.o_orderstatus)
        if s == "O" and (int(c), p) in f_pairs
    }
    got = run(spark, "compiler_exists_query_corr")
    assert_keyed(got, want, ["o_orderkey"],
                 ["o_custkey", "o_orderpriority"])
