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


def close(a, b, tol=1e-6) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return a is b or (isinstance(b, float) and math.isnan(b))
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


def _edges() -> set:
    """Directed user→user edges from the documented definition: same
    props.k, 0 < Δt ≤ 1h, src ≠ dst, distinct."""
    ev = _tbl("events")
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
