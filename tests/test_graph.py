"""Iterative-graph validation the SQL oracle can't cover (SURVEY §5.2-3):
PageRank against a NumPy power-iteration reference on the same edges, and
invariants (probability mass, BFS/CC consistency)."""

from __future__ import annotations

import numpy as np
import pytest

from naqed_spark.queries.graph import user_edges
from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SF_DIR = "/root/testdata/sf0.001"

load_all()


@pytest.fixture(scope="module")
def spark():
    return tune_session(get_spark("naqed-graph-tests"))


def test_pagerank_matches_numpy(spark):
    edges = [(r.src, r.dst) for r in user_edges(spark, SF_DIR).collect()]
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(10):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += pr[idx[s]] / outdeg[idx[s]]
        dangling = pr[outdeg == 0].sum()
        pr = 0.15 / n + 0.85 * (inflow + dangling / n)

    got = {
        r.v: r.pagerank
        for r in QUERIES["graph_pagerank_fixed"](spark, SF_DIR).collect()
    }
    assert set(got) == set(verts)
    assert abs(sum(got.values()) - 1.0) < 1e-3  # probability mass conserved
    for v in verts:
        assert abs(got[v] - pr[idx[v]]) < 1e-5, (v, got[v], pr[idx[v]])


def test_bfs_dist_zero_is_source(spark):
    rows = QUERIES["graph_reachability_bfs"](spark, SF_DIR).collect()
    dists = {r.user_id: r.dist for r in rows}
    assert dists.get(0) == 0
    assert all(d >= 0 for d in dists.values())


def test_connected_components_labels_are_members(spark):
    rows = QUERIES["graph_connected_components"](spark, SF_DIR).collect()
    comp = {r.user_id: r.component for r in rows}
    # a component label is the min vertex id of the component → must itself
    # be a vertex carrying its own label
    for label in set(comp.values()):
        assert comp[label] == label


def test_scc_adversarial_graphs(spark):
    """The SCC coloring loop on hand-built graphs: a chain of two cycles
    joined by a one-way bridge (two SCCs, forcing a second outer round),
    a pure DAG (every vertex its own SCC), and a full cycle (one SCC)."""
    from naqed_spark.queries.graph import scc_labels

    def run(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["v"]: r["scc"] for r in scc_labels(spark, df).collect()
        }

    # cycle {0,1,2} -> bridge -> cycle {10,11}
    two = run([(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 10)])
    assert two == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}

    # DAG: all singleton SCCs
    dag = run([(1, 2), (2, 3), (1, 3), (3, 4)])
    assert dag == {1: 1, 2: 2, 3: 3, 4: 4}

    # one big cycle
    cyc = run([(5, 6), (6, 7), (7, 8), (8, 5)])
    assert cyc == {5: 5, 6: 5, 7: 5, 8: 5}
