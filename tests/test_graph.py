"""Distributed PageRank (stages/graph.py): dense numpy reference parity,
partitioning invariance, duplicate-edge dedup, sink-node teleport mass."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _numpy_pagerank(edges, iters=5, damping=0.85):
    """Dense reference for the same simplified recurrence (no dangling
    redistribution)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in set(edges):
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for u, v in set(edges):
            nxt[idx[v]] += damping * r[idx[u]] / deg[idx[u]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def _run(edges, parts, distributed=False, **kw):
    import ray.data as rd

    from pprl_ray.stages.graph import pagerank

    t = pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64()),
    })
    out = pagerank(rd.from_arrow(t).repartition(parts), partitions=4,
                   local_max_edges=0 if distributed else 2_000_000, **kw)
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    return dict(zip(df["id"], df["r"]))


def test_pagerank_matches_dense_reference(ray_session):
    rng = np.random.default_rng(3)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 40, (300, 2))
             if u != v]
    edges += edges[:25]  # duplicate edges must collapse before degree calc
    want = _numpy_pagerank(edges)
    for distributed in (False, True):  # both hybrid paths, same recurrence
        got = _run(edges, parts=5, distributed=distributed)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], rel=1e-9)
        # probability mass <= 1 (sinks leak, never gain)
        assert sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_partitioning_invariant(ray_session):
    rng = np.random.default_rng(9)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 25, (120, 2))
             if u != v]
    a = _run(edges, parts=1, distributed=True)
    b = _run(edges, parts=7, distributed=True)
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12)


def test_pagerank_sink_keeps_teleport(ray_session):
    # 0 -> 1 -> 2 (sink): the sink's outgoing mass leaks by design, but
    # every node keeps at least the teleport term
    got = _run([(0, 1), (1, 2)], parts=1, iters=10)
    n = 3
    t = 0.15 / n
    assert got[2] > got[1] > got[0] >= t - 1e-12
    want = _numpy_pagerank([(0, 1), (1, 2)], iters=10)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9)


# --- triangle counting ------------------------------------------------------


def _tri_run(edges, node_type=np.int64, local=True, parts=None):
    import ray.data as rd

    from pprl_ray.stages.graph import triangle_counts

    df = pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    if node_type is str:
        df = df.astype({"src": str, "dst": str})
    ds = rd.from_pandas(df).repartition(4)
    out = triangle_counts(
        ds, local_max_edges=(10**9 if local else 0), partitions=parts
    ).to_pandas()
    return dict(zip(out["node"], out["triangles"].astype(int)))


def _tri_reference(edges):
    """Brute-force per-node triangle counts via adjacency sets."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    for x in (u, v, w):
                        counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangles_k4_plus_pendant(ray_session):
    # K4 has 4 triangles; each K4 node sits in 3; the pendant node in 0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _tri_run(k4 + [(3, 9)])
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(got.values()) // 3 == 4


def test_triangles_random_graph_local_vs_distributed_vs_reference(ray_session):
    rng = np.random.default_rng(17)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 40, (300, 2))]
    ref = _tri_reference(edges)
    # duplicates, reversed duplicates and self-loops must be tolerated
    noisy = edges + [(v, u) for u, v in edges[:50]] + [(7, 7)]
    assert _tri_run(noisy, local=True) == ref
    assert _tri_run(noisy, local=False, parts=5) == ref


def test_triangles_string_nodes_both_paths(ray_session):
    edges = [("ab", "cd"), ("cd", "ef"), ("ef", "ab"), ("ab", "zz")]
    want = {"ab": 1, "cd": 1, "ef": 1}
    assert _tri_run(edges, node_type=str, local=True) == want
    assert _tri_run(edges, node_type=str, local=False, parts=3) == want


# --- k-core -----------------------------------------------------------------


def _kcore_run(edges, k, rounds=4, local=True, parts=None):
    import ray.data as rd

    from pprl_ray.stages.graph import k_core

    df = pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    ds = rd.from_pandas(df).repartition(3)
    out = k_core(
        ds, k=k, rounds=rounds,
        local_max_edges=(10**9 if local else 0), partitions=parts,
    ).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["deg"].astype(int)))


def _kcore_reference(edges, k, rounds):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in es if u in keep and v in keep}
        if nxt == es:
            break
        es = nxt
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_clique_with_pendants(ray_session):
    # K5 survives a 4-core forever; pendants peel off in round 1
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = _kcore_run(k5 + [(0, 10), (10, 11)], k=4)
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_random_graph_local_vs_distributed_vs_reference(ray_session):
    rng = np.random.default_rng(31)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 30, (200, 2))]
    for k in (3, 6):
        ref = _kcore_reference(edges, k, rounds=4)
        assert _kcore_run(edges, k=k, local=True) == ref
        assert _kcore_run(edges, k=k, local=False, parts=4) == ref


def test_kcore_chain_needs_multiple_rounds(ray_session):
    # a path graph peels one layer per round: after r rounds of 2-core
    # peeling a 6-path loses both endpoints each round until empty
    path = [(i, i + 1) for i in range(6)]
    ref1 = _kcore_reference(path, 2, rounds=1)
    got1 = _kcore_run(path, k=2, rounds=1)
    assert got1 == ref1 and len(got1) > 0
    assert _kcore_run(path, k=2, rounds=4) == {}


# --- assortativity ----------------------------------------------------------


def test_assortativity_matches_pearson_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.graph import degree_assortativity

    rng = np.random.default_rng(41)
    edges = {tuple(sorted((int(u), int(v))))
             for u, v in rng.integers(0, 30, (150, 2)) if u != v}
    edges = sorted(edges)
    df = pd.DataFrame({"src": [u for u, _ in edges], "dst": [v for _, v in edges]})

    def run(local):
        ds = rd.from_pandas(df).repartition(4)
        out = degree_assortativity(
            ds, local_max_edges=(10**9 if local else 0), partitions=4
        ).to_pandas()
        assert len(out) == 1
        return out.iloc[0]

    # independent reference: Pearson correlation over the SYMMETRIZED
    # endpoint-degree pairs (Newman 2002 definition)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    ys = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    want = np.corrcoef(xs, ys)[0, 1]

    a, b = run(True), run(False)
    assert a["m_edges"] == b["m_edges"] == len(edges)
    for col in ("s1", "s2", "s3", "assortativity"):
        assert a[col] == b[col]
    assert a["assortativity"] == pytest.approx(want, rel=1e-9)
