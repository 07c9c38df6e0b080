"""Graph analytics + sketch/index operators: semantics checks beyond the
driver's oracle compare (guarantee properties, partitioning invariance,
edge cases)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from climatemind_ontology_processing_ray.functions.graph_algo import (
    degree_stats,
    distinct_edges,
    pagerank_fixed,
)
from climatemind_ontology_processing_ray.functions.sketch import (
    _mg_sketch,
    exact_quantiles,
    heavy_hitters,
)
from climatemind_ontology_processing_ray.functions.text import inverted_index


def _edges_ds(pairs, nparts=1):
    df = pd.DataFrame(pairs, columns=["subject", "object"])
    ds = rd.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


class TestGraphAlgo:
    PAIRS = [
        ("a", "b"),
        ("a", "b"),  # duplicate edge collapses
        ("b", "c"),
        ("c", "a"),
        ("d", "a"),  # d is dangling-in only via out-edge; no in-edges to d
    ]

    def test_distinct_edges(self, ray_session):
        out = distinct_edges(_edges_ds(self.PAIRS, 3)).to_pandas()
        assert len(out) == 4
        assert set(zip(out.subject, out.object)) == {
            ("a", "b"),
            ("b", "c"),
            ("c", "a"),
            ("d", "a"),
        }

    def test_degree_stats(self, ray_session):
        out = (
            degree_stats(_edges_ds(self.PAIRS, 2))
            .to_pandas()
            .set_index("node")
            .sort_index()
        )
        assert out.loc["a", "out_degree"] == 1
        assert out.loc["a", "in_degree"] == 2
        assert out.loc["d", "out_degree"] == 1
        assert out.loc["d", "in_degree"] == 0

    def test_pagerank_partitioning_invariant_and_exact(self, ray_session):
        """Integer fixed-point: result is bit-identical across block
        layouts and matches a plain-python reference evaluation."""
        r1 = pagerank_fixed(_edges_ds(self.PAIRS, 1), iters=3)
        r5 = pagerank_fixed(_edges_ds(self.PAIRS, 5), iters=3)
        pd.testing.assert_frame_equal(r1, r5)

        # plain-python reference of the same integer rule
        edges = {("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")}
        nodes = sorted({x for e in edges for x in e})
        out_deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
        n = len(nodes)
        scale = 10**9
        rank = {v: scale // n for v in nodes}
        base = (scale // n) * 15 // 100
        for _ in range(3):
            sum_in = {v: 0 for v in nodes}
            for s, d in edges:
                sum_in[d] += rank[s] // out_deg[s]
            dang = sum(r for v, r in rank.items() if not out_deg[v])
            rank = {
                v: base + 85 * (sum_in[v] + dang // n) // 100 for v in nodes
            }
        got = dict(zip(r1.node, r1.rank_scaled))
        assert got == rank
        # sanity: 'a' (two in-edges) outranks 'd' (no in-edges)
        assert got["a"] > got["d"]

    def test_pagerank_empty(self, ray_session):
        out = pagerank_fixed(_edges_ds([("x", "y")]).filter(lambda r: False))
        assert len(out) == 0


class TestHeavyHitters:
    def test_mg_guarantee(self):
        # adversarial stream: heavy item interleaved with k distinct fillers
        stream = []
        for i in range(300):
            stream.append("hot")
            stream.append(f"cold{i % 40}")
        sketch = _mg_sketch(stream, k=5)
        assert "hot" in sketch  # freq 1/2 > n/(k+1)

    def test_exact_vs_bruteforce(self, ray_session):
        rng = np.random.default_rng(7)
        toks = rng.choice(
            ["x"] * 5 + ["y"] * 3 + list("abcdefghijklmnop"), size=2000
        )
        docs = [
            " ".join(toks[i : i + 20]) for i in range(0, 2000, 20)
        ]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(7)
        k = 10
        out = heavy_hitters(ds, k=k)
        # brute force ground truth
        from collections import Counter

        c = Counter(t for d in docs for t in d.split(" ") if t)
        n = sum(c.values())
        want = sorted(t for t, v in c.items() if v * (k + 1) > n)
        assert list(out.token) == want
        assert all(
            int(out.loc[out.token == t, "n"].iloc[0]) == c[t] for t in want
        )


class TestQuantiles:
    def test_matches_sorted_rank(self, ray_session):
        vals = list(range(1, 101))  # 1..100
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
        out = exact_quantiles(ds, "v", [0.0, 0.5, 0.9, 1.0])
        got = dict(zip(out.q, out.value))
        # ceil(q*n) rank, 1-indexed (DuckDB quantile_disc)
        assert got[0.0] == 1
        assert got[0.5] == 50
        assert got[0.9] == 90
        assert got[1.0] == 100

    def test_duplicate_values(self, ray_session):
        ds = rd.from_pandas(pd.DataFrame({"v": [1, 1, 1, 2, 3]}))
        out = exact_quantiles(ds, "v", [0.5])
        assert out.value.iloc[0] == 1


class TestInvertedIndex:
    def test_postings(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": [3, 1, 2],
                "text": ["apple banana apple", "banana", "apple cherry"],
            }
        )
        out = (
            inverted_index(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .set_index("token")
        )
        assert out.loc["apple", "postings"] == "2,3"
        assert out.loc["apple", "df"] == 2
        assert out.loc["banana", "postings"] == "1,3"
        assert out.loc["cherry", "postings"] == "2"


class TestMembershipJoins:
    def test_semi_and_anti_partition(self, ray_session):
        from climatemind_ontology_processing_ray.functions.join import (
            bucketed_anti_join,
            bucketed_semi_join,
        )

        left = rd.from_pandas(
            pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
        ).repartition(3)
        right = rd.from_pandas(pd.DataFrame({"k": [2, 4, 4, 9]})).repartition(2)
        semi = bucketed_semi_join(left, right, "k").to_pandas()
        anti = bucketed_anti_join(left, right, "k").to_pandas()
        assert sorted(semi.k) == [2, 4]
        assert sorted(anti.k) == [1, 3, 5]
        # semi + anti partition left exactly; non-key columns survive
        assert sorted(list(semi.v) + list(anti.v)) == list("abcde")

    def test_anti_join_empty_result(self, ray_session):
        from climatemind_ontology_processing_ray.functions.join import (
            bucketed_anti_join,
        )

        left = rd.from_pandas(pd.DataFrame({"k": [1, 2]}))
        right = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
        out = bucketed_anti_join(left, right, "k").to_pandas()
        assert len(out) == 0


class TestTfIdf:
    def test_matches_bruteforce(self, ray_session):
        from climatemind_ontology_processing_ray.functions.search import (
            IDF_SCALE,
            tfidf_topk,
        )

        docs = [
            "apple banana apple",
            "banana cherry",
            "apple apple apple",
            "durian durian",
            "cherry apple banana",
        ]
        df = pd.DataFrame({"doc_id": range(5), "text": docs})
        out = tfidf_topk(rd.from_pandas(df).repartition(4), ["apple", "cherry"], k=3)

        n = 5
        dfs = {"apple": 3, "cherry": 2}
        idf = {t: (n * IDF_SCALE) // d for t, d in dfs.items()}
        scores = {
            i: sum(d.split().count(t) * idf[t] for t in idf)
            for i, d in enumerate(docs)
        }
        want = sorted(
            ((i, s) for i, s in scores.items() if s > 0),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert list(zip(out.doc_id, out.score)) == want


class TestBloom:
    def test_no_false_negatives(self):
        from climatemind_ontology_processing_ray.functions.bloom import (
            _hash_pair,
            _set_bits,
            bloom_contains,
        )
        import numpy as np

        n_bits = 1 << 12
        keys = [f"k{i}" for i in range(200)]
        bits = np.zeros(n_bits // 8, np.uint8)
        h1, h2 = _hash_pair(keys)
        for i in range(7):
            _set_bits(bits, ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64))
        assert bloom_contains(bits, keys, n_bits).all()

    def test_incremental_exact_even_with_tiny_filter(self, ray_session):
        """A deliberately undersized filter (massive fp rate) must NOT
        change the result — the verify join absorbs false positives."""
        from climatemind_ontology_processing_ray.functions.bloom import (
            incremental_new,
        )

        seen = rd.from_pandas(pd.DataFrame({"k": [f"s{i}" for i in range(50)]}))
        incoming = rd.from_pandas(
            pd.DataFrame(
                {"k": [f"s{i}" for i in range(30)] + [f"n{i}" for i in range(40)],
                 "payload": list(range(70))}
            )
        ).repartition(4)
        out = incremental_new(incoming, seen, "k", n_bits=64, k=3).to_pandas()
        assert sorted(out.k) == sorted(f"n{i}" for i in range(40))
        # non-key columns survive the split/union
        assert set(out.columns) == {"k", "payload"}

    def test_merge_is_or(self, ray_session):
        from climatemind_ontology_processing_ray.functions.bloom import (
            bloom_contains,
            build_bloom,
        )

        a = rd.from_pandas(pd.DataFrame({"k": ["x", "y"]}))
        b = rd.from_pandas(pd.DataFrame({"k": ["z"]}))
        bits = build_bloom(a.union(b).repartition(3), "k", n_bits=1 << 12)
        assert bloom_contains(bits, ["x", "y", "z"], 1 << 12).all()


class TestShardedInvertedIndex:
    def test_shards_reconstruct_global(self, ray_session):
        rng = np.random.default_rng(3)
        # 'hot' appears in every doc (the stop-token skew case)
        docs = [
            "hot " + " ".join(rng.choice(list("abcdef"), size=5))
            for _ in range(60)
        ]
        df = pd.DataFrame({"doc_id": range(60), "text": docs})
        ds = rd.from_pandas(df).repartition(5)
        flat = inverted_index(ds).to_pandas().set_index("token")
        sharded = inverted_index(ds, shard_range=16).to_pandas()

        hot = sharded[sharded.token == "hot"].sort_values("shard")
        assert len(hot) == 4  # 60 ids / range 16 -> shards 0..3
        # concatenating shards in shard order reproduces the flat list
        joined = ",".join(hot.postings)
        assert joined == flat.loc["hot", "postings"]
        assert int(hot.df.sum()) == int(flat.loc["hot", "df"])


class TestSsspHops:
    def _ring_edges(self, n=12):
        # weighted ring + one chord: costs differ from hop counts, so a
        # wrong (BFS-like) implementation fails
        rows = []
        for i in range(n):
            rows.append((i, (i + 1) % n, (i % 3) + 1))
        rows.append((0, 3, 10))  # heavy chord: 3 hops around is cheaper
        return pd.DataFrame(rows, columns=["subject", "object", "w"])

    def _brute(self, edf, sources, k):
        # exact <=k-edge min cost by full Bellman-Ford rounds
        import collections

        adj = collections.defaultdict(list)
        for s, o, w in edf.itertuples(index=False):
            adj[str(s)].append((str(o), w))
            adj[str(o)].append((str(s), w))
        cost = {str(s): 0 for s in sources}
        for _ in range(k):
            nxt = dict(cost)
            for u, c in cost.items():
                for v, w in adj[u]:
                    if v not in nxt or c + w < nxt[v]:
                        nxt[v] = c + w
            cost = nxt
        return cost

    @pytest.mark.parametrize("threshold", [250_000, 0])
    def test_matches_bruteforce_both_paths(self, ray_session, threshold):
        from climatemind_ontology_processing_ray.functions.graph_algo import sssp_hops

        edf = self._ring_edges()
        edges = rd.from_pandas(edf).repartition(3)
        sources = rd.from_pandas(pd.DataFrame({"node": [0]}))
        out = (
            sssp_hops(edges, sources, 3, driver_threshold=threshold)
            .to_pandas()
            .sort_values("node")
        )
        want = self._brute(edf, [0], 3)
        got = dict(zip(out["node"], out["cost"].astype(int)))
        assert got == want
        # the heavy chord must NOT be the cost to node 3: 1+2+3=6 < 10
        assert got["3"] == 6

    def test_parallel_edges_collapse_to_min(self, ray_session):
        from climatemind_ontology_processing_ray.functions.graph_algo import sssp_hops

        edf = pd.DataFrame(
            {"subject": [1, 2, 1, 1], "object": [2, 1, 2, 1], "w": [5, 2, 9, 7]}
        )  # parallel edges both directions -> min w=2; self-loop drops
        out = (
            sssp_hops(
                rd.from_pandas(edf),
                rd.from_pandas(pd.DataFrame({"node": [1]})),
                2,
            )
            .to_pandas()
            .sort_values("node")
        )
        assert dict(zip(out["node"], out["cost"])) == {"1": 0, "2": 2}


class TestHitsFixed:
    def test_bipartite_hubs_vs_authorities(self, ray_session):
        from climatemind_ontology_processing_ray.functions.graph_algo import hits_fixed

        # h1, h2 are pure hubs pointing at a1..a3 (a1 gets both hubs)
        edges = pd.DataFrame(
            {
                "subject": ["h1", "h1", "h2", "h2"],
                "object": ["a1", "a2", "a1", "a3"],
            }
        )
        out = hits_fixed(rd.from_pandas(edges).repartition(3), iters=2)
        s = out.set_index("node")
        # a1 (in-degree 2) is the max authority -> exactly scale
        assert s.loc["a1", "auth_scaled"] == 10**9
        assert s.loc["a2", "auth_scaled"] == s.loc["a3", "auth_scaled"]
        assert 0 < s.loc["a2", "auth_scaled"] < 10**9
        # hubs have zero authority; authorities have zero hub score
        assert s.loc["h1", "auth_scaled"] == 0
        assert s.loc["a1", "hub_scaled"] == 0
        # h1 and h2 are symmetric -> equal max hub score
        assert s.loc["h1", "hub_scaled"] == s.loc["h2", "hub_scaled"] == 10**9

        # parallelism invariance (bit-exact integer contract)
        out2 = hits_fixed(rd.from_pandas(edges).repartition(1), iters=2)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), out2.reset_index(drop=True)
        )


class TestRandomWalks:
    def test_deterministic_and_correct(self, ray_session):
        from climatemind_ontology_processing_ray.functions.graph_algo import (
            _walk_hash,
            random_walks,
        )

        # path graph 1-2-3-4 plus isolated seed 9
        edges = pd.DataFrame(
            {"subject": [1, 2, 3], "object": [2, 3, 4]}
        )
        sources = rd.from_pandas(pd.DataFrame({"node": [1, 9]}))
        out = (
            random_walks(rd.from_pandas(edges).repartition(2), sources, 3)
            .to_pandas()
            .sort_values(["start", "step"])
            .reset_index(drop=True)
        )
        # isolated seed: exactly the step-0 row
        w9 = out[out.start == 9]
        assert w9[["step", "node"]].values.tolist() == [[0, 9]]
        # seed 1: replay the hash draw by hand
        w1 = out[out.start == 1].set_index("step")["node"].to_dict()
        adj = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3]}
        cur, want = 1, {0: 1}
        for t in (1, 2, 3):
            nbrs = adj[cur]
            cur = nbrs[int(_walk_hash(np.array([cur]), t)[0]) % len(nbrs)]
            want[t] = cur
        assert w1 == want

        # parallelism invariance
        out2 = (
            random_walks(rd.from_pandas(edges).repartition(7), sources, 3)
            .to_pandas()
            .sort_values(["start", "step"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)


class TestClusteringCoeff:
    # K4 minus one edge: nodes a,b,c,d; edges ab ac ad bc bd (no cd)
    PAIRS = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]

    WANT = {
        # triangles: abc, abd
        "a": (2, 3),  # deg 3 -> 3 wedges
        "b": (2, 3),
        "c": (1, 1),  # deg 2 -> 1 wedge
        "d": (1, 1),
    }

    @pytest.mark.parametrize("threshold", [1_000_000, 0])
    def test_exact_counts_both_paths(self, ray_session, threshold):
        from climatemind_ontology_processing_ray.functions.graph_algo import (
            clustering_coeff,
        )

        out = (
            clustering_coeff(
                _edges_ds(self.PAIRS, 3), broadcast_threshold=threshold
            )
            .to_pandas()
            .set_index("node")
        )
        got = {
            n: (int(r.n_tri), int(r.n_wedges)) for n, r in out.iterrows()
        }
        assert got == self.WANT


class TestSCC:
    """Strongly connected components: Tarjan driver path vs a
    mutual-reachability brute force, and the distributed FW-BW-Trim
    path (forced via driver_threshold=0) vs Tarjan."""

    @staticmethod
    def _brute_scc(pairs):
        """scc_id = min (string order) over the mutual-reachability set."""
        nodes = sorted({str(x) for p in pairs for x in p})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        reach = [[False] * n for _ in range(n)]
        for i in range(n):
            reach[i][i] = True
        for u, v in pairs:
            reach[idx[str(u)]][idx[str(v)]] = True
        for k in range(n):
            rk = reach[k]
            for i in range(n):
                if reach[i][k]:
                    ri = reach[i]
                    for j in range(n):
                        if rk[j]:
                            ri[j] = True
        out = {}
        for i, u in enumerate(nodes):
            comp = [nodes[j] for j in range(n) if reach[i][j] and reach[j][i]]
            out[u] = min(comp)
        return out

    def test_tarjan_matches_bruteforce_random(self, ray_session):
        from climatemind_ontology_processing_ray.functions.graph_algo import scc

        rng = np.random.default_rng(17)
        for trial in range(5):
            n, m = 40, 70
            pairs = [
                (f"n{a:02d}", f"n{b:02d}")
                for a, b in zip(
                    rng.integers(0, n, m), rng.integers(0, n, m)
                )
            ]
            got = scc(_edges_ds(pairs, 3)).to_pandas()
            got_map = dict(zip(got["node"], got["scc_id"]))
            assert got_map == self._brute_scc(pairs), f"trial {trial}"

    def test_distributed_path_matches_tarjan(self, ray_session):
        """Force the FW-BW-Trim path on a graph with every interesting
        shape: a ring SCC, two bridged half-rings (DAG edge between
        SCCs that must NOT merge), a pure path (trim-only), a 2-cycle
        hanging off it, and a self-loop singleton."""
        from climatemind_ontology_processing_ray.functions.graph_algo import (
            _tarjan_scc,
            scc,
        )

        pairs = [
            # ring a0->a1->a2->a0
            ("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
            # two half-rings bridged: b0<->b1 -> b2<->b3
            ("b0", "b1"), ("b1", "b0"), ("b1", "b2"),
            ("b2", "b3"), ("b3", "b2"),
            # path c0->c1->c2 (all singletons, trims away)
            ("c0", "c1"), ("c1", "c2"),
            # 2-cycle off the path: c2->d0, d0<->d1
            ("c2", "d0"), ("d0", "d1"), ("d1", "d0"),
            # self loop
            ("e0", "e0"),
        ]
        exp = _tarjan_scc(pd.DataFrame(pairs, columns=["u", "v"]).astype(str))
        exp_map = dict(zip(exp["node"], exp["scc_id"]))
        got = scc(_edges_ds(pairs, 3), driver_threshold=0).to_pandas()
        got_map = dict(zip(got["node"], got["scc_id"]))
        assert got_map == exp_map
        # sanity on the expectation itself
        assert exp_map["a1"] == "a0" and exp_map["b3"] == "b2"
        assert exp_map["b0"] == "b0" and exp_map["c1"] == "c1"
        assert exp_map["d1"] == "d0" and exp_map["e0"] == "e0"


def test_pagerank_personalized_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.graph_algo import (
        pagerank_fixed,
    )

    rng = np.random.RandomState(41)
    u = rng.randint(0, 30, size=80)
    v = rng.randint(0, 30, size=80)
    keep = u != v
    edges = pd.DataFrame(
        {"subject": u[keep].astype(str), "object": v[keep].astype(str)}
    )
    seeds = ["1", "5", "9"]
    out = pagerank_fixed(
        rd.from_pandas(edges).repartition(4),
        iters=3,
        scale=10**9,
        seed_nodes=seeds,
    )
    got = dict(zip(out["node"], out["rank_scaled"]))

    # brute replication of the integer update rule
    ded = edges.drop_duplicates()
    nodes = sorted(set(ded["subject"]) | set(ded["object"]))
    outd = ded.groupby("subject").size().to_dict()
    restart = set(seeds) & set(nodes)
    k = len(restart)
    scale = 10**9
    rank = {n: scale // k if n in restart else 0 for n in nodes}
    base = {
        n: (scale // k) * 15 // 100 if n in restart else 0 for n in nodes
    }
    for _ in range(3):
        inc = {}
        for s, d in zip(ded["subject"], ded["object"]):
            if outd.get(s, 0):
                inc[d] = inc.get(d, 0) + rank[s] // outd[s]
        dang = sum(r for n, r in rank.items() if not outd.get(n, 0))
        rank = {
            n: base[n]
            + 85 * (inc.get(n, 0) + (dang // k if n in restart else 0)) // 100
            for n in nodes
        }
    assert got == rank


def test_earliest_arrival_driver_vs_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.graph_algo import (
        earliest_arrival_per_source,
    )

    rng = np.random.RandomState(43)
    m = 200
    e = pd.DataFrame(
        {
            "node": rng.randint(0, 40, size=m).astype(str),
            "nbr": rng.randint(0, 40, size=m).astype(str),
            "ts": rng.randint(0, 1000, size=m).astype(np.int64),
        }
    )
    e = e[e["node"] != e["nbr"]]
    seeds = pd.DataFrame(
        {"node": [str(i) for i in range(0, 40, 9)], "t0": np.int64(100)}
    )
    e_ds = rd.from_pandas(e).repartition(5)
    s_ds = rd.from_pandas(seeds)

    def run(threshold):
        out = (
            earliest_arrival_per_source(
                e_ds, s_ds, 3, driver_threshold=threshold
            )
            .to_pandas()
            .sort_values("start")
            .reset_index(drop=True)
        )
        return out.astype({"n_reach": "int64", "latest_us": "int64"})

    drv, dist = run(10**9), run(0)
    pd.testing.assert_frame_equal(drv, dist)

    # brute: enumerate monotone paths <= 3 hops per seed
    edges = list(zip(e["node"], e["nbr"], e["ts"]))
    for _, srow in seeds.iterrows():
        s, t0 = srow["node"], int(srow["t0"])
        best = {(s): t0}
        states = {(s, t0)}
        for _ in range(3):
            nxt = set()
            for (u, t) in states:
                for (a, b, ts) in edges:
                    if a == u and ts >= t:
                        nxt.add((b, ts))
                        if b not in best or ts < best[b]:
                            best[b] = ts
            states = nxt
        row = drv[drv["start"] == s].iloc[0]
        assert row["n_reach"] == len(best) - 1
        assert row["latest_us"] == max(best.values())


def test_four_clique_counts_matches_brute(ray_session):
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.graph_algo import (
        four_clique_counts,
    )

    rng = np.random.RandomState(59)
    n, p = 25, 0.35  # dense enough for plenty of K4s
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n) if rng.rand() < p]
    edges = pd.DataFrame(
        {
            "subject": [str(a) for a, _ in pairs],
            "object": [str(b) for _, b in pairs],
        }
    )
    out = (
        four_clique_counts(rd.from_pandas(edges).repartition(4))
        .to_pandas()
        .set_index("node")["n_k4"]
        .to_dict()
    )

    adj = {str(i): set() for i in range(n)}
    for a, b in pairs:
        adj[str(a)].add(str(b))
        adj[str(b)].add(str(a))
    brute: dict[str, int] = {}
    for quad in combinations([str(i) for i in range(n)], 4):
        if all(y in adj[x] for x, y in combinations(quad, 2)):
            for v in quad:
                brute[v] = brute.get(v, 0) + 1
    assert {k: int(v) for k, v in out.items()} == brute


def test_maximal_matching_driver_vs_distributed_and_valid(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.graph_algo import (
        maximal_matching,
    )

    rng = np.random.RandomState(67)
    u = rng.randint(0, 80, size=300)
    v = rng.randint(0, 80, size=300)
    keep = u != v
    edges = pd.DataFrame(
        {"subject": u[keep].astype(str), "object": v[keep].astype(str)}
    )
    e_ds = rd.from_pandas(edges).repartition(5)

    def run(threshold):
        out = maximal_matching(e_ds, driver_threshold=threshold).to_pandas()
        return out.sort_values(["u", "v"]).reset_index(drop=True)

    drv, dist = run(10**9), run(0)
    pd.testing.assert_frame_equal(drv, dist)

    # validity: a matching (no node twice)
    nodes = list(drv["u"]) + list(drv["v"])
    assert len(nodes) == len(set(nodes))
    # maximality: every edge has >= 1 matched endpoint
    matched_nodes = set(nodes)
    und = {
        (min(a, b), max(a, b))
        for a, b in zip(edges["subject"], edges["object"])
    }
    for a, b in und:
        assert a in matched_nodes or b in matched_nodes, (a, b)


def test_khop_directed_driver_vs_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.graph_algo import (
        khop_per_source,
    )

    rng = np.random.RandomState(71)
    u = rng.randint(0, 40, size=120)
    v = rng.randint(0, 40, size=120)
    keep = u != v
    edges = pd.DataFrame({"subject": u[keep], "object": v[keep]})
    seeds = pd.DataFrame({"node": np.arange(0, 40, 6)})
    e_ds, s_ds = rd.from_pandas(edges).repartition(4), rd.from_pandas(seeds)

    def run(threshold):
        out = khop_per_source(
            e_ds, s_ds, 3, driver_threshold=threshold, directed=True
        ).to_pandas()
        out["start"] = out["start"].astype(int)
        return out.sort_values("start").reset_index(drop=True).astype(
            {"n_reach": "int64", "dist_sum": "int64"}
        )

    drv, dist = run(10**9), run(0)
    pd.testing.assert_frame_equal(drv, dist)

    # directed reach must differ from undirected on this random digraph
    und = khop_per_source(e_ds, s_ds, 3, driver_threshold=10**9).to_pandas()
    assert und["n_reach"].sum() >= drv["n_reach"].sum()

    # brute directed BFS
    adj: dict[int, set] = {}
    for a, b in zip(edges["subject"], edges["object"]):
        adj.setdefault(int(a), set()).add(int(b))
    for srow in seeds["node"]:
        s = int(srow)
        dist_map = {s: 0}
        frontier = [s]
        for d in (1, 2, 3):
            nxt = []
            for x in frontier:
                for nb in adj.get(x, ()):
                    if nb not in dist_map:
                        dist_map[nb] = d
                        nxt.append(nb)
            frontier = nxt
        row = drv[drv["start"] == s].iloc[0]
        assert row["n_reach"] == len(dist_map) - 1
        assert row["dist_sum"] == sum(dist_map.values())
