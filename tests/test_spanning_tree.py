"""Spanning tree / essential graph (reference: Map/SpanningTree.h:19-88)."""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.mapstore import spanning_tree as st


def _numpy_prim_weight(w, valid):
    """Total weight of the max-weight spanning tree (numpy oracle)."""
    idx = [i for i in range(len(valid)) if valid[i]]
    if not idx:
        return 0.0
    in_tree = {idx[0]}
    total = 0.0
    while len(in_tree) < len(idx):
        best = None
        for a in in_tree:
            for b in idx:
                if b in in_tree:
                    continue
                cand = w[a, b]
                if best is None or cand > best[0]:
                    best = (cand, b)
        total += best[0]
        in_tree.add(best[1])
    return total


def _random_covis(rng, K, valid_frac=1.0):
    w = rng.integers(0, 50, size=(K, K)).astype(np.float64)
    w = np.triu(w, 1)
    w = w + w.T
    valid = rng.random(K) < valid_frac
    if valid.sum() == 0:
        valid[0] = True
    return w, valid


class TestMaxWeightSpanningTree:
    def test_tree_properties(self, rng):
        K = 24
        w, valid = _random_covis(rng, K)
        tree = st.max_weight_spanning_tree(jnp.asarray(w),
                                           jnp.asarray(valid))
        parent = np.asarray(tree.parent)
        root = int(tree.root)
        # root has no parent; every other valid node has a valid parent
        assert parent[root] == -1
        for k in range(K):
            if valid[k] and k != root:
                assert parent[k] >= 0 and valid[parent[k]]
            if not valid[k]:
                assert parent[k] == -1
        # acyclic + connected: every node reaches root
        for k in range(K):
            if not valid[k]:
                continue
            seen, cur = set(), k
            while cur != root:
                assert cur not in seen
                seen.add(cur)
                cur = parent[cur]

    def test_matches_numpy_prim_total_weight(self, rng):
        for trial in range(5):
            K = 16
            w, valid = _random_covis(rng, K)
            tree = st.max_weight_spanning_tree(jnp.asarray(w),
                                               jnp.asarray(valid))
            parent = np.asarray(tree.parent)
            got = sum(w[k, parent[k]] for k in range(K) if parent[k] >= 0)
            want = _numpy_prim_weight(w, valid)
            assert got == want

    def test_invalid_slots_excluded(self, rng):
        K = 12
        w, valid = _random_covis(rng, K, valid_frac=0.6)
        tree = st.max_weight_spanning_tree(jnp.asarray(w),
                                           jnp.asarray(valid))
        parent = np.asarray(tree.parent)
        n_edges = (parent >= 0).sum()
        assert n_edges == valid.sum() - 1

    def test_depths(self, rng):
        K = 10
        w, valid = _random_covis(rng, K)
        tree = st.max_weight_spanning_tree(jnp.asarray(w),
                                           jnp.asarray(valid))
        d = np.asarray(st.depths_from_root(tree))
        parent = np.asarray(tree.parent)
        assert d[int(tree.root)] == 0
        for k in range(K):
            if parent[k] >= 0:
                assert d[k] == d[parent[k]] + 1

    def test_zero_covis_still_spans(self):
        # disconnected covisibility: the epsilon bias must bridge gaps so
        # every valid keyframe joins the tree (the reference guarantees this
        # by construction on insertion, SpanningTree.cpp AddKeyframe)
        K = 8
        w = np.zeros((K, K))
        w[0, 1] = w[1, 0] = 30
        w[4, 5] = w[5, 4] = 30  # island
        valid = np.ones(K, bool)
        tree = st.max_weight_spanning_tree(jnp.asarray(w),
                                           jnp.asarray(valid))
        parent = np.asarray(tree.parent)
        assert (parent >= 0).sum() == K - 1


class TestEssentialGraph:
    def test_edges_from_map_state(self, rng):
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import map_state as ms
        from mageslam_tpu.tracking.frontend import FrameFeatures

        K, F, L = 8, 32, 64
        m = ms.empty_map(K, F, L)
        pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        m, _ = ms.allocate_map_points(
            m, pts,
            jnp.asarray(rng.integers(0, 2**32, (40, 8), dtype=np.uint32)),
            pts, 0, jnp.ones(40, bool))
        for k in range(4):
            uv = rng.uniform(0, 200, (F, 2)).astype(np.float32)
            feats = FrameFeatures(
                uv=jnp.asarray(uv),
                xn_undist=jnp.asarray((uv - 100.0) / 250.0),
                response=jnp.ones(F, jnp.float32),
                angle=jnp.zeros(F, jnp.float32),
                octave=jnp.zeros(F, jnp.int32),
                desc=jnp.asarray(
                    rng.integers(0, 2**32, (F, 8), dtype=np.uint32)),
                valid=jnp.ones(F, bool),
            )
            # associate a sliding window of points so consecutive keyframes
            # share observations
            assoc = jnp.full(F, -1, jnp.int32)
            assoc = assoc.at[jnp.arange(20)].set(
                jnp.arange(k * 5, k * 5 + 20, dtype=jnp.int32))
            m, _ = ms.insert_keyframe(m, se3.pose_identity(), feats,
                                      assoc, k)
        eg = st.essential_graph_edges(m, min_covis=5)
        w = np.asarray(eg.edge_weight)
        ei = np.asarray(eg.edge_i)
        ej = np.asarray(eg.edge_j)
        active = w > 0
        assert active.sum() >= 3  # at least the tree over 4 keyframes
        # all active edges connect valid keyframes
        kv = np.asarray(m.kf_valid)
        assert kv[ei[active]].all() and kv[ej[active]].all()
        # tree slots for valid children carry weight
        tree_active = active & np.asarray(eg.is_tree)
        assert tree_active.sum() == 3
