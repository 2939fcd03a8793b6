"""Max-weight spanning tree of the covisibility graph (the essential graph).

Equivalent of the reference's Map/SpanningTree.{h,cpp} (SpanningTree.h:19-88:
max-weight spanning tree over covisibility with incremental update/repair on
keyframe add/remove) — the substrate of the "essential graph" used for
pose-graph optimization.

TPU-first design: where the reference maintains the tree incrementally in a
mutable adjacency structure (SpanningTree.cpp), here the tree is *derived*
state — one jitted Prim's sweep over the padded (K, K) covisibility matrix.
K is small (hundreds), so a full O(K^2) recompute is a handful of fused
vector ops per mapping step and never desynchronizes: insert/remove/merge
"repair" (SpanningTree.h:36-60) is recomputation by construction, the same
stance MapState takes for covisibility itself (mapstore/map_state.py).

The essential graph (tree edges + covisibility edges above a threshold +
loop-closure edges, ORB-SLAM's definition, which the reference's unused
PoseGraphOptimizer was built for) is exported as fixed-shape edge arrays for
solvers/pose_graph.optimize_pose_graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.mapstore import map_state as ms

# Bias added to every valid keyframe pair so Prim always spans the valid set
# even through zero-covisibility gaps (the reference guarantees connectivity
# by construction: every keyframe enters the tree when inserted,
# SpanningTree.cpp AddKeyframe). Adjacent-index pairs get a slightly larger
# bias so gap-bridging edges deterministically follow temporal order.
_EPS_ANY = 1e-4
_EPS_ADJ = 1e-3


class SpanningTree(NamedTuple):
    """Parent-pointer encoding; root has parent -1, invalid slots -1."""

    parent: jnp.ndarray       # (K,) int32
    parent_weight: jnp.ndarray  # (K,) float32 covis count of the tree edge
    root: jnp.ndarray         # () int32


def _padded_weights(covis: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    K = covis.shape[0]
    pair_ok = valid[:, None] & valid[None, :]
    idx = jnp.arange(K)
    adj = jnp.abs(idx[:, None] - idx[None, :]) == 1
    w = covis.astype(jnp.float32) + _EPS_ANY + jnp.where(adj, _EPS_ADJ, 0.0)
    w = jnp.where(pair_ok, w, -jnp.inf)
    return jnp.where(jnp.eye(K, dtype=bool), -jnp.inf, w)


@jax.jit
def max_weight_spanning_tree(covis: jnp.ndarray,
                             valid: jnp.ndarray) -> SpanningTree:
    """Prim's algorithm, fixed K-1 iterations, masked.

    covis: (K, K) shared-observation counts (symmetric);
    valid: (K,) keyframe-slot validity. Invalid slots stay parent -1.
    """
    K = covis.shape[0]
    w = _padded_weights(covis, valid)
    root = jnp.argmax(valid).astype(jnp.int32)

    in_tree = jnp.zeros(K, bool).at[root].set(valid[root])
    parent = jnp.full(K, -1, jnp.int32)
    # best known connection of each out-of-tree node to the tree
    best_w = w[root]
    best_p = jnp.full(K, root, jnp.int32)

    def body(carry, _):
        in_tree, parent, best_w, best_p = carry
        cand = jnp.where(valid & ~in_tree, best_w, -jnp.inf)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        grow = cand[nxt] > -jnp.inf
        parent = jnp.where(grow, parent.at[nxt].set(best_p[nxt]), parent)
        in_tree = in_tree.at[nxt].set(in_tree[nxt] | grow)
        improve = grow & (w[nxt] > best_w) & ~in_tree
        best_w = jnp.where(improve, w[nxt], best_w)
        best_p = jnp.where(improve, nxt, best_p)
        return (in_tree, parent, best_w, best_p), None

    (in_tree, parent, _, _), _ = jax.lax.scan(
        body, (in_tree, parent, best_w, best_p), None, length=K - 1)

    pw = jnp.where(parent >= 0,
                   covis[jnp.arange(K), jnp.clip(parent, 0)], 0.0)
    return SpanningTree(parent=parent, parent_weight=pw.astype(jnp.float32),
                        root=root)


def spanning_tree(m: ms.MapState) -> SpanningTree:
    """Tree over the *derived* covisibility of a MapState."""
    return max_weight_spanning_tree(ms.covisibility(m), m.kf_valid)


@jax.jit
def depths_from_root(tree: SpanningTree) -> jnp.ndarray:
    """(K,) hop distance from root; -1 for nodes outside the tree."""
    K = tree.parent.shape[0]
    parent = tree.parent
    depth = jnp.where(jnp.arange(K) == tree.root, 0, -1)

    def single(depth, _):
        pd = jnp.where(parent >= 0, depth[jnp.clip(parent, 0)], -1)
        newly = (depth < 0) & (pd >= 0)
        return jnp.where(newly, pd + 1, depth), None

    depth, _ = jax.lax.scan(single, depth, None, length=K - 1)
    return depth


class EssentialGraph(NamedTuple):
    """Fixed-shape edge list for the pose-graph solver.

    E = K-1 tree slots + E_cov thresholded covisibility slots (+ the caller
    appends loop edges). weight 0 marks an inactive slot, matching
    solvers/pose_graph.PoseGraphProblem conventions.
    """

    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_weight: jnp.ndarray
    is_tree: jnp.ndarray      # (E,) bool


def essential_graph_edges(m: ms.MapState, min_covis: int = 100,
                          max_covis_edges: int = 256,
                          tree_weight: float = 1.0,
                          covis_weight: float = 1.0) -> EssentialGraph:
    """Tree edges + strong covisibility edges (ORB-SLAM essential graph).

    min_covis matches the reference PoseGraphOptimizer's intended use (strong
    covisibility theta=100 in the ORB-SLAM formulation the reference follows).
    """
    K = m.kf_valid.shape[0]
    covis = ms.covisibility(m)
    tree = max_weight_spanning_tree(covis, m.kf_valid)

    # tree edges: (child, parent)
    child = jnp.arange(K, dtype=jnp.int32)
    t_i = child
    t_j = jnp.clip(tree.parent, 0).astype(jnp.int32)
    t_w = jnp.where(tree.parent >= 0, tree_weight, 0.0).astype(jnp.float32)

    # strong covisibility edges (upper triangle, excluding tree edges)
    iu, ju = jnp.triu_indices(K, k=1)
    cw = covis[iu, ju]
    is_tree_edge = ((tree.parent[iu] == ju) | (tree.parent[ju] == iu))
    ok = (cw >= min_covis) & m.kf_valid[iu] & m.kf_valid[ju] & ~is_tree_edge
    score = jnp.where(ok, cw.astype(jnp.float32), -1.0)
    top = jnp.argsort(-score)[:max_covis_edges]
    c_i = iu[top].astype(jnp.int32)
    c_j = ju[top].astype(jnp.int32)
    c_w = jnp.where(score[top] > 0, covis_weight, 0.0).astype(jnp.float32)

    tree_slots = t_i.shape[0]
    return EssentialGraph(
        edge_i=jnp.concatenate([t_i, c_i]),
        edge_j=jnp.concatenate([t_j, c_j]),
        edge_weight=jnp.concatenate([t_w, c_w]),
        is_tree=jnp.arange(tree_slots + c_i.shape[0]) < tree_slots,
    )
