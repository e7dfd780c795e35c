"""Vector graph type + graph algorithms — `vgraph` parity.

Reference: `vgraph` adjacency type with int64 node ids and typed weighted
edges (NeuronDB/include/neurondb_types.h:81-107) and graph algorithms BFS,
DFS, PageRank, community detection (src/vector/vector_graph_ops.c:176-701).

TPU design: the graph is a padded dense adjacency —
``neighbors [N, deg_max] int32`` (pad = -1) + ``weights [N, deg_max] f32``.
All algorithms are fixed-trip-count ``lax`` iterations over that array:
BFS = masked frontier expansion, PageRank = power iteration (a gather-sum,
or SpMV), label propagation for community detection. DFS order is computed
host-side (inherently sequential; kept for API parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class VectorGraph:
    neighbors: jax.Array   # [N, deg_max] int32, -1 = pad
    weights: jax.Array     # [N, deg_max] f32

    def tree_flatten(self):
        return (self.neighbors, self.weights), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_nodes(self) -> int:
        return self.neighbors.shape[0]

    @property
    def mask(self) -> jax.Array:
        return self.neighbors >= 0

    @classmethod
    def from_edges(cls, n: int, edges: Sequence[Tuple[int, int]],
                   weights: Optional[Sequence[float]] = None,
                   directed: bool = False) -> "VectorGraph":
        adj: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
        ws = weights if weights is not None else [1.0] * len(edges)
        for (u, v), w in zip(edges, ws):
            adj[u].append((v, w))
            if not directed:
                adj[v].append((u, w))
        deg = max((len(a) for a in adj), default=1) or 1
        nb = np.full((n, deg), -1, np.int32)
        wt = np.zeros((n, deg), np.float32)
        for i, a in enumerate(adj):
            for j, (v, w) in enumerate(a):
                nb[i, j] = v
                wt[i, j] = w
        return cls(jnp.asarray(nb), jnp.asarray(wt))


def bfs(g: VectorGraph, source: int, max_steps: Optional[int] = None) -> jax.Array:
    """BFS levels from ``source`` -> [N] int32 (-1 unreachable).
    vector_graph_ops.c BFS parity as masked frontier expansion."""
    n = g.num_nodes
    steps = max_steps if max_steps is not None else n
    level = jnp.full((n,), -1, jnp.int32).at[source].set(0)

    def body(i, level):
        frontier = level == i
        nbrs = g.neighbors                                  # [N, deg]
        # nodes reachable from frontier
        from_frontier = frontier[:, None] & (nbrs >= 0)     # [N, deg]
        safe = jnp.where(nbrs >= 0, nbrs, 0)
        hit = jnp.zeros((n,), jnp.bool_).at[safe.reshape(-1)].max(
            from_frontier.reshape(-1))
        newly = hit & (level < 0)
        return jnp.where(newly, i + 1, level)

    return jax.lax.fori_loop(0, steps, body, level)


def shortest_path_lengths(g: VectorGraph, source: int) -> jax.Array:
    """Weighted SSSP via Bellman-Ford iterations -> [N] f32 (inf unreachable)."""
    n = g.num_nodes
    inf = jnp.float32(jnp.inf)
    dist = jnp.full((n,), inf).at[source].set(0.0)
    safe = jnp.where(g.mask, g.neighbors, 0)

    def body(_, dist):
        cand = dist[:, None] + g.weights                    # relax u -> v
        cand = jnp.where(g.mask, cand, inf)
        upd = jnp.full((n,), inf).at[safe.reshape(-1)].min(cand.reshape(-1))
        return jnp.minimum(dist, upd)

    return jax.lax.fori_loop(0, n, body, dist)


def dfs_order(g: VectorGraph, source: int) -> List[int]:
    """Host-side DFS preorder (sequential by nature; API parity only)."""
    nb = np.asarray(g.neighbors)
    seen = set()
    order: List[int] = []
    stack = [source]
    while stack:
        u = stack.pop()
        if u in seen:
            continue
        seen.add(u)
        order.append(u)
        for v in reversed([int(v) for v in nb[u] if v >= 0]):
            if v not in seen:
                stack.append(v)
    return order


def pagerank(g: VectorGraph, damping: float = 0.85, iters: int = 50) -> jax.Array:
    """PageRank power iteration (vector_graph_ops.c pagerank parity)."""
    n = g.num_nodes
    deg = jnp.maximum(jnp.sum(g.mask, axis=1), 1).astype(jnp.float32)
    pr = jnp.full((n,), 1.0 / n, jnp.float32)
    safe = jnp.where(g.mask, g.neighbors, 0)

    def body(_, pr):
        contrib = jnp.where(g.mask, (pr / deg)[:, None], 0.0)   # [N, deg]
        inbound = jnp.zeros((n,), jnp.float32).at[safe.reshape(-1)].add(
            contrib.reshape(-1))
        # dangling mass redistributed uniformly
        dangling = jnp.sum(jnp.where(jnp.sum(g.mask, axis=1) == 0, pr, 0.0))
        return (1.0 - damping) / n + damping * (inbound + dangling / n)

    return jax.lax.fori_loop(0, iters, body, pr)


def community_labels(g: VectorGraph, iters: int = 20, seed: int = 0) -> jax.Array:
    """Community detection by synchronous weighted label propagation ->
    [N] int32 labels. Matches the reference's community-detection surface."""
    n = g.num_nodes
    labels = jnp.arange(n, dtype=jnp.int32)
    safe = jnp.where(g.mask, g.neighbors, 0)
    w = jnp.where(g.mask, g.weights, 0.0)

    def body(_, labels):
        nbr_labels = labels[safe]                               # [N, deg]
        # one-hot histogram of neighbor labels, weighted
        onehot = jax.nn.one_hot(nbr_labels, n, dtype=jnp.float32)
        hist = jnp.einsum("nd,ndk->nk", w, onehot)
        best = jnp.argmax(hist, axis=1).astype(jnp.int32)
        has_nbr = jnp.sum(g.mask, axis=1) > 0
        return jnp.where(has_nbr, jnp.minimum(best, labels * 0 + best), labels)

    return jax.lax.fori_loop(0, iters, body, labels)


def connected_components(g: VectorGraph, iters: Optional[int] = None) -> jax.Array:
    """Min-label propagation -> component ids [N] int32."""
    n = g.num_nodes
    labels = jnp.arange(n, dtype=jnp.int32)
    safe = jnp.where(g.mask, g.neighbors, 0)

    def body(_, labels):
        nbr = jnp.where(g.mask, labels[safe], n)
        best = jnp.minimum(jnp.min(nbr, axis=1), labels)
        return best

    return jax.lax.fori_loop(0, iters or n, body, labels)
