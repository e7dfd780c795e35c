"""Tree ensembles — decision tree, random forest, gradient boosting.

Reference: NeuronDB/src/ml/ml_decision_tree.c (2649), ml_random_forest.c
(7623), ml_xgboost.c (1396), ml_catboost.c (1417), ml_lightgbm.c and their
CUDA kernels. TPU redesign: histogram trees grown level-synchronous —
features are quantile-binned to uint8 once; each level computes per-
(node, feature, bin) target histograms with one segment-sum (a gather-free
scatter-add), evaluates all split gains with cumulative sums, and advances
every sample's node id in lockstep. The whole grower is jittable with
static depth, so a random forest is one ``vmap`` over per-tree RNG keys
(bootstrap + feature subsampling inside), and boosting is a scan over
rounds. No recursion, no pointers — the tree is a flat array.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_BINS = 64


def quantile_bins(X: jnp.ndarray, n_bins: int = MAX_BINS) -> jnp.ndarray:
    """Per-feature bin edges [F, n_bins-1] from quantiles."""
    qs = jnp.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    return jnp.quantile(jnp.asarray(X, jnp.float32), qs, axis=0).T


def bin_features(X, edges: jnp.ndarray) -> jnp.ndarray:
    """[N, F] uint8 bin ids via vectorized searchsorted."""
    X = jnp.asarray(X, jnp.float32)
    f = jax.vmap(lambda col, e: jnp.searchsorted(e, col), in_axes=(1, 0),
                 out_axes=1)
    return f(X, edges).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("depth", "n_bins", "min_leaf"))
def grow_tree(Xb: jnp.ndarray, Y: jnp.ndarray, sample_w: jnp.ndarray, *,
              depth: int = 6, n_bins: int = MAX_BINS,
              min_leaf: int = 1) -> Dict:
    """Grow one regression tree on binned features.

    Xb [N, F] int32 bins; Y [N, O] targets; sample_w [N] weights (0 drops a
    row — used for bootstrap). Returns flat arrays over 2^(depth+1)-1 nodes:
    feat, thresh_bin, leaf [nodes, O], plus training-sample node ids.
    Split criterion: weighted variance reduction summed over outputs.
    """
    N, F = Xb.shape
    O = Y.shape[1]
    n_nodes_total = 2 ** (depth + 1) - 1

    feat = jnp.full((n_nodes_total,), -1, jnp.int32)
    tbin = jnp.zeros((n_nodes_total,), jnp.int32)
    node_of = jnp.zeros((N,), jnp.int32)          # current node per sample

    def level_step(carry, level_nodes_start):
        feat, tbin, node_of = carry
        n_level = level_nodes_start[1]
        start = level_nodes_start[0]
        # histograms: index = (node_local * F + f) * n_bins + bin
        node_local = node_of - start              # valid for active samples
        active = (node_local >= 0) & (node_local < n_level)
        idx = (jnp.clip(node_local, 0, n_level - 1)[:, None] * F
               + jnp.arange(F)[None, :]) * n_bins + Xb      # [N, F]
        w = jnp.where(active, sample_w, 0.0)
        seg = n_level * F * n_bins
        cnt = jax.ops.segment_sum(
            jnp.broadcast_to(w[:, None], (N, F)).reshape(-1),
            idx.reshape(-1), num_segments=seg).reshape(n_level, F, n_bins)
        wy = Y * w[:, None]                                   # [N, O]
        sums = jax.ops.segment_sum(
            (wy[:, None, :] * jnp.ones((1, F, 1))).reshape(-1, O),
            idx.reshape(-1), num_segments=seg).reshape(n_level, F, n_bins, O)
        # cumulative over bins -> candidate left stats for each threshold
        ccnt = jnp.cumsum(cnt, axis=2)                        # [n, F, B]
        csum = jnp.cumsum(sums, axis=2)                       # [n, F, B, O]
        tot_cnt = ccnt[:, :, -1:]                             # [n, F, 1]
        tot_sum = csum[:, :, -1:, :]
        lcnt = ccnt
        rcnt = tot_cnt - ccnt
        lsum = csum
        rsum = tot_sum - csum
        eps = 1e-9
        gain = (jnp.sum(lsum * lsum, -1) / jnp.maximum(lcnt, eps)
                + jnp.sum(rsum * rsum, -1) / jnp.maximum(rcnt, eps)
                - jnp.sum(tot_sum * tot_sum, -1) / jnp.maximum(tot_cnt, eps))
        ok = (lcnt >= min_leaf) & (rcnt >= min_leaf)
        gain = jnp.where(ok, gain, -jnp.inf)                  # [n, F, B]
        flat = gain.reshape(n_level, F * n_bins)
        best = jnp.argmax(flat, axis=1)
        best_gain = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        bf = (best // n_bins).astype(jnp.int32)
        bb = (best % n_bins).astype(jnp.int32)
        split = best_gain > 1e-7
        bf = jnp.where(split, bf, -1)
        feat = jax.lax.dynamic_update_slice(feat, bf, (start,))
        tbin = jax.lax.dynamic_update_slice(tbin, bb, (start,))
        # advance samples: left = 2*node+1, right = 2*node+2
        nl = jnp.clip(node_local, 0, n_level - 1)
        sf = bf[nl]
        sb = bb[nl]
        has_split = active & (sf >= 0)
        go_right = jnp.take_along_axis(
            Xb, jnp.maximum(sf, 0)[:, None], axis=1)[:, 0] > sb
        child = 2 * node_of + 1 + go_right.astype(jnp.int32)
        node_of = jnp.where(has_split, child, node_of)
        return (feat, tbin, node_of), None

    # levels differ in node count -> not scan-uniform; unroll (depth static)
    carry = (feat, tbin, node_of)
    for l in range(depth):
        carry, _ = level_step(carry, (2 ** l - 1, 2 ** l))
    feat, tbin, node_of = carry

    # leaf values: mean of Y per final node
    w = sample_w
    cnt = jax.ops.segment_sum(w, node_of, num_segments=n_nodes_total)
    sums = jax.ops.segment_sum(Y * w[:, None], node_of,
                               num_segments=n_nodes_total)
    leaf = sums / jnp.maximum(cnt[:, None], 1e-9)
    return {"feat": feat, "tbin": tbin, "leaf": leaf}


@functools.partial(jax.jit, static_argnames=("depth",))
def tree_predict(tree: Dict, Xb: jnp.ndarray, *, depth: int = 6) -> jnp.ndarray:
    """[N, O] leaf values by lockstep traversal."""
    N = Xb.shape[0]
    node = jnp.zeros((N,), jnp.int32)
    for _ in range(depth):
        f = tree["feat"][node]
        b = tree["tbin"][node]
        go_right = jnp.take_along_axis(Xb, jnp.maximum(f, 0)[:, None],
                                       axis=1)[:, 0] > b
        child = 2 * node + 1 + go_right.astype(jnp.int32)
        node = jnp.where(f >= 0, child, node)
    return tree["leaf"][node]


# ---- public trainers ----

def _prep(X, y, task: str, num_classes: Optional[int]):
    X = jnp.asarray(X, jnp.float32)
    edges = quantile_bins(X)
    Xb = bin_features(X, edges)
    if task == "classify":
        y = jnp.asarray(y, jnp.int32)
        C = int(num_classes if num_classes is not None else int(jnp.max(y)) + 1)
        Y = jax.nn.one_hot(y, C)
    else:
        Y = jnp.asarray(y, jnp.float32)
        if Y.ndim == 1:
            Y = Y[:, None]
        C = Y.shape[1]
    return Xb, Y, edges, C


def decision_tree_fit(X, y, *, task: str = "classify", depth: int = 6,
                      min_leaf: int = 1, num_classes: Optional[int] = None
                      ) -> Dict:
    Xb, Y, edges, C = _prep(X, y, task, num_classes)
    w = jnp.ones((Xb.shape[0],))
    tree = grow_tree(Xb, Y, w, depth=depth, min_leaf=min_leaf)
    return {"trees": jax.tree_util.tree_map(lambda a: a[None], tree),
            "edges": edges, "depth": jnp.asarray(depth),
            "task_classify": jnp.asarray(task == "classify"),
            "learning_rate": jnp.asarray(1.0), "base": jnp.zeros((C,)),
            "kind": jnp.asarray(0)}  # 0 = averaged ensemble


def random_forest_fit(X, y, *, task: str = "classify", n_trees: int = 50,
                      depth: int = 6, min_leaf: int = 1, seed: int = 0,
                      feature_frac: float = 0.7,
                      num_classes: Optional[int] = None) -> Dict:
    Xb, Y, edges, C = _prep(X, y, task, num_classes)
    N, F = Xb.shape
    keys = jax.random.split(jax.random.PRNGKey(seed), n_trees)

    @jax.vmap
    def one_tree(key):
        k1, k2 = jax.random.split(key)
        # bootstrap as Poisson(1) weights (equivalent in expectation,
        # shape-static); feature subsample by zeroing gains via bin
        # randomization is costlier — instead mask features by setting
        # their bins to 0 for this tree
        w = jax.random.poisson(k1, 1.0, (N,)).astype(jnp.float32)
        fmask = jax.random.uniform(k2, (F,)) < feature_frac
        Xb_t = jnp.where(fmask[None, :], Xb, 0)
        return grow_tree(Xb_t, Y, w, depth=depth, min_leaf=min_leaf)

    trees = one_tree(keys)
    return {"trees": trees, "edges": edges, "depth": jnp.asarray(depth),
            "task_classify": jnp.asarray(task == "classify"),
            "learning_rate": jnp.asarray(1.0 / n_trees),
            "base": jnp.zeros((C,)), "kind": jnp.asarray(0)}


def gradient_boosting_fit(X, y, *, task: str = "classify",
                          n_trees: int = 50, depth: int = 4,
                          learning_rate: float = 0.1, min_leaf: int = 5,
                          num_classes: Optional[int] = None) -> Dict:
    """Squared-loss boosting on (one-hot) targets — the reference's
    xgboost/lightgbm/catboost surface maps here (histogram GBT)."""
    Xb, Y, edges, C = _prep(X, y, task, num_classes)
    N = Xb.shape[0]
    w = jnp.ones((N,))
    base = jnp.mean(Y, axis=0)
    pred = jnp.tile(base[None, :], (N, 1))
    trees = []
    for _ in range(n_trees):
        resid = Y - pred
        tree = grow_tree(Xb, resid, w, depth=depth, min_leaf=min_leaf)
        upd = tree_predict(tree, Xb, depth=depth)
        pred = pred + learning_rate * upd
        trees.append(tree)
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *trees)
    return {"trees": stacked, "edges": edges, "depth": jnp.asarray(depth),
            "task_classify": jnp.asarray(task == "classify"),
            "learning_rate": jnp.asarray(learning_rate), "base": base,
            "kind": jnp.asarray(1)}  # 1 = additive ensemble


def ensemble_raw(model: Dict, X) -> jnp.ndarray:
    Xb = bin_features(X, model["edges"])
    depth = int(model["depth"])
    preds = jax.vmap(lambda t: tree_predict(t, Xb, depth=depth))(
        model["trees"])                                      # [T, N, O]
    if int(model["kind"]) == 1:                              # boosting
        return model["base"][None, :] + float(model["learning_rate"]) * \
            jnp.sum(preds, axis=0)
    return jnp.mean(preds, axis=0)                           # averaging


def ensemble_predict(model: Dict, X) -> jnp.ndarray:
    raw = ensemble_raw(model, X)
    if bool(model["task_classify"]):
        return jnp.argmax(raw, axis=1).astype(jnp.int32)
    return raw[:, 0] if raw.shape[1] == 1 else raw


def ensemble_predict_proba(model: Dict, X) -> jnp.ndarray:
    raw = ensemble_raw(model, X)
    raw = jnp.maximum(raw, 0.0)
    return raw / jnp.maximum(jnp.sum(raw, axis=1, keepdims=True), 1e-9)
