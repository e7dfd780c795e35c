"""HNSW — hierarchical graph ANN, rebuilt as batched beam search on TPU.

Reference behavior being rebuilt (NeuronDB/src/index/hnsw_am.c):
- node = level + vector + per-level neighbor lists, one per 8KB page
  (:124-156); meta page holds entryPoint/entryLevel/m/efC/efS/ml (:108-120);
- defaults m=16, ef_construction=200, ef_search=64, ml=0.36, max level 16
  (:81-95); random level = floor(-ln(U) * ml) (:1143);
- insert: greedy entry descent (:2156-2286), per-level search with
  ef=ef_construction, closest-M neighbor selection (no diversity heuristic,
  :2364-2424), bidirectional linking with prune-to-2M (:2451-2533);
- search: greedy descent on levels L..1 (:1638-1750), ef-bounded level-0
  expansion (:1833-1975), top-k (:1984-2013);
- distance strategies 1=L2, 2=cosine, 3=-IP (:1301-1345).

TPU redesign (SURVEY.md §7 phase 2): the graph lives in HBM as int32
adjacency arrays — level 0 is ``nbr0 [Ncap, 2M]``, upper levels are compact
per-level arrays with local row ids plus row->vector maps. A query batch
runs the whole search in lockstep:
- upper levels: greedy descent, one gather + fused distance per step,
  convergence-masked ``lax.while_loop``;
- level 0: batched best-first expansion — each step expands the best
  unexpanded beam entry of every query, gathers its <=2M neighbors, checks
  a [B, N] visited bitmap, scores candidates with one VPU multiply-reduce,
  and merges them into the beam with an XLA top-k. All shapes static;
  finished queries are masked, matching the "convergence-divergent walks"
  plan in SURVEY.md §7.

Construction is wave-batched instead of the reference's one-at-a-time
insert under an exclusive meta-page lock (hnsw_am.c:511-519): a wave of W
nodes searches the frozen graph in one batch, then links are applied with
grouped scatter updates (reverse edges re-pruned to closest-capacity,
matching the reference's closest-only prune). Nodes within one wave do not
see each other; this is the standard batch-construction approximation and
is validated by the recall tests.
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.index.base import BaseIndex, as_batch
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import sortnet as SN
from neurondb_tpu.ops import topk as TK

INF = jnp.float32(jnp.finfo(jnp.float32).max)
INF_NP = float(np.finfo(np.float32).max) * 0.5   # "masked" threshold


def _phase_timer():
    """Env-gated build-phase profiler (``NEURONDB_TPU_BUILD_PROFILE=1``).

    Returns ``mark(label, *arrays)`` which value-fetches one row of each
    array (``block_until_ready`` returns EARLY through the axon tunnel —
    IMPLEMENTATION_NOTES round-3 finding 4, so a real fetch is the only
    honest barrier) and prints the phase's wall time to stderr."""
    if os.environ.get("NEURONDB_TPU_BUILD_PROFILE") != "1":
        return None
    state = {"t": time.time()}

    def mark(label, *arrays):
        for a in arrays:
            if a is not None:
                np.asarray(jax.device_get(a[:1]))
        now = time.time()
        print(f"[build-profile] {label}: {now - state['t']:.2f}s",
              file=sys.stderr, flush=True)
        state["t"] = now

    return mark


# ===========================================================================
# jitted search primitives
# ===========================================================================

def _pair_dist(q: jax.Array, q_sq: jax.Array, g: jax.Array,
               g_sq: jax.Array, metric: str) -> jax.Array:
    """q [B, D] vs per-query gathered rows g [B, C, D] -> [B, C] scores."""
    dots = jnp.einsum("bd,bcd->bc", q, g, preferred_element_type=jnp.float32)
    if metric == "ip":
        return -dots
    return jnp.maximum(q_sq[:, None] + g_sq - 2.0 * dots, 0.0)


@functools.partial(jax.jit, static_argnames=("metric", "max_steps"))
def _greedy_descent(q, cur, vecs, sqnorms, nbr, rowmap, *,
                    metric: str, max_steps: int):
    """One-level greedy walk: move to the best neighbor while it improves.
    cur: [B] local rows. rowmap: [Nc] local row -> vector row.
    Returns improved [B] local rows."""
    B = q.shape[0]
    q_sq = jnp.sum(q * q, axis=1)

    def dist_of(rows):                       # rows: [B] local
        vr = rowmap[rows]
        g = vecs[vr]
        gs = sqnorms[vr]
        dots = jnp.einsum("bd,bd->b", q, g, preferred_element_type=jnp.float32)
        if metric == "ip":
            return -dots
        return jnp.maximum(q_sq + gs - 2.0 * dots, 0.0)

    def cond(state):
        _, _, moved, step = state
        return jnp.any(moved) & (step < max_steps)

    def body(state):
        cur, cur_d, moved, step = state
        nb = nbr[cur]                                        # [B, deg] local
        valid = (nb >= 0) & moved[:, None]
        nb_safe = jnp.maximum(nb, 0)
        vr = rowmap[nb_safe]
        g = vecs[vr]
        gs = sqnorms[vr]
        d = _pair_dist(q, q_sq, g, gs, metric)
        d = jnp.where(valid, d, INF)
        j = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
        better = best_d < cur_d
        new_cur = jnp.where(better, jnp.take_along_axis(nb_safe, j[:, None],
                                                        axis=1)[:, 0], cur)
        new_d = jnp.where(better, best_d, cur_d)
        return new_cur, new_d, better, step + 1

    cur_d = dist_of(cur)
    moved = jnp.ones((B,), jnp.bool_)
    cur, _, _, _ = jax.lax.while_loop(cond, body, (cur, cur_d, moved,
                                                   jnp.int32(0)))
    return cur


def _use_network() -> bool:
    """Beam-merge strategy default: plain lax.top_k everywhere. The
    bitonic-network merge (ops/sortnet.py) was built on the round-2
    diagnosis that top_k dominated the beam step (~6 of 8.5 ms at
    B=1024), but the end-to-end A/B on the 1M index measured it 3.5-4x
    SLOWER than top_k on the TPU backend (1.3-1.5k vs 5.1-5.6k QPS at
    ef=8 across batch 1024-4096): the 36 elementwise compare/select
    stages each rewrite the full [B, ef+E*deg] payload in VMEM, while
    XLA's top_k only scans it. NDB_SORTNET=1 keeps the network path
    available; it is threaded through the jits as a STATIC argument
    (env is read at call sites, never inside a traced function)."""
    import os
    env = os.environ.get("NDB_SORTNET", "").lower()
    if env in ("1", "true"):
        return True
    return False


def _use_approx_merge() -> bool:
    """Opt-in: NDB_BEAM_MERGE=approx replaces the beam-merge top_k with
    lax.approx_min_k (TPU PartialReduce). The exact-scan A/B measured
    PartialReduce 5.3x faster than TopK at [16384, 16384]
    (IMPLEMENTATION_NOTES finding 12), but the beam merge reduces only
    [B, ef+E*deg] (~48-64 columns) — the A/B decides whether the win
    survives at that width (VERDICT r3 item 6)."""
    import os
    return os.environ.get("NDB_BEAM_MERGE", "").lower() == "approx"


def _use_ring() -> bool:
    """Visited-set strategy for the QUERY path: the [B, W] expanded-id
    ring on TPU (the bitmap's gather + scatter-add runs on the scalar
    core at ~18M updates/s — ~25-40% of the beam step at 1M rows), the
    packed bitmap elsewhere (CPU scatters fine, and the bitmap is the
    reference semantics: scored-once, like hnswlib). Call sites gate
    the ring on ef >= 12: at ef <= 10 the re-scored evicted candidates
    crowd the tiny beam and recall drops (0.84 vs 0.97 measured at 1M).
    NDB_VISITED=ring|bitmap forces the strategy (the ef gate still
    applies); construction always uses the bitmap."""
    import os
    env = os.environ.get("NDB_VISITED", "").lower()
    if env == "ring":
        return True
    if env == "bitmap":
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit,
                   static_argnames=("metric", "ef", "max_steps",
                                    "identity_map", "expand", "net",
                                    "ring", "approx"))
def _beam_search(q, entry, vecs, sqnorms, nbr, rowmap, n_nodes, *,
                 metric: str, ef: int, max_steps: int, identity_map: bool,
                 expand: int = 1, net: bool = True, ring: bool = False,
                 approx: bool = False):
    """ef-bounded best-first expansion at one level, whole batch in lockstep.

    q [B, D]; entry [B] local rows; nbr [Nc, deg] local adjacency (-1 pad);
    rowmap [Nc] local->vector row (ignored when identity_map);
    n_nodes: scalar count of live local rows (visited sizing uses Nc).
    expand > 1 pops the E best unexpanded candidates per step (multi-
    expansion): E-fold fewer lockstep rounds and larger, more efficient
    gathers, at slightly eager exploration — used for construction.
    ``net`` selects the beam-merge implementation (see _use_network).
    ``ring`` replaces the [B, Nc/32] packed visited bitmap with a small
    [B, W] ring of EXPANDED ids + a beam-membership test + post-merge
    dedupe (all dense VPU compares — the bitmap's gather + scatter-add
    runs on the TPU scalar core, ~25-40%% of the step). W >= E*max_steps
    + R so a node can never be expanded twice (no loops); a scored-but-
    evicted node may be re-scored, which classic HNSW forbids but which
    only re-considers (never loses) candidates. Requires net=False
    (dedupe breaks the ascending-beam invariant the network merge
    needs); falls back to the bitmap when W would exceed 256.
    Returns (dists [B, ef], rows [B, ef]) ascending, -1/-inf padded.
    """
    B = q.shape[0]
    Nc, deg = nbr.shape
    E = max(1, expand)
    q_sq = jnp.sum(q * q, axis=1)
    barange = jnp.arange(B)

    def vrow(rows):
        return rows if identity_map else rowmap[rows]

    # beam state; entry may be [B] (single) or [B, R] (multi-entry —
    # the bulk build's centroid router seeds the beam with R entries)
    if entry.ndim == 1:
        entry = entry[:, None]
    R = entry.shape[1]
    e_vr = vrow(jnp.maximum(entry, 0))                     # [B, R]
    e_g = vecs[e_vr].astype(jnp.float32)                   # [B, R, D]
    e_dots = jnp.einsum("bd,brd->br", q, e_g,
                        preferred_element_type=jnp.float32)
    if metric == "ip":
        e_d = -e_dots
    else:
        e_d = jnp.maximum(q_sq[:, None] + sqnorms[e_vr] - 2.0 * e_dots,
                          0.0)
    entry_ok = entry >= 0
    if R > 1:
        # duplicate entries within a row would occupy beam slots twice;
        # keep the first occurrence only (j < i comparisons)
        dup = (entry[:, :, None] == entry[:, None, :]) & \
            jnp.tril(jnp.ones((R, R), bool), k=-1)[None]
        entry_ok = entry_ok & ~dup.any(2)

    beam_d = jnp.full((B, ef), INF).at[:, :R].set(
        jnp.where(entry_ok, e_d, INF))
    beam_i = jnp.full((B, ef), -1, jnp.int32).at[:, :R].set(
        jnp.where(entry_ok, entry, -1))
    expanded = jnp.ones((B, ef), jnp.bool_).at[:, :R].set(~entry_ok)
    if R > 1 and net:
        # the loop keeps the beam ascending (the pop rank-select and the
        # merge sweep both rely on it); sort the multi-entry seed once
        beam_d, (beam_i, expanded) = SN.sort_with_payloads(
            beam_d, (beam_i, expanded))
    W = 8
    while W < E * max_steps + R + 1:
        W *= 2
    use_ring = ring and not net and W <= 256
    if use_ring:
        # ring of expanded ids (-1 empty); entries are covered by the
        # beam-membership test until they are popped into the ring
        visited = jnp.full((B, W), -1, jnp.int32)
    else:
        # visited set as packed bit-words: a [B, Nc] byte map is carried
        # (and on this backend copied) through every while_loop step —
        # 1 GB at B=1024/N=1M, ~31 ms/step of pure bitmap traffic
        # (measured r2). Packed uint32 words are 32x smaller. Updates
        # are scatter-ADD of per-step-deduplicated fresh bits, which is
        # exactly bitwise-OR because every added bit is distinct and
        # currently zero.
        nwords = (Nc + 31) // 32
        e_safe = jnp.maximum(entry, 0)
        e_bit = (jnp.uint32(1) << (e_safe.astype(jnp.uint32) & 31))
        e_val = jnp.where(entry_ok, e_bit, jnp.uint32(0))
        visited = jnp.zeros((B, nwords), jnp.uint32).at[
            barange[:, None], e_safe >> 5].add(e_val)

    def cond(state):
        _, _, expanded, _, step = state
        return jnp.any(~expanded) & (step < max_steps)

    def body(state):
        beam_d, beam_i, expanded, visited, step = state
        # pop the E best unexpanded candidates per query. The beam is
        # kept ascending (sorted seed + network merge below), so the E
        # best unexpanded are the FIRST E unexpanded slots — a cumsum
        # rank-select, no sort/top_k HLO (those serialize on the TPU
        # scalar core and were ~6 of 8.5 ms/step at B=1024, round 2)
        md = jnp.where(expanded, INF, beam_d)
        if E == 1:
            e = jnp.argmin(md, axis=1)[:, None]                # [B, 1]
            sel_d = jnp.take_along_axis(md, e, axis=1)         # [B, 1]
        elif net:
            une = ~expanded
            rank = jnp.cumsum(une.astype(jnp.int32), axis=1)   # [B, ef]
            hit = une[:, :, None] & (
                rank[:, :, None] == 1 + jnp.arange(E)[None, None, :])
            e = jnp.argmax(hit, axis=1).astype(jnp.int32)      # [B, E]
            sel_d = jnp.take_along_axis(md, e, axis=1)         # [B, E]
            # columns past the number of unexpanded slots alias slot 0;
            # deactivate them instead of re-expanding it
            sel_d = jnp.where(hit.any(axis=1), sel_d, INF)
        else:
            _, e = jax.lax.top_k(-md, E)                       # [B, E]
            sel_d = jnp.take_along_axis(md, e, axis=1)         # [B, E]
        active = sel_d < INF
        chosen = jnp.where(active,
                           jnp.take_along_axis(beam_i, e, axis=1), 0)
        chosen = jnp.maximum(chosen, 0)
        expanded = expanded.at[barange[:, None], e].max(
            jnp.ones((B, E), jnp.bool_))

        nb = nbr[chosen].reshape(B, E * deg)                   # [B, E*deg]
        ok = (nb >= 0) & jnp.repeat(active, deg, axis=1)
        nb_safe = jnp.maximum(nb, 0)
        if use_ring:
            # membership = dense compares vs the expanded ring and the
            # current beam (no sort, no scatter; in-step duplicates are
            # removed by the post-merge dedupe below)
            visited = jnp.concatenate(
                [jnp.where(active, chosen, -1), visited[:, :-E]], axis=1)
            in_ring = (nb_safe[:, :, None] == visited[:, None, :]).any(2)
            in_beam = (nb_safe[:, :, None] == beam_i[:, None, :]).any(2)
            fresh = ok & ~(in_ring | in_beam)
        else:
            # dedup within the step ALWAYS (not just E>1): the
            # packed-bit scatter-add below is only OR-equivalent if
            # every fresh id is unique within the step (adjacency rows
            # may carry duplicates). id-sort via the bitonic network on
            # TPU, argsort elsewhere
            if net:
                _, (nb_safe, ok) = SN.sort_with_payloads(
                    jnp.where(ok, nb_safe, Nc), (nb_safe, ok))
            else:
                order = jnp.argsort(jnp.where(ok, nb_safe, Nc), axis=1)
                nb_safe = jnp.take_along_axis(nb_safe, order, axis=1)
                ok = jnp.take_along_axis(ok, order, axis=1)
            dup = jnp.concatenate(
                [jnp.zeros((B, 1), bool),
                 nb_safe[:, 1:] == nb_safe[:, :-1]], axis=1)
            ok = ok & ~dup
            word = nb_safe >> 5
            bit = (jnp.uint32(1) << (nb_safe.astype(jnp.uint32) & 31))
            seen = (visited[barange[:, None], word] & bit) != 0
            fresh = ok & ~seen
            visited = visited.at[barange[:, None], word].add(
                jnp.where(fresh, bit, jnp.uint32(0)))

        vr = vrow(nb_safe)
        g = vecs[vr].astype(jnp.float32)
        gs = sqnorms[vr]
        d = _pair_dist(q, q_sq, g, gs, metric)
        d = jnp.where(fresh, d, INF)

        # merge candidates into beam: network-sort the candidate block,
        # then one bitonic merge sweep against the (sorted) beam —
        # replaces top_k over [B, ef+E*deg] (the round-2 hot spot)
        if net:
            cd, (ci, ce) = SN.sort_with_payloads(
                d, (nb_safe, jnp.where(fresh, False, True)))
            beam_d, (beam_i, expanded) = SN.merge_sorted_with_payloads(
                beam_d, (beam_i, expanded), cd, (ci, ce), out_width=ef)
        else:
            cat_d = jnp.concatenate([beam_d, d], axis=1)
            cat_i = jnp.concatenate([beam_i, nb_safe], axis=1)
            cat_e = jnp.concatenate(
                [expanded, jnp.where(fresh, False, True)], axis=1)
            if approx:
                beam_d, pos = jax.lax.approx_min_k(cat_d, ef)
            else:
                negv, pos = jax.lax.top_k(-cat_d, ef)
                beam_d = -negv
            beam_i = jnp.take_along_axis(cat_i, pos, axis=1)
            expanded = jnp.take_along_axis(cat_e, pos, axis=1)
        beam_i = jnp.where(beam_d < INF, beam_i, -1)
        if use_ring:
            # dedupe the beam: without the bitmap an id can enter twice
            # (same id => same distance => slots need not be adjacent
            # only under exact cross-id float ties, so compare all
            # pairs); kill the later copy
            dupb = ((beam_i[:, :, None] == beam_i[:, None, :])
                    & (beam_i[:, :, None] >= 0)
                    & jnp.tril(jnp.ones((ef, ef), bool), k=-1)[None]
                    ).any(2)
            beam_d = jnp.where(dupb, INF, beam_d)
            beam_i = jnp.where(dupb, -1, beam_i)
            expanded = expanded | dupb
        return beam_d, beam_i, expanded, visited, step + 1

    beam_d, beam_i, _, _, _ = jax.lax.while_loop(
        cond, body, (beam_d, beam_i, expanded, visited, jnp.int32(0)))
    if use_ring:
        # the post-merge dedupe leaves INF holes mid-beam; restore the
        # ascending contract with one final top_k
        negv, pos = jax.lax.top_k(-beam_d, ef)
        beam_d = -negv
        beam_i = jnp.take_along_axis(beam_i, pos, axis=1)
    # ascending from top_k of negated distances
    return beam_d, beam_i


@functools.partial(jax.jit, static_argnames=("metric", "cap"))
def _prune_closest(vvecs, cand, vecs, sqnorms, *, metric: str, cap: int):
    """Closest-``cap`` of candidates (the reference's prune policy,
    hnsw_am.c:2451-2533). vvecs [V, D] owners; cand [V, C] vector rows
    (-1 pad). Returns lists [V, cap] int32."""
    V, C = cand.shape
    ok = cand >= 0
    cs = jnp.maximum(cand, 0)
    g = vecs[cs]                                            # [V, C, D]
    gs = sqnorms[cs]
    v_sq = jnp.sum(vvecs * vvecs, axis=1)
    d = _pair_dist(vvecs, v_sq, g, gs, metric)
    d = jnp.where(ok, d, INF)
    k = min(cap, C)
    negv, pos = jax.lax.top_k(-d, k)
    lists = jnp.take_along_axis(cand, pos, axis=1)
    lists = jnp.where(-negv < INF, lists, -1)
    if k < cap:
        lists = jnp.pad(lists, ((0, 0), (0, cap - k)), constant_values=-1)
    return lists


@functools.partial(jax.jit, static_argnames=("metric", "cap"))
def _select_neighbors_heuristic(vvecs, cand, vecs, sqnorms, *,
                                metric: str, cap: int):
    """Diversity-pruned neighbor selection (Malkov & Yashunin Alg. 4),
    batched: accept candidate c (in ascending distance-to-owner order) iff
    d(c, owner) < d(c, a) for every already-accepted a; fill leftover slots
    with the closest rejected candidates (hnswlib keepPrunedConnections).

    The reference uses closest-only selection (hnsw_am.c:2398-2424), which
    collapses on clustered data; SURVEY.md §7 directs matching *standard*
    HNSW quality, so the heuristic is the default and closest-only is kept
    as an option. Returns lists [V, cap] int32 (-1 pad).
    """
    V, C = cand.shape
    ok = cand >= 0
    cs = jnp.maximum(cand, 0)
    g = vecs[cs]                                            # [V, C, D]
    gs = sqnorms[cs]
    v_sq = jnp.sum(vvecs * vvecs, axis=1)
    d_vc = jnp.where(ok, _pair_dist(vvecs, v_sq, g, gs, metric), INF)
    order = jnp.argsort(d_vc, axis=1)                       # ascending, inv last
    cand_s = jnp.take_along_axis(cand, order, axis=1)
    d_s = jnp.take_along_axis(d_vc, order, axis=1)
    ok_s = cand_s >= 0
    g_s = jnp.take_along_axis(g, order[:, :, None], axis=1)
    gs_s = jnp.take_along_axis(gs, order, axis=1)
    # pairwise candidate-candidate scores
    dots = jnp.einsum("vcd,ved->vce", g_s, g_s,
                      preferred_element_type=jnp.float32)
    if metric == "ip":
        d_cc = -dots
    else:
        d_cc = jnp.maximum(gs_s[:, :, None] + gs_s[:, None, :] - 2.0 * dots,
                           0.0)

    def body(i, acc):
        di = d_cc[:, i, :]                                  # [V, C]
        mmin = jnp.min(jnp.where(acc, di, INF), axis=1)
        cnt = jnp.sum(acc, axis=1)
        take = ok_s[:, i] & (cnt < cap) & ((d_s[:, i] < mmin) | (cnt == 0))
        return acc.at[:, i].set(take)

    acc = jax.lax.fori_loop(0, C, body, jnp.zeros((V, C), jnp.bool_))
    # order: accepted (by distance), then rejected (by distance), invalid last
    key = jnp.where(ok_s, (~acc).astype(jnp.int32) * C
                    + jax.lax.broadcasted_iota(jnp.int32, (V, C), 1),
                    2 * C + jax.lax.broadcasted_iota(jnp.int32, (V, C), 1))
    ord2 = jnp.argsort(key, axis=1)[:, :cap]
    lists = jnp.take_along_axis(cand_s, ord2, axis=1)
    if cap > C:
        lists = jnp.pad(lists, ((0, 0), (0, cap - C)), constant_values=-1)
    return lists


@functools.partial(jax.jit,
                   static_argnames=("m", "cap", "metric", "heuristic",
                                    "slab"),
                   donate_argnums=(0,))
def _link_level0_device(nbr0, rows, sel0, w_real, vecs, sqnorms, *, m: int,
                        cap: int, metric: str, heuristic: bool,
                        slab: int = 2048):
    """Whole level-0 link phase of one wave as ONE device program
    (round 1 ran this on the host with per-edge Python loops and several
    device round-trips per wave — the measured build bottleneck,
    IMPLEMENTATION_NOTES r1).

    1. write each new node's own selected-m list;
    2. group the W*m reverse edges by target with the sort/segment trick
       (same pattern as the IVF grouped kernel's probe grouping);
    3. re-prune every touched target's list to capacity with the same
       selection policy as the build, slab by slab;
    4. scatter the pruned lists back. ``nbr0`` is donated: XLA updates
       the [Ncap, 2M] adjacency in place.

    rows [W] global rows; sel0 [W, m] global rows (-1 pad). Rows at
    index >= w_real are wave padding (repeat-last): their own-list write
    is an identical duplicate (safe), but their reverse edges must be
    suppressed or the last real row's edges double.
    """
    W = rows.shape[0]
    ncap = nbr0.shape[0]
    row_ok = (jnp.arange(W, dtype=jnp.int32) < w_real)[:, None]
    # pad rows duplicate the last real row's GLOBAL row; their wave-search
    # selection contains that row itself (zero-distance intra-wave
    # candidate), so writing their own list would create a self-loop —
    # drop them from the scatter entirely
    own = jnp.full((W, cap), -1, jnp.int32).at[:, :m].set(sel0)
    rows_w = jnp.where(row_ok[:, 0], rows, ncap)
    nbr0 = nbr0.at[rows_w].set(own, mode="drop")

    G = W * m
    sent = jnp.int32(ncap)
    vflat = jnp.where(row_ok & (sel0 >= 0), sel0, -1).reshape(G)
    v = jnp.where(vflat >= 0, vflat, sent)
    u = jnp.repeat(rows, m)
    order = jnp.argsort(v, stable=True)
    sv = v[order]
    su = u[order]
    idx = jnp.arange(G, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sv[1:] != sv[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start
    gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    maxnew = 2 * cap
    tgt = jnp.full((G,), sent, jnp.int32).at[gid].set(
        sv, mode="drop")                               # group -> target
    su_m = jnp.where(sv < sent, su, -1)
    newmat = jnp.full((G, maxnew), -1, jnp.int32).at[gid, rank].set(
        su_m, mode="drop")                             # overflow dropped

    nslab = -(-G // slab)
    gpad = nslab * slab
    if gpad > G:
        tgt = jnp.pad(tgt, (0, gpad - G), constant_values=ncap)
        newmat = jnp.pad(newmat, ((0, gpad - G), (0, 0)),
                         constant_values=-1)

    def slab_step(carry, s):
        nb = carry
        tg = jax.lax.dynamic_slice(tgt, (s * slab,), (slab,))
        nm = jax.lax.dynamic_slice(newmat, (s * slab, 0), (slab, maxnew))
        tgs = jnp.minimum(tg, ncap - 1)
        existing = nb[tgs]                             # [S, cap]
        cand = jnp.concatenate([existing, nm], axis=1)
        # a target's own row must never enter its list (intra-wave edges
        # can propose it); dedup of existing-vs-new is unnecessary — the
        # prune keeps one copy ranked first and duplicates cost a slot
        # only in the rare both-directions case
        cand = jnp.where(cand == tg[:, None], -1, cand)
        vv = vecs[tgs].astype(jnp.float32)
        if heuristic:
            lists = _select_neighbors_heuristic(
                vv, cand, vecs, sqnorms, metric=metric, cap=cap)
        else:
            lists = _prune_closest(
                vv, cand, vecs, sqnorms, metric=metric, cap=cap)
        nb = nb.at[tg].set(lists, mode="drop")         # sentinel dropped
        return nb, None

    nbr0, _ = jax.lax.scan(slab_step, nbr0, jnp.arange(nslab))
    return nbr0


@functools.partial(jax.jit,
                   static_argnames=("m", "cap", "metric", "heuristic",
                                    "slab"),
                   donate_argnums=(0,))
def _bulk_reverse_link(nbr0, sel, vecs, sqnorms, *, m: int, cap: int,
                       metric: str, heuristic: bool, slab: int = 2048):
    """Bulk-build version of the reverse-link pass: ``sel`` [N, m] holds
    every node's pruned own list at once. Targets are dense (0..N-1), so
    the incoming-edge matrix is [N, maxnew] instead of per-edge rows.
    Writes own lists, groups the N*m reverse edges by target, and
    re-prunes every node's (own + incoming) candidates to ``cap``."""
    N = sel.shape[0]
    ncap = nbr0.shape[0]
    own = jnp.full((N, cap), -1, jnp.int32).at[:, :m].set(sel)
    nbr0 = nbr0.at[:N].set(own)

    G = N * m
    sent = jnp.int32(ncap)
    v = jnp.where(sel.reshape(G) >= 0, sel.reshape(G), sent)
    u = jnp.repeat(jnp.arange(N, dtype=jnp.int32), m)
    order = jnp.argsort(v, stable=True)
    sv = v[order]
    su = u[order]
    idx = jnp.arange(G, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sv[1:] != sv[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start
    maxnew = 2 * cap
    su_m = jnp.where(sv < sent, su, -1)
    tgt_safe = jnp.minimum(sv, N - 1)
    keep = (rank < maxnew) & (sv < sent)
    newmat = jnp.full((N, maxnew), -1, jnp.int32).at[
        jnp.where(keep, tgt_safe, N), jnp.where(keep, rank, 0)].set(
        su_m, mode="drop")

    nslab = -(-N // slab)

    def slab_step(carry, s):
        nb = carry
        start = s * slab
        rows = start + jnp.arange(slab, dtype=jnp.int32)
        rows_safe = jnp.minimum(rows, N - 1)
        existing = nb[rows_safe]
        nm = newmat[rows_safe]
        cand = jnp.concatenate([existing, nm], axis=1)
        cand = jnp.where(cand == rows_safe[:, None], -1, cand)
        vv = vecs[rows_safe].astype(jnp.float32)
        if heuristic:
            lists = _select_neighbors_heuristic(
                vv, cand, vecs, sqnorms, metric=metric, cap=cap)
        else:
            lists = _prune_closest(
                vv, cand, vecs, sqnorms, metric=metric, cap=cap)
        write_rows = jnp.where(rows < N, rows, ncap)
        nb = nb.at[write_rows].set(lists, mode="drop")
        return nb, None

    nbr0, _ = jax.lax.scan(slab_step, nbr0, jnp.arange(nslab))
    return nbr0


@functools.partial(jax.jit, static_argnames=("scan_w", "metric"))
def _bridge_near(mu, x, x_sq, lab_dense, *, scan_w: int, metric: str):
    """Per-component nearest OUTSIDE nodes for the bridge phase, on
    device: mu [Cp, D] component centroids (zero-padded rows), x [N, D],
    lab_dense [N] dense component label per node (padded mu rows carry
    label -2, matching nothing). Returns (d [Cp, scan_w],
    idx [Cp, scan_w]) ascending. Host numpy did this with a [C, N] GEMM
    + argpartition — 32 s + 13.5 s of the 250k build at C=512; one MXU
    GEMM + top_k is milliseconds."""
    Cp = mu.shape[0]
    if metric == "ip":
        d = -jnp.dot(mu, x.T, preferred_element_type=jnp.float32)
    else:
        d = x_sq[None, :] - 2.0 * jnp.dot(mu, x.T,
                                          preferred_element_type=jnp.float32)
    own = lab_dense[None, :] == jnp.arange(Cp, dtype=lab_dense.dtype)[:, None]
    d = jnp.where(own, INF, d)
    negv, idx = jax.lax.top_k(-d, scan_w)
    return -negv, idx


@functools.partial(jax.jit, static_argnames=("K",))
def _strip_selfhits(ids_all, *, K: int):
    """Bulk-build step 1.5 on device: drop each row's self-hit from its
    [N, K+1] kNN ids and left-pack to [N, K] (stable). The host numpy
    version (repeat/cumsum compaction) was ~10-40 s of the 250k build;
    one stable argsort on the VPU replaces it."""
    n, w = ids_all.shape
    rows = jnp.arange(n, dtype=ids_all.dtype)[:, None]
    stripped = jnp.where(ids_all == rows, -1, ids_all)
    # stable sort: valid entries first, original order preserved
    order = jnp.argsort((stripped < 0).astype(jnp.int32), axis=1,
                        stable=True)
    out = jnp.take_along_axis(stripped, order, axis=1)[:, :K]
    return out.astype(jnp.int32)


@jax.jit
def _component_labels(nbr):
    """Connected-component labels of the first N rows of an adjacency
    array, treating edges as undirected: min-label propagation (forward
    gather-min + reverse scatter-min) with FastSV-style path halving
    (lab = lab[lab] each round), so convergence is O(log diameter)
    rounds instead of O(diameter) — the scatter-min is ~0.45 s per round
    at 250k x 32 edges on this backend (18M updates/s scalar core), and
    plain propagation needed diameter-many of them (measured 156 s of a
    ~310 s 250k bulk build in the bridge phase)."""
    N = nbr.shape[0]
    rows = jnp.arange(N, dtype=jnp.int32)
    nb_safe = jnp.where(nbr >= 0, nbr, rows[:, None])
    nbr_flat = jnp.where(nbr >= 0, nbr, N).reshape(-1)   # N = dropped

    def cond(state):
        _, changed, it = state
        return changed & (it < 512)

    def body(state):
        lab, _, it = state
        fwd = jnp.minimum(lab, jnp.min(lab[nb_safe], axis=1))
        deg = nbr.shape[1]
        rev = fwd.at[nbr_flat].min(jnp.repeat(fwd, deg), mode="drop")
        # path halving: labels are always existing row ids, so lab[lab]
        # jumps to the label's own (smaller-or-equal) label; two hops
        # per round collapse chains geometrically
        rev = jnp.minimum(rev, rev[rev])
        rev = jnp.minimum(rev, rev[rev])
        return rev, jnp.any(rev != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (rows, jnp.bool_(True), jnp.int32(0)))
    return lab


@functools.partial(jax.jit,
                   static_argnames=("m", "heuristic", "metric", "slab"))
def _bulk_prune_own(cand, vecs, sqnorms, *, m: int, heuristic: bool,
                    metric: str, slab: int = 4096):
    """Prune each node's kNN candidate list [N, K] to its own m
    neighbors, slab by slab (bulk build step 2)."""
    N = cand.shape[0]

    def slab_step(_, s):
        rows = s * slab + jnp.arange(slab, dtype=jnp.int32)
        rows_safe = jnp.minimum(rows, N - 1)
        c = cand[rows_safe]
        c = jnp.where(c == rows_safe[:, None], -1, c)
        vv = vecs[rows_safe].astype(jnp.float32)
        if heuristic:
            lists = _select_neighbors_heuristic(
                vv, c, vecs, sqnorms, metric=metric, cap=m)
        else:
            lists = _prune_closest(vv, c, vecs, sqnorms, metric=metric,
                                   cap=m)
        return None, lists

    nslab = -(-N // slab)
    _, out = jax.lax.scan(slab_step, None, jnp.arange(nslab))
    return out.reshape(nslab * slab, m)[:N]


@functools.partial(jax.jit,
                   static_argnames=("m", "metric", "heuristic", "slab",
                                    "n_rand"))
def _nn_descent_round(nbr0, vecs, sqnorms, n_arr, rnd, *, m: int,
                      metric: str, heuristic: bool, slab: int = 2048,
                      n_rand: int = 16):
    """One NN-descent refinement round (bulk build): each node's
    candidates are its current neighbors, a per-round alternating-column
    sample of its neighbors' FULL 2m lists, and a few random long-range
    probes; a distance top-(4m) trim bounds the heuristic's pairwise
    cost, then the usual diversity prune picks the node's own m list.

    Round-2 sampled only each neighbor's first m columns — which, after
    _bulk_reverse_link, are exactly the node's own selected edges, so
    the join never saw REVERSE edges and graph 10-NN recall saturated at
    ~0.73 on uniform corpora (measured round 3). Classic NN-descent's
    local join needs both directions (a reverse neighbor's neighbors are
    candidates too); the alternating-phase stride-2 sample covers own
    and reverse halves across rounds at unchanged candidate width, and
    the random probes escape locally-optimal basins. ``rnd`` is the
    traced round counter (phase + random seed), so every round shares
    one compilation.

    Returns sel [Nslabbed, m] own lists for the reverse-link pass."""
    N = nbr0.shape[0]
    deg = nbr0.shape[1]

    def slab_step(_, s):
        rows = s * slab + jnp.arange(slab, dtype=jnp.int32)
        rows_safe = jnp.minimum(rows, N - 1)
        nb = nbr0[rows_safe]                                # [s, deg]
        nb_safe = jnp.maximum(nb, 0)
        nn2 = nbr0[nb_safe]                                 # [s, deg, deg]
        # stride-2 column sample with per-round phase: even rounds see
        # each neighbor's own-selected half, odd rounds its reverse half
        cols = (rnd % 2) + 2 * jnp.arange(deg // 2, dtype=jnp.int32)
        nb2 = jnp.take(nn2, cols, axis=2).reshape(slab, deg * (deg // 2))
        nb2 = jnp.where(jnp.repeat(nb >= 0, deg // 2, axis=1), nb2, -1)
        # long-range random candidates (fresh per round and per slab)
        rkey = jax.random.fold_in(jax.random.PRNGKey(7), rnd * 65536 + s)
        rand = jax.random.randint(rkey, (slab, n_rand), 0,
                                  jnp.maximum(n_arr, 1), dtype=jnp.int32)
        cand = jnp.concatenate([nb, nb2, rand], axis=1)
        cand = jnp.where(cand == rows_safe[:, None], -1, cand)
        # sort-dedup (duplicates would survive _prune_closest)
        order = jnp.argsort(jnp.where(cand >= 0, cand, jnp.int32(2**30)),
                            axis=1)
        cs = jnp.take_along_axis(cand, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((slab, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
        cand = jnp.where(dup, -1, cs)
        vv = vecs[rows_safe].astype(jnp.float32)
        # stage 1: distance top-(4m) trim
        trimmed = _prune_closest(vv, cand, vecs, sqnorms, metric=metric,
                                 cap=4 * m)
        if heuristic:
            lists = _select_neighbors_heuristic(
                vv, trimmed, vecs, sqnorms, metric=metric, cap=m)
        else:
            lists = trimmed[:, :m]
        # rows beyond n keep empty lists
        lists = jnp.where((rows < n_arr)[:, None], lists, -1)
        return None, lists

    nslab = -(-N // slab)
    _, out = jax.lax.scan(slab_step, None, jnp.arange(nslab))
    return out.reshape(nslab * slab, m)


@functools.partial(jax.jit,
                   static_argnames=("graph_top", "node_top", "efc", "m",
                                    "metric", "heuristic", "net"))
def _wave_search(rows, entry, vecs, sqnorms, nbr0, uppers, *,
                 graph_top: int, node_top: int, efc: int, m: int,
                 metric: str, heuristic: bool, net: bool = True):
    """The whole per-wave search phase as ONE program: greedy descent
    through the upper levels, intra-wave candidate mining, ef-bounded beam
    search per level, and diversity-heuristic neighbor selection.

    rows [W] global rows of the wave; uppers: tuple of (nbr, nodes, pos)
    per level. Returns (sel0 [W, m] global rows,
    {level: sel [W, m] local rows}).
    """
    W = rows.shape[0]
    q = vecs[rows].astype(jnp.float32)

    def select(cand_g):
        if not heuristic:
            return cand_g[:, :m]
        return _select_neighbors_heuristic(q, cand_g, vecs, sqnorms,
                                           metric=metric, cap=m)

    # descent from the entry through the upper levels
    cur_g = jnp.full((W,), entry, jnp.int32)
    per_level_entry = {}
    for l in range(graph_top, 0, -1):
        nbrU, nodesU, posU = uppers[l - 1]
        loc = jnp.maximum(posU[cur_g], 0)
        loc = _greedy_descent(q, loc, vecs, sqnorms, nbrU, nodesU,
                              metric=metric, max_steps=256)
        per_level_entry[l] = loc
        cur_g = nodesU[loc]
    entry0 = cur_g

    # intra-wave candidates: earlier wave members only (serial-insert
    # visibility order); wave members are invisible in the frozen graph
    within = None
    if W > 1:
        if metric == "ip":
            d_ww = -jnp.dot(q, q.T, preferred_element_type=jnp.float32)
        else:
            qs = jnp.sum(q * q, axis=1)
            d_ww = jnp.maximum(
                qs[:, None] + qs[None, :]
                - 2.0 * jnp.dot(q, q.T, preferred_element_type=jnp.float32),
                0.0)
        iu = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        d_ww = jnp.where(ju < iu, d_ww, INF)
        kw = min(m, W)
        _, wpos = jax.lax.top_k(-d_ww, kw)
        wvalid = jnp.take_along_axis(d_ww, wpos, axis=1) < INF
        within = jnp.where(wvalid, rows[wpos], -1)         # [W, kw] global

    sels = {}
    for l in range(min(node_top, graph_top), 0, -1):
        nbrU, nodesU, posU = uppers[l - 1]
        _, bi = _beam_search(
            q, per_level_entry[l], vecs, sqnorms, nbrU, nodesU, 0,
            metric=metric, ef=efc, max_steps=efc // 4 + 32,
            identity_map=False, expand=4, net=net)
        cand_g = jnp.where(bi >= 0, nodesU[jnp.maximum(bi, 0)], -1)
        if within is not None:
            # keep only wave members that exist at this level
            wloc_ok = posU[jnp.maximum(within, 0)] >= 0
            w_g = jnp.where((within >= 0) & wloc_ok, within, -1)
            cand_g = jnp.concatenate([cand_g, w_g], axis=1)
        sel_g = select(cand_g)
        sels[l] = jnp.where(sel_g >= 0, posU[jnp.maximum(sel_g, 0)], -1)

    _, bi0 = _beam_search(
        q, entry0, vecs, sqnorms, nbr0, jnp.zeros((1,), jnp.int32), 0,
        metric=metric, ef=efc, max_steps=efc // 4 + 32,
        identity_map=True, expand=4, net=net)
    cand0 = bi0 if within is None else jnp.concatenate([bi0, within], axis=1)
    sel0 = select(cand0)
    return sel0, sels


@functools.partial(jax.jit,
                   static_argnames=("metric", "ef", "max_steps", "expand",
                                    "topr", "net", "ring", "approx"))
def _query_search_routed(q, centroids, reps, vecs, sqnorms, nbr0, *,
                         metric: str, ef: int, max_steps: int,
                         expand: int, topr: int, net: bool = True,
                         ring: bool = False, approx: bool = False):
    """Query search with the centroid router (bulk-built indexes): one
    [B, C] GEMM picks the top-R coarse cells, their representative rows
    seed a multi-entry level-0 beam — no upper-level descent."""
    if metric == "ip":
        cd = -jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    else:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        cd = c_sq[None, :] - 2.0 * jnp.dot(
            q, centroids.T, preferred_element_type=jnp.float32)
    _, top = jax.lax.top_k(-cd, min(topr, centroids.shape[0]))
    entries = reps[top]                                   # [B, R]
    return _beam_search(
        q, entries, vecs, sqnorms, nbr0, jnp.zeros((1,), jnp.int32), 0,
        metric=metric, ef=ef, max_steps=max_steps, identity_map=True,
        expand=expand, net=net, ring=ring, approx=approx)


@functools.partial(jax.jit,
                   static_argnames=("graph_top", "ef", "max_steps",
                                    "metric", "expand", "net", "ring",
                                    "approx"))
def _query_search(q, entry, vecs, sqnorms, nbr0, uppers, *,
                  graph_top: int, ef: int, max_steps: int, metric: str,
                  expand: int, net: bool = True, ring: bool = False,
                  approx: bool = False):
    """Query-time search as one program: greedy descent through the upper
    levels + level-0 beam. One dispatch + one sync per sub-batch."""
    B = q.shape[0]
    cur = jnp.full((B,), entry, jnp.int32)
    for l in range(graph_top, 0, -1):
        nbrU, nodesU, posU = uppers[l - 1]
        loc = jnp.maximum(posU[cur], 0)
        loc = _greedy_descent(q, loc, vecs, sqnorms, nbrU, nodesU,
                              metric=metric, max_steps=256)
        cur = nodesU[loc]
    return _beam_search(
        q, cur, vecs, sqnorms, nbr0, jnp.zeros((1,), jnp.int32), 0,
        metric=metric, ef=ef, max_steps=max_steps, identity_map=True,
        expand=expand, net=net, ring=ring, approx=approx)


# ===========================================================================
# the index
# ===========================================================================

class HNSWIndex(BaseIndex):
    kind = "hnsw"

    def __init__(self, vectors=None, *, dim: Optional[int] = None,
                 m: Optional[int] = None, ef_construction: Optional[int] = None,
                 ef_search: Optional[int] = None, ml: Optional[float] = None,
                 metric: str = "l2", ids=None, seed: int = 0,
                 wave: Optional[int] = None, neighbor_heuristic: bool = True,
                 build_mode: str = "auto"):
        cfg = get_config()
        self._heuristic = neighbor_heuristic
        self.metric = D.canonical_metric(metric)
        self.m = int(m or cfg.hnsw_m)
        self.ef_construction = int(ef_construction or cfg.hnsw_ef_construction)
        self.ef_search = int(ef_search or cfg.hnsw_ef_search)
        self.ml = float(ml or cfg.hnsw_ml)
        self.max_level = cfg.hnsw_max_level
        self._wave = int(wave or cfg.hnsw_build_wave)
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._spherical = self.metric == "cosine"

        if vectors is None and dim is None:
            raise ValueError("need vectors or dim")
        x = None
        if vectors is not None:
            x = np.asarray(vectors, np.float32)
            dim = x.shape[1]
        self.dim = int(dim)
        self.n = 0
        self.entry: int = -1          # global row of entry point
        self.entry_level: int = -1
        self._ncap = 0
        self._ids_np = np.zeros((0,), np.int64)
        self._levels_np = np.zeros((0,), np.int32)
        self._alive_np = np.zeros((0,), bool)     # tombstones (delete)
        # device state (allocated by _ensure_capacity)
        self._vecs = None             # [Ncap, D] f32
        self._sqnorms = None          # [Ncap]
        self._nbr0 = None             # [Ncap, 2M]
        # upper levels: list indexed by level-1
        self._upper: List[Dict[str, Any]] = []
        self._router = None           # centroid router (bulk builds)
        self._build_mode = build_mode
        if x is not None and len(x):
            if build_mode == "bulk" or (build_mode == "auto"
                                        and len(x) >= 4096):
                self.build_bulk(x, ids=ids)
            else:
                self.add(x, ids=ids)

    # ---- capacity management ----
    def _ensure_capacity(self, need: int) -> None:
        if need <= self._ncap:
            return
        cap = max(1024, self._ncap or 1024)
        while cap < need:
            cap *= 2
        pad = cap - self._ncap
        if self._vecs is None:
            # bf16 vector storage on TPU halves the beam-search gather
            # traffic; sqnorms stay f32 (computed from the f32 source)
            store_dt = (jnp.bfloat16
                        if (jax.default_backend() == "tpu"
                            and get_config().store_dtype in ("auto",
                                                             "bfloat16"))
                        else jnp.float32)
            self._vecs = jnp.zeros((cap, self.dim), store_dt)
            self._sqnorms = jnp.zeros((cap,), jnp.float32)
            self._nbr0 = jnp.full((cap, 2 * self.m), -1, jnp.int32)
        else:
            self._vecs = jnp.pad(self._vecs, ((0, pad), (0, 0)))
            self._sqnorms = jnp.pad(self._sqnorms, (0, pad))
            self._nbr0 = jnp.pad(self._nbr0, ((0, pad), (0, 0)),
                                 constant_values=-1)
        for u in self._upper:
            u["pos"] = jnp.pad(u["pos"], (0, cap - u["pos"].shape[0]),
                               constant_values=-1)
        self._ncap = cap

    def _ensure_level(self, level: int) -> None:
        """Allocate upper-level structures up to ``level``."""
        while len(self._upper) < level:
            l = len(self._upper) + 1
            cap0 = 1024
            self._upper.append({
                "n": 0,
                "nodes": jnp.full((cap0,), -1, jnp.int32),     # local -> global
                "pos": jnp.full((max(self._ncap, 1),), -1, jnp.int32),
                "nbr": jnp.full((cap0, self.m), -1, jnp.int32),  # local rows
            })

    def _grow_upper(self, l: int, need: int) -> None:
        u = self._upper[l - 1]
        cap = u["nodes"].shape[0]
        if need <= cap:
            return
        new = cap
        while new < need:
            new *= 2
        u["nodes"] = jnp.pad(u["nodes"], (0, new - cap), constant_values=-1)
        u["nbr"] = jnp.pad(u["nbr"], ((0, new - cap), (0, 0)),
                           constant_values=-1)

    # ---- level assignment (hnsw_am.c:1143) ----
    def _draw_levels(self, count: int) -> np.ndarray:
        u = self._rng.random(count)
        lv = np.floor(-np.log(np.maximum(u, 1e-12)) * self.ml).astype(np.int32)
        return np.minimum(lv, self.max_level)

    # ---- bulk construction (TPU-first redesign, round 2) ----
    def build_bulk(self, vectors, ids=None, *, knn_k: Optional[int] = None,
                   nprobe: int = 16, bridges: int = 8,
                   refine: int = 1) -> np.ndarray:
        """Batch-build the whole graph from an IVF-bootstrapped kNN graph
        instead of lockstep insertion waves.

        The reference builds serially under an exclusive lock
        (hnsw_am.c:511-519); round 1's wave insertion batched that but
        stayed beam-search-bound (~3 s per 1024-node wave on this
        backend). This path is pure batch work on the MXU:
          1. IVF coarse index over the corpus, one batched kNN query
             per point -> candidate graph [N, K] (the engine's fastest
             primitive: ~100k QPS at 1M);
          2. diversity-prune each node's K candidates to its own m list
             (slab-scanned device program);
          3. one bulk reverse-link pass: group all N*m reverse edges by
             target, re-prune every node to 2m (same selection policy as
             the incremental path);
          4. upper levels: exact in-subset kNN (subsets shrink by
             e^(-1/ml) per level) + the same prune/link machinery in
             local coordinates;
        Quality is validated against the incremental builder in
        tests/test_hnsw_bulk.py (matching recall at equal ef).
        """
        x = np.asarray(vectors, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        if self.n:
            return self.add(x, ids=ids)      # bulk is build-time only
        if self._spherical:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-30)
        n = x.shape[0]
        new_ids = (np.asarray(ids, np.int64) if ids is not None
                   else np.arange(n, dtype=np.int64))
        levels = self._draw_levels(n)
        K = int(knn_k or max(2 * self.m, 32))

        self._ensure_capacity(n)
        xj = jnp.asarray(x)
        self._vecs = self._vecs.at[:n].set(xj.astype(self._vecs.dtype))
        self._sqnorms = self._sqnorms.at[:n].set(jnp.sum(xj * xj, axis=1))
        self._ids_np = new_ids.copy()
        self._levels_np = levels
        self._alive_np = np.ones(n, bool)
        self.n = n

        mark = _phase_timer()
        # (1) candidate kNN graph via IVF (exact for small corpora).
        # xj rides along: the corpus is already on device, and the IVF
        # bootstrap re-uploading it (sample + full corpus) was 200+ s
        # of the 1M build on a degraded-h2d tunnel slot (r5 profile)
        cand = self._bulk_knn_graph(x, K, nprobe, xdev=xj)
        if mark:
            mark("knn_graph", cand if isinstance(cand, jax.Array) else None)

        # (2) own lists + (3) bulk reverse link at level 0
        sel = _bulk_prune_own(jnp.asarray(cand), self._vecs,
                              self._sqnorms, m=self.m,
                              heuristic=self._heuristic,
                              metric=self._imetric)
        if mark:
            mark("prune_own", sel)
        self._nbr0 = _bulk_reverse_link(
            self._nbr0, sel, self._vecs, self._sqnorms, m=self.m,
            cap=2 * self.m, metric=self._imetric,
            heuristic=self._heuristic)
        if mark:
            mark("reverse_link", self._nbr0)
        # NN-descent refinement: neighbors-of-neighbors candidates,
        # re-prune, re-link (uniform-random corpora gain most — the IVF
        # bootstrap's candidates are probe-local)
        for r in range(max(0, refine)):
            sel_r = _nn_descent_round(
                self._nbr0, self._vecs, self._sqnorms, jnp.int32(n),
                jnp.int32(r), m=self.m, metric=self._imetric,
                heuristic=self._heuristic)[:n]
            if mark:
                mark(f"nn_descent[{r}]", sel_r)
            self._nbr0 = _bulk_reverse_link(
                jnp.full_like(self._nbr0, -1), sel_r, self._vecs,
                self._sqnorms, m=self.m, cap=2 * self.m,
                metric=self._imetric, heuristic=self._heuristic)
            if mark:
                mark(f"reverse_link[{r}]", self._nbr0)
        # bridge disconnected components (clustered corpora: the kNN
        # graph has no cross-cluster edges)
        nbr_host = np.array(self._nbr0[:n])
        bridged = self._connect_components(nbr_host, x, self._imetric,
                                           bridges=bridges)
        if not np.array_equal(bridged, nbr_host):
            self._nbr0 = self._nbr0.at[:n].set(jnp.asarray(bridged))
        if mark:
            mark("bridge_components", self._nbr0)

        # (4) upper levels in local coordinates
        top = int(levels.max()) if n else 0
        self._ensure_level(top)
        for l in range(1, top + 1):
            members = np.where(levels >= l)[0].astype(np.int32)
            u = self._upper[l - 1]
            S = len(members)
            self._grow_upper(l, S)
            loc = np.arange(S, dtype=np.int32)
            u["nodes"] = u["nodes"].at[loc].set(jnp.asarray(members))
            u["pos"] = u["pos"].at[jnp.asarray(members)].set(
                jnp.asarray(loc))
            u["n"] = S
            if S <= 1:
                continue
            # pow2-pad the level to its capacity P so every level (and
            # every corpus) shares the same compiled shapes: unpadded,
            # each tiny level cost ~6 s of fresh tunnel compiles
            # (measured S=66 and S=8 at 6.8/6.5 s each, 250k profile)
            P = u["nbr"].shape[0]
            xs_np = np.zeros((P, x.shape[1]), np.float32)
            xs_np[:S] = x[members]
            xs = jnp.asarray(xs_np)
            sq = jnp.sum(xs * xs, axis=1)
            kk = self.m + 8
            validS = jnp.arange(P, dtype=jnp.int32) < S
            # recall_target routes the per-chunk top-k to the TPU
            # PartialReduce (finding 12: 5.3x over XLA TopK at wide
            # shapes — level-1 at 1M is a [65536, 16384]-chunk top-k).
            # Upper graphs are heuristic routing structures (pruned and
            # reverse-linked below); a 0.99-recall neighbor pool is the
            # same class of approximation as the NN-descent level 0.
            # Gated by config.hnsw_build_rt (1.0 restores the exact,
            # deterministic build) like every other approx knob.
            _, nn_loc = TK.chunked_knn(
                xs, xs, kk + 1, metric="ip" if self._imetric == "ip"
                else "l2", chunk=min(P, 16384), valid=validS,
                recall_target=get_config().hnsw_build_rt)
            sel_l = _bulk_prune_own(
                _strip_selfhits(nn_loc.astype(jnp.int32), K=kk), xs, sq,
                m=self.m, heuristic=self._heuristic, metric=self._imetric)
            sel_l = jnp.where(validS[:, None], sel_l, -1)   # pad rows
            nbr_l = jnp.full((P, self.m), -1, jnp.int32)
            nbr_l = _bulk_reverse_link(
                nbr_l, sel_l, xs, sq, m=self.m, cap=self.m,
                metric=self._imetric, heuristic=self._heuristic)
            nbr_host = np.array(nbr_l[:S])
            bridged = self._connect_components(nbr_host, x[members],
                                               self._imetric)
            if not np.array_equal(bridged, nbr_host):
                nbr_l = nbr_l.at[:S].set(jnp.asarray(bridged))
            u["nbr"] = nbr_l
            if mark:
                mark(f"  level[{l}] S={S}")

        if mark:
            mark("upper_levels")
        best = int(levels.argmax()) if n else -1
        self.entry = best
        self.entry_level = int(levels[best]) if n else -1
        return new_ids

    def _set_router(self, centroids: np.ndarray, reps: np.ndarray) -> None:
        """Centroid router: the bulk build replaces greedy upper-level
        descent with one [B, C] centroid GEMM whose top-R members seed a
        multi-entry level-0 beam. Diagnosis behind this (round 2): on a
        512-cluster corpus the bulk hierarchy whole-missed ~7% of queries
        (self-recall 0.80) because the upper kNN graphs lack incremental
        insertion's organic long-range links; a coarse-quantizer entry is
        the TPU-idiomatic router and reuses the build's own IVF."""
        self._router = {"centroids": jnp.asarray(centroids, jnp.float32),
                        "reps": jnp.asarray(reps.astype(np.int32))}

    @staticmethod
    def _connect_components(nbr: np.ndarray, x: np.ndarray,
                            metric: str, bridges: int = 3) -> np.ndarray:
        """Bridge disconnected components of a bulk-built graph: the kNN
        graph of well-separated clusters has no cross-cluster edges (the
        incremental build gets them for free from early inserts). Per
        round, every non-largest component gets ``bridges`` bidirectional
        edges to its nearest outside nodes; iterate until connected.
        nbr [N, deg] (numpy, modified copy returned); x [N, D]."""
        import jax.numpy as jnp_
        mark = _phase_timer()
        nbr = nbr.copy()
        n = x.shape[0]
        x_sq = (x * x).sum(1)

        def labels_host(nb):
            # small graphs: numpy min-propagation with path halving —
            # the device while_loop would compile per exact shape
            # (~4 s each through the tunnel for the tiny upper levels)
            lab = np.arange(nb.shape[0])
            ok = nb >= 0
            u = np.repeat(np.arange(nb.shape[0]), nb.shape[1])[ok.ravel()]
            v = nb.ravel()[ok.ravel()]
            nb_safe = np.where(ok, nb, np.arange(nb.shape[0])[:, None])
            for _ in range(512):
                fwd = np.minimum(lab, lab[nb_safe].min(1))
                np.minimum.at(fwd, v, fwd[u])
                fwd = np.minimum(fwd, fwd[fwd])
                fwd = np.minimum(fwd, fwd[fwd])
                if np.array_equal(fwd, lab):
                    break
                lab = fwd
            return lab

        lab = None
        for rnd_ in range(32):
            if lab is None:
                # full label propagation ONCE; later rounds only ADD
                # edges, so connectivity updates are exactly the unions
                # of the added bridges (host union-find, microseconds —
                # a device label pass is ~25 s/round at 1M)
                if n <= 8192:
                    lab = labels_host(nbr)
                else:
                    # native linear union-find (~0.4 s at 1M x 32) when
                    # libndbnative is present; device min-label
                    # propagation (~25 s at 1M — scatter-min on the
                    # scalar core) as the fallback
                    from neurondb_tpu import native as _nat
                    lab = _nat.graph_components(nbr)
                    if lab is None:
                        lab = np.asarray(
                            _component_labels(jnp_.asarray(nbr)))
            if mark:
                mark(f"  bridge.labels[{rnd_}]")
            comps, lab_dense = np.unique(lab, return_inverse=True)
            C = len(comps)
            if C <= 1:
                break
            counts = np.bincount(lab_dense)
            main = int(np.argmax(counts))
            # all component centroids in one pass, all outside-distance
            # rows in one GEMM (the per-component scans were the bulk of
            # 1M build time)
            mu = np.zeros((C, x.shape[1]), np.float32)
            np.add.at(mu, lab_dense, x)
            mu /= counts[:, None]
            # per component: nearest outside nodes of DISTINCT other
            # components (bridging toward only one neighbor cluster
            # leaves greedy descent stuck between far clusters)
            scan_w = min(max(1000, 64 * bridges), n - 1)
            if C * n >= (1 << 24):
                # device path: [C, N] GEMM + top_k on the MXU (the host
                # numpy version was 32 s GEMM + 13.5 s argpartition at
                # C=512, N=250k). C pads to pow2 and scan_w to a pow2
                # bucket so rounds share compilations.
                Cp = 1 << max(4, int(C - 1).bit_length())
                sw = min(1 << int(scan_w - 1).bit_length(), n - 1)
                mu_p = np.zeros((Cp, x.shape[1]), np.float32)
                mu_p[:C] = mu
                dn, near = _bridge_near(
                    jnp_.asarray(mu_p), jnp_.asarray(x),
                    jnp_.asarray(x_sq),
                    jnp_.asarray(lab_dense.astype(np.int32)),
                    scan_w=sw,
                    metric="ip" if metric == "ip" else "l2")
                near = np.asarray(near[:C])       # ascending already
                d_near = np.asarray(dn[:C])
            else:
                if metric == "ip":
                    d_all = -(mu @ x.T)                       # [C, N]
                else:
                    d_all = x_sq[None, :] - 2.0 * (mu @ x.T)
                d_all[lab_dense[None, :] ==
                      np.arange(C)[:, None]] = np.inf         # own comp
                near = np.argpartition(d_all, scan_w - 1,
                                       axis=1)[:, :scan_w]
                ordr = np.take_along_axis(
                    d_all, near, axis=1).argsort(axis=1, kind="stable")
                near = np.take_along_axis(near, ordr, axis=1)
                d_near = np.take_along_axis(d_all, near, axis=1)
            if mark:
                mark(f"  bridge.near[{rnd_}] C={C}")
            uf = np.arange(C)

            def find(c):
                while uf[c] != c:
                    uf[c] = uf[uf[c]]
                    c = uf[c]
                return c

            for ci in range(C):
                if ci == main:
                    continue
                cand = near[ci]
                outs = []
                seen_lab = set()
                for j, b in enumerate(cand):
                    if not np.isfinite(d_near[ci, j]) or \
                            d_near[ci, j] >= INF_NP:
                        break
                    lb = lab_dense[b]
                    if lb in seen_lab:
                        continue
                    seen_lab.add(lb)
                    outs.append(int(b))
                    if len(outs) >= bridges:
                        break
                if not outs:
                    continue
                mem = np.where(lab_dense == ci)[0]
                xb = x[outs]                              # [nb, D]
                if metric == "ip":
                    d_in = -(x[mem] @ xb.T)               # [M, nb]
                else:
                    d_in = x_sq[mem][:, None] - 2.0 * (x[mem] @ xb.T)
                a_rows = mem[np.argmin(d_in, axis=0)]
                for a, b in zip(a_rows, outs):
                    ra, rb = find(ci), find(int(lab_dense[b]))
                    if ra != rb:
                        uf[max(ra, rb)] = min(ra, rb)
                    for src, dst in ((int(a), int(b)), (int(b), int(a))):
                        row = nbr[src]
                        if dst in row:
                            continue
                        free = np.where(row < 0)[0]
                        slot = free[0] if len(free) else len(row) - 1
                        nbr[src, slot] = dst
            # fold the unions back into per-node labels for the next
            # round (exact: added edges are the only connectivity change)
            roots = np.array([find(c) for c in range(C)])
            lab = comps[roots][lab_dense]
            if mark:
                mark(f"  bridge.link[{rnd_}]")
        return nbr

    def _bulk_knn_graph(self, x: np.ndarray, K: int, nprobe: int,
                        xdev: Optional[jax.Array] = None) -> np.ndarray:
        """[N, K] candidate rows per node (self stripped). ``xdev``: the
        same corpus already device-resident (f32, pre-normalized) — the
        IVF bootstrap and self-queries then run upload-free."""
        n = x.shape[0]
        metric = "ip" if self._imetric == "ip" else "l2"
        if n <= 20000:                      # exact is cheap enough
            ids_all = np.empty((n, K + 1), np.int64)
            xj = jnp.asarray(x) if xdev is None else xdev
            step = 4096
            for s in range(0, n, step):
                e = min(s + step, n)
                qb = xj[s:e]
                if e - s < step:
                    qb = jnp.concatenate(
                        [qb, jnp.repeat(qb[-1:], step - (e - s), axis=0)])
                _, ids_b = TK.chunked_knn(qb, xj, min(K + 1, n),
                                          metric=metric,
                                          chunk=min(n, 65536))
                got = np.asarray(ids_b)[: e - s]
                if got.shape[1] < K + 1:
                    got = np.pad(got, ((0, 0), (0, K + 1 - got.shape[1])),
                                 constant_values=-1)
                ids_all[s:e] = got
            # router centroids: a k-means over the corpus (small)
            from neurondb_tpu.ml.kmeans import kmeans_fit, kmeans_predict
            ncl = max(8, min(256, n // 64))
            st = kmeans_fit(jnp.asarray(x), ncl, max_iter=10,
                            seed=self._seed)
            cents = np.asarray(st.centroids)
            lab = np.asarray(kmeans_predict(st.centroids, jnp.asarray(x)))
            reps = np.zeros(ncl, np.int64)
            for c in range(ncl):
                mem = np.where(lab == c)[0]
                reps[c] = mem[0] if len(mem) else 0
            self._set_router(cents, reps)
        else:
            from neurondb_tpu.index.ivf import IVFFlatIndex
            mark = _phase_timer()
            nlists = max(64, min(4096, int(2 * np.sqrt(n))))
            # bootstrap quantizer only: the candidate graph tolerates a
            # coarse k-means (NN-descent + the reverse-link prune repair
            # it), so cap iterations and the kmeans++ sample — the
            # default-quality build was 53-293 s of the 1M build
            # depending on slot, ~5x the rest of the phase
            ivf = IVFFlatIndex(x, nlists=nlists, metric=metric,
                               seed=self._seed, kmeans_iters=10,
                               sample_cap=131072, device_vectors=xdev)
            if mark:
                mark("  knn.ivf_build", ivf._vecs)
            batch = 16384
            # dispatch every sub-batch before the first use (each host
            # sync costs ~29 ms of tunnel latency and serializes the
            # device; serving-style pipelining is the same trick as the
            # IVF headline bench). Results stay ON DEVICE: the self-hit
            # strip is a jit and the consumer (_bulk_prune_own) is
            # device-side too, so the [N, K] graph never round-trips.
            outs = []
            for s in range(0, n, batch):
                e = min(s + batch, n)
                if xdev is not None:
                    # device slice: no per-batch 8 MB query upload. The
                    # last partial batch slides its window back to keep
                    # the compiled shape, then drops the overlap rows so
                    # block i always holds results for rows [s, e).
                    start = s if e - s == batch else max(0, n - batch)
                    qb = jax.lax.dynamic_slice_in_dim(
                        xdev, start, min(batch, n), axis=0)
                    res = ivf.search(qb, k=K + 1, nprobe=nprobe,
                                     out="device")[1]
                    if start != s:
                        res = res[s - start:]
                    outs.append(res)
                    continue
                qb = x[s:e]
                if e - s < batch:
                    qb = np.concatenate(
                        [qb, np.repeat(qb[-1:], batch - (e - s), axis=0)])
                outs.append(ivf.search(qb, k=K + 1, nprobe=nprobe,
                                       out="device")[1])
            allj = (jnp.concatenate(outs)[:n] if len(outs) > 1
                    else outs[0][:n])
            cand_dev = _strip_selfhits(allj, K=K)
            if mark:
                mark("  knn.self_queries", cand_dev)
            # router from the build's own coarse quantizer: one member
            # row per non-empty list
            offs = np.asarray(ivf._offsets)
            cnts = np.asarray(ivf._counts)
            rows_dev = np.asarray(ivf._row_ids)
            live = cnts > 0
            reps = rows_dev[offs[live]].astype(np.int64)
            self._set_router(np.asarray(ivf.centroids)[live], reps)
            return cand_dev
        rows = np.arange(n)[:, None]
        stripped = np.where(ids_all == rows, -1, ids_all)
        # compact the self-hit out so every row keeps K candidates
        out = np.full((n, K), -1, np.int32)
        for_r = stripped >= 0
        counts = for_r.sum(1)
        flat = stripped[for_r]
        idxs = np.repeat(np.arange(n), counts)
        # rank within row, vectorized (a [np.arange(c) for c in counts]
        # comprehension is O(n) interpreter work on the 1M build path)
        pos_in_row = (np.arange(counts.sum())
                      - np.repeat(np.cumsum(counts) - counts, counts)) \
            if n else np.zeros(0, np.int64)
        keep = pos_in_row < K
        out[idxs[keep], pos_in_row[keep]] = flat[keep]
        return out

    # ---- insertion ----
    def add(self, vectors, ids=None) -> np.ndarray:
        x = np.asarray(vectors, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        if self._spherical:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        m = x.shape[0]
        start_id = int(self._ids_np.max()) + 1 if len(self._ids_np) else 0
        new_ids = (np.asarray(ids, np.int64) if ids is not None
                   else np.arange(start_id, start_id + m, dtype=np.int64))
        # Internal insertion order is shuffled: waves of correlated input
        # (e.g. one cluster arriving contiguously) would otherwise land in
        # a single wave and never interlink. External ids are unaffected.
        perm = self._rng.permutation(m)
        x = x[perm]
        ret_ids = new_ids.copy()
        new_ids = new_ids[perm]
        levels = self._draw_levels(m)

        self._ensure_capacity(self.n + m)
        rows = np.arange(self.n, self.n + m, dtype=np.int32)
        xj = jnp.asarray(x)
        self._vecs = self._vecs.at[self.n:self.n + m].set(xj.astype(self._vecs.dtype))
        self._sqnorms = self._sqnorms.at[self.n:self.n + m].set(
            jnp.sum(xj * xj, axis=1))
        self._ids_np = np.concatenate([self._ids_np, new_ids])
        self._levels_np = np.concatenate([self._levels_np, levels])
        self._alive_np = np.concatenate([self._alive_np, np.ones(m, bool)])
        self.n += m

        # register upper-level membership
        top = int(levels.max()) if m else 0
        self._ensure_level(max(top, 0))
        upper_rows = {}
        for l in range(1, top + 1):
            members = rows[levels >= l]
            if len(members) == 0:
                continue
            u = self._upper[l - 1]
            self._grow_upper(l, u["n"] + len(members))
            loc = np.arange(u["n"], u["n"] + len(members), dtype=np.int32)
            u["nodes"] = u["nodes"].at[loc].set(jnp.asarray(members))
            u["pos"] = u["pos"].at[jnp.asarray(members)].set(jnp.asarray(loc))
            u["n"] += len(members)
            upper_rows[l] = dict(zip(members.tolist(), loc.tolist()))

        # bootstrap: first ever node becomes the entry point
        offset = 0
        if self.entry < 0:
            self.entry = int(rows[0])
            self.entry_level = int(levels[0])
            offset = 1
        # Wave insertion with geometric growth: a wave never exceeds the
        # number of already-linked nodes, so the candidate pool a wave
        # searches is at least half of the final graph at its insertion
        # point. (A fixed large wave against a tiny seed graph degenerates
        # into a star: wave-1 nodes all link only to the seed and most of
        # the corpus becomes unreachable.) Entry promotion runs between
        # waves so later waves see the tallest routing tower so far.
        # Wave sizes are powers of two so the per-wave jitted kernels see a
        # bounded set of shapes: first compile on this backend costs tens of
        # seconds, so shape churn would dominate the build. A remainder is
        # split into already-seen power-of-two chunks.
        linked = self.n - m + offset
        s = offset
        while s < m:
            w = max(16, min(self._wave, linked))
            w = 1 << (w.bit_length() - 1)                 # floor pow2
            remaining = m - s
            if remaining < w:
                w = min(w, 1 << max(remaining.bit_length() - 1, 4))
                w = min(w, remaining)
            e = s + w
            self._insert_wave(rows[s:e], levels[s:e], upper_rows)
            linked += e - s
            wbest = int(levels[s:e].argmax())
            if int(levels[s:e][wbest]) > self.entry_level:
                self.entry = int(rows[s:e][wbest])
                self.entry_level = int(levels[s:e][wbest])
            s = e
        return ret_ids

    def _insert_wave(self, rows: np.ndarray, levels: np.ndarray,
                     upper_rows: Dict[int, Dict[int, int]]) -> None:
        W_real = len(rows)
        if W_real == 0:
            return
        # Pad every wave to one fixed compile shape: first compilation on
        # this backend costs tens of seconds per kernel, so per-wave shape
        # churn (the geometric growth ladder) would dominate build time.
        # Pad rows repeat the last real row; their search results are
        # discarded before linking.
        W = max(16, self._wave)
        if W_real < W:
            rows = np.concatenate(
                [rows, np.full(W - W_real, rows[-1], rows.dtype)])
            levels = np.concatenate(
                [levels, np.zeros(W - W_real, levels.dtype)])
        efc = self.ef_construction
        node_top = int(levels.max())
        graph_top = self.entry_level

        # One fused jit for the whole search phase: per-wave eager
        # dispatches and host syncs dominate wave time on this backend
        # (each roundtrip costs tens of ms), so descent + intra-wave
        # candidates + all beam searches + neighbor selection run as a
        # single program with one device->host sync at the end.
        uppers = tuple((u["nbr"], u["nodes"], u["pos"])
                       for u in self._upper)
        sel0_j, sels_j = _wave_search(
            jnp.asarray(rows), jnp.int32(self.entry), self._vecs,
            self._sqnorms, self._nbr0, uppers,
            graph_top=graph_top, node_top=node_top, efc=efc, m=self.m,
            metric=self._imetric, heuristic=self._heuristic,
            net=_use_network())
        # --- level-0 links: one fused device program, adjacency donated
        # (round 1 did this host-side with several round-trips per wave —
        # the measured build bottleneck) ---
        self._nbr0 = _link_level0_device(
            self._nbr0, jnp.asarray(rows), sel0_j, jnp.int32(W_real),
            self._vecs, self._sqnorms, m=self.m, cap=2 * self.m,
            metric=self._imetric, heuristic=self._heuristic)

        # --- upper levels (few nodes; host path) ---
        if sels_j:
            rows_r, levels_r = rows[:W_real], levels[:W_real]
            for l, sj in sels_j.items():
                sel = np.array(sj)
                sel[~(levels >= l)] = -1
                self._link_upper(l, rows_r, levels_r, sel[:W_real],
                                 upper_rows[l])

    def _select(self, q: jax.Array, beam_rows: jax.Array, cap: int,
                upper: Optional[Dict[str, Any]] = None) -> jax.Array:
        """Pick ``cap`` neighbors from beam candidates: diversity heuristic
        by default, closest-only (reference policy) when disabled."""
        if not self._heuristic:
            return beam_rows[:, :cap]
        cand = beam_rows
        if upper is not None:
            cand_g = jnp.where(cand >= 0,
                               upper["nodes"][jnp.maximum(cand, 0)], -1)
        else:
            cand_g = cand
        lists_g = _select_neighbors_heuristic(
            q, cand_g, self._vecs, self._sqnorms,
            metric=self._imetric, cap=cap)
        if upper is not None:
            return jnp.where(lists_g >= 0,
                             upper["pos"][jnp.maximum(lists_g, 0)], -1)
        return lists_g

    def _link_upper(self, l: int, rows: np.ndarray, levels: np.ndarray,
                    sel: np.ndarray, local_of: Dict[int, int]) -> None:
        u = self._upper[l - 1]
        mask = levels >= l
        wrows = rows[mask]
        wsel = sel[mask]
        if len(wrows) == 0:
            return
        wloc = np.asarray([local_of[int(r)] for r in wrows], np.int32)
        own = np.full((len(wloc), self.m), -1, np.int32)
        own[:, : self.m] = wsel[:, : self.m]
        # pad the scatter up a power-of-4 ladder (repeat-last; duplicate
        # rows write identical values) to bound recompiles
        vp = 16
        while vp < len(wloc):
            vp *= 4
        pad = vp - len(wloc)
        if pad:
            wloc_p = np.concatenate([wloc, np.full(pad, wloc[-1], np.int32)])
            own_p = np.concatenate([own, np.repeat(own[-1:], pad, axis=0)])
        else:
            wloc_p, own_p = wloc, own
        u["nbr"] = u["nbr"].at[jnp.asarray(wloc_p)].set(jnp.asarray(own_p))
        self._apply_reverse(wloc, wsel, level=l)

    def _apply_reverse(self, src_rows: np.ndarray, sel: np.ndarray,
                       level: int) -> None:
        """Group reverse edges by target and re-prune each touched list to
        closest-capacity. src/sel are local rows at ``level``."""
        cap = 2 * self.m if level == 0 else self.m
        edges_v: List[int] = []
        edges_u: List[int] = []
        for i, r in enumerate(src_rows):
            for v in sel[i]:
                if v >= 0:
                    edges_v.append(int(v))
                    edges_u.append(int(r))
        if not edges_v:
            return
        ev = np.asarray(edges_v, np.int64)
        eu = np.asarray(edges_u, np.int64)
        order = np.argsort(ev, kind="stable")
        ev, eu = ev[order], eu[order]
        uniq, starts = np.unique(ev, return_index=True)
        groups = np.split(eu, starts[1:])
        # Shape stability: a fresh XLA compile costs tens of seconds on this
        # backend, so the prune kernel must see a tiny set of shapes. New-
        # edge columns are FIXED at 2*cap (groups beyond that drop the
        # overflow — such targets already have full lists and the heuristic
        # would prune most of the surplus anyway); the target-row count is
        # padded up a power-of-4 ladder. Padded rows repeat the last real
        # target; the duplicate scatter writes identical values.
        maxnew = 2 * cap
        vreal = len(uniq)
        vpad = 256
        while vpad < vreal:
            vpad *= 4
        newmat = np.full((vpad, maxnew), -1, np.int32)
        for i, g in enumerate(groups):
            newmat[i, : min(len(g), maxnew)] = g[:maxnew]
        if vpad > vreal:
            newmat[vreal:] = newmat[vreal - 1]
            uniq = np.concatenate(
                [uniq, np.full(vpad - vreal, uniq[-1], uniq.dtype)])

        nbr = self._nbr0 if level == 0 else self._upper[level - 1]["nbr"]
        uq = jnp.asarray(uniq.astype(np.int32))
        existing = nbr[uq]                                     # [V, cap]
        cand = jnp.concatenate([existing, jnp.asarray(newmat)], axis=1)
        if level == 0:
            vvecs = self._vecs[uq].astype(jnp.float32)
            cand_g = cand
        else:
            u = self._upper[level - 1]
            vvecs = self._vecs[u["nodes"][uq]].astype(jnp.float32)
            cand_g = jnp.where(cand >= 0,
                               u["nodes"][jnp.maximum(cand, 0)], -1)
        # bound the heuristic's O(C^2) pairwise block for hub targets
        if cand_g.shape[1] > 6 * cap:
            cand_g = _prune_closest(vvecs, cand_g, self._vecs, self._sqnorms,
                                    metric=self._imetric, cap=6 * cap)
        if self._heuristic:
            lists_g = _select_neighbors_heuristic(
                vvecs, cand_g, self._vecs, self._sqnorms,
                metric=self._imetric, cap=cap)
        else:
            lists_g = _prune_closest(vvecs, cand_g, self._vecs, self._sqnorms,
                                     metric=self._imetric, cap=cap)
        if level == 0:
            self._nbr0 = self._nbr0.at[uq].set(lists_g)
        else:
            u = self._upper[level - 1]
            lists = jnp.where(lists_g >= 0,
                              u["pos"][jnp.maximum(lists_g, 0)], -1)
            u["nbr"] = u["nbr"].at[uq].set(lists)

    @property
    def _imetric(self) -> str:
        # internal metric: cosine runs on the unit sphere as squared L2
        return "ip" if self.metric == "ip" else "sqeuclidean"

    # ---- delete / vacuum (hnsw_am.c:544-733 bulkdelete role) ----
    def delete(self, ids) -> int:
        """Tombstone delete: deleted nodes stay traversable (preserving
        graph connectivity and survivor recall — a deliberate divergence
        from the reference's immediate back-link removal) but are masked
        out of every result. ``compact()`` / DefragWorker later removes
        them physically with back-link repair. Returns #removed."""
        drop = np.unique(np.atleast_1d(np.asarray(ids, np.int64)))
        mask = np.isin(self._ids_np, drop) & self._alive_np
        hit = int(mask.sum())
        if hit == 0:
            return 0
        self._alive_np[mask] = False
        if self.entry >= 0 and not self._alive_np[self.entry]:
            self._promote_entry()
        return hit

    def _promote_entry(self) -> None:
        alive_rows = np.where(self._alive_np)[0]
        if len(alive_rows) == 0:
            self.entry, self.entry_level = -1, -1
            return
        best = alive_rows[np.argmax(self._levels_np[alive_rows])]
        self.entry = int(best)
        self.entry_level = int(self._levels_np[best])

    @property
    def dead_ratio(self) -> float:
        return (1.0 - float(self._alive_np.sum()) / self.n) if self.n \
            else 0.0

    def compact(self) -> int:
        """Physically remove tombstoned nodes: repair every touched
        neighbor list by splicing in the dead neighbor's alive neighbors
        (back-link repair, pruned to capacity), then renumber rows. The
        reference's neurandefrag/bulkdelete analog. Returns #removed."""
        dead = ~self._alive_np
        ndead = int(dead.sum())
        if ndead == 0:
            return 0
        n = self.n
        alive_rows = np.where(~dead)[0]
        nbr0 = np.array(self._nbr0[:n])                    # host copy
        vec_np = np.asarray(self._vecs[:n], np.float32)
        # --- level-0 repair: one-hop splice through dead neighbors ---
        nbr0 = self._repair_adjacency(nbr0, dead, vec_np,
                                      rowmap=None, cap=2 * self.m)
        # --- renumber ---
        newpos = np.full(n, -1, np.int64)
        newpos[alive_rows] = np.arange(len(alive_rows))
        nbr0_l = nbr0[alive_rows]
        nbr0_l = np.where(nbr0_l >= 0, newpos[np.maximum(nbr0_l, 0)], -1)
        nbr0_l = np.where(nbr0_l >= 0, nbr0_l, -1).astype(np.int32)
        x_l = vec_np[alive_rows]
        ids_l = self._ids_np[alive_rows]
        levels_l = self._levels_np[alive_rows]
        # --- upper levels: filter members, repair, remap ---
        uppers_new = []
        for l, u in enumerate(self._upper, start=1):
            nodes = np.asarray(u["nodes"][: u["n"]])
            nbr = np.array(u["nbr"][: u["n"]])
            keep_loc = np.where(self._alive_np[nodes])[0]
            if len(keep_loc) == 0:
                break      # levels are nested: higher ones are empty too
            dead_loc = ~self._alive_np[nodes]
            nbr = self._repair_adjacency(nbr, dead_loc, vec_np,
                                         rowmap=nodes, cap=self.m)
            # remap locals
            locpos = np.full(u["n"], -1, np.int64)
            locpos[keep_loc] = np.arange(len(keep_loc))
            nbr_l = nbr[keep_loc]
            nbr_l = np.where(nbr_l >= 0, locpos[np.maximum(nbr_l, 0)], -1)
            nodes_l = newpos[nodes[keep_loc]].astype(np.int32)
            uppers_new.append((nodes_l, nbr_l.astype(np.int32)))
        # --- rebuild device state ---
        meta_upper = {"num_upper": len(uppers_new)}
        arrays = {"vecs": x_l, "nbr0": nbr0_l, "ids": ids_l,
                  "levels": levels_l}
        for l, (nodes_l, nbr_l) in enumerate(uppers_new, start=1):
            arrays[f"u{l}_nodes"] = nodes_l
            arrays[f"u{l}_nbr"] = nbr_l
        # remap router representatives; a deleted rep falls back to the
        # nearest alive row of its centroid
        router_state = None
        if self._router is not None:
            cents = np.asarray(self._router["centroids"])
            reps_old = np.asarray(self._router["reps"])
            reps_new = np.where(reps_old < n, newpos[np.minimum(reps_old,
                                                                n - 1)],
                                -1)
            if len(x_l):
                for ci in np.where(reps_new < 0)[0]:
                    d = ((x_l - cents[ci]) ** 2).sum(1)
                    reps_new[ci] = int(np.argmin(d))
            else:
                # fully-deleted index: no alive rows to represent
                reps_new[:] = -1
            router_state = (cents, reps_new.astype(np.int64))
        entry_new = int(newpos[self.entry]) if (
            self.entry >= 0 and self._alive_np[self.entry]) else -1
        meta = {"metric": self.metric, "dim": self.dim, "m": self.m,
                "ef_construction": self.ef_construction,
                "ef_search": self.ef_search, "ml": self.ml,
                "n": len(alive_rows), "entry": entry_new,
                "entry_level": self.entry_level if entry_new >= 0 else -1,
                "seed": self._seed, "heuristic": self._heuristic,
                **meta_upper}
        self._load_state(arrays, meta)
        if router_state is not None:
            self._set_router(*router_state)
        if self.entry < 0 and self.n:
            self._promote_entry()
        return ndead

    def _repair_adjacency(self, nbr: np.ndarray, dead_rows: np.ndarray,
                          vec_np: np.ndarray, rowmap, cap: int
                          ) -> np.ndarray:
        """For every node with >=1 dead neighbor: candidates = alive
        neighbors + dead neighbors' alive neighbors (one-hop splice),
        pruned to ``cap`` by the configured selection policy — the same
        diversity heuristic the build uses, or closest-only in reference
        mode. ``nbr`` holds local rows when ``rowmap`` (local -> vector
        row) is given, else vector rows."""
        valid = nbr >= 0
        is_dead = np.zeros_like(valid)
        is_dead[valid] = dead_rows[nbr[valid]]
        touched = np.where(is_dead.any(axis=1))[0]
        if len(touched) == 0:
            return nbr
        out = nbr.copy()
        back = None
        if rowmap is not None:
            back = np.full(vec_np.shape[0], -1, np.int64)
            back[rowmap] = np.arange(len(rowmap))
        chunk = 2048
        for s in range(0, len(touched), chunk):
            rows_c = touched[s:s + chunk]
            C = len(rows_c)
            nb = nbr[rows_c]                              # [C, deg]
            nb_dead = is_dead[rows_c]
            alive_nb = np.where((nb >= 0) & ~nb_dead, nb, -1)
            # one-hop splice: neighbors of dead neighbors
            dn = np.where(nb_dead, nb, 0)
            hop = nbr[dn]                                 # [C, deg, deg]
            hop = np.where(nb_dead[:, :, None], hop, -1)
            hop_valid = hop >= 0
            hop_alive = np.zeros_like(hop_valid)
            hop_alive[hop_valid] = ~dead_rows[hop[hop_valid]]
            hop = np.where(hop_valid & hop_alive, hop, -1)
            cand = np.concatenate([alive_nb, hop.reshape(C, -1)], axis=1)
            vrows = rows_c if rowmap is None else rowmap[rows_c]
            crows = cand if rowmap is None else np.where(
                cand >= 0, rowmap[np.maximum(cand, 0)], -1)
            crows = np.where(crows == vrows[:, None], -1, crows)  # no self
            # pad the chunk to a fixed shape (bounded compile count)
            pad = chunk - C
            if pad:
                vrows_p = np.concatenate([vrows, np.full(pad, vrows[-1])])
                crows_p = np.concatenate(
                    [crows, np.repeat(crows[-1:], pad, axis=0)])
            else:
                vrows_p, crows_p = vrows, crows
            vv = jnp.asarray(vec_np[vrows_p])
            cj = jnp.asarray(crows_p.astype(np.int32))
            if cj.shape[1] > 6 * cap:      # bound the heuristic's O(C^2)
                cj = _prune_closest(vv, cj, self._vecs, self._sqnorms,
                                    metric=self._imetric, cap=6 * cap)
            if self._heuristic:
                sel_g = _select_neighbors_heuristic(
                    vv, cj, self._vecs, self._sqnorms,
                    metric=self._imetric, cap=cap)
            else:
                sel_g = _prune_closest(vv, cj, self._vecs, self._sqnorms,
                                       metric=self._imetric, cap=cap)
            sel = np.asarray(sel_g)[:C].astype(np.int64)
            if rowmap is None:
                out[rows_c] = sel
            else:
                out[rows_c] = np.where(sel >= 0,
                                       back[np.maximum(sel, 0)], -1)
        return out

    # ---- search ----
    def search(self, queries, k: int = 10, *, ef: Optional[int] = None,
               max_steps: Optional[int] = None, batch: Optional[int] = None,
               expand: int = 4, router_topr: int = 4
               ) -> Tuple[np.ndarray, np.ndarray]:
        cfg = get_config()
        ef = int(ef or self.ef_search)
        ef = max(ef, k)
        q, single = as_batch(queries)
        if self._spherical:
            qn = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = q / jnp.maximum(qn, 1e-30)
        expand = max(1, expand)
        steps = int(max_steps or ((2 * ef + 32) // expand + 16))
        if batch is None:
            # the visited set is [B, Ncap/32] packed uint32 words: size
            # sub-batches so it stays within ~512MB (it is carried through
            # every while_loop step; a 1M-row corpus allows B=4096)
            batch = int(max(64, min(4096, (1 << 32) // max(self._ncap, 1))))
        outs_d, outs_i = [], []
        uppers = tuple((u["nbr"], u["nodes"], u["pos"]) for u in self._upper)
        for s in range(0, q.shape[0], batch):
            qb = q[s:s + batch]
            nb = qb.shape[0]
            # pad the batch to a power of two to bound compile shapes
            npad = 1 << max((nb - 1).bit_length(), 3)
            if npad > nb:
                qb = jnp.concatenate(
                    [qb, jnp.repeat(qb[-1:], npad - nb, axis=0)])
            if self._router is not None:
                bd, bi = _query_search_routed(
                    qb, self._router["centroids"], self._router["reps"],
                    self._vecs, self._sqnorms, self._nbr0,
                    metric=self._imetric, ef=ef, max_steps=steps,
                    expand=expand, topr=min(router_topr, ef),
                    net=_use_network(),
                    ring=_use_ring() and ef >= 12,
                    approx=_use_approx_merge())
            else:
                bd, bi = _query_search(
                    qb, jnp.int32(self.entry), self._vecs, self._sqnorms,
                    self._nbr0, uppers, graph_top=self.entry_level, ef=ef,
                    max_steps=steps, metric=self._imetric, expand=expand,
                    net=_use_network(),
                    ring=_use_ring() and ef >= 12,
                    approx=_use_approx_merge())
            keep = ef if not self._alive_np.all() else k
            outs_d.append(np.asarray(bd[:nb, :keep]))
            outs_i.append(np.asarray(bi[:nb, :keep]))
        dists = np.concatenate(outs_d) if len(outs_d) > 1 else outs_d[0]
        rows = np.concatenate(outs_i) if len(outs_i) > 1 else outs_i[0]
        dists = np.asarray(dists)
        if not self._alive_np.all():
            # tombstones: deleted nodes were traversable but must never
            # be returned — mask and re-rank within the ef beam
            dead = (rows < 0) | ~self._alive_np[np.maximum(rows, 0)]
            dists = np.where(dead, np.inf, dists)
            rows = np.where(dead, -1, rows)
            order = np.argsort(dists, axis=1, kind="stable")[:, :k]
            dists = np.take_along_axis(dists, order, axis=1)
            rows = np.take_along_axis(rows, order, axis=1)
        dists = self._postprocess_dist(dists)
        ids = np.where(rows >= 0, self._ids_np[np.maximum(rows, 0)], -1)
        return (dists[0], ids[0]) if single else (dists, ids)

    def _postprocess_dist(self, d: np.ndarray) -> np.ndarray:
        if self.metric == "l2":
            return np.sqrt(np.maximum(d, 0.0))
        if self.metric == "cosine":
            return d * 0.5
        return d

    # ---- persistence ----
    def _state(self):
        arrays = {
            "vecs": self._vecs[: self.n],
            "nbr0": self._nbr0[: self.n],
            "ids": self._ids_np,
            "levels": self._levels_np,
            "alive": self._alive_np,
            # sqnorms are computed from the f32 inputs at build time but
            # vecs are stored bf16 — persist them so a loaded index
            # reproduces search results bit-for-bit (recomputing from
            # bf16 shifts distance tie-breaks)
            "sqnorms": self._sqnorms[: self.n],
        }
        for l, u in enumerate(self._upper, start=1):
            arrays[f"u{l}_nodes"] = u["nodes"][: u["n"]]
            arrays[f"u{l}_nbr"] = u["nbr"][: u["n"]]
        if self._router is not None:
            arrays["router_centroids"] = self._router["centroids"]
            arrays["router_reps"] = self._router["reps"]
        meta = {"m": self.m, "ef_construction": self.ef_construction,
                "ef_search": self.ef_search, "ml": self.ml, "n": self.n,
                "entry": self.entry, "entry_level": self.entry_level,
                "num_upper": len(self._upper), "seed": self._seed,
                "heuristic": self._heuristic}
        return arrays, meta

    def _load_state(self, arrays, meta):
        self.metric = meta["metric"]
        self.dim = meta["dim"]
        self.m = meta["m"]
        self.ef_construction = meta["ef_construction"]
        self.ef_search = meta["ef_search"]
        self.ml = meta["ml"]
        self.max_level = get_config().hnsw_max_level
        self._wave = get_config().hnsw_build_wave
        self._rng = np.random.default_rng(meta.get("seed", 0))
        self._seed = meta.get("seed", 0)
        self._heuristic = meta.get("heuristic", True)
        self._spherical = self.metric == "cosine"
        self.entry = meta["entry"]
        self.entry_level = meta["entry_level"]
        n = meta["n"]
        self.n = n
        self._ncap = 0
        self._vecs = None
        self._upper = []
        self._ensure_capacity(max(n, 1))
        x = jnp.asarray(arrays["vecs"])
        self._vecs = self._vecs.at[:n].set(x.astype(self._vecs.dtype))
        if "sqnorms" in arrays:
            self._sqnorms = self._sqnorms.at[:n].set(
                jnp.asarray(arrays["sqnorms"]))
        else:  # older saves: recompute from the (bf16) stored vectors
            self._sqnorms = self._sqnorms.at[:n].set(jnp.sum(x * x, axis=1))
        self._nbr0 = self._nbr0.at[:n].set(jnp.asarray(arrays["nbr0"]))
        self._ids_np = np.asarray(arrays["ids"])
        self._levels_np = np.asarray(arrays["levels"])
        self._alive_np = (np.asarray(arrays["alive"], bool)
                          if "alive" in arrays else np.ones(n, bool))
        self._router = None
        if "router_centroids" in arrays:
            self._set_router(np.asarray(arrays["router_centroids"]),
                             np.asarray(arrays["router_reps"]))
        self._upper = []
        for l in range(1, meta["num_upper"] + 1):
            nodes = np.asarray(arrays[f"u{l}_nodes"])
            nbr = np.asarray(arrays[f"u{l}_nbr"])
            nl = len(nodes)
            cap = max(1024, nl)
            pos = np.full((self._ncap,), -1, np.int32)
            pos[nodes] = np.arange(nl, dtype=np.int32)
            self._upper.append({
                "n": nl,
                "nodes": jnp.asarray(np.pad(nodes, (0, cap - nl),
                                            constant_values=-1)),
                "pos": jnp.asarray(pos),
                "nbr": jnp.asarray(np.pad(nbr, ((0, cap - nl), (0, 0)),
                                          constant_values=-1)),
            })

    # ---- diagnostics (index_validator.c analog) ----
    def stats(self) -> Dict[str, Any]:
        nbr = np.asarray(self._nbr0[: self.n])
        deg = (nbr >= 0).sum(axis=1)
        return {"kind": self.kind, "n": self.n, "m": self.m,
                "metric": self.metric, "entry_level": self.entry_level,
                "level_histogram": np.bincount(self._levels_np).tolist(),
                "degree_mean": float(deg.mean()) if self.n else 0.0,
                "degree_min": int(deg.min()) if self.n else 0,
                "isolated_nodes": int((deg == 0).sum())}
