"""Single-node NumPy oracles — the executable specification of the engine.

``louvain_numpy`` implements exactly the reference's batched block-synchronous
schedule (/root/reference/louvain_gpu.cpp:53-121):

- per sweep, vertices are processed in ``nbatches`` batches; each batch's
  gain argmax sees the labels and community weights already updated by
  earlier batches of the same sweep (louvain_gpu.cpp:61-82);
- gain formula per graph_cuda.cu:1493-1536:
      gain(v->c)   = (e_{v,c} - k_v * a_c       / (2m)) / m      for c != c(v)
      self(v)      = (e_{v,c(v)} - k_v * (a_{c(v)} - k_v) / (2m)) / m
  move to argmax c iff max gain - self > 0; self-loop weights are excluded
  from e_{v,c} (copy_weights, graph_cuda.cu:2263-2348);
- modularity per graph_cuda.cu:2097-2133 (self-loops included):
      Q = sum_{(u,v): c(u)=c(v)} w / (2m) - sum_c a_c^2 / (4m^2)
- sweep loop: while dQ > tol and loops < max_loops; dQ < 0 -> rollback to
  sweep-start labels (louvain_gpu.cpp:85-90);
- phase loop: aggregate when phase gain > tol_phase; coarsening merges
  communities into super-vertices and sums parallel edge weights, keeping
  intra-community weight as self-loops (graph_gpu.cpp:1382-1545); stop when
  no compression or a single community remains (graph_gpu.cpp:1391-1392).

Deliberate, documented deviations from the reference (mirrored by the Spark
engine so the two stay in lockstep):

1. deterministic tie-break — max gain, then smallest community id (the
   reference's tie-break is warp-order dependent, graph_cuda.cu:1507-1526);
2. batch membership = ``vertex_id % nbatches`` (reference: contiguous ranges
   balanced by edge count — any fixed assignment is valid, this one is
   partitioning-independent on both sides);
3. community ids stay *sparse* (a community is named by a vertex id) — the
   reference densifies ids each phase only because CSR needs 0..NV-1; labels
   are compared up to relabeling anyway;
4. the final phase's labels are projected into the flat clustering even when
   its gain <= tol_phase (the reference discards that last sub-tolerance
   sweep from the dump, clustering.cpp:12-21 is only called from
   aggregation()).

Community weights are *recomputed* after each batch rather than delta-updated
(matches the Spark engine; mathematically identical, reference uses atomic
deltas, graph_cuda.cu:1222-1269).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _vertex_index(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique sorted vertex ids + src/dst index arrays."""
    uids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(uids, src)
    d = np.searchsorted(uids, dst)
    return uids, s, d


def modularity_numpy(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    labels: dict[int, int] | None = None, gamma: float = 1.0,
) -> float:
    """Q of a labeling over a symmetric edge table (labels: vertex id -> comm
    id; None = singleton partition). ``gamma`` is the Reichardt-Bornholdt
    resolution parameter scaling the null-model term (1.0 = classic Q)."""
    uids, s, d = _vertex_index(src, dst)
    nv = len(uids)
    k = np.bincount(s, weights=w, minlength=nv)
    m = w.sum() / 2.0
    if labels is None:
        comm = np.arange(nv)
    else:
        lab_ids = np.array([labels[int(u)] for u in uids])
        _, comm = np.unique(lab_ids, return_inverse=True)
    a_c = np.bincount(comm, weights=k)
    internal = w[comm[s] == comm[d]].sum()
    return float(internal / (2 * m) - gamma * (a_c**2).sum() / (4 * m * m))


@dataclass
class LouvainResult:
    labels: dict[int, int]          # original vertex id -> community id
    modularity: float
    n_phases: int
    total_sweeps: int
    history: list[dict] = field(default_factory=list)  # per-sweep Q trace


def _one_sweep(
    uids: np.ndarray,
    s: np.ndarray,
    d: np.ndarray,
    w: np.ndarray,
    k: np.ndarray,
    m: float,
    comm: np.ndarray,
    nbatches: int,
    gamma: float = 1.0,
) -> np.ndarray:
    """One batched sweep; mutates and returns ``comm`` (indices into uids)."""
    nv = len(uids)
    self_loop = s == d
    w_eff = np.where(self_loop, 0.0, w)
    for b in range(nbatches):
        batch_mask = (uids[s] % nbatches) == b
        if not batch_mask.any():
            continue
        a_c = np.bincount(comm, weights=k, minlength=nv)
        bs = s[batch_mask]
        bc = comm[d[batch_mask]]
        bw = w_eff[batch_mask]
        # aggregate e_{v,c} over (src, neighbor community)
        key = bs.astype(np.int64) * nv + bc
        ukey, inv = np.unique(key, return_inverse=True)
        e_vc = np.bincount(inv, weights=bw)
        cs = (ukey // nv).astype(np.int64)   # src index per candidate
        cc = (ukey % nv).astype(np.int64)    # candidate community index
        my = comm[cs]
        is_self = cc == my
        # self weight per batch src (0 when no neighbor in own community)
        self_w = np.zeros(nv)
        np.add.at(self_w, cs[is_self], e_vc[is_self])
        # candidate gains (c != my)
        ext = ~is_self
        if ext.any():
            gs, gc, ge = cs[ext], cc[ext], e_vc[ext]
            gain = (ge - gamma * k[gs] * a_c[gc] / (2 * m)) / m
            # argmax per src: sort by (src, -gain, comm_id) and take first
            order = np.lexsort((uids[gc], -gain, gs))
            gs_o, gc_o, gain_o = gs[order], gc[order], gain[order]
            first = np.ones(len(gs_o), dtype=bool)
            first[1:] = gs_o[1:] != gs_o[:-1]
            top_src = gs_o[first]
            top_comm = gc_o[first]
            top_gain = gain_o[first]
            self_term = (
                self_w[top_src]
                - gamma * k[top_src] * (a_c[comm[top_src]] - k[top_src]) / (2 * m)
            ) / m
            move = top_gain - self_term > 0
            comm[top_src[move]] = top_comm[move]
    return comm


def louvain_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    nbatches: int = 2,
    tol: float = 1e-6,
    max_loops: int = 500,
    tol_phase: float = 1e-6,
    max_phases: int = 200,
    dense_relabel: bool = False,
    gamma: float = 1.0,
    init_ids: dict | None = None,
) -> LouvainResult:
    """Full multi-phase batched Louvain. Input: symmetric edge arrays.
    ``gamma``: Reichardt-Bornholdt resolution (see louvain.louvain).

    ``init_ids``: optional warm start — {vertex id: community id} applied
    at PHASE 0 instead of the singleton partition (vertices missing from
    the mapping stay singletons). Labels are canonicalized to the min
    member id per community first (the engine-portable representative,
    same convention as leiden_numpy), so any labeling works.

    ``dense_relabel`` mirrors louvain(dense_relabel=True): order-preserving
    renumbering of super-vertices to 0..ncomm-1 at every phase transition
    (reference C1). Changes only batch membership (pmod over new ids)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)

    # flat clustering over original vertices (id space: original ids)
    orig_uids = np.unique(np.concatenate([src, dst]))
    flat = orig_uids.copy()  # orig vertex id -> current super-vertex id

    total_sweeps = 0
    history: list[dict] = []
    Q_final = 0.0
    n_phases = 0
    done = False

    while not done and n_phases < max_phases:
        uids, s, d = _vertex_index(src, dst)
        nv = len(uids)
        k = np.bincount(s, weights=w, minlength=nv)
        m = w.sum() / 2.0
        if n_phases == 0 and init_ids:
            # canonical warm start: min member id per init community
            reps: dict = {}
            for vid in uids.tolist():
                c = init_ids.get(int(vid), int(vid))
                if c not in reps or vid < reps[c]:
                    reps[c] = int(vid)
            comm = np.searchsorted(uids, np.array(
                [reps[init_ids.get(int(v), int(v))] for v in uids],
                dtype=np.int64))
        else:
            comm = np.arange(nv)  # singleton: community id == own vertex id
        Q = _modularity_idx(s, d, w, k, m, comm, nv, gamma)
        Q_phase_start = Q

        dQ = np.inf
        loops = 0
        while tol < dQ and loops < max_loops:
            comm_prev = comm.copy()
            comm = _one_sweep(uids, s, d, w, k, m, comm, nbatches, gamma)
            Qtmp = _modularity_idx(s, d, w, k, m, comm, nv, gamma)
            dQ = Qtmp - Q
            loops += 1
            if dQ < 0:
                comm = comm_prev  # rollback (louvain_gpu.cpp:85-90)
            else:
                Q = Qtmp
            history.append({"phase": n_phases, "sweep": loops, "Q": float(Qtmp), "dQ": float(dQ)})
        total_sweeps += loops
        Q_final = Q

        # project this phase's labels into the flat clustering
        flat_idx = np.searchsorted(uids, flat)
        flat = uids[comm[flat_idx]]

        if Q - Q_phase_start > tol_phase:
            # coarsen: super-vertex id = community id (sparse ids kept)
            new_src = uids[comm[s]]
            new_dst = uids[comm[d]]
            if dense_relabel:
                # order-preserving dense renumber (C1), applied to the
                # coarsened edges AND the flat projection — same as Spark
                dense_ids = np.unique(new_src)
                new_src = np.searchsorted(dense_ids, new_src)
                new_dst = np.searchsorted(dense_ids, new_dst)
                flat = np.searchsorted(dense_ids, flat)
            # aggregation via lexsort (ids may be large/sparse)
            order = np.lexsort((new_dst, new_src))
            ns, nd, nw = new_src[order], new_dst[order], w[order]
            boundary = np.ones(len(ns), dtype=bool)
            boundary[1:] = (ns[1:] != ns[:-1]) | (nd[1:] != nd[:-1])
            seg = np.cumsum(boundary) - 1
            agg_w = np.bincount(seg, weights=nw)
            src, dst, w = ns[boundary], nd[boundary], agg_w
            n_comms = len(np.unique(src))
            if n_comms == nv or n_comms <= 1:
                done = True
        else:
            done = True
        n_phases += 1

    labels = {int(v): int(c) for v, c in zip(orig_uids, flat)}
    return LouvainResult(labels, float(Q_final), n_phases, total_sweeps, history)


def _modularity_idx(s, d, w, k, m, comm, nv, gamma: float = 1.0) -> float:
    a_c = np.bincount(comm, weights=k, minlength=nv)
    internal = w[comm[s] == comm[d]].sum()
    return float(internal / (2 * m) - gamma * (a_c**2).sum() / (4 * m * m))


# ---------------------------------------------------------------------------
# companion-algorithm oracles
# ---------------------------------------------------------------------------


def pagerank_numpy(
    src, dst, w, damping: float = 0.85, max_iters: int = 20, tol: float = 1e-9
) -> dict[int, float]:
    """Weighted PageRank: r'(v) = (1-d)/N + d * sum_u r(u) * w(u,v)/k(u).
    The canonical edge table is symmetric, so there are no dangling vertices;
    dangling mass is still redistributed uniformly for generality."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    uids, s, d = _vertex_index(src, dst)
    nv = len(uids)
    k = np.bincount(s, weights=w, minlength=nv)
    r = np.full(nv, 1.0 / nv)
    out_frac = np.where(k[s] > 0, w / np.where(k[s] > 0, k[s], 1.0), 0.0)
    for _ in range(max_iters):
        contrib = np.bincount(d, weights=r[s] * out_frac, minlength=nv)
        dangling = r[k == 0].sum()
        r_new = (1 - damping) / nv + damping * (contrib + dangling / nv)
        if np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return {int(u): float(x) for u, x in zip(uids, r)}


def connected_components_numpy(src, dst, w=None) -> dict[int, int]:
    """Min-label propagation to fixpoint: component id = min vertex id."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    uids, s, d = _vertex_index(src, dst)
    lab = uids.copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, d, lab[s])
        np.minimum.at(new, s, lab[d])
        if (new == lab).all():
            break
        lab = new
    return {int(u): int(c) for u, c in zip(uids, lab)}


def lpa_numpy(src, dst, w, nbatches: int = 2, max_iters: int = 20) -> dict[int, int]:
    """Batched synchronous label propagation: per batch, each vertex adopts
    the neighbor label with the largest incident-weight sum (self-loops
    excluded), ties -> smallest label id. Stops when a full sweep changes
    nothing. Same batch schedule as Louvain (v % nbatches)."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    uids, s, d = _vertex_index(src, dst)
    nv = len(uids)
    lab = np.arange(nv)  # index-space labels; reported as uids[lab]
    w_eff = np.where(s == d, 0.0, w)
    for _ in range(max_iters):
        changed = False
        for b in range(nbatches):
            bm = (uids[s] % nbatches) == b
            if not bm.any():
                continue
            bs, bl, bw = s[bm], lab[d[bm]], w_eff[bm]
            key = bs.astype(np.int64) * nv + bl
            ukey, inv = np.unique(key, return_inverse=True)
            wsum = np.bincount(inv, weights=bw)
            cs = (ukey // nv).astype(np.int64)
            cl = (ukey % nv).astype(np.int64)
            keep = wsum > 0
            cs, cl, wsum = cs[keep], cl[keep], wsum[keep]
            if len(cs) == 0:
                continue
            order = np.lexsort((uids[cl], -wsum, cs))
            first = np.ones(len(cs), dtype=bool)
            first[1:] = cs[order][1:] != cs[order][:-1]
            tgt_src = cs[order][first]
            tgt_lab = cl[order][first]
            if (lab[tgt_src] != tgt_lab).any():
                changed = True
            lab[tgt_src] = tgt_lab
        if not changed:
            break
    return {int(u): int(uids[c]) for u, c in zip(uids, lab)}


def triangle_count_numpy(src, dst, w=None) -> int:
    """Global triangle count of the undirected simple graph (self-loops and
    weights ignored; parallel edges already merged by normalize_edges)."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    mask = src < dst
    pairs = set(zip(src[mask].tolist(), dst[mask].tolist()))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # orient by (degree, id) and count common out-neighbors per oriented edge
    def rank(v):
        return (len(adj.get(v, ())), v)
    out: dict[int, set[int]] = {v: set() for v in adj}
    for a, b in pairs:
        if rank(a) < rank(b):
            out[a].add(b)
        else:
            out[b].add(a)
    t = 0
    for u, nbrs in out.items():
        for v in nbrs:
            t += len(nbrs & out[v])
    return t


def k_core_numpy(src, dst) -> dict[int, int]:
    """Exact coreness via Batagelj-Zaversnik peeling (min-degree removal).
    Simple-graph semantics: self-loops dropped, parallel edges collapsed;
    vertices with no proper neighbors get core 0."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    verts = set(np.unique(np.concatenate([src, dst])).tolist())
    adj: dict[int, set] = {int(v): set() for v in verts}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    live = set(verts)
    core: dict[int, int] = {}
    k = 0
    while live:
        v = min(live, key=lambda u: (deg[u], u))
        k = max(k, deg[v])
        core[v] = k
        live.discard(v)
        for u in adj[v]:
            if u in live:
                deg[u] -= 1
    return {int(v): int(c) for v, c in core.items()}


def _refine_connected_numpy(uids, s, d, comm) -> np.ndarray:
    """Split every community into its connected components (union-find
    over intra-community edges); returns refined comm INDICES where each
    refined part is represented by its min-member index — the same
    min-label convention as algos.refine_connected / connected_components.
    Vertices with no intra-community edge become their own singletons."""
    nv = len(uids)
    parent = np.arange(nv)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    intra = (comm[s] == comm[d]) & (s != d)
    for a, b in zip(s[intra].tolist(), d[intra].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the min-member index
            # (uids is sorted, so min index == min id)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return np.array([find(i) for i in range(nv)], dtype=np.int64)


def leiden_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    nbatches: int = 2,
    tol: float = 1e-6,
    max_loops: int = 500,
    tol_phase: float = 1e-6,
    max_phases: int = 200,
    gamma: float = 1.0,
) -> LouvainResult:
    """Deterministic Leiden (Traag et al. 2019, deterministic rendering):
    per level, (1) the batched local-move phase of louvain_numpy — warm-
    started from the carried partition, not singletons, (2) REFINEMENT of
    the resulting communities into their connected components (the Leiden
    guarantee), (3) aggregation on the REFINED partition with the next
    level's initial communities given by the parent coarse community
    (canonicalized to min-member id so labels are engine-portable). The
    randomized refinement of the paper is replaced by the connected split
    — the component that provides Leiden's published guarantee — so every
    trajectory is exactly replayable (the same determinism convention as
    the batched Louvain schedule itself)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)

    orig_uids = np.unique(np.concatenate([src, dst]))
    flat = orig_uids.copy()          # orig id -> current-level vertex id
    final_flat = orig_uids.copy()    # orig id -> coarse community id
    init_ids = None                  # warm start: vertex id -> comm id

    total_sweeps = 0
    history: list[dict] = []
    Q_final = 0.0
    n_phases = 0
    done = False

    while not done and n_phases < max_phases:
        uids, s, d = _vertex_index(src, dst)
        nv = len(uids)
        k = np.bincount(s, weights=w, minlength=nv)
        m = w.sum() / 2.0
        if init_ids is None:
            comm = np.arange(nv)
        else:
            # carried partition: comm id -> representative (min member)
            # index; init_ids maps vertex id -> canonical comm id, and
            # the canonical id IS a member's id, hence present in uids
            comm = np.searchsorted(uids, np.array(
                [init_ids[int(v)] for v in uids], dtype=np.int64))
        Q = _modularity_idx(s, d, w, k, m, comm, nv, gamma)
        Q_phase_start = Q

        dQ = np.inf
        loops = 0
        while tol < dQ and loops < max_loops:
            comm_prev = comm.copy()
            comm = _one_sweep(uids, s, d, w, k, m, comm, nbatches, gamma)
            Qtmp = _modularity_idx(s, d, w, k, m, comm, nv, gamma)
            dQ = Qtmp - Q
            loops += 1
            if dQ < 0:
                comm = comm_prev
            else:
                Q = Qtmp
            history.append({"phase": n_phases, "sweep": loops,
                            "Q": float(Qtmp), "dQ": float(dQ)})
        total_sweeps += loops
        Q_final = Q

        # the RESULT partition of this level is the coarse labels
        flat_idx = np.searchsorted(uids, flat)
        final_flat = uids[comm[flat_idx]]

        ref = _refine_connected_numpy(uids, s, d, comm)
        flat_ref = uids[ref[flat_idx]]

        if Q - Q_phase_start > tol_phase:
            new_src = uids[ref[s]]
            new_dst = uids[ref[d]]
            order = np.lexsort((new_dst, new_src))
            ns, nd, nw = new_src[order], new_dst[order], w[order]
            boundary = np.ones(len(ns), dtype=bool)
            boundary[1:] = (ns[1:] != ns[:-1]) | (nd[1:] != nd[:-1])
            seg = np.cumsum(boundary) - 1
            agg_w = np.bincount(seg, weights=nw)
            n_ref = len(np.unique(new_src))
            # next level's warm start: refined part -> its parent COARSE
            # community, canonicalized to the min refined-part id per
            # coarse community (engine-portable representative)
            ref_id = uids[ref]            # per current vertex: refined id
            coarse_id = uids[comm]        # per current vertex: coarse id
            reps: dict[int, int] = {}
            for r_, c_ in zip(ref_id.tolist(), coarse_id.tolist()):
                if c_ not in reps or r_ < reps[c_]:
                    reps[c_] = r_
            init_ids = {
                int(r_): int(reps[c_])
                for r_, c_ in zip(ref_id.tolist(), coarse_id.tolist())
            }
            src, dst, w = ns[boundary], nd[boundary], agg_w
            flat = flat_ref
            if n_ref == nv or n_ref <= 1:
                done = True
        else:
            done = True
        n_phases += 1

    labels = {int(v): int(c) for v, c in zip(orig_uids, final_flat)}
    return LouvainResult(labels, float(Q_final), n_phases, total_sweeps, history)


def densest_peel_numpy(
    src, dst, eps_num: int = 1, eps_den: int = 2
) -> dict:
    """Independent adjacency-set replay of the greedy densest-subgraph
    peel (Charikar 2000 / Bahmani et al. 2012) with the same exact
    integer schedule as algos.densest_subgraph: round r removes every
    alive vertex with deg * nv * eps_den <= 2*ne * (eps_den + eps_num);
    best round by exact rational density compare, earliest tie. Returns
    {"profile": [(round, nv, ne)], "members": set, "best_round": int}.
    Simple-graph semantics (self-loops dropped, parallel edges
    collapsed); vertex universe = src UNION dst."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    adj: dict[int, set] = {
        int(v): set() for v in np.unique(np.concatenate([src, dst]))
    }
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    profile: list[tuple[int, int, int]] = []
    peel_round: dict[int, int] = {}
    best = (0, 1, 0)                    # (ne, nv, round)
    rnd = 0
    while alive:
        rnd += 1
        nv = len(alive)
        ne = sum(len(adj[v]) for v in alive) // 2
        profile.append((rnd, nv, ne))
        if ne * best[1] > best[0] * nv:
            best = (ne, nv, rnd)
        peel = {
            v for v in alive
            if len(adj[v]) * nv * eps_den <= 2 * ne * (eps_den + eps_num)
        }
        for v in peel:
            peel_round[v] = rnd
            for u in adj[v]:
                adj[u].discard(v)
            adj[v].clear()
        alive -= peel
    members = {v for v, r in peel_round.items() if r >= best[2]}
    return {"profile": profile, "members": members, "best_round": best[2]}


def trussness_numpy(src, dst) -> dict[tuple[int, int], int]:
    """Exact per-edge trussness via the SEQUENTIAL min-support peel —
    remove the single minimum-support edge, decrement the supports of
    the <= sup(e) edges sharing its triangles, ratchet the threshold;
    trussness = threshold at removal + 2. A genuinely different
    schedule from algos.truss_decomposition's batched rounds (trussness
    is schedule-independent, so they must agree exactly). Simple-graph
    semantics: self-loops dropped, parallel edges collapsed."""
    src = np.asarray(src, np.int64); dst = np.asarray(dst, np.int64)
    adj: dict[int, set] = {}
    live: set[tuple[int, int]] = set()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a == b:
            continue
        e = (min(a, b), max(a, b))
        live.add(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sup = {(a, b): len(adj[a] & adj[b]) for a, b in live}
    truss: dict[tuple[int, int], int] = {}
    k = 0
    while live:
        e = min(live, key=lambda x: (sup[x], x))
        a, b = e
        k = max(k, sup[e])
        truss[e] = k + 2
        for w in adj[a] & adj[b]:
            for f in ((min(a, w), max(a, w)), (min(b, w), max(b, w))):
                if f in live and f != e:
                    sup[f] -= 1
        live.discard(e)
        adj[a].discard(b)
        adj[b].discard(a)
    return truss
