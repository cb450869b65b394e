"""Hierarchical EM (HEM) Gaussian-mixture downsampler, data-parallel JAX.

Re-implementation of the reference's only first-party native component — the
C++/OpenMP extension (`/root/reference/src/cpp_ext/src/mixture.cpp:25-333`) —
as vectorized JAX with static shapes, so it runs on TPU and shards over
meshes. Semantics follow the C++ faithfully:

* per-parent conservative query radius = distance_delta * sqrt(lambda_max)
  (`mixture.cpp:88`), realized as a fixed-K nearest-neighbor candidate set
  instead of an unbounded hash-grid radius search;
* child eligibility: color distance <= color_delta^2/2, KL divergence
  <= distance_delta^2/2, other parents excluded (`mixture.cpp:116-136`);
* likelihood = the *active* opacity-weighted kernel `hemLikelihoodOpacity`
  (`mixture.cpp:54-64`): exp(-d^2/decay^2) * opacity * exp(-dcolor^2/decay^2)
  * sqrt(det cov), clamped to [FLT_MIN, 1e8] and weighted by parent weight
  (`mixture.cpp:155-158`);
* responsibilities r_is = wL_si / sum_s wL_si, accumulation of
  mean/color/cov (relative to the parent mean for stability,
  `mixture.cpp:212`)/opacity/SH features/wrapped-normal statistics
  (`mixture.cpp:196-244`);
* orphans (sumLw == 0) pass through unchanged (`mixture.cpp:250-253`);
* new parent flags ~ Bernoulli(1/hem_reduction) with an explicit PRNG key
  (`mixture.cpp:256-259` — the C++ used a global LCG);
* NaN / non-PSD components are culled (`mixture.cpp:262-282`) — here by
  marking the slot dead, keeping shapes static.

Deviations by design: opacities are *activated* (sigmoid) values rather than
the raw logits the reference marshals in
(`/root/reference/src/gui/workers/downsampling/qt_gaussian_mixture.py:42-47`);
averaging opacity in linear space is well-defined, logit averaging is not.
Level 0 is dropped from the result like `mixture_wrapper.cpp:15-16`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from gaussiansplattingregistration_tpu.ops import knn as knn_ops
from gaussiansplattingregistration_tpu.ops import math3d

_FLT_MIN = 1.175494e-38
_MAX_L = 1e8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixtureState:
    """One HEM level as fixed-size slot arrays (dead slots masked)."""

    mean: jax.Array       # [N, 3]
    color: jax.Array      # [N, 3] SH-DC colors
    cov: jax.Array        # [N, 6] packed covariance
    opacity: jax.Array    # [N] activated opacity
    weight: jax.Array     # [N]
    features: jax.Array   # [N, F] flattened SH rest
    nvar: jax.Array       # [N, 3] normal * variance encoding
    is_parent: jax.Array  # [N] bool
    alive: jax.Array      # [N] bool

    @property
    def num_alive(self):
        return jnp.sum(self.alive)


@dataclasses.dataclass
class MixtureLevel:
    """Host-side compacted level (the `GaussianMixtureModel` analogue,
    `/root/reference/src/models/gaussian_mixture_level.py:1-7`)."""

    xyz: np.ndarray
    colors: np.ndarray
    opacities: np.ndarray
    covariance: np.ndarray
    features: np.ndarray


def _det6(cov6: jax.Array) -> jax.Array:
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    # | a b c |
    # | b d e |
    # | c e f |
    return a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)


def _inv6(cov6: jax.Array) -> jax.Array:
    """Inverse of packed symmetric 3x3, packed again. Adjugate / det."""
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    det = _det6(cov6)
    det = jnp.where(jnp.abs(det) < 1e-30, jnp.sign(det) * 1e-30 + (det == 0) * 1e-30, det)
    i00 = (d * f - e * e) / det
    i01 = (c * e - b * f) / det
    i02 = (b * e - c * d) / det
    i11 = (a * f - c * c) / det
    i12 = (b * c - a * e) / det
    i22 = (a * d - b * b) / det
    return jnp.stack([i00, i01, i02, i11, i12, i22], axis=-1)


def _mahalanobis6(diff: jax.Array, inv6: jax.Array) -> jax.Array:
    """diff [.., 3], inv6 [.., 6] -> diff^T Sigma^-1 diff."""
    x, y, z = diff[..., 0], diff[..., 1], diff[..., 2]
    a, b, c, d, e, f = (inv6[..., i] for i in range(6))
    return (a * x * x + d * y * y + f * z * z
            + 2.0 * (b * x * y + c * x * z + e * y * z))


def _trace_product6(inv_p: jax.Array, cov_c: jax.Array) -> jax.Array:
    """trace(Sigma_p^-1 Sigma_c) for packed matrices."""
    a, b, c, d, e, f = (inv_p[..., i] for i in range(6))
    A, B, C, D, E, F = (cov_c[..., i] for i in range(6))
    # Row-wise dot of matching full matrices.
    return (a * A + b * B + c * C) + (b * B + d * D + e * E) + (c * C + e * E + f * F)


def _max_eigenvalue6(cov6: jax.Array) -> jax.Array:
    """Largest eigenvalue of packed symmetric 3x3, closed form.

    The trigonometric solution of the characteristic cubic (same formula as
    the native path, `native/hem.cpp:92-106`, and the reference's
    `vec.hpp:736-768`): pure VPU elementwise math. `jnp.linalg.eigvalsh`
    here was a 603 ms/level LAPACK-style custom call at 200k points."""
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    q = (a + d + f) / 3.0
    p1 = b * b + c * c + e * e
    aq, dq, fq = a - q, d - q, f - q
    p2 = aq * aq + dq * dq + fq * fq + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    # det((A - q I) / p) / 2 via the packed determinant of the shifted matrix
    det_b = (
        aq * (dq * fq - e * e)
        - b * (b * fq - c * e)
        + c * (b * e - c * dq)
    ) / (safe_p * safe_p * safe_p)
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi)
    return jnp.where(p2 <= 1e-30, q, lam)


def init_mixture(
    key: jax.Array,
    xyz: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    cov6: jax.Array,
    features: jax.Array,
    hem_reduction: float,
) -> MixtureState:
    """Level-0 init (`mixture.cpp:287-333`): weight 1, initial normal =
    smallest-eigenvector of the covariance scaled by variance 0.001,
    parent flags ~ Bernoulli(1/hem_reduction)."""
    n = xyz.shape[0]
    _, vecs = jnp.linalg.eigh(math3d.unpack_symmetric(cov6))
    normal = vecs[..., :, 0]  # smallest eigenvector
    nvar = normal * 0.001
    is_parent = jax.random.uniform(key, (n,)) < (1.0 / hem_reduction)
    return MixtureState(
        mean=xyz,
        color=colors,
        cov=cov6,
        opacity=opacities.reshape(n),
        weight=jnp.ones((n,), xyz.dtype),
        features=features.reshape(n, -1),
        nvar=nvar,
        is_parent=is_parent,
        alive=jnp.ones((n,), bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_children", "with_stats", "use_grid", "max_parent_slots"
    ),
)
def hem_cluster_level(
    key: jax.Array,
    state: MixtureState,
    hem_reduction: float,
    distance_delta: float,
    color_delta: float,
    decay_rate: float,
    max_children: int = 32,
    with_stats: bool = False,
    use_grid: bool = False,
    grid_table=None,       # [n_cells(+pad), W*4] (knn_ops.build_grid_table)
    grid_origin=None,
    grid_inv_cell=None,
    grid_dims=None,        # [3] i32 TRACED — levels with equal table shapes
                           # share one executable
    max_parent_slots: Optional[int] = None,  # static: candidate-search query
                           # budget — see the compaction note in the body
):
    """One HEM clustering round (`createClusterLevel`, `mixture.cpp:66-285`).

    Slot semantics: parent slots receive the merged component, orphan slots
    pass through, all other slots die. Output shape equals input shape.

    Candidate children per parent come from either a global fixed-K nearest
    neighbor sweep (use_grid=False) or, when the caller planned a 27-cell
    candidate table with cell >= every parent's query radius
    (`create_mixture` does), the k nearest WITHIN the parent's 3x3x3 cell
    window (use_grid=True) — the direct analogue of the reference's
    radius-search + truncate (`pointindex.cpp:110-118`), and the closer of
    the two to its semantics: a window top-k can never lose an in-radius
    child to an out-of-radius one the way a global top-k can.

    With `with_stats`, returns (state, stats) where stats counts the fixed-K
    truncation this op trades for the reference's unbounded radius search
    (`pointindex.cpp:120-143`): `saturated_parents` = parents whose K-th
    nearest candidate is still inside the query radius (the radius search
    would have found MORE children than max_children holds), plus
    merged/orphan/alive composition counters.
    """
    n = state.mean.shape[0]
    k = min(max_children, n)

    parent_mask = state.is_parent & state.alive
    child_alive = state.alive

    # --- candidate children per parent: fixed-K nearest neighbors ----------
    # PARENT COMPACTION: only parent rows consume their candidate lists
    # (eligibility is gated on parent_mask; children receive responsibility
    # through the scatter over idx), yet the search runs for every row. With
    # `max_parent_slots` (static, ~N/reduction + margin from the caller) the
    # queries are compacted parents-first via one [N] flag sort, searched at
    # the budget, and row-gathered back — the selection is the level's
    # dominant cost (profiled 23 ms per [1024, 200k] top-32 block, ~4.6 of
    # 5.6 s/level), so a 1/reduction query budget is a ~reduction-fold cut.
    # Parents past the budget (Binomial tail; counted in stats as
    # `parent_overflow`) get no candidates and pass through as orphans.
    def _search(queries):
        if use_grid:
            # Dead points were excluded from the table by the caller's
            # valid mask; empty slots fail the radius gate below.
            return knn_ops.grid_topk(
                queries, grid_table, grid_origin, grid_inv_cell,
                grid_dims, k,
            )
        # Push dead points far away so they never enter a neighborhood.
        # approx=True: the K-candidate list is already this op's documented
        # truncation of the reference's unbounded radius search; the
        # PartialReduce selection (recall ~0.975 on v5e, ~10x faster than
        # exact top_k — ops/knn.py) can miss ~1 of 32 candidates, which
        # lands in the same saturated_parents/orphan accounting.
        far = jnp.where(child_alive[:, None], state.mean, 1e12)
        return knn_ops.knn(queries, far, k=k, approx=True)

    if max_parent_slots is None or max_parent_slots >= n:
        d2, idx = _search(state.mean)                        # [N, K]
        parent_overflow = jnp.zeros((), jnp.int32)
    else:
        n_p = max_parent_slots
        flag = jnp.where(parent_mask, 0, 1).astype(jnp.int32)
        _, order = jax.lax.sort(
            (flag, jnp.arange(n, dtype=jnp.int32)), num_keys=2,
            is_stable=False,
        )                                                    # parents first
        d2p, idxp = _search(state.mean[order[:n_p]])         # [n_p, K]
        _, inv = jax.lax.sort(
            (order, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=False,
        )                                                    # rank per row
        in_budget = inv < n_p
        safe = jnp.clip(inv, 0, n_p - 1)
        d2 = jnp.where(in_budget[:, None], d2p[safe], jnp.inf)
        idx = jnp.where(in_budget[:, None], idxp[safe], 0)
        parent_overflow = jnp.sum(
            parent_mask & ~in_budget
        ).astype(jnp.int32)
    query_radius = distance_delta * jnp.sqrt(
        jnp.maximum(_max_eigenvalue6(state.cov), 0.0)
    )                                                         # [N]
    in_radius = d2 <= (query_radius[:, None] ** 2)

    c_mean = state.mean[idx]       # [N, K, 3]
    c_color = state.color[idx]
    c_cov = state.cov[idx]
    c_par = state.is_parent[idx]
    c_alive = child_alive[idx]

    # --- eligibility (mixture.cpp:116-136) ---------------------------------
    color_diff = jnp.linalg.norm(c_color - state.color[:, None, :], axis=-1)
    ok_color = color_diff <= (color_delta * color_delta * 0.5)

    inv_p = _inv6(state.cov)[:, None, :]                       # parent Sigma^-1
    diff = c_mean - state.mean[:, None, :]
    smd = _mahalanobis6(diff, inv_p)
    tr = _trace_product6(inv_p, c_cov)
    det_c = jnp.maximum(_det6(c_cov), 1e-30)
    det_p = jnp.maximum(_det6(state.cov), 1e-30)[:, None]
    kld = 0.5 * (smd + tr - 3.0 - jnp.log(det_c / det_p))
    ok_kld = kld <= (distance_delta * distance_delta * 0.5)

    self_idx = idx == jnp.arange(n, dtype=idx.dtype)[:, None]
    ok_parent = (~c_par) | self_idx

    eligible = (
        in_radius & ok_color & ok_kld & ok_parent
        & c_alive & parent_mask[:, None]
    )

    # --- likelihoods (hemLikelihoodOpacity, mixture.cpp:54-64) -------------
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    dist_w = jnp.exp(-(dist * dist) / (decay_rate * decay_rate))
    color_w = jnp.exp(-(color_diff * color_diff) / (decay_rate * decay_rate))
    c_opacity = state.opacity[idx]
    L = dist_w * c_opacity * color_w * jnp.sqrt(jnp.maximum(det_c, 0.0))
    wL = state.weight[:, None] * jnp.clip(L, _FLT_MIN, _MAX_L)
    wL = jnp.where(eligible, wL, 0.0)

    # --- responsibility denominators: sum over parents per child -----------
    sum_lw = jnp.zeros((n,), wL.dtype).at[idx.reshape(-1)].add(wL.reshape(-1))
    denom = sum_lw[idx]                                        # [N, K]
    r = jnp.where(denom > 0, wL / jnp.maximum(denom, _FLT_MIN), 0.0)
    w = r * state.weight[idx]                                  # [N, K]

    # --- accumulate (mixture.cpp:186-244) ----------------------------------
    w_s = jnp.sum(w, axis=1)                                   # [N]
    inv_w = 1.0 / jnp.maximum(w_s, 1e-30)
    mean_s = jnp.einsum("nk,nkc->nc", w, c_mean) * inv_w[:, None]
    col_s = jnp.einsum("nk,nkc->nc", w, c_color) * inv_w[:, None]
    # covariance accumulated relative to the parent mean (mixture.cpp:212)
    rel = c_mean - state.mean[:, None, :]
    outer = jnp.stack(
        [
            rel[..., 0] * rel[..., 0], rel[..., 0] * rel[..., 1],
            rel[..., 0] * rel[..., 2], rel[..., 1] * rel[..., 1],
            rel[..., 1] * rel[..., 2], rel[..., 2] * rel[..., 2],
        ],
        axis=-1,
    )
    sumcov = jnp.einsum("nk,nkc->nc", w, c_cov + outer)
    mrel = mean_s - state.mean
    mouter = jnp.stack(
        [
            mrel[:, 0] * mrel[:, 0], mrel[:, 0] * mrel[:, 1],
            mrel[:, 0] * mrel[:, 2], mrel[:, 1] * mrel[:, 1],
            mrel[:, 1] * mrel[:, 2], mrel[:, 2] * mrel[:, 2],
        ],
        axis=-1,
    )
    cov_s = sumcov * inv_w[:, None] - mouter
    opacity_s = jnp.einsum("nk,nk->n", w, c_opacity) * inv_w
    feat_s = jnp.einsum("nk,nkf->nf", w, state.features[idx]) * inv_w[:, None]

    # wrapped-normal statistics (mixture.cpp:199-244)
    c_nvar = state.nvar[idx]                                   # [N, K, 3]
    c_nlen = jnp.maximum(jnp.linalg.norm(c_nvar, axis=-1), 1e-30)
    c_normal = c_nvar / c_nlen[..., None]
    flip = jnp.sign(jnp.sum(c_normal * state.nvar[:, None, :], axis=-1))
    flip = jnp.where(flip == 0, 1.0, flip)
    resultant = jnp.einsum("nk,nkc->nc", w, c_normal * flip[..., None])
    nvar_sum = jnp.einsum("nk,nk->n", w, c_nlen)
    R = jnp.maximum(jnp.linalg.norm(resultant, axis=-1), 1e-30)
    variance1 = nvar_sum * inv_w
    r_mean = jnp.clip(R * inv_w, 1e-6, 1.0)
    variance2 = -2.0 * jnp.log(r_mean)
    new_normal = resultant / R[:, None]
    nvar_s = new_normal * (variance1 + variance2)[:, None]

    # --- compose output slots ----------------------------------------------
    merged_ok = parent_mask & (w_s > 0)
    orphan = child_alive & (sum_lw == 0.0)

    def pick(new, old):
        m = merged_ok.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    out_mean = pick(mean_s, state.mean)
    out_color = pick(col_s, state.color)
    out_cov = pick(cov_s, state.cov)
    out_opacity = jnp.where(merged_ok, opacity_s, state.opacity)
    out_weight = jnp.where(merged_ok, w_s, state.weight)
    out_feat = pick(feat_s, state.features)
    out_nvar = pick(nvar_s, state.nvar)

    alive = merged_ok | orphan
    # NaN / non-PSD culling (mixture.cpp:262-282), as a death mask.
    det_out = _det6(out_cov)
    bad = (
        jnp.any(~jnp.isfinite(out_mean), axis=-1)
        | ~jnp.isfinite(det_out)
        | (det_out <= 0.0)
    )
    alive = alive & ~bad

    new_parents = jax.random.uniform(key, (n,)) < (1.0 / hem_reduction)
    out = MixtureState(
        mean=out_mean,
        color=out_color,
        cov=out_cov,
        opacity=out_opacity,
        weight=out_weight,
        features=out_feat,
        nvar=out_nvar,
        is_parent=new_parents & alive,
        alive=alive,
    )
    if not with_stats:
        return out
    stats = {
        # parents whose K-th candidate is still in-radius: the fixed-K
        # neighborhood truncated what the reference's radius search returns
        "saturated_parents": jnp.sum(
            parent_mask & in_radius[:, -1] & c_alive[:, -1]
        ).astype(jnp.int32),
        "parents": jnp.sum(parent_mask).astype(jnp.int32),
        # parents beyond the compaction budget (searchless -> orphaned)
        "parent_overflow": parent_overflow,
        "merged": jnp.sum(merged_ok).astype(jnp.int32),
        "orphans": jnp.sum(orphan).astype(jnp.int32),
        "alive": jnp.sum(alive).astype(jnp.int32),
    }
    return out, stats


@jax.jit
def _device_compact(state: MixtureState):
    """Pack alive rows first (original order preserved via the iota key) into
    ONE [N, 13 + F] array, so the host pulls a single contiguous slice of
    ~alive rows instead of five full-[N] arrays — host<->device transfers
    through the tunnel run at ~30 MB/s, making the pull the second-largest
    steady-state cost of a level (0.6 s of 1.5 s measured at 200k)."""
    n = state.mean.shape[0]
    flag = jnp.where(state.alive, 0, 1).astype(jnp.int32)
    _, order = jax.lax.sort(
        (flag, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    packed = jnp.concatenate(
        [
            state.mean, state.color, state.opacity[:, None], state.cov,
            state.features,
        ],
        axis=1,
    )
    return packed[order], jnp.sum(state.alive).astype(jnp.int32)


def _materialize_level(packed, count) -> MixtureLevel:
    """Pull a `_device_compact` result to host as a MixtureLevel."""
    rows = np.asarray(packed[: int(count)])
    return MixtureLevel(
        xyz=rows[:, 0:3],
        colors=rows[:, 3:6],
        opacities=rows[:, 6],
        covariance=rows[:, 7:13],
        features=rows[:, 13:],
    )


def _compact(state: MixtureState) -> MixtureLevel:
    """Device slots -> host-side compacted MixtureLevel."""
    return _materialize_level(*_device_compact(state))


def create_mixture(
    cloud,
    params: GaussianMixtureParams,
    seed: int = 0,
    max_children: int = 32,
    backend: str = "jax",
    with_stats: bool = False,
    neighbor_search: str = "auto",
):
    """Run `cluster_level` HEM rounds over a GaussianCloud.

    Counterpart of `MixtureCreator.CreateMixture`
    (`/root/reference/src/cpp_ext/mixture_wrapper.cpp:10-18`): returns levels
    1..cluster_level (level 0 = the input itself is dropped, as there).

    backend: "jax" (TPU, fixed-K candidates) or "native" (host C++/OpenMP,
    exact radius search — the counterpart of the reference's extension,
    built in native/hem.cpp; falls back to "jax" if no compiler).

    With `with_stats` (jax backend only), returns (levels, per-level stats
    dicts — see `hem_cluster_level`).
    """
    if backend == "native":
        levels = _create_mixture_native(cloud, params, seed)
        if levels is not None:
            return (levels, []) if with_stats else levels
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    state = init_mixture(
        init_key,
        cloud.xyz,
        cloud.get_colors,
        cloud.get_opacity[:, 0],
        cloud.get_covariance(),
        cloud.features_rest.reshape(cloud.num_points, -1),
        params.hem_reduction,
    )
    levels = []
    all_stats = []
    # Grid candidate tables beat the [N, N] kNN sweep once N is large (the
    # sweep's lax.top_k dominates t_hem at bench scale); shapes are padded
    # so the level pyramid shares one hem_cluster_level executable whenever
    # the padded table shapes coincide.
    if neighbor_search not in ("auto", "grid", "global"):
        raise ValueError(f"unknown neighbor_search {neighbor_search!r}")
    grid_shape = None   # (rows_pad, w_pad) sticky across levels
    want_grid = neighbor_search == "grid" or (
        neighbor_search == "auto" and cloud.num_points >= 10_000
    )
    for _ in range(params.cluster_level):
        key, sub = jax.random.split(key)
        grid_kw = {}
        if want_grid:
            plan = _plan_level_grid(state, float(params.distance_delta))
            if plan is None and neighbor_search == "auto":
                # Coarser levels only grow the query radius while the alive
                # count shrinks slower than the cell count — once the
                # occupancy bound fails it fails for every later level.
                want_grid = False
            if plan is not None:
                origin, inv_cell, dims, max_occ = plan
                table = knn_ops.build_grid_table(
                    state.mean, state.alive, jnp.asarray(origin),
                    jnp.asarray(inv_cell),
                    dims[0], dims[1], dims[2], max_occ,
                )
                rows = table.shape[0]
                w4 = table.shape[1]
                if grid_shape is not None and (
                    rows <= grid_shape[0] and w4 <= grid_shape[1]
                ):
                    rows_pad, w_pad = grid_shape
                else:
                    rows_pad = 1 << (rows - 1).bit_length()
                    w_pad = 1 << (w4 - 1).bit_length()
                    grid_shape = (rows_pad, w_pad)
                table = _pad_grid_table(table, rows_pad, w_pad)
                grid_kw = dict(
                    use_grid=True,
                    grid_table=table,
                    grid_origin=jnp.asarray(origin),
                    grid_inv_cell=jnp.asarray(inv_cell),
                    grid_dims=jnp.asarray(dims, jnp.int32),
                )
        # Parent-compaction budget: ~N/reduction parents + a Binomial-tail
        # margin, rounded to the knn block size. Only pays off when the
        # budget actually cuts query blocks.
        n_slots = cloud.num_points
        budget = int(n_slots / max(float(params.hem_reduction), 1.01) * 1.15)
        budget = min(n_slots, -(-(budget + 256) // 1024) * 1024)
        out = hem_cluster_level(
            sub, state,
            float(params.hem_reduction),
            float(params.distance_delta),
            float(params.color_delta),
            float(params.decay_rate),
            max_children=max_children,
            with_stats=with_stats,
            max_parent_slots=budget if budget < n_slots else None,
            **grid_kw,
        )
        if with_stats:
            state, stats = out
            # Stack the per-level stat scalars into ONE device array (the
            # stack dispatch is async); the pull happens after the loop.
            all_stats.append(
                (tuple(stats), jnp.stack(list(stats.values())))
            )
        else:
            state = out
        # Defer the host pulls: keep the (packed, count) device arrays and
        # materialize after every level is DISPATCHED. Each host sync
        # through the tunnel costs a full round-trip that would otherwise
        # sit on the critical path between levels — deferring cut the warm
        # 3-level 200k wall from 3.8 s to the pull cost alone (the device
        # compute is ~0.2 s; see PERF.md "HEM host-sync batching").
        levels.append(_device_compact(state))
    levels = [_materialize_level(p, c) for p, c in levels]
    if with_stats:
        all_stats = [
            {k: int(v) for k, v in zip(keys, np.asarray(vals))}
            for keys, vals in all_stats
        ]
    return (levels, all_stats) if with_stats else levels


@jax.jit
def _grid_precheck_scalars(state: "MixtureState", distance_delta):
    """Device-side scalars for the grid-plan feasibility precheck, PACKED
    into one f32[6] array: ONE small transfer (= one tunnel round-trip)
    instead of pulling [N] masks + [N, 3] means to host on levels where the
    plan is infeasible anyway (dense scenes with query radius comparable to
    the bbox — e.g. the config-3 bench scene — fail the average-occupancy
    bound at every level). Counts are exact as f32 (< 2^24)."""
    alive = state.alive
    parents = state.is_parent & alive
    radius = distance_delta * jnp.sqrt(
        jnp.maximum(_max_eigenvalue6(state.cov), 0.0)
    )
    rmax = jnp.max(jnp.where(parents, radius, 0.0))
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(alive[:, None], state.mean, big), axis=0)
    hi = jnp.max(jnp.where(alive[:, None], state.mean, -big), axis=0)
    span = hi - lo
    return jnp.stack([
        rmax, span[0], span[1], span[2],
        jnp.sum(alive).astype(jnp.float32),
        jnp.sum(parents).astype(jnp.float32),
    ])


def _plan_level_grid(state: "MixtureState", distance_delta: float,
                     max_w: int = 4096, max_cells: int = 1_000_000):
    """Host-side grid plan for one HEM level: cell >= the LARGEST alive
    parent's query radius so every parent's radius ball fits its 27-cell
    window. None -> the global-kNN fallback."""
    pk = np.asarray(_grid_precheck_scalars(
        state, jnp.float32(distance_delta)
    ))                                       # ONE host pull for all scalars
    rmax = float(pk[0])
    m = int(pk[4])
    if int(pk[5]) == 0 or m == 0 or not np.isfinite(rmax) or rmax <= 0:
        return None
    # Feasibility from scalars alone (the same doubling walk grid_nn_plan
    # does, minus the per-cell bincount): if no cell size passes the
    # average-occupancy and cell-count bounds, skip the host pull entirely.
    span = np.asarray(pk[1:4], np.float64)
    cell = rmax
    feasible = False
    for _ in range(40):
        dims = np.minimum(np.floor(span / cell).astype(np.int64) + 1, 1 << 20)
        n_cells = int(dims.prod())
        if 27 * m / max(n_cells, 1) > max_w:
            break  # coarsening only increases average occupancy
        if n_cells <= max_cells:
            feasible = True
            break
        cell *= 2.0
    if not feasible:
        return None
    alive = np.asarray(state.alive)
    means = np.asarray(state.mean)[alive]
    plan = knn_ops.grid_nn_plan(means, rmax, max_w=max_w)
    return plan


def _pad_grid_table(table: jax.Array, rows_pad: int, w_pad: int) -> jax.Array:
    """Pad a candidate table to (rows_pad, w_pad) so level shapes coincide.
    Row padding is never indexed (cell ids stay < the true cell count);
    column padding must be EMPTY slots — (far, far, far, -1) — so the extra
    candidates always fail the radius gate."""
    rows, w4 = table.shape
    if w_pad > w4:
        n_slots = (w_pad - w4) // 4
        empty = jnp.tile(
            jnp.asarray(
                [knn_ops._GRID_PAD_COORD] * 3 + [-1.0], jnp.float32
            ),
            (rows, n_slots),
        )
        table = jnp.concatenate([table, empty], axis=1)
    if rows_pad > rows:
        table = jnp.pad(table, ((0, rows_pad - rows), (0, 0)))
    return table


def _initial_nvar(cov6: np.ndarray) -> np.ndarray:
    """Smallest-eigenvector of each covariance scaled by variance 0.001
    (`mixture.cpp:318-326`)."""
    full = np.asarray(math3d.unpack_symmetric(jnp.asarray(cov6)))
    _, vecs = np.linalg.eigh(full)
    return (vecs[..., :, 0] * 0.001).astype(np.float32)


def _create_mixture_native(
    cloud, params: GaussianMixtureParams, seed: int
) -> Optional[List[MixtureLevel]]:
    """Host C++/OpenMP HEM (native/hem.cpp) — Python owns the RNG so runs are
    deterministic and testable against the JAX path."""
    from gaussiansplattingregistration_tpu.utils import native

    if native.load_library() is None:
        return None
    rng = np.random.default_rng(seed)
    p = 1.0 / params.hem_reduction

    mean = np.asarray(cloud.xyz, np.float32)
    color = np.asarray(cloud.get_colors, np.float32)
    cov6 = np.asarray(cloud.get_covariance(), np.float32)
    opacity = np.asarray(cloud.get_opacity[:, 0], np.float32)
    weight = np.ones(mean.shape[0], np.float32)
    features = np.asarray(
        cloud.features_rest.reshape(cloud.num_points, -1), np.float32
    )
    nvar = _initial_nvar(cov6)

    levels: List[MixtureLevel] = []
    for _ in range(params.cluster_level):
        is_parent = (rng.random(mean.shape[0]) < p).astype(np.uint8)
        out = native.hem_cluster_level_native(
            mean, color, cov6, opacity, weight, features, nvar, is_parent,
            params.distance_delta, params.color_delta, params.decay_rate,
        )
        if out is None:
            return None
        mean, color, cov6, opacity, weight, features, nvar = out
        levels.append(
            MixtureLevel(
                xyz=mean.copy(), colors=color.copy(), opacities=opacity.copy(),
                covariance=cov6.copy(), features=features.copy(),
            )
        )
    return levels


def mixture_levels_to_clouds(levels: List[MixtureLevel], sh_degree: int):
    """Convert mixture levels back to GaussianClouds (counterpart of the
    worker loop at `qt_gaussian_mixture.py:95-116` + `from_mixture`)."""
    from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud

    out = []
    for level in levels:
        out.append(GaussianCloud.from_mixture(level, sh_degree))
    return out
