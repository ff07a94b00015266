"""Ball query and grouping.

Semantics mirror the reference CUDA kernels:

- ``ball_query`` (`pointnet2/_ext_src/src/ball_query_gpu.cu:14-58`): for each
  query center, the indices of the FIRST ``nsample`` points (in input scan
  order, not by distance) whose squared distance is strictly < radius^2.
  When the first in-radius point is found, all ``nsample`` slots are
  pre-filled with its index, so centers with fewer than ``nsample`` neighbors
  repeat the first neighbor. Centers with zero neighbors keep index 0
  (the output buffer is zero-initialized). Non-differentiable, int32 output.

- ``group_points`` (`group_points_gpu.cu:13-79`): a plain gather
  (B,N,C) x (B,m,ns) -> (B,m,ns,C) (channels-last here), differentiable
  w.r.t. features (the scatter-add backward falls out of autodiff).

TPU-first design: "the first ``nsample`` in-radius points in scan order" is
exactly "the ``nsample`` SMALLEST indices among in-radius points", so the
whole op becomes a top-k selection — no scatter (TPU scatters serialize; a
scatter formulation measured 5.1 s for SA1 shapes). Two paths:
``exact=True`` streams N-chunks through a running top-k merge (CUDA-parity
index sets for tests); ``exact=False`` (the model default) is one
``approx_min_k`` partial reduction over full N with the distance matmul
fused in — 19.9 ms vs 5151 ms at SA1 shapes on v5e.
"""
from functools import partial

import jax
import jax.numpy as jnp

_INT_INF = jnp.int32(2**31 - 1)


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    chunk: int = 8192,
    exact: bool = True,
) -> jax.Array:
    """xyz: (B, N, 3) candidates; new_xyz: (B, m, 3) centers.

    Returns int32 (B, m, nsample) with reference first-found semantics:
    slots past the neighbor count repeat the first neighbor; centers with no
    neighbor keep index 0 (ball_query_gpu.cu:39-45). One caveat even on the
    exact path: d2 comes from the |c|^2+|p|^2-2c.p matmul identity (MXU
    HIGHEST), whose last-ulp rounding can differ from CUDA's direct
    (c-p)^2 sum — a point mathematically ON the radius boundary may
    classify differently. Verified sets are identical on the oracle suite;
    the divergence regime is measure-zero boundary ties.

    ``exact=False`` uses ``lax.approx_min_k`` (TPU-native partial reduction,
    ~6x faster at SA1 scale). Best-effort contract: returned indices are
    in-radius neighbors (up to HIGH-precision d2 rounding at the boundary
    for n > 16384) and typically the nsample smallest; the partial
    reduction may drop a true neighbor (recall_target < 1) even for
    centers with <= nsample in-radius points, refilling the slot with the
    first found. Measured recall 0.9996 at SA1 train shapes. Use for
    training; keep ``exact=True`` for parity tests.
    """
    if not exact:
        return _ball_query_approx(radius, nsample, xyz, new_xyz, chunk)
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    # f32(radius) * f32(radius), like the CUDA kernel — f32(radius*radius
    # in double) is 1 ulp off for e.g. radius=0.2 and can flip boundary
    # points under the strict d2 < r2 test
    r2 = jnp.float32(radius) * jnp.float32(radius)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    chunk = min(chunk, n)
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    # Pad with far-away sentinels so padded points never match.
    if pad:
        xyz_p = jnp.concatenate(
            [xyz, jnp.full((b, pad, 3), 1e18, dtype=jnp.float32)], axis=1
        )
    else:
        xyz_p = xyz
    xyz_chunks = xyz_p.reshape(b, nchunks, chunk, 3).transpose(1, 0, 2, 3)

    center_sq = jnp.sum(new_xyz * new_xyz, axis=-1)  # (B, m)

    def scan_body(best, inp):
        # best: (B, m, nsample) int32 — smallest in-radius indices so far,
        # ascending, INT_INF-padded.
        pts, base = inp  # pts: (B, chunk, 3), base: global offset

        def per_scene(best_s, pts_s, centers_s, csq_s):
            # |c - p|^2 = |c|^2 + |p|^2 - 2 c.p — cross term on the MXU.
            cross = jax.lax.dot_general(
                centers_s, pts_s,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (m, chunk)
            psq = jnp.sum(pts_s * pts_s, axis=-1)  # (chunk,)
            d2 = csq_s[:, None] + psq[None, :] - 2.0 * cross
            kglob = base + jnp.arange(chunk, dtype=jnp.int32)
            cand = jnp.where(d2 < r2, kglob[None, :], _INT_INF)  # (m, chunk)
            # nsample smallest of [best | chunk candidates]. Value-only sorts:
            # lax.top_k lowers to a stable sort carrying a companion index
            # array — twice the sort traffic for values we'd discard.
            chunk_top = jnp.sort(cand, axis=1)[:, :nsample]
            merged = jnp.concatenate([best_s, chunk_top], axis=1)
            return jnp.sort(merged, axis=1)[:, :nsample]

        best = jax.vmap(per_scene)(best, pts, new_xyz, center_sq)
        return best, None

    best0 = jnp.full((b, m, nsample), _INT_INF, dtype=jnp.int32)
    bases = (jnp.arange(nchunks) * chunk).astype(jnp.int32)
    best, _ = jax.lax.scan(scan_body, best0, (xyz_chunks, bases))

    # `best` is ascending (INT_INF-padded) from the chunked sort-merge;
    # fill overflow slots with the first found index, empty centers with 0.
    found = best < _INT_INF
    first = jnp.where(found[:, :, :1], best[:, :, :1], 0)
    return jnp.where(found, best, first)


def _ball_query_approx(radius, nsample, xyz, new_xyz, chunk):
    """approx_min_k fast path, single full-N pass.

    ``aggregate_to_topk=False`` returns the raw partially-reduced candidate
    set (XLA fuses the distance computation into the partial reduction — the
    (m, N) matrix is never materialized); one exact top-k then selects the
    nsample smallest indices. Measured 19.9 ms vs 57.4 ms for the chunked
    aggregated form and 5151 ms for a scatter form (SA1 shapes, v5e).
    ``chunk`` is unused (kept for API stability).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = jnp.float32(radius) * jnp.float32(radius)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    # Per-scene mean-centering shrinks |q_c||q_p|, the scale of the MXU
    # multi-pass residual error in the cross term, so 3-pass HIGH precision
    # suffices at big-N shapes (d2 is translation-invariant).
    mu = jnp.mean(xyz, axis=1, keepdims=True)
    xyz = xyz - mu
    new_xyz = new_xyz - mu
    center_sq = jnp.sum(new_xyz * new_xyz, axis=-1)
    finf = jnp.float32(2**30)  # < f32 exact-int limit, > any index
    kglob = jnp.arange(n, dtype=jnp.float32)
    # v5e sweep at SA1 shapes (12 x 2048 centers x 40k points, ns=64):
    # HIGHEST/r.95 18.2 ms recall .997 | HIGH+center/r.80 8.9 ms recall .985.
    # The recall_target drives the partial-reduce width l (the sort that
    # dominates); dropped neighbors are boundary-shell / stride collisions,
    # covered by the any-in-radius-subset contract. Small layers stay on
    # the accurate setting — they are cheap either way.
    if n > 16384:
        prec, recall = jax.lax.Precision.HIGH, 0.8
    else:
        prec, recall = jax.lax.Precision.HIGHEST, 0.95

    def per_scene(pts_s, centers_s, csq_s):
        cross = jax.lax.dot_general(
            centers_s, pts_s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        d2 = csq_s[:, None] + jnp.sum(pts_s * pts_s, axis=-1)[None, :] - 2.0 * cross
        cand = jnp.where(d2 < r2, kglob[None, :], finf)
        # aggregate_to_topk=True: XLA's own exact top-k over the reduced set
        # is ~2x faster than an explicit jnp.sort of the (m, l) partial
        # result (6.5 vs 13.5 ms at SA1 shapes on v5e), and lax.top_k would
        # be 2x worse still (stable pair-sort with a companion iota). The
        # cheap final sort fixes ascending slot order on the k survivors.
        sel = jax.lax.approx_min_k(
            cand, nsample, recall_target=recall, aggregate_to_topk=True
        )[0]
        return jnp.sort(sel, axis=1)

    best = jax.vmap(per_scene)(xyz, new_xyz, center_sq)

    # ascending indices; fill overflow slots with the first found index,
    # empty centers with 0.
    found = best < finf
    besti = best.astype(jnp.int32)
    first = jnp.where(found[:, :, :1], besti[:, :, :1], 0)
    return jnp.where(found, besti, first)


@jax.custom_vjp
def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather feature groups. features: (B, N, C), idx: (B, m, ns) int ->
    (B, m, ns, C). Differentiable w.r.t. ``features`` only
    (`pointnet2_utils.GroupingOperation`, pointnet2/pointnet2_utils.py:210-258).

    The backward is a custom VJP: one-hot matmul segment-sum (ops/scatter.py)
    instead of XLA's serialized TPU scatter-add.

    TPU forward: a plain row gather. Row cost grows ~11 ns/KB past a ~5 ns
    floor, so the one lever that pays is fewer/narrower rows (models/
    pointnet2.py packs xyz+features into ONE table, bf16 with bitcast-f32
    xyz payload in fast mode). A P-points-per-row packing with an idx%P
    select epilogue was tried and ultimately LOST to the plain gather at
    SA1 train shapes once the epilogue cost was accounted honestly
    (bench 102 -> 107.5 scenes/s after removal) — narrow 16 B rows gather
    at the same row rate as 128 B rows, so packing buys nothing the
    epilogue doesn't spend.

    On TPU, f32 tables up to 256 lanes dispatch to a Pallas kernel that
    pins the whole per-scene table in VMEM (ops/gather_pallas.py):
    VMEM-local loads beat the HBM gather ~2x on row rate (v5e: 3.1 vs 7.4
    ns/row at 4 lanes, 8.2 vs 13.9 at 131 lanes).
    """
    from .gather_pallas import gather_rows_vmem, gather_rows_vmem_supported

    b, n, c = features.shape
    m, ns = idx.shape[1], idx.shape[2]
    # one index contract on every path: clamp to [0, n-1] (XLA would wrap
    # negatives, the Pallas kernel clamps; the clamp also matches the
    # one-hot VJP's data flow)
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    if jax.default_backend() == "tpu" and gather_rows_vmem_supported(
        n, m * ns, c, features.dtype
    ):
        flat = gather_rows_vmem(features, idx.reshape(b, m * ns))
        return flat.reshape(b, m, ns, c)
    return jax.vmap(lambda f, i: f[i])(features, idx)


def _group_fwd(features, idx):
    return group_points(features, idx), (idx, features.shape[1])


def _group_bwd(res, g):
    from .scatter import batched_onehot_segment_sum

    idx, n = res
    b, m, ns, c = g.shape
    # match the forward's clamp so OOB cotangents land on the row the
    # forward actually read (an unclamped one-hot would silently drop them)
    flat_idx = jnp.clip(idx.reshape(b, m * ns).astype(jnp.int32), 0, n - 1)
    flat_g = g.reshape(b, m * ns, c)
    return batched_onehot_segment_sum(flat_idx, flat_g, n), None


group_points.defvjp(_group_fwd, _group_bwd)
