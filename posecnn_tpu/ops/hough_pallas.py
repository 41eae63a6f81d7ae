"""Pallas TPU kernel: Hough vote accumulation.

The hot inner loop of Hough voting (vote accumulation over
cells × samples, ref CUDA kernel compute_hough_kernel
lib/hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc:253-333) as a
tiled Pallas kernel:

  grid = (class-slot, cell-tile-row, cell-tile-col); each program
  accumulates one (8, 128) tile of Hough cells over all S samples of
  its class slot (VPU elementwise work, fp32 accumulate in VMEM
  scratch).

TPU-native optimization the XLA path can't express: per-slot vote
bounding boxes ride in as scalar-prefetch arguments, and tiles that
cannot receive any vote (no sample's projected-extent box reaches
them) SKIP the whole sample loop with `pl.when` — on typical scenes
objects cover a small fraction of the image, cutting the dominant
cost several-fold. The CUDA reference instead iterates every
(cell, sample) pair of present classes.

Falls back to interpret mode off-TPU so the same code path is tested
on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
WINDOW = 32  # refine-window side (WINDOW² == TILE_H·TILE_W)


def _vote_kernel(
    bbox_ref,  # SMEM scalar-prefetch: (K, 4) [x0, x1, y0, y1] pixel coords
    samples_ref,  # SMEM scalar-prefetch (K, 8, S): x, y, u, v, d, (t·‖uv‖)², thresh, weight
    votes_ref,  # out (1, TILE_H, TILE_W)
    dsum_ref,  # out (1, TILE_H, TILE_W)
    acc_v,  # VMEM scratch (TILE_H, TILE_W)
    acc_d,  # VMEM scratch (TILE_H, TILE_W)
    *,
    num_samples: int,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
):
    k = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    # Mosaic requires integer iota; cast to float after
    row_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + ti * TILE_H
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + tj * TILE_W
    cy = row_i.astype(jnp.float32) * cell_stride
    cx = col_i.astype(jnp.float32) * cell_stride
    # cells outside the (possibly padded) grid produce no votes
    in_grid = (row_i < grid_h) & (col_i < grid_w)

    acc_v[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc_d[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    # tile↔slot-bbox overlap test (cell pixel coords)
    x_lo = bbox_ref[k, 0]
    x_hi = bbox_ref[k, 1]
    y_lo = bbox_ref[k, 2]
    y_hi = bbox_ref[k, 3]
    tile_x0 = tj * TILE_W * cell_stride
    tile_x1 = (tj + 1) * TILE_W * cell_stride
    tile_y0 = ti * TILE_H * cell_stride
    tile_y1 = (ti + 1) * TILE_H * cell_stride
    overlap = (
        (x_hi >= tile_x0)
        & (x_lo < tile_x1)
        & (y_hi >= tile_y0)
        & (y_lo < tile_y1)
    )

    @pl.when(overlap)
    def _():
        def body(j, _):
            # dynamic scalar reads come from SMEM (scalar-prefetch
            # operand) — Mosaic cannot do dynamic lane indexing in VMEM
            x = samples_ref[k, 0, j]
            y = samples_ref[k, 1, j]
            thr = samples_ref[k, 6, j]
            wgt = samples_ref[k, 7, j]

            # per-SAMPLE tile skip (scalar): this sample's vote box
            # [x±thr]×[y±thr] must reach the tile at all — on real
            # scenes (compact objects) most (tile, sample) pairs skip
            # the vector work entirely
            hit = (
                (x + thr >= tile_x0)
                & (x - thr < tile_x1)
                & (y + thr >= tile_y0)
                & (y - thr < tile_y1)
                & (wgt > 0.0)
            )

            @pl.when(hit)
            def _():
                u = samples_ref[k, 2, j]
                v = samples_ref[k, 3, j]
                d = samples_ref[k, 4, j]
                t2n2 = samples_ref[k, 5, j]  # (threshold·‖uv‖)²

                dx = cx - x
                dy = cy - y
                # algebraic cone test — no sqrt, no divide:
                #   dot/(‖uv‖·dist) > t  ⟺  dot > 0 ∧ dot² > t²‖uv‖²·dist²
                # (t = inlier_threshold > 0; at dist = 0 both sides
                # give "not inlier", matching the +1e-10-guarded form)
                dot = u * dx + v * dy
                dist2 = dx * dx + dy * dy
                inl = (
                    (dot > 0.0)
                    & (dot * dot > t2n2 * dist2)
                    & (jnp.abs(dx) < thr)
                    & (jnp.abs(dy) < thr)
                    & in_grid
                )
                w = jnp.where(inl, wgt, 0.0)
                acc_v[:] = acc_v[:] + w
                acc_d[:] = acc_d[:] + w * d

            return 0

        jax.lax.fori_loop(0, num_samples, body, 0)

    votes_ref[0] = acc_v[:]
    dsum_ref[0] = acc_d[:]


@functools.partial(
    jax.jit,
    static_argnames=("cell_stride", "grid_h", "grid_w", "interpret"),
)
def hough_votes_pallas(
    samples: jnp.ndarray,  # (K, 8, S) packed sample channels
    bboxes: jnp.ndarray,  # (K, 4) [x_lo, x_hi, y_lo, y_hi] pixel coords
    *,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
    interpret: bool = False,
):
    """Returns (votes, dsum) each (K, grid_h, grid_w) fp32."""
    k_slots, _, s = samples.shape
    ph = pl.cdiv(grid_h, TILE_H)
    pw = pl.cdiv(grid_w, TILE_W)

    # the inlier threshold is pre-folded into sample channel 5 as
    # (threshold·‖uv‖)² by the caller's packing (_prepare_slots)
    kernel = functools.partial(
        _vote_kernel,
        num_samples=s,
        cell_stride=cell_stride,
        grid_h=grid_h,
        grid_w=grid_w,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bboxes + packed samples, both in SMEM
        grid=(k_slots, ph, pw),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda k, i, j, bbox, samp: (k, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda k, i, j, bbox, samp: (k, i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
    )
    votes, dsum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((k_slots, ph * TILE_H, pw * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((k_slots, ph * TILE_H, pw * TILE_W), jnp.float32),
        ),
        interpret=interpret,
    )(bboxes, samples)
    return votes[:, :grid_h, :grid_w], dsum[:, :grid_h, :grid_w]


def _flat_vote_kernel(
    bbox_ref,  # SMEM scalar-prefetch: (K, 4) [x0, x1, y0, y1] pixel coords
    samples_ref,  # SMEM scalar-prefetch (K, 8, S)
    votes_ref,  # out (1, TILE_H, TILE_W)
    dsum_ref,  # out (1, TILE_H, TILE_W)
    acc_v,
    acc_d,
    *,
    num_samples: int,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
):
    """Vote accumulation over a FLAT-packed cell grid: tile t covers
    cells [t·1024, (t+1)·1024) in row-major order, so every (8, 128)
    vector op is 100% dense regardless of grid width. Used for the
    coarse c2f pass whose grid (e.g. 120×160 at 480×640/4) would waste
    60% of lanes under 2D (8, 128) tiling (160 cols pad to 256). A
    tile spans ~1024/grid_w rows and all columns, so the skip tests
    are y-only — at coarse granularity the 2D kernel's x-skip is
    ineffective anyway (one 128-lane tile already covers 128 of
    grid_w≈160 columns)."""
    k = pl.program_id(0)
    t = pl.program_id(1)
    base = t * (TILE_H * TILE_W)

    r = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    idx = base + r * TILE_W + c
    fy = idx // grid_w
    fxc = idx - fy * grid_w
    cy = fy.astype(jnp.float32) * cell_stride
    cx = fxc.astype(jnp.float32) * cell_stride
    in_grid = fy < grid_h

    acc_v[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc_d[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    # tile y-span in pixel coords (inclusive)
    tile_y0 = (base // grid_w) * cell_stride
    tile_y1 = ((base + TILE_H * TILE_W - 1) // grid_w) * cell_stride

    y_lo = bbox_ref[k, 2]
    y_hi = bbox_ref[k, 3]
    overlap = (y_hi >= tile_y0) & (y_lo <= tile_y1)

    @pl.when(overlap)
    def _():
        def body(j, _):
            x = samples_ref[k, 0, j]
            y = samples_ref[k, 1, j]
            thr = samples_ref[k, 6, j]
            wgt = samples_ref[k, 7, j]
            hit = (
                (y + thr >= tile_y0)
                & (y - thr <= tile_y1)
                & (wgt > 0.0)
            )

            @pl.when(hit)
            def _():
                u = samples_ref[k, 2, j]
                v = samples_ref[k, 3, j]
                d = samples_ref[k, 4, j]
                t2n2 = samples_ref[k, 5, j]
                dx = cx - x
                dy = cy - y
                dot = u * dx + v * dy
                dist2 = dx * dx + dy * dy
                inl = (
                    (dot > 0.0)
                    & (dot * dot > t2n2 * dist2)
                    & (jnp.abs(dx) < thr)
                    & (jnp.abs(dy) < thr)
                    & in_grid
                )
                w = jnp.where(inl, wgt, 0.0)
                acc_v[:] = acc_v[:] + w
                acc_d[:] = acc_d[:] + w * d

            return 0

        jax.lax.fori_loop(0, num_samples, body, 0)

    votes_ref[0] = acc_v[:]
    dsum_ref[0] = acc_d[:]


@functools.partial(
    jax.jit,
    static_argnames=("cell_stride", "grid_h", "grid_w", "interpret"),
)
def hough_votes_flat(
    samples: jnp.ndarray,  # (K, 8, S)
    bboxes: jnp.ndarray,  # (K, 4)
    *,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
    interpret: bool = False,
):
    """Flat-packed vote accumulation; returns (votes, dsum) each
    (K, grid_h·grid_w) in row-major cell order."""
    k_slots, _, s = samples.shape
    n_cells = grid_h * grid_w
    tile = TILE_H * TILE_W
    n_tiles = pl.cdiv(n_cells, tile)
    kernel = functools.partial(
        _flat_vote_kernel,
        num_samples=s,
        cell_stride=cell_stride,
        grid_h=grid_h,
        grid_w=grid_w,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_slots, n_tiles),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda k, t, bbox, samp: (k, t, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda k, t, bbox, samp: (k, t, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
    )
    votes, dsum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((k_slots, n_tiles * TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((k_slots, n_tiles * TILE_H, TILE_W), jnp.float32),
        ),
        interpret=interpret,
    )(bboxes, samples)
    return (
        votes.reshape(k_slots, n_tiles * tile)[:, :n_cells],
        dsum.reshape(k_slots, n_tiles * tile)[:, :n_cells],
    )


def _window_vote_kernel(
    origins_ref,  # SMEM scalar-prefetch (K·T, 3) int32: [oy, ox, enable]
    samples_ref,  # SMEM scalar-prefetch (K, 8, S): x, y, u, v, d, (t·‖uv‖)², thresh, weight
    votes_ref,  # out (1, TILE_H, TILE_W)
    dsum_ref,  # out (1, TILE_H, TILE_W)
    acc_v,  # VMEM scratch
    acc_d,  # VMEM scratch
    *,
    num_samples: int,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
    top_t: int,
):
    """Exact stride-1 vote accumulation over one WINDOW×WINDOW patch of
    Hough cells anchored at a coarse-pass candidate (origins in fine-cell
    units). The (8, 128) output tile packs the window row-major:
    window cell idx = tile_row·128 + tile_col, (wy, wx) = divmod(idx, 32)."""
    p = pl.program_id(0)
    k = p // top_t
    oy = origins_ref[p, 0]
    ox = origins_ref[p, 1]
    enable = origins_ref[p, 2] > 0

    r = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    idx = r * TILE_W + c
    fy = oy + idx // WINDOW  # fine-cell row
    fxc = ox + idx % WINDOW  # fine-cell col
    cy = fy.astype(jnp.float32) * cell_stride  # pixel coords
    cx = fxc.astype(jnp.float32) * cell_stride
    in_grid = (fy < grid_h) & (fxc < grid_w)

    acc_v[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc_d[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    win_x0 = (ox * cell_stride).astype(jnp.float32)
    win_x1 = ((ox + WINDOW) * cell_stride).astype(jnp.float32)
    win_y0 = (oy * cell_stride).astype(jnp.float32)
    win_y1 = ((oy + WINDOW) * cell_stride).astype(jnp.float32)

    @pl.when(enable)
    def _():
        def body(j, _):
            x = samples_ref[k, 0, j]
            y = samples_ref[k, 1, j]
            thr = samples_ref[k, 6, j]
            wgt = samples_ref[k, 7, j]
            hit = (
                (x + thr >= win_x0)
                & (x - thr < win_x1)
                & (y + thr >= win_y0)
                & (y - thr < win_y1)
                & (wgt > 0.0)
            )

            @pl.when(hit)
            def _():
                u = samples_ref[k, 2, j]
                v = samples_ref[k, 3, j]
                d = samples_ref[k, 4, j]
                t2n2 = samples_ref[k, 5, j]
                dx = cx - x
                dy = cy - y
                dot = u * dx + v * dy
                dist2 = dx * dx + dy * dy
                inl = (
                    (dot > 0.0)
                    & (dot * dot > t2n2 * dist2)
                    & (jnp.abs(dx) < thr)
                    & (jnp.abs(dy) < thr)
                    & in_grid
                )
                w = jnp.where(inl, wgt, 0.0)
                acc_v[:] = acc_v[:] + w
                acc_d[:] = acc_d[:] + w * d

            return 0

        jax.lax.fori_loop(0, num_samples, body, 0)

    votes_ref[0] = acc_v[:]
    dsum_ref[0] = acc_d[:]


@functools.partial(
    jax.jit,
    static_argnames=("cell_stride", "grid_h", "grid_w", "top_t",
                     "coarse_factor", "coarse_local_max", "interpret"),
)
def hough_votes_c2f_windows(
    samples: jnp.ndarray,  # (K, 8, S) packed sample channels
    bboxes: jnp.ndarray,  # (K, 4) [x_lo, x_hi, y_lo, y_hi] pixel coords
    *,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
    top_t: int = 4,
    coarse_factor: int = 4,
    coarse_local_max: bool = False,
    interpret: bool = False,
):
    """Coarse pass + exact refinement windows (the shared c2f core).

    Pass 1 votes on every `coarse_factor`-th cell (16× less work at
    the default 4) with the flat-packed kernel; pass 2 re-votes
    EXACTLY on WINDOW×WINDOW fine-cell patches centered on the
    top-`top_t` coarse cells per slot.

    With `coarse_local_max` (multi-instance mode), the top-`top_t`
    coarse candidates are picked GREEDILY with spatial suppression —
    plain top-k would spend the whole candidate budget on coarse
    cells around the one or two strongest peaks, and secondary vote
    maxima (the reference emits EVERY above-threshold 7×7 local max,
    .cu.cc:345-381) would get no refinement window. The suppression
    radius approximates window coverage: suppressed coarse cells lie
    inside the suppressor's window except the outermost ring, which
    can stick out up to f-2+f//2 fine cells past the window edge
    (e.g. suppressed rows to ccy·4+19 vs window rows to ccy·4+17 at
    defaults) — a fine local max in that rim band is refined by a
    later greedy round's window when one lands there, or lost when
    `top_t` stronger clusters exhaust the budget first (the same
    votes-ranked cutoff the fixed-size candidate output imposes
    anyway; the kernel-parity tests encode this rim tolerance).

    Returns (votes_w, dsum_w, oy, ox, enable):
      votes_w, dsum_w — (K, top_t, WINDOW·WINDOW) fine-cell votes /
        depth-weighted sums, window cells packed row-major;
      oy, ox — (K, top_t) int32 window origins in fine-cell coords
        (windows are fully inside the grid when the grid is ≥ WINDOW);
      enable — (K, top_t) bool, False for dead coarse candidates
        (their window votes are all zero).
    """
    k_slots, _, s = samples.shape
    f = coarse_factor
    ch = pl.cdiv(grid_h, f)
    cw = pl.cdiv(grid_w, f)

    votes_c, _ = hough_votes_flat(
        samples,
        bboxes,
        cell_stride=cell_stride * f,
        grid_h=ch,
        grid_w=cw,
        interpret=interpret,
    )
    if coarse_local_max:
        # greedy pick-and-suppress with a full window radius
        # (r = W/(2f) = 4 at defaults): rim cells adjacent to a picked
        # peak are suppressed — otherwise their near-duplicate windows
        # exhaust the candidate budget and secondary maxima get no
        # window at all — while cells just beyond the suppression ring
        # stay available and claim their own windows in later greedy
        # rounds, tiling coverage outward. Cells in the outermost
        # suppressed ring sit within a few fine cells of the window
        # edge, where local-max candidacy defers to one of those later
        # windows — on wide equal-vote plateaus this can surface a
        # different plateau cell than the exhaustive path (the
        # tolerance the parity tests encode; the reference's own
        # atomics make plateau emission order nondeterministic,
        # .cu.cc:377).
        r = WINDOW // (2 * f)
        cy_i = jax.lax.broadcasted_iota(jnp.int32, (k_slots, ch, cw), 1)
        cx_i = jax.lax.broadcasted_iota(jnp.int32, (k_slots, ch, cw), 2)

        def pick(avail, _):
            flat = avail.reshape(k_slots, ch * cw)
            i = jnp.argmax(flat, axis=1)
            v = jnp.take_along_axis(flat, i[:, None], 1)[:, 0]
            py = (i // cw)[:, None, None]
            px = (i % cw)[:, None, None]
            supp = (jnp.abs(cy_i - py) <= r) & (jnp.abs(cx_i - px) <= r)
            return jnp.where(supp, 0.0, avail), (v, i.astype(jnp.int32))

        _, (top_v_t, top_i_t) = jax.lax.scan(
            pick, votes_c.reshape(k_slots, ch, cw), None, length=top_t
        )
        top_v, top_i = top_v_t.T, top_i_t.T  # (K, top_t)
    else:
        top_v, top_i = jax.lax.top_k(votes_c, top_t)
    ccy = top_i // cw
    ccx = top_i % cw
    oy = jnp.clip(ccy * f + f // 2 - WINDOW // 2, 0, max(grid_h - WINDOW, 0))
    ox = jnp.clip(ccx * f + f // 2 - WINDOW // 2, 0, max(grid_w - WINDOW, 0))
    enable = top_v > 0
    origins = jnp.stack([oy, ox, enable.astype(jnp.int32)], axis=-1).reshape(
        k_slots * top_t, 3
    ).astype(jnp.int32)

    kernel = functools.partial(
        _window_vote_kernel,
        num_samples=s,
        cell_stride=cell_stride,
        grid_h=grid_h,
        grid_w=grid_w,
        top_t=top_t,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_slots * top_t,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda p, orig, samp: (p, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda p, orig, samp: (p, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
    )
    votes_w, dsum_w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((k_slots * top_t, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((k_slots * top_t, TILE_H, TILE_W), jnp.float32),
        ),
        interpret=interpret,
    )(origins, samples)

    n_win = WINDOW * WINDOW
    return (
        votes_w.reshape(k_slots, top_t, n_win),
        dsum_w.reshape(k_slots, top_t, n_win),
        oy,
        ox,
        enable,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cell_stride", "grid_h", "grid_w", "top_t",
                     "coarse_factor", "interpret"),
)
def hough_votes_c2f(
    samples: jnp.ndarray,  # (K, 8, S) packed sample channels
    bboxes: jnp.ndarray,  # (K, 4) [x_lo, x_hi, y_lo, y_hi] pixel coords
    *,
    cell_stride: int,
    grid_h: int,
    grid_w: int,
    top_t: int = 4,
    coarse_factor: int = 4,
    interpret: bool = False,
):
    """Coarse-to-fine single-instance vote maximum per class slot.

    The exhaustive kernel evaluates every stride-`cell_stride` Hough
    cell (the CUDA reference iterates every (cell, sample) pair,
    ref .cu.cc:253-333). The per-slot argmax only needs the peak, and
    center-vote fields are cones ≥ tens of pixels wide, so the peak of
    the coarse subsampled field localizes the fine peak: the final
    argmax over the refined windows equals the exhaustive argmax
    whenever the true peak lies within ±(WINDOW/2 − coarse_factor)
    cells of a top coarse cell (tests/test_hough_pallas.py checks
    equality against the exhaustive path).

    Returns (best_votes, best_dsum, best_cy, best_cx): per-slot vote
    count, depth-weighted sum, and fine-cell coordinates of the
    maximum; each (K,).
    """
    k_slots = samples.shape[0]
    vw3, dw3, oy, ox, _ = hough_votes_c2f_windows(
        samples,
        bboxes,
        cell_stride=cell_stride,
        grid_h=grid_h,
        grid_w=grid_w,
        top_t=top_t,
        coarse_factor=coarse_factor,
        interpret=interpret,
    )
    n_win = WINDOW * WINDOW
    vw = vw3.reshape(k_slots, top_t * n_win)
    dw = dw3.reshape(k_slots, top_t * n_win)
    best = jnp.argmax(vw, axis=1)
    best_v = jnp.take_along_axis(vw, best[:, None], 1)[:, 0]
    best_d = jnp.take_along_axis(dw, best[:, None], 1)[:, 0]
    t_idx = (best // n_win).astype(jnp.int32)
    cell = (best % n_win).astype(jnp.int32)
    sel = lambda a: jnp.take_along_axis(a, t_idx[:, None], 1)[:, 0]
    best_cy = sel(oy) + cell // WINDOW
    best_cx = sel(ox) + cell % WINDOW
    return best_v, best_d, best_cy, best_cx
