"""Fused Pallas decode kernel: dequantize -> IDCT -> upsample -> YCbCr->RGB.

This single kernel replaces the reference's entire DPU program — its three
separate phases each round-tripped every block through MRAM
(dequantize / idct / convert_colorspace, reference: src/decoder_dpu.c:94-107,
~3x the necessary memory traffic per SURVEY.md section 3.4).  Here each MCU
tile is read from HBM once, fully decoded in VMEM, and written once as RGB.

TPU-first layout ("blocks on lanes"):
  - coefficients arrive as ``[g, 64, M]`` int16 — slot-major so each MCU slot
    is a contiguous ``[64, T]`` lane tile; all butterfly ops run on full
    ``[8, T]`` VPU tiles (8 sublanes x T lanes).
  - the grid walks MCU tiles of T lanes; one kernel variant is compiled per
    sampling mode (static slot geometry — no dynamic dispatch, unlike the
    reference's per-block (v,h) switch at reference: src/decoder_dpu.c:332-355).
  - per-image quantization tables are fused in-kernel: a one-hot
    ``[Q, T]`` matrix (image id per MCU lane) times the ``[64, Q]`` table
    pool on the MXU gathers each lane's quant row exactly (fp32 exact for
    values < 2^24); this replaces the reference's per-DPU metadata quant
    staging (reference: src/decoder_dpu.c:112-132).

Outputs ``[3, luma_slots*64, M]`` uint8 RGB, slot-major per MCU; raster
assembly (pure layout) happens on the host or via XLA transpose.

Bit-exactness: arithmetic is the shared spec (ops/specs.py, ops/idct_math.py);
tests assert equality with the NumPy oracle for every mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.idct_math import idct_1d
from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

# Lanes (MCUs) per grid step.  512 MCUs x 6 slots x 64 coeffs x 2B = 384 KiB
# of VMEM for the worst-case (4:2:0) input tile.  Measured fastest on v5e
# with device-side loop timing (tunnel-immune): 159 us vs 211 us (tile 128)
# per 16384-MCU 4:2:0 launch.
LANE_TILE = 512

# Maximum images whose quant tables can share one device batch.
MAX_IMAGES_PER_BATCH = 16


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual multi-chip mesh)."""
    return jax.default_backend() != "tpu"


def check_lane_tile(lane_tile: int, m: int, interpret: bool) -> None:
    """Fail fast with a CLEAR error for TPU-illegal lane tiles.

    Mosaic requires the last block dimension to be a multiple of the
    128-wide lane unit (or equal to the whole array dimension); interpret
    mode (CPU tests) enforces nothing, so a small-tile config that works
    in tests would otherwise die on real hardware inside the lowering
    with an inscrutable BlockSpec error (found by the r5 hardware fuzz
    campaign)."""
    if interpret or lane_tile % 128 == 0 or lane_tile == m:
        return
    where = (f" or equal to the padded MCU count ({m})" if m >= 0 else "")
    raise ValueError(
        f"lane_tile={lane_tile} cannot lower on TPU: the lane (last) block"
        f" dimension must be a multiple of 128{where}. Use 128/256/512;"
        f" smaller tiles are for interpret-mode tests only.")


def _idct_pass1(x32):
    """Pass 1 over vertical freqs: list over spatial row r of [u, T].

    Both passes slice the LEADING axis (contiguous sublane groups) with one
    explicit swapaxes between them: slicing the middle axis instead
    (``y[:, v]``) forces a strided sublane gather per slice, which measured
    2.4x slower for the whole fused kernel on v5e (184 -> 78 us per
    16K-MCU launch).
    """
    return idct_1d([x32[v] for v in range(8)], S.CONST_BITS - S.PASS1_BITS)


def _idct_pass2(rows1):
    """rows1: list over r of [u, T] -> list over spatial col p of [r, T]."""
    y = jnp.swapaxes(jnp.stack(rows1, axis=0), 0, 1)  # [freq u, spat row, T]
    return idct_1d([y[u] for u in range(8)],
                   S.CONST_BITS + S.PASS1_BITS + 3)


def _assemble(cols2):
    """list over p of [r, T] -> [r, p, T], clamped to the sample range."""
    spat = jnp.swapaxes(jnp.stack(cols2, axis=0), 0, 1)
    return jnp.clip(spat, S.SAMPLE_MIN, S.SAMPLE_MAX)


def _assemble_pm(cols2):
    """list over p of [r, T] -> [p, r, T] (COLUMN-major pixel order),
    clamped to the sample range.

    The kernel-native pixel order within a slot is px*n + py: skipping the
    final swapaxes saves ~25 us per 16K-MCU 4:2:0 launch on v5e (~27%); the
    host assembly/C++ converter absorb the order for free."""
    return jnp.clip(jnp.stack(cols2, axis=0), S.SAMPLE_MIN, S.SAMPLE_MAX)


def _idct_block(x32):
    """[8, 8, T] int32 coefficients -> [8, 8, T] int32 samples (clamped)."""
    return _assemble(_idct_pass2(_idct_pass1(x32)))


def _reduced_pass(xs, mat, shift):
    """One n-point reduced-IDCT pass: xs is a freq-indexed list of n
    arrays; returns the n transformed arrays (spec: specs.py 'Reduced
    (scaled) IDCT')."""
    n = len(mat)
    outs = []
    for k in range(n):
        acc = xs[0] * mat[k][0]
        for u in range(1, n):
            acc = acc + xs[u] * mat[k][u]
        outs.append(S.descale(acc, shift))
    return outs


def _reduced_idct_lists(x32, ny: int, nx: int):
    """Reduced (ny x nx)-point IDCT of the top-left frequency sub-block.

    Returns the pass-2 output as a list over spatial col p (nx entries) of
    ``[ny, T]`` arrays — same list structure as the full-scale path, so
    slot selection stays free Python indexing.  Scaled decode uses the
    reduced-matrix convention for BOTH passes (including ny/nx == 8): the
    matrices carry the 1/2-per-pass normalization, shifts are
    CONST_BITS - PASS1_BITS then CONST_BITS + PASS1_BITS (specs.py
    'Reduced (scaled) IDCT').
    """
    mat1 = S.reduced_idct_matrix(ny)
    xs = [x32[v][0:nx] for v in range(ny)]        # top-left ny x nx freqs
    rows1 = _reduced_pass(xs, mat1, S.CONST_BITS - S.PASS1_BITS)
    mat2 = S.reduced_idct_matrix(nx)
    y = jnp.swapaxes(jnp.stack(rows1, axis=0), 0, 1)   # [freq u, row, T]
    return _reduced_pass([y[u] for u in range(nx)], mat2,
                         S.CONST_BITS + S.PASS1_BITS)


def _upsample(chroma, qv: int, qh: int, v: int, h: int):
    """Nearest-neighbor chroma upsample for the luma slot at (qv, qh).

    ``chroma`` is [8, 8, T]; selects the (8//v x 8//h) sub-block and
    replicates it to 8x8 (reference: src/decoder_dpu.c:338-355,370).
    """
    if v == 1 and h == 1:
        return chroma
    rh, rw = 8 // v, 8 // h
    sub = chroma[qv * rh:(qv + 1) * rh, qh * rw:(qh + 1) * rw]   # [rh, rw, T]
    t = sub.shape[-1]
    sub = jnp.broadcast_to(sub[:, None, :, None, :], (rh, v, rw, h, t))
    return sub.reshape(8, 8, t)


def _color(y, cb, cr):
    """Fixed-point BT.601 (spec constants); returns (r, g, b) int32."""
    y128 = y + 128
    r = y128 + S.descale(S.FIX_CR_R * cr, S.COLOR_BITS)
    g = y128 + S.descale(S.FIX_CB_G * cb + S.FIX_CR_G * cr, S.COLOR_BITS)
    b = y128 + S.descale(S.FIX_CB_B * cb, S.COLOR_BITS)
    return r, g, b


def _to_u8(plane, t: int):
    return jnp.clip(plane.reshape(-1, t), 0, 255).astype(jnp.uint8)


def _make_kernel(mode: S.ModeSpec, lane_tile: int, num_images: int,
                 scale: int = 1):
    """Build the fused kernel body for one sampling mode.

    ``scale`` in {1, 2, 4, 8} selects full or reduced (n = 8/scale point)
    IDCT output — the scaled-decode capability (specs.py 'Reduced IDCT').
    """
    n = 8 // scale
    nn = n * n

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        # One-hot image-id matrix [Q, T] for the quant-row MXU gather.
        image_ids = qidx_ref[0, :]                                  # [T] int32
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (num_images, t), 0)
                  == image_ids[None, :]).astype(jnp.float32)

        # Dequantize every slot once; keep everything in VMEM.
        def deq_slot(s):
            q = jax.lax.dot(
                qpool_ref[s], onehot,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)                                      # [64, T]
            deq = coeff_ref[s].astype(jnp.int32) * q
            deq = jnp.clip(deq, -S.DEQUANT_CLAMP - 1, S.DEQUANT_CLAMP)
            return deq.reshape(8, 8, t)

        def idct_slot(s):
            if scale == 1:
                return _assemble_pm(_idct_pass2(_idct_pass1(deq_slot(s))))
            return _assemble_pm(_reduced_idct_lists(deq_slot(s), n, n))

        spat = [idct_slot(s) for s in range(mode.luma_slots)]  # [px, py, T]

        if mode.ncomp == 1:
            y128 = jnp.clip(spat[0] + 128, 0, 255).astype(jnp.uint8)
            flat = y128.reshape(nn, t)
            for ch in range(3):
                out_ref[ch, 0:nn, :] = flat
            return

        if scale == 1:
            # Chroma with FUSED nearest-neighbor upsample: replication
            # commutes with the per-row/per-col IDCT passes, so upsampling
            # is free Python list selection — rows are duplicated between
            # pass 1 and pass 2 (one extra chroma pass 2 per distinct qv
            # when v == 2), columns on the pass-2 output list.  This removes
            # the broadcast/strided-gather upsample from the hot path
            # entirely (the reference does it per pixel,
            # reference: src/decoder_dpu.c:338-355,370).
            #
            # The BT.601 chroma terms are likewise computed ONCE at chroma
            # resolution on the pass-2 column lists and slot-selected for
            # free — 1/4 the color multiplies for 4:2:0 (replication
            # commutes with the elementwise term arithmetic too).
            rh, rw = 8 // mode.v, 8 // mode.h
            chroma_cols = {}
            for ci in range(2):
                rows1 = _idct_pass1(deq_slot(mode.luma_slots + ci))
                for qv in range(mode.v):
                    sel = (rows1 if mode.v == 1 else
                           [rows1[qv * rh + r // mode.v] for r in range(8)])
                    chroma_cols[ci, qv] = _idct_pass2(sel)

            term_cols = {}
            for qv in range(mode.v):
                cbl = [jnp.clip(c, S.SAMPLE_MIN, S.SAMPLE_MAX)
                       for c in chroma_cols[0, qv]]
                crl = [jnp.clip(c, S.SAMPLE_MIN, S.SAMPLE_MAX)
                       for c in chroma_cols[1, qv]]
                term_cols[0, qv] = [
                    S.descale(S.FIX_CR_R * c, S.COLOR_BITS) for c in crl]
                term_cols[1, qv] = [
                    S.descale(S.FIX_CB_G * b + S.FIX_CR_G * r, S.COLOR_BITS)
                    for b, r in zip(cbl, crl)]
                term_cols[2, qv] = [
                    S.descale(S.FIX_CB_B * b, S.COLOR_BITS) for b in cbl]

            for s in range(mode.luma_slots):
                qv, qh = mode.luma_slot_pos(s)
                y128 = spat[s] + 128
                for ch in range(3):
                    cols2 = term_cols[ch, qv]
                    if mode.h != 1:
                        cols2 = [cols2[qh * rw + p // mode.h]
                                 for p in range(8)]
                    term = jnp.stack(cols2, axis=0)      # [px, py, T]
                    out_ref[ch, s * 64:(s + 1) * 64, :] = (
                        _to_u8(y128 + term, t))
            return
        else:
            # Scaled decode: chroma covers v x h MCU cells per block, so at
            # scale >= 2 its reduced output is (v*n) x (h*n) — no upsample
            # at all (chroma is reduced LESS than luma, matching libjpeg's
            # scaled 4:2:0 behavior where 1/2-scale chroma is full 8x8).
            # Slot (qv, qh) takes its n x n region by free list/sublane
            # slicing.
            chroma_out = {
                ci: _reduced_idct_lists(deq_slot(mode.luma_slots + ci),
                                        mode.v * n, mode.h * n)
                for ci in range(2)
            }

            def chroma_slot(ci, qv, qh):
                cols2 = chroma_out[ci][qh * n:(qh + 1) * n]
                return _assemble_pm(
                    [c[qv * n:(qv + 1) * n] for c in cols2])

        for s in range(mode.luma_slots):
            qv, qh = mode.luma_slot_pos(s)
            cb_s = chroma_slot(0, qv, qh)
            cr_s = chroma_slot(1, qv, qh)
            for ch, plane in enumerate(_color(spat[s], cb_s, cr_s)):
                out_ref[ch, s * nn:(s + 1) * nn, :] = _to_u8(plane, t)

    return kernel


def _make_kernel_ycbcr(mode: S.ModeSpec, lane_tile: int, num_images: int):
    """Wire-optimal variant: dequant + IDCT only, emitting level-shifted
    uint8 YCbCr planes in the SUBSAMPLED layout (one 64-byte plane per slot
    per MCU).  For 4:2:0 that is 1.5 B/px on the wire vs 3 B/px RGB — the
    host finishes upsample + BT.601 with the identical integer spec, so the
    final RGB is bit-identical to the fused RGB kernel (tested).  D2H is
    the deployment bottleneck (PCIe or tunnel), not the chip.
    """

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        image_ids = qidx_ref[0, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (num_images, t), 0)
                  == image_ids[None, :]).astype(jnp.float32)
        for s in range(mode.g):
            q = jax.lax.dot(
                qpool_ref[s], onehot,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            deq = coeff_ref[s].astype(jnp.int32) * q
            deq = jnp.clip(deq, -S.DEQUANT_CLAMP - 1, S.DEQUANT_CLAMP)
            spat = _assemble_pm(_idct_pass2(_idct_pass1(
                deq.reshape(8, 8, t))))                # [px, py, T] clamped
            out_ref[s] = (spat.reshape(64, t) + 128).astype(jnp.uint8)

    return kernel


def decode_mcus_impl(
    coeffs: jax.Array,        # [M, g, 64] int16 raw coefficients
    qidx: jax.Array,          # [M] int32 image index per MCU
    qpool: jax.Array,         # [Q, g, 64] float32 per-slot quant rows
    *,
    mode: S.ModeSpec,
    lane_tile: int,
    interpret: bool,
    raw: bool = False,
    ycbcr: bool = False,
    scale: int = 1,
) -> jax.Array:
    """Traceable (un-jitted) device decode — usable inside shard_map/jit.

    With ``raw=True`` returns the kernel-native channel-planar layout
    ``[3, luma_slots, 64, M]`` and skips the raster-layout transpose (a real
    HBM copy), so the raw path touches HBM exactly twice (coefficients in,
    RGB out).  Host raster assembly absorbs the layout at no extra cost, so
    the engine uses raw=True.

    Pixel order within a slot is COLUMN-major (index = px*n + py) in every
    output layout — see _assemble_pm.
    """
    m = coeffs.shape[0]
    q = qpool.shape[0]
    gy = mode.luma_slots
    assert m % lane_tile == 0, (m, lane_tile)
    check_lane_tile(lane_tile, m, interpret)
    assert scale in (1, 2, 4, 8), scale
    assert not (ycbcr and scale != 1), "ycbcr transport is full-scale only"
    nn = (8 // scale) ** 2

    # Dtype coercion happens here, inside the traced function: it is free at
    # dispatch time (part of the compiled program, a no-op for already-
    # correct dtypes).  Host-side jnp.asarray per call costs ~26us of
    # dispatch latency — enough to starve the ~14us device kernel.
    coeffs = coeffs.astype(jnp.int16)
    qidx = qidx.astype(jnp.int32)
    qpool = qpool.astype(jnp.float32)

    x = jnp.transpose(coeffs, (1, 2, 0))          # [g, 64, M]
    qp = jnp.transpose(qpool, (1, 2, 0))          # [g, 64, Q]
    qidx2 = qidx[None, :]                         # [1, M]

    grid = (m // lane_tile,)
    in_specs = [
        pl.BlockSpec((1, lane_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mode.g, 64, q), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if ycbcr:
        return pl.pallas_call(
            _make_kernel_ycbcr(mode, lane_tile, q),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((mode.g, 64, lane_tile),
                                   lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mode.g, 64, m), jnp.uint8),
            interpret=interpret,
        )(qidx2, x, qp)
    rgb = pl.pallas_call(
        _make_kernel(mode, lane_tile, q, scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, gy * nn, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, gy * nn, m), jnp.uint8),
        interpret=interpret,
    )(qidx2, x, qp)

    if raw:
        return rgb.reshape(3, gy, nn, m)
    # [3, gy*nn, M] -> [M, gy, nn, 3] (slot-major per MCU).  This is a real
    # HBM copy (the default output layout differs); prefer raw=True.
    return jnp.transpose(rgb.reshape(3, gy, nn, m), (3, 1, 2, 0))


_decode_mcus_jit = jax.jit(
    decode_mcus_impl,
    static_argnames=("mode", "lane_tile", "interpret", "raw", "ycbcr",
                     "scale"))


def decode_mcus(coeffs, qidx, qpool, mode: S.ModeSpec,
                lane_tile: int = LANE_TILE, raw: bool = False,
                ycbcr: bool = False, scale: int = 1) -> jax.Array:
    """Decode a batch of MCUs on device.

    Args:
      coeffs: ``[M, g, 64]`` int16 raw (entropy-decoded) coefficients,
        natural order; M must be a multiple of ``lane_tile`` (pad with
        zeros — padded lanes decode to gray and are never assembled).
      qidx: ``[M]`` int32 image index per MCU (selects quant tables).
      qpool: ``[Q, g, 64]`` per-slot quantizer rows (uint16/float ok).
      mode: sampling mode (one kernel variant per mode).
      raw: return the kernel-native ``[3, luma_slots, 64, M]`` layout and
        skip the raster transpose (a real HBM copy; raw is ~4x faster).
      ycbcr: return level-shifted uint8 YCbCr planes ``[g, 64, M]`` in the
        subsampled layout (1.5 B/px for 4:2:0) for host-side upsample +
        color — the wire-optimal transport when the result leaves the chip.
      scale: 1 (full) or 2/4/8 for reduced-IDCT scaled decode — each slot
        emits (8/scale)^2 pixels (libjpeg scaled-decode equivalent; see
        specs.py 'Reduced IDCT').

    Returns:
      ``[M, luma_slots, nn, 3]`` uint8 RGB where nn = (8/scale)^2,
      ``[3, luma_slots, nn, M]`` with ``raw=True``, or ``[g, 64, M]`` with
      ``ycbcr=True`` (full scale only).
    """
    ensure_compilation_cache()
    return _decode_mcus_jit(
        coeffs,
        qidx,
        qpool,
        mode=mode,
        lane_tile=lane_tile,
        interpret=_interpret(),
        raw=raw,
        ycbcr=ycbcr,
        scale=scale,
    )


def pad_mcus(num_mcus: int, lane_tile: int = LANE_TILE) -> int:
    """Round an MCU count up to the kernel's lane-tile multiple."""
    return -(-num_mcus // lane_tile) * lane_tile
