"""Sharded device decode: MCU tiles across chips via shard_map.

Replaces the reference's per-DPU scatter/exec/gather
(``pim.copy("mcus", ...)``, ``pim.exec()``, reference:
src/decoder_host.cpp:276-312) with JAX sharding: coefficients are placed
with a NamedSharding over the MCU axis, each chip runs the fused Pallas
kernel on its shard under ``shard_map``, and the RGB output stays sharded
over the same axis (host gathers once at D2H).  No cross-chip collectives
are needed on the decode path — MCUs are independent — so scaling is
bandwidth-bound, not ICI-bound.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import (
    LANE_TILE,
    decode_mcus_impl,
    _interpret,
)
from pim_jpeg_decoder_tpu.parallel.mesh import MCU_AXIS, make_mesh
from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, mode: S.ModeSpec, lane_tile: int,
                interpret: bool, raw: bool, ycbcr: bool = False,
                scale: int = 1):
    impl = functools.partial(decode_mcus_impl, mode=mode,
                             lane_tile=lane_tile, interpret=interpret,
                             raw=raw, ycbcr=ycbcr, scale=scale)
    # The MCU axis is the last dim of the raw and ycbcr layouts, the first
    # otherwise.
    if ycbcr:
        out_spec = P(None, None, MCU_AXIS)
    else:
        out_spec = P(None, None, None, MCU_AXIS) if raw else P(MCU_AXIS)
    shmapped = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(MCU_AXIS), P(MCU_AXIS), P()),
        out_specs=out_spec,
        # pallas_call's out_shape carries no varying-mesh-axis metadata;
        # the decode is purely elementwise over the MCU axis (no
        # collectives), so the replication check is vacuous here.
        check_vma=False,
    )
    return jax.jit(shmapped)


def place_for_mesh(coeffs, qidx, qpool, mesh: Mesh):
    """Asynchronously place decode inputs with their mesh shardings
    (coefficients/qidx split over the MCU axis, qpool replicated).

    Producer-side H2D: the engine's ``_stage_batch`` calls this on the
    prepare side so the multi-chip transfer of batch N+1 overlaps the
    consumer's dispatch of batch N — the same copy/exec overlap the
    single-chip path has (and the reference's two threads,
    reference: src/decoder_host.cpp:276-292).  ``decode_mcus_sharded``
    recognizes already-placed inputs and does not place them again.

    The coefficient wire dtype (int8 from batching.compact_wire, else
    int16) is preserved on the wire and widened on device.
    """
    import numpy as _np
    wire_np = (_np.int8 if _np.dtype(getattr(coeffs, "dtype", _np.int16))
               == _np.dtype(_np.int8) else _np.int16)

    def _put(arr, np_dt, spec):
        # Host arrays: fix the dtype on host and let ONE device_put ship
        # each shard directly to its device.  (jnp.asarray first would
        # materialize the full array on the default device and turn the
        # placement into a second device-to-device scatter — an extra
        # full-batch copy on the H2D-bound path.)  Already-on-device
        # arrays skip the host conversion (np.asarray would D2H them).
        if not isinstance(arr, jax.Array):
            arr = _np.asarray(arr, np_dt)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return (_put(coeffs, wire_np, P(MCU_AXIS)),
            _put(qidx, _np.int32, P(MCU_AXIS)),
            _put(qpool, _np.float32, P()))


def _already_placed(arr, mesh: Mesh, spec) -> bool:
    return (isinstance(arr, jax.Array)
            and getattr(arr, "sharding", None) == NamedSharding(mesh, spec))


def decode_mcus_sharded(
    coeffs,                   # [M, g, 64] int16; M % (n_devices*lane_tile) == 0
    qidx,                     # [M] int32
    qpool,                    # [Q, g, 64] quant rows (replicated)
    mode: S.ModeSpec,
    mesh: Optional[Mesh] = None,
    lane_tile: int = LANE_TILE,
    raw: bool = False,
    ycbcr: bool = False,
    scale: int = 1,
) -> jax.Array:
    """Decode MCU tiles sharded across the mesh's chips.

    Returns ``[M, luma_slots, 64, 3]`` uint8 (the kernel-native
    ``[3, luma_slots, 64, M]`` with ``raw=True``, or ``[g, 64, M]`` YCbCr
    wire planes with ``ycbcr=True``), sharded over the MCU axis.
    """
    ensure_compilation_cache()
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    m = coeffs.shape[0]
    if m % (n * lane_tile):
        raise ValueError(
            f"M={m} must be a multiple of devices*lane_tile={n * lane_tile}")

    # Preserve an int8 coefficient wire (batching.compact_wire): the H2D
    # placement ships half the bytes; shard_map's impl widens on device.
    # Inputs already placed by place_for_mesh (producer-side overlap) pass
    # straight through — no second placement.
    if not (_already_placed(coeffs, mesh, P(MCU_AXIS))
            and _already_placed(qidx, mesh, P(MCU_AXIS))
            and _already_placed(qpool, mesh, P())):
        coeffs, qidx, qpool = place_for_mesh(coeffs, qidx, qpool, mesh)

    fn = _sharded_fn(mesh, mode, lane_tile, _interpret(), raw, ycbcr,
                     scale)
    return fn(coeffs, qidx, qpool)
