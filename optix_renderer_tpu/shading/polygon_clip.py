"""Branchless polygon clipping to the upper hemisphere (z >= 0).

TPU re-design of ``clipPolygon`` (cuda_include/ltc/polygon_utils.cuh:33-120):
the reference encodes (vertex_count, per-vertex z>0) into a bitmask and
switches over 23 precomputed cases.  Here each case's *final* vertex values
are resolved statically (the reference's in-place assignment sequences are
unrolled, including the ones that read already-overwritten slots, e.g.
case 51's ``v[4] = v[0]`` after ``v[0] = iz0(v0,v1)``) into a dense
(128-case) gather table, so the whole clip is table lookups + selects —
no control flow at all.

Output contract matches the reference: vertex count in {0, 3, 4, 5}; for
vc < 5 the first output vertex is repeated at index vc; untouched slots
pass the input through.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# per-output-slot op: COPY input[a]  or  IZ0(input[a], input[b])
_COPY, _IZ0 = 0, 1


def _case(vc, *slots):
    """slots: five (op, a, b) entries (b ignored for COPY)."""
    return vc, slots


def _c(a):  # copy input slot a
    return (_COPY, a, 0)


def _z(a, b):  # iz0(input a, input b)
    return (_IZ0, a, b)


def _keep(i):  # slot keeps its input value
    return (_COPY, i, 0)


# Transcription of polygon_utils.cuh:46-118 with assignment order resolved.
_CASES = {
    # --- triangles (vertex_count == 3, bits 3..5 = z0,z1,z2 > 0) ---
    3: _case(0, _keep(0), _keep(1), _keep(2), _keep(3), _keep(4)),
    59: _case(3, _c(0), _c(1), _c(2), _c(0), _keep(4)),
    11: _case(3, _c(0), _z(0, 1), _z(2, 0), _c(0), _keep(4)),
    19: _case(3, _z(0, 1), _c(1), _z(1, 2), _z(0, 1), _keep(4)),  # v[3]=v[0] reads new v0
    35: _case(3, _z(2, 0), _z(1, 2), _c(2), _z(2, 0), _keep(4)),
    27: _case(4, _c(0), _c(1), _z(1, 2), _z(2, 0), _c(0)),
    51: _case(4, _z(0, 1), _c(1), _c(2), _z(2, 0), _z(0, 1)),  # v[4]=v[0] reads new v0
    43: _case(4, _c(0), _z(0, 1), _z(1, 2), _c(2), _c(0)),
    # --- quads (vertex_count == 4, bits 3..6 = z0..z3 > 0) ---
    4: _case(0, _keep(0), _keep(1), _keep(2), _keep(3), _keep(4)),
    124: _case(4, _c(0), _c(1), _c(2), _c(3), _c(0)),
    12: _case(3, _c(0), _z(0, 1), _z(3, 0), _c(0), _keep(4)),
    20: _case(3, _z(0, 1), _c(1), _z(1, 2), _z(0, 1), _keep(4)),
    36: _case(3, _z(2, 3), _z(1, 2), _c(2), _z(2, 3), _keep(4)),
    68: _case(3, _c(3), _z(3, 0), _z(2, 3), _c(3), _keep(4)),  # v[3] untouched == v3 == out0
    28: _case(4, _c(0), _c(1), _z(1, 2), _z(3, 0), _c(0)),
    52: _case(4, _z(0, 1), _c(1), _c(2), _z(2, 3), _z(0, 1)),
    100: _case(4, _z(3, 0), _z(1, 2), _c(2), _c(3), _z(3, 0)),
    76: _case(4, _c(0), _z(0, 1), _z(2, 3), _c(3), _c(0)),
    60: _case(5, _c(0), _c(1), _c(2), _z(2, 3), _z(3, 0)),
    116: _case(5, _z(0, 1), _c(1), _c(2), _c(3), _z(3, 0)),
    108: _case(5, _z(0, 1), _z(1, 2), _c(2), _c(3), _c(0)),
    92: _case(5, _c(0), _c(1), _z(1, 2), _z(2, 3), _c(3)),
}

_VC = np.zeros(128, np.int32)
_OP = np.zeros((128, 5), np.int32)
_A = np.tile(np.arange(5, dtype=np.int32), (128, 1))  # default: keep slot
_B = np.zeros((128, 5), np.int32)
for _mask, (_vc, _slots) in _CASES.items():
    _VC[_mask] = _vc
    for _j, (_op, _a, _b) in enumerate(_slots):
        _OP[_mask, _j] = _op
        _A[_mask, _j] = _a
        _B[_mask, _j] = _b

# numpy module constants (not jnp): device-resident module constants
# become hoisted executable inputs in this jax build (see engine.renderer).
VC_TABLE = _VC
OP_TABLE = _OP
A_TABLE = _A
B_TABLE = _B
# packed (128, 16) f32 row per case [vc | op*5 | a*5 | b*5] — fetched with
# ONE one-hot MXU matmul instead of four per-lane gathers (XLA lowers
# per-lane gathers to scalar loops on TPU: ~57 ms per 1M lanes)
CASE_TABLE = np.concatenate(
    [_VC[:, None], _OP, _A, _B], axis=1
).astype(np.float32)


def iz0(lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Normalized intersection of segment lhs->rhs with plane z=0
    (polygon_utils.cuh:7-22). Batched over (..., 3)."""
    lz = lhs[..., 2]
    rz = rhs[..., 2]
    den = lz - rz
    lerp = lz / jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
    lerp = lerp[..., None]
    xy = lerp * rhs[..., :2] + (-lerp * lhs[..., :2] + lhs[..., :2])
    n = jnp.sqrt(jnp.maximum(jnp.sum(xy * xy, axis=-1, keepdims=True), 1e-30))
    xy = xy / n
    return jnp.concatenate([xy, jnp.zeros_like(lz)[..., None]], axis=-1)


def clip_polygon(verts: jnp.ndarray, vcount: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clip polygons to z >= 0.

    verts: (..., 5, 3) with the convention verts[vcount..] = verts[0] for
    inputs below 5 vertices (as the reference's callers arrange,
    ltc_utils.cuh:77/100). vcount: (...,) int32 in {0, 3, 4}.
    Returns (clipped (..., 5, 3), new_count (...,)).
    """
    above = verts[..., :4, 2] > 0.0  # (..., 4)
    bits = (
        above[..., 0].astype(jnp.int32) * 8
        + above[..., 1].astype(jnp.int32) * 16
        + above[..., 2].astype(jnp.int32) * 32
        + (above[..., 3] & (vcount == 4)).astype(jnp.int32) * 64
    )
    mask = jnp.clip(vcount + bits, 0, 127)

    # case-row fetch: one-hot matmul (exact-precision; values < 128 are
    # exact in f32), then slot selection via one-hot over the 5 vertex
    # slots — zero per-lane gathers anywhere in the clip
    # bf16 single-pass matmul is EXACT here: the one-hot is 0/1 and every
    # CASE_TABLE value is an integer < 128 (8 mantissa bits suffice), so
    # skip the 3-pass f32 HIGHEST decomposition and halve the one-hot's
    # memory traffic
    onehot = (mask[..., None] == jnp.arange(128, dtype=jnp.int32)).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        onehot.reshape(-1, 128), jnp.asarray(CASE_TABLE, jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(mask.shape + (16,))
    vc = rows[..., 0].astype(jnp.int32)
    op = rows[..., 1:6].astype(jnp.int32)  # (..., 5)
    a = rows[..., 6:11].astype(jnp.int32)
    b = rows[..., 11:16].astype(jnp.int32)

    def sel5(idx):
        # verts[..., idx[..., o], :] as a chain of static-slice selects —
        # neither a gather nor a tiny batched einsum survives TPU lowering
        outs = []
        for o in range(5):
            io = idx[..., o]
            v = verts[..., 0, :]
            for k in range(1, 5):
                v = jnp.where((io == k)[..., None], verts[..., k, :], v)
            outs.append(v)
        return jnp.stack(outs, axis=-2)

    va = sel5(a)  # (..., 5, 3)
    vb = sel5(b)
    out = jnp.where((op == _IZ0)[..., None], iz0(va, vb), va)
    return out, vc
