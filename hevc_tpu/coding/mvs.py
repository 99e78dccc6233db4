"""Motion vector prediction: spatial merge + AMVP (H.265 8.5.3.2).

Capability parity with the reference's hevc_mvs.c
(ff_hevc_luma_mv_merge_mode :523, derive_spatial_merge_candidates :307,
ff_hevc_luma_mv_mvp_mode :635), re-derived from the specification.

Current scope: uni-directional L0 (P slices), short-term references, no
TMVP (slice_temporal_mvp_enabled == 0 in generated streams).  The
candidate geometry, pruning and scaling follow the spec so B-slice
support extends naturally.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

PART_2Nx2N = 0
PART_2NxN = 1
PART_Nx2N = 2
PART_NxN = 3


@dataclass
class MotionInfo:
    mv: Tuple[int, int]     # quarter-pel
    ref_idx: int
    ref_poc: int


def _neighbour_motion(pic, x_cur, y_cur, xn, yn) -> Optional[MotionInfo]:
    """Motion of the 4x4 block covering luma (xn, yn), or None if the
    block is unavailable or intra."""
    if not pic.available(x_cur, y_cur, xn, yn):
        return None
    y4, x4 = yn >> 2, xn >> 2
    if pic.is_intra[y4, x4] or pic.ref_l0[y4, x4] < 0:
        return None
    return MotionInfo(mv=(int(pic.mv_l0[y4, x4, 0]),
                          int(pic.mv_l0[y4, x4, 1])),
                      ref_idx=int(pic.ref_l0[y4, x4]),
                      ref_poc=int(pic.ref_poc_l0[y4, x4]))


def _same_motion(a: MotionInfo, b: MotionInfo) -> bool:
    return a.mv == b.mv and a.ref_idx == b.ref_idx


def merge_candidates(pic, x_pb, y_pb, n_w, n_h, part_idx, part_mode,
                     max_cand, num_ref_l0, ref_poc_list) -> List[MotionInfo]:
    """Spatial merge candidate list (8.5.3.2.3) + zero padding
    (8.5.3.2.4).  Returns max_cand candidates."""
    a1 = (x_pb - 1, y_pb + n_h - 1)
    b1 = (x_pb + n_w - 1, y_pb - 1)
    b0 = (x_pb + n_w, y_pb - 1)
    a0 = (x_pb - 1, y_pb + n_h)
    b2 = (x_pb - 1, y_pb - 1)

    cand: List[MotionInfo] = []
    m_a1 = None
    if not (part_idx == 1 and part_mode == PART_Nx2N):
        m_a1 = _neighbour_motion(pic, x_pb, y_pb, *a1)
        if m_a1 is not None:
            cand.append(m_a1)
    # NOTE: pruning compares against a neighbour's MOTION whenever that
    # neighbour is available, regardless of whether it was itself pruned
    # (reference: hevc_mvs.c derive_spatial_merge_candidates :307)
    m_b1 = None
    if not (part_idx == 1 and part_mode == PART_2NxN):
        m_b1 = _neighbour_motion(pic, x_pb, y_pb, *b1)
        if m_b1 is not None and not (m_a1 and _same_motion(m_b1, m_a1)):
            cand.append(m_b1)
    m_b0 = _neighbour_motion(pic, x_pb, y_pb, *b0)
    if m_b0 is not None and not (m_b1 and _same_motion(m_b0, m_b1)):
        cand.append(m_b0)
    m_a0 = _neighbour_motion(pic, x_pb, y_pb, *a0)
    if m_a0 is not None and not (m_a1 and _same_motion(m_a0, m_a1)):
        cand.append(m_a0)
    if len(cand) < 4:
        m_b2 = _neighbour_motion(pic, x_pb, y_pb, *b2)
        if m_b2 is not None \
                and not (m_a1 and _same_motion(m_b2, m_a1)) \
                and not (m_b1 and _same_motion(m_b2, m_b1)):
            cand.append(m_b2)
    # (temporal candidate omitted: slice_temporal_mvp_enabled == 0)
    zero_idx = 0
    while len(cand) < max_cand:
        ridx = zero_idx if zero_idx < num_ref_l0 else 0
        cand.append(MotionInfo(mv=(0, 0), ref_idx=ridx,
                               ref_poc=ref_poc_list[ridx]))
        zero_idx += 1
    return cand[:max_cand]


def _scale_mv(mv, cur_poc, cur_ref_poc, nb_ref_poc) -> Tuple[int, int]:
    """Temporal MV scaling (8.5.3.2.8)."""
    td = max(-128, min(127, cur_poc - nb_ref_poc))
    tb = max(-128, min(127, cur_poc - cur_ref_poc))
    if td == 0:
        return mv
    tx = (16384 + (abs(td) >> 1)) // td
    dsf = max(-4096, min(4095, (tb * tx + 32) >> 6))
    out = []
    for c in mv:
        v = dsf * c
        out.append(max(-32768, min(32767,
                                   (abs(v) + 127 >> 8) * (1 if v >= 0 else -1))))
    return tuple(out)


def amvp_candidates(pic, x_pb, y_pb, n_w, n_h, ref_idx, ref_poc_list,
                    cur_poc) -> List[Tuple[int, int]]:
    """Spatial AMVP candidate list (8.5.3.2.5-7): [mvp0, mvp1]."""
    target_poc = ref_poc_list[ref_idx]
    a0 = (x_pb - 1, y_pb + n_h)
    a1 = (x_pb - 1, y_pb + n_h - 1)
    b0 = (x_pb + n_w, y_pb - 1)
    b1 = (x_pb + n_w - 1, y_pb - 1)
    b2 = (x_pb - 1, y_pb - 1)

    def motion(pos):
        return _neighbour_motion(pic, x_pb, y_pb, *pos)

    # ---- candidate A (8.5.3.2.6): A0, A1 same-ref; then scaled --------
    mv_a = None
    a_neigh = [motion(a0), motion(a1)]
    a_block_avail = any(m is not None for m in a_neigh) or any(
        pic.available(x_pb, y_pb, *p) for p in (a0, a1))
    for m in a_neigh:
        if m is not None and m.ref_poc == target_poc:
            mv_a = m.mv
            break
    if mv_a is None:
        for m in a_neigh:
            if m is not None:
                mv_a = _scale_mv(m.mv, cur_poc, target_poc, m.ref_poc)
                break
    # ---- candidate B: B0, B1, B2 same-ref -----------------------------
    mv_b = None
    b_neigh = [motion(b0), motion(b1), motion(b2)]
    for m in b_neigh:
        if m is not None and m.ref_poc == target_poc:
            mv_b = m.mv
            break
    # scaled-B pass only when no A neighbour block exists (isScaledFlag)
    if not a_block_avail:
        if mv_a is None:
            mv_a = mv_b
            mv_b = None
        if mv_b is None:
            for m in b_neigh:
                if m is not None:
                    mv_b = _scale_mv(m.mv, cur_poc, target_poc, m.ref_poc)
                    break
    out = []
    if mv_a is not None:
        out.append(tuple(mv_a))
    if mv_b is not None and (not out or tuple(mv_b) != out[0]):
        out.append(tuple(mv_b))
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]
