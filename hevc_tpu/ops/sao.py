"""Sample-adaptive offset — bit-exact NumPy reference (H.265 8.7.3).

Capability parity with the reference's sao_filter_CTB / sao_band_filter /
sao_edge_filter (reference: libavcodec/hevc_filter.c:264,
hevcdsp_template.c:310-496), re-derived from the specification.

SAO reads the deblocked picture and writes the output picture; all CTBs
read original (pre-SAO) neighbour samples, so frame-level application
with an input snapshot is exact.
"""
from __future__ import annotations

import numpy as np

SAO_OFF = 0
SAO_BAND = 1
SAO_EDGE = 2

# hPos/vPos per eo_class (8.7.3): neighbour offsets (a, b)
_EO_NEIGHBOURS = {
    0: ((0, -1), (0, 1)),      # horizontal
    1: ((-1, 0), (1, 0)),      # vertical
    2: ((-1, -1), (1, 1)),     # 135 degrees
    3: ((1, -1), (-1, 1)),     # 45 degrees
}


def sao_band(block: np.ndarray, position: int, offsets, bit_depth: int):
    """Band offset over one region.  offsets: 4 signed values."""
    shift = bit_depth - 5
    band = block >> shift
    out = block.astype(np.int32).copy()
    for k in range(4):
        b = (position + k) & 31
        out[band == b] += int(offsets[k])
    return np.clip(out, 0, (1 << bit_depth) - 1)


def sao_edge(plane_in: np.ndarray, x0: int, y0: int, w: int, h: int,
             eo_class: int, offsets, bit_depth: int) -> np.ndarray:
    """Edge offset for region [y0:y0+h, x0:x0+w] of plane_in.

    offsets: 4 signed values for edge categories 1..4.  Samples whose
    neighbour falls outside the picture are left unmodified."""
    ph, pw = plane_in.shape
    (ay, ax), (by, bx) = _EO_NEIGHBOURS[eo_class]
    ys, xs = np.mgrid[y0:y0 + h, x0:x0 + w]
    na_y, na_x = ys + ay, xs + ax
    nb_y, nb_x = ys + by, xs + bx
    valid = ((na_y >= 0) & (na_y < ph) & (na_x >= 0) & (na_x < pw)
             & (nb_y >= 0) & (nb_y < ph) & (nb_x >= 0) & (nb_x < pw))
    cur = plane_in[y0:y0 + h, x0:x0 + w].astype(np.int32)
    a = plane_in[np.clip(na_y, 0, ph - 1), np.clip(na_x, 0, pw - 1)
                 ].astype(np.int32)
    b = plane_in[np.clip(nb_y, 0, ph - 1),
                 np.clip(nb_x, 0, pw - 1)].astype(np.int32)
    idx = 2 + np.sign(cur - a) + np.sign(cur - b)
    # remap: raw {0,1,2} -> {1,2,0}
    cat = np.where(idx == 2, 0, np.where(idx < 2, idx + 1, idx))
    off_lut = np.array([0, offsets[0], offsets[1], offsets[2], offsets[3]],
                       np.int32)
    out = np.clip(cur + off_lut[cat], 0, (1 << bit_depth) - 1)
    return np.where(valid, out, cur)


class SaoParams:
    """Per-CTB SAO parameters for the three components."""
    __slots__ = ("type_idx", "band_position", "offsets", "eo_class")

    def __init__(self):
        self.type_idx = [SAO_OFF, SAO_OFF, SAO_OFF]
        self.band_position = [0, 0, 0]
        self.offsets = [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
        self.eo_class = [0, 0, 0]

    def copy(self):
        p = SaoParams()
        p.type_idx = list(self.type_idx)
        p.band_position = list(self.band_position)
        p.offsets = [list(o) for o in self.offsets]
        p.eo_class = list(self.eo_class)
        return p


def apply_sao_frame(planes, sao_map, ctb_size: int, bit_depth: int,
                    sub_w: int, sub_h: int):
    """Apply SAO in place.  sao_map: dict (ctb_x, ctb_y) -> SaoParams
    (missing entries = off)."""
    snap = [p.copy() for p in planes]
    h, w = planes[0].shape
    for (cx, cy), prm in sao_map.items():
        for c_idx in range(3):
            t = prm.type_idx[c_idx]
            if t == SAO_OFF:
                continue
            sw = sub_w if c_idx else 1
            sh_ = sub_h if c_idx else 1
            cs_x = ctb_size // sw
            cs_y = ctb_size // sh_
            x0, y0 = cx * cs_x, cy * cs_y
            ph, pw = planes[c_idx].shape
            bw = min(cs_x, pw - x0)
            bh = min(cs_y, ph - y0)
            if bw <= 0 or bh <= 0:
                continue
            if t == SAO_BAND:
                blk = snap[c_idx][y0:y0 + bh, x0:x0 + bw]
                out = sao_band(blk, prm.band_position[c_idx],
                               prm.offsets[c_idx], bit_depth)
            else:
                out = sao_edge(snap[c_idx], x0, y0, bw, bh,
                               prm.eo_class[c_idx], prm.offsets[c_idx],
                               bit_depth)
            planes[c_idx][y0:y0 + bh, x0:x0 + bw] = \
                out.astype(planes[c_idx].dtype)
