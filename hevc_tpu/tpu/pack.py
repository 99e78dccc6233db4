"""Stage-A → stage-B packing: BlockRecords → wavefront-chunked tensors.

Host-side preparation of the symbol tensors the TPU reconstruction
consumes: a single padded int32 canvas holding Y/Cb/Cr regions, per-
size-class residual level batches, and per-record prediction metadata
grouped into conflict-free wavefront chunks.

Chunking: records are taken in decode order and greedily packed into the
current chunk until a record's reference band (the L-shaped left column +
top row it predicts from) touches a block already written by the chunk —
then a new chunk starts.  Records inside one chunk are therefore
independent: the device vmaps them and commits each class batch with one
scatter.  This is the TPU analogue of the reference's WPP wavefront
(reference: hevcdec.c:2961 hls_decode_entry_wpp) applied to the
reconstruction stage.

Availability is pure geometry (z-scan order + slice/tile maps), computed
here once and shipped as masks — the device never re-derives syntax
state.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..coding.picture import PictureState
from ..ops import reference as R

PAD = 8          # top/left margin of each region
TAIL = 72        # bottom/right slack so 2n-reads never leave the canvas
DUMP = -(1 << 20)  # scatter target for padding lanes (dropped as OOB)


def _round_up(x, m):
    return ((x + m - 1) // m) * m



@dataclass
class PackedFrame:
    canvas: np.ndarray            # int32 [CH, CW]
    scal: tuple                   # per class: int32 [n_chunks, B, 8]
    avail: tuple                  # per class: bool [n_chunks, B, 128]
    levels: tuple                 # per class: int32 [Nc, s, s]
    rmeta: tuple                  # per class: int32 [Nc, 4] (qp,dst,ts,raw)
    n_chunks: int
    region: dict                  # plane -> (oy, ox, h, w)
    bit_depth: int


def region_offsets(sps):
    h, w = sps.height, sps.width
    h2, w2 = h // sps.sub_h, w // sps.sub_w
    reg = {0: (PAD, PAD, h, w),
           1: (PAD + h + PAD, PAD, h2, w2),
           2: (PAD + h + PAD, PAD + w2 + PAD, h2, w2)}
    ch = PAD + h + PAD + h2 + TAIL
    cw = max(PAD + w, PAD + w2 + PAD + w2) + TAIL + PAD
    return reg, ch, cw


def _schedule_levels(pic: PictureState, plan):
    """Wavefront scheduling: group records into dependency levels.

    level(rec) = 1 + max level over the blocks its L-shaped reference
    band reads from; records of one level are mutually independent, so
    any topological reorder (here: by level) is a legal reconstruction
    schedule.  This exposes the full anti-diagonal parallelism of the
    frame instead of the decode order's left-to-right chain."""
    sps = pic.sps
    shapes = {0: (sps.height, sps.width)}
    shapes[1] = shapes[2] = (sps.height // sps.sub_h, sps.width // sps.sub_w)
    lvl_map = {p: np.full(shapes[p], -1, np.int32) for p in range(3)}
    chunks = []
    for r in plan:
        m = lvl_map[r.plane]
        h, w = m.shape
        n2 = 2 * r.size
        x0 = max(0, r.x - 1)
        y0 = max(0, r.y - 1)
        col = m[y0:min(h, r.y + n2), x0:r.x] if r.x > 0 else None
        row = m[y0:r.y, x0:min(w, r.x + n2)] if r.y > 0 else None
        lvl = 0
        if col is not None and col.size:
            lvl = max(lvl, int(col.max()) + 1)
        if row is not None and row.size:
            lvl = max(lvl, int(row.max()) + 1)
        m[r.y:r.y + r.size, r.x:r.x + r.size] = lvl
        while len(chunks) <= lvl:
            chunks.append([])
        chunks[lvl].append(r)
    return chunks


def _pow2_at_least(x):
    return 1 << max(0, (x - 1).bit_length())


def pack_frame(pic: PictureState, plan: List) -> PackedFrame:
    sps = pic.sps
    bd = sps.bit_depth_luma
    reg, ch, cw = region_offsets(sps)
    canvas = np.zeros((ch, cw), np.int32)
    classes = {4: 0, 8: 1, 16: 2, 32: 3}
    chroma444 = sps.chroma_format_idc == 3

    chunks = _schedule_levels(pic, plan)

    # residual pools (slot 0 = zeros, prepended on device)
    lv = [[] for _ in range(4)]
    rmeta = [[] for _ in range(4)]
    rec_meta = {}  # id(rec) -> (class, scal fields, avail bits)
    for r in plan:
        c = classes[r.size]
        n = r.size
        n2 = 2 * n
        sx = sps.sub_w if r.plane else 1
        sy = sps.sub_h if r.plane else 1
        oy, ox, rh, rw = reg[r.plane]
        xl, yl = r.x * sx, r.y * sy
        bits = np.zeros(128, bool)
        for i in range(n2):
            if r.y + i < rh:
                bits[i] = pic.available(xl, yl, xl - sx, (r.y + i) * sy)
            if r.x + i < rw:
                bits[64 + i] = pic.available(xl, yl, (r.x + i) * sx,
                                             yl - sy)
        ac = pic.available(xl, yl, xl - sx, yl - sy)
        filt = (not sps.intra_smoothing_disabled
                and R._filter_flag(r.mode, n, r.plane, chroma444, False))
        strong = bool(sps.strong_intra_smoothing) and n == 32 and filt
        if r.levels is not None:
            lv[c].append(np.asarray(r.levels, np.int32))
            rmeta[c].append((r.qp, int(r.dst), int(r.ts), int(r.tqb)))
            slot = len(lv[c])
        else:
            slot = 0
        rec_meta[id(r)] = (c, (oy + r.y, ox + r.x, r.mode, slot, int(filt),
                               int(strong), int(r.plane == 0 and n < 32),
                               int(ac)), bits)

    # per-class per-chunk arrays, bucketed shapes for jit-cache stability
    n_chunks = _round_up(max(1, len(chunks)), 16)
    counts = [max((sum(1 for r in chk if classes[r.size] == c)
                   for chk in chunks), default=0) for c in range(4)]
    # B = 0 ⇒ class completely unused: the device skips its branch
    B = [_pow2_at_least(c) if c else 0 for c in counts]
    scal = []
    avail = []
    for c in range(4):
        a = np.zeros((n_chunks, B[c], 8), np.int32)
        a[:, :, 0] = DUMP
        a[:, :, 1] = DUMP
        a[:, :, 2] = 1
        scal.append(a)
        avail.append(np.zeros((n_chunks, B[c], 128), bool))
    for k, chk in enumerate(chunks):
        fill = [0, 0, 0, 0]
        for r in chk:
            c, fields, bits = rec_meta[id(r)]
            j = fill[c]
            fill[c] += 1
            scal[c][k, j] = fields
            avail[c][k, j] = bits

    levels = []
    rmetas = []
    for c, s in enumerate((4, 8, 16, 32)):
        nlv = _round_up(max(1, len(lv[c]) + 1), 16)
        padl = nlv - len(lv[c])
        levels.append(np.stack(lv[c] + [np.zeros((s, s), np.int32)] * padl))
        rmetas.append(np.asarray(rmeta[c] + [(0, 0, 0, 0)] * padl, np.int32))

    return PackedFrame(canvas=canvas, scal=tuple(scal), avail=tuple(avail),
                       levels=tuple(levels), rmeta=tuple(rmetas),
                       n_chunks=n_chunks, region=reg, bit_depth=bd)
