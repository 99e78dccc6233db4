"""Intra HEVC encoder — the framework's bitstream generator.

The reference decoder ships no encoder; we need one to create conformant
test/benchmark streams that the openHEVC oracle binary can cross-check
(decoded-picture-hash SEI → "Correct MD5").  The encoder reuses the same
PictureState/ops as the decoder, so its reconstruction is by construction
the decode result; the embedded MD5 makes any drift observable.

Forward transform + quantization follow the HM informative design
(quantScales, qbits = 29 + qp/6 − bitDepth − log2TrafoSize).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..bitstream import nal as nalmod
from ..bitstream.ps import PPS, SPS, VPS
from ..bitstream.sei import (SEI_TYPE_DECODED_PICTURE_HASH,
                             DecodedPictureHash, picture_md5, write_sei_rbsp)
from ..bitstream.slice import SLICE_I, SliceHeader
from ..cabac.ctx import ContextModel
from ..cabac.engine import CabacEncoder
from ..coding.picture import (PictureState, chroma_mode_to_idx, mpm_list)
from ..coding.residual import encode_residual
from ..coding.scans import scan_idx_for_intra
from ..ops import reference as R

QUANT_SCALES = (26214, 23302, 20560, 18396, 16384, 14564)


def forward_transform(res: np.ndarray, bit_depth: int,
                      dst: bool = False) -> np.ndarray:
    """Forward integer transform (HM informative): res[n,n] → coeff[n,n]."""
    n = res.shape[0]
    log2 = int(np.log2(n))
    T = R.DST4 if dst else R.dct_matrix(n)
    s1 = log2 + bit_depth - 9
    s2 = log2 + 6
    tmp = (T.astype(np.int64) @ res.astype(np.int64)
           + (1 << (s1 - 1))) >> s1
    out = (tmp @ T.T.astype(np.int64) + (1 << (s2 - 1))) >> s2
    return out.astype(np.int64)


def quantize(coef: np.ndarray, qp: int, log2_size: int, bit_depth: int,
             intra: bool = True) -> np.ndarray:
    qbits = 29 + qp // 6 - bit_depth - log2_size
    scale = QUANT_SCALES[qp % 6]
    offset = (171 if intra else 85) << (qbits - 9)
    mag = (np.abs(coef.astype(np.int64)) * scale + offset) >> qbits
    lv = np.sign(coef) * mag
    return np.clip(lv, -32768, 32767).astype(np.int32)


@dataclass
class EncoderConfig:
    width: int = 416
    height: int = 240
    qp: int = 32
    log2_ctb_size: int = 4
    log2_min_cb_size: int = 3
    bit_depth: int = 8
    chroma_format_idc: int = 1
    # CU size the encoder targets (log2); must be <= log2_max_tb for now
    log2_cu_size: int = 4
    candidate_modes: tuple = (R.INTRA_PLANAR, R.INTRA_DC, 10, 26, 2, 18, 34)
    sei_hash: bool = True
    deblocking: bool = False  # in-loop deblocking (decoder filter stage)


class IntraEncoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        assert cfg.width % (1 << cfg.log2_min_cb_size) == 0
        assert cfg.height % (1 << cfg.log2_min_cb_size) == 0
        self.vps = VPS()
        self.sps = SPS(
            width=cfg.width, height=cfg.height,
            bit_depth_luma=cfg.bit_depth, bit_depth_chroma=cfg.bit_depth,
            chroma_format_idc=cfg.chroma_format_idc,
            log2_min_cb_size=cfg.log2_min_cb_size,
            log2_ctb_size=cfg.log2_ctb_size,
            log2_min_tb_size=2,
            log2_max_tb_size=min(5, cfg.log2_ctb_size),
        ).derive()
        self.pps = PPS(
            init_qp=cfg.qp,
            deblocking_filter_control_present=0 if cfg.deblocking else 1,
            deblocking_filter_disabled=0 if cfg.deblocking else 1,
        ).derive(self.sps)
        assert cfg.log2_cu_size <= self.sps.log2_max_tb_size, \
            "TU split not yet emitted by the encoder"
        self.frames_encoded = 0

    def headers_annexb(self) -> bytes:
        return nalmod.write_annexb([
            (nalmod.NAL_VPS, 0, 0, self.vps.write_rbsp()),
            (nalmod.NAL_SPS, 0, 0, self.sps.write_rbsp()),
            (nalmod.NAL_PPS, 0, 0, self.pps.write_rbsp()),
        ])

    # ---- one frame -------------------------------------------------------
    def encode_frame(self, planes: List[np.ndarray]) -> bytes:
        """planes: [Y, Cb, Cr] source arrays.  Returns the AU (Annex-B)."""
        sps, pps, cfg = self.sps, self.pps, self.cfg
        self.pic = PictureState(sps, pps)
        self.src = [p.astype(np.int32) for p in planes]
        self.e = CabacEncoder()
        self.cm = ContextModel(0, cfg.qp)
        self.qp_y = cfg.qp

        n_ctbs = sps.ctb_w * sps.ctb_h
        for rs in range(n_ctbs):
            xc, yc = rs % sps.ctb_w, rs // sps.ctb_w
            self.pic.set_ctb_slice(xc, yc, 0)
            x0, y0 = xc << sps.log2_ctb_size, yc << sps.log2_ctb_size
            self._quadtree(x0, y0, sps.log2_ctb_size, 0)
            last = rs == n_ctbs - 1
            self.e.encode_terminate(1 if last else 0)
        self.e.terminate_and_align()
        payload = self.e.getvalue()

        sh = SliceHeader(slice_type=SLICE_I, qp_delta=cfg.qp - pps.init_qp)
        nal_type = nalmod.NAL_IDR_W_RADL
        slice_rbsp = sh.write_rbsp(sps, pps, nal_type, payload)
        au = []
        if self.frames_encoded == 0:
            au += [
                (nalmod.NAL_VPS, 0, 0, self.vps.write_rbsp()),
                (nalmod.NAL_SPS, 0, 0, self.sps.write_rbsp()),
                (nalmod.NAL_PPS, 0, 0, self.pps.write_rbsp()),
            ]
        if cfg.sei_hash:
            md5s = picture_md5(self.pic.planes, sps.bit_depth_luma)
            sei = DecodedPictureHash(hash_type=0, md5=md5s)
            au.append((nalmod.NAL_SEI_PREFIX, 0, 0, write_sei_rbsp(
                [(SEI_TYPE_DECODED_PICTURE_HASH, sei.payload())])))
        au.append((nal_type, 0, 0, slice_rbsp))
        self.frames_encoded += 1
        return nalmod.write_annexb(au)

    @property
    def recon_planes(self):
        return self.pic.planes

    # ---- recursion -------------------------------------------------------
    def _quadtree(self, x0, y0, log2_size, depth):
        sps, cfg = self.sps, self.cfg
        size = 1 << log2_size
        w, h = sps.width, sps.height
        inside = x0 + size <= w and y0 + size <= h
        if inside and log2_size > sps.log2_min_cb_size:
            split = 1 if log2_size > cfg.log2_cu_size else 0
            ctx = self.pic.ctdepth_gt(x0, y0, depth)
            self.e.encode_bin(self.cm.at("split_cu_flag", ctx), split)
        elif not inside:
            split = 1 if log2_size > sps.log2_min_cb_size else 0
        else:
            split = 0
        if split:
            half = size >> 1
            for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
                x1, y1 = x0 + dx * half, y0 + dy * half
                if x1 < w and y1 < h:
                    self._quadtree(x1, y1, log2_size - 1, depth + 1)
        else:
            self._coding_unit(x0, y0, log2_size, depth)

    def _choose_mode(self, x0, y0, size) -> int:
        src = self.src[0][y0:y0 + size, x0:x0 + size]
        best, best_cost = R.INTRA_DC, None
        for mode in self.cfg.candidate_modes:
            pred = self.pic.predict_intra(0, x0, y0, size, mode)
            cost = int(np.abs(src - pred).sum())
            if best_cost is None or cost < best_cost:
                best, best_cost = mode, cost
        return best

    def _coding_unit(self, x0, y0, log2_size, depth):
        sps, pps, e, cm, pic = self.sps, self.pps, self.e, self.cm, self.pic
        size = 1 << log2_size
        if pps.transquant_bypass_enabled:
            e.encode_bin(cm.at("cu_transquant_bypass_flag", 0), 0)
        if log2_size == sps.log2_min_cb_size:
            e.encode_bin(cm.at("part_mode", 0), 1)  # PART_2Nx2N

        mode = self._choose_mode(x0, y0, size)
        ca, cb = pic.luma_intra_mode_cand(x0, y0)
        cands = mpm_list(ca, cb)
        if mode in cands:
            idx = cands.index(mode)
            e.encode_bin(cm.at("prev_intra_luma_pred_flag", 0), 1)
            if idx == 0:
                e.encode_bypass(0)
            else:
                e.encode_bypass(1)
                e.encode_bypass(idx - 1)
        else:
            e.encode_bin(cm.at("prev_intra_luma_pred_flag", 0), 0)
            rem = mode
            for m in sorted(cands, reverse=True):
                if rem > m:
                    rem -= 1
            e.encode_bypass_bits(rem, 5)
        g4 = size >> 2
        pic.intra_mode_y[y0 >> 2:(y0 >> 2) + g4,
                         x0 >> 2:(x0 >> 2) + g4] = mode
        pic.is_intra[y0 >> 2:(y0 >> 2) + g4, x0 >> 2:(x0 >> 2) + g4] = True
        pic.ct_depth[y0 >> 2:(y0 >> 2) + g4, x0 >> 2:(x0 >> 2) + g4] = depth

        # chroma: derived mode (DM) — binarization '0'
        chroma_mode = mode
        idx = chroma_mode_to_idx(chroma_mode, mode)
        assert idx == 4
        e.encode_bin(cm.at("intra_chroma_pred_mode", 0), 0)

        # ---- single-TU transform tree ----
        bd = sps.bit_depth_luma
        maxv = (1 << bd) - 1
        # luma
        pred_y = pic.predict_intra(0, x0, y0, size, mode)
        res_y = self.src[0][y0:y0 + size, x0:x0 + size] - pred_y
        use_dst = log2_size == 2
        coef = forward_transform(res_y, bd, dst=use_dst)
        lv_y = quantize(coef, self.qp_y + sps.qp_bd_offset, log2_size, bd)
        cbf_luma = 1 if lv_y.any() else 0

        # chroma (4:2:0)
        xc, yc = x0 >> 1, y0 >> 1
        log2c = log2_size - 1
        csize = size >> 1
        lv_c, pred_c, qp_c = [], [], []
        for c_idx in (1, 2):
            off = pps.cb_qp_offset if c_idx == 1 else pps.cr_qp_offset
            qp = R.chroma_qp(self.qp_y, off, sps.chroma_format_idc,
                             sps.qp_bd_offset)
            p = pic.predict_intra(c_idx, xc, yc, csize, chroma_mode)
            res = self.src[c_idx][yc:yc + csize, xc:xc + csize] - p
            c = forward_transform(res, sps.bit_depth_chroma)
            lv = quantize(c, qp, log2c, sps.bit_depth_chroma)
            lv_c.append(lv)
            pred_c.append(p)
            qp_c.append(qp)
        cbf_cb = 1 if lv_c[0].any() else 0
        cbf_cr = 1 if lv_c[1].any() else 0

        # cbf syntax (depth 0)
        e.encode_bin(cm.at("cbf_cbcr", 0), cbf_cb)
        e.encode_bin(cm.at("cbf_cbcr", 0), cbf_cr)
        e.encode_bin(cm.at("cbf_luma", 1), cbf_luma)

        # residual syntax + reconstruction
        scan = scan_idx_for_intra(mode, log2_size, 0, sps.chroma_format_idc)
        if cbf_luma:
            encode_residual(e, cm, lv_y, log2_size, 0, scan)
            dq = R.dequant(lv_y, self.qp_y + sps.qp_bd_offset, log2_size, bd)
            r = R.inverse_transform(dq, bd, dst=use_dst)
            rec = np.clip(pred_y + r, 0, maxv)
        else:
            rec = pred_y
        pic.planes[0][y0:y0 + size, x0:x0 + size] = \
            rec.astype(pic.planes[0].dtype)
        for k, c_idx in enumerate((1, 2)):
            cbf = (cbf_cb, cbf_cr)[k]
            scan_c = scan_idx_for_intra(chroma_mode, log2c, c_idx,
                                        sps.chroma_format_idc)
            if cbf:
                encode_residual(e, cm, lv_c[k], log2c, c_idx, scan_c)
                dq = R.dequant(lv_c[k], qp_c[k], log2c, sps.bit_depth_chroma)
                r = R.inverse_transform(dq, sps.bit_depth_chroma)
                rec = np.clip(pred_c[k] + r, 0, (1 << sps.bit_depth_chroma) - 1)
            else:
                rec = pred_c[k]
            pic.planes[c_idx][yc:yc + csize, xc:xc + csize] = \
                rec.astype(pic.planes[c_idx].dtype)
