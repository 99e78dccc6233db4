// Native (C++) CABAC residual-coding front-end — the stage-A hot loop.
//
// This is the TPU framework's analogue of the reference's hottest
// sequential kernel, ff_hevc_hls_coefficients_coding (reference:
// libavcodec/hevc_cabac.c:2408) plus the arithmetic engine it drives
// (libavcodec/cabac.c:177, cabac_functions.h:107).  It is a direct
// re-expression of this repo's own spec-derived Python implementation
// (hevc_tpu/cabac/engine.py, hevc_tpu/coding/residual.py) — H.265
// clauses 9.3.4.3 (arithmetic decoding), 7.3.8.11 (residual_coding),
// 9.3.4.2.3-9.3.4.2.6 (context derivations), 9.3.3.13
// (coeff_abs_level_remaining) — NOT a port of the ffmpeg engine.
//
// Contract: bit-exact with the Python path.  The Python wrapper
// (hevc_tpu/native/__init__.py) marshals the live CabacDecoder state and
// the ContextModel byte array in and out around each transform-block
// call; scan tables and context-offset layout are passed in so the
// single source of truth for both stays in Python.
//
// Build: g++ -O3 -shared -fPIC residual.cpp -o _residual.so

#include <cstdint>
#include <cstring>

namespace {

// Table 9-46: rangeTabLps[pStateIdx][qRangeIdx] (spec constant)
const uint8_t RANGE_TAB_LPS[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2},
};

// Table 9-47 (spec constant)
const uint8_t TRANS_IDX_LPS[64] = {
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24, 24, 25, 26, 26, 27,
    27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33, 33, 34, 34, 35, 35,
    35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
};

// 9.3.4.2.5: ctxIdxMap for 4x4 blocks
const uint8_t CTX_IDX_MAP_4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                     6, 6, 8, 8, 7, 7, 8, 8};

// Live arithmetic-decoder state, mirroring hevc_tpu.cabac.engine
// CabacDecoder (data/bytepos/range/offset/_bitbuf/_nbits).
struct Cabac {
    const uint8_t* data;
    int64_t bytepos;
    int64_t nbytes;
    int32_t range;
    int32_t offset;
    int32_t bitbuf;
    int32_t nbits;
};

static inline int read_bit(Cabac* c) {
    if (c->nbits == 0) {
        c->bitbuf = (c->bytepos < c->nbytes) ? c->data[c->bytepos] : 0;
        c->bytepos++;
        c->nbits = 8;
    }
    c->nbits--;
    return (c->bitbuf >> c->nbits) & 1;
}

static inline int decode_bin(Cabac* c, uint8_t* ctx) {
    int s = *ctx;
    int p = s >> 1;
    int mps = s & 1;
    int rlps = RANGE_TAB_LPS[p][(c->range >> 6) & 3];
    c->range -= rlps;
    int bit;
    if (c->offset >= c->range) {
        bit = 1 - mps;
        c->offset -= c->range;
        c->range = rlps;
        if (p == 0)
            mps = 1 - mps;
        *ctx = (uint8_t)((TRANS_IDX_LPS[p] << 1) | mps);
    } else {
        bit = mps;
        int nxt = p < 62 ? p + 1 : p;  // transIdxMps: min(p+1, 62), 63 fixed
        if (p == 63)
            nxt = 63;
        *ctx = (uint8_t)((nxt << 1) | mps);
    }
    while (c->range < 256) {
        c->range <<= 1;
        c->offset = (c->offset << 1) | read_bit(c);
    }
    return bit;
}

static inline int decode_bypass(Cabac* c) {
    c->offset = (c->offset << 1) | read_bit(c);
    if (c->offset >= c->range) {
        c->offset -= c->range;
        return 1;
    }
    return 0;
}

static inline int decode_bypass_bits(Cabac* c, int n) {
    int v = 0;
    for (int i = 0; i < n; i++)
        v = (v << 1) | decode_bypass(c);
    return v;
}

// coeff_abs_level_remaining (9.3.3.13): TR prefix + EGk escape
static inline int decode_remaining(Cabac* c, int rice) {
    int prefix = 0;
    while (prefix < 24 && decode_bypass(c))
        prefix++;
    if (prefix < 3)
        return (prefix << rice) + decode_bypass_bits(c, rice);
    int nbits = prefix - 3 + rice;
    return (((1 << (prefix - 3)) + 2) << rice) + decode_bypass_bits(c, nbits);
}

// 9.3.4.2.5 sig_coeff_flag context (mirror of residual.py _sig_ctx)
static inline int sig_ctx(int log2_size, int c_idx, int xc, int yc,
                          int scan_idx, const uint8_t* csbf, int nsb) {
    int s;
    if (log2_size == 2) {
        s = CTX_IDX_MAP_4x4[(yc << 2) + xc];
    } else if (xc + yc == 0) {
        s = 0;
    } else {
        int xs = xc >> 2, ys = yc >> 2;
        int prev = 0;
        if (xs < nsb - 1 && csbf[ys * nsb + xs + 1])
            prev += 1;
        if (ys < nsb - 1 && csbf[(ys + 1) * nsb + xs])
            prev += 2;
        int xp = xc & 3, yp = yc & 3;
        if (prev == 0)
            s = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
        else if (prev == 1)
            s = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
        else if (prev == 2)
            s = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
        else
            s = 2;
        if (c_idx == 0) {
            if (xs + ys > 0)
                s += 3;
            if (log2_size == 3)
                s += (scan_idx == 0) ? 9 : 15;  // SCAN_DIAG == 0
            else
                s += 21;
        } else {
            s += (log2_size == 3) ? 9 : 12;
        }
    }
    return s + (c_idx ? 27 : 0);
}

}  // namespace

// Context-offset layout passed from Python (single source of truth is
// hevc_tpu.cabac.ctx CTX_OFFSET):
//   off[0] transform_skip_flag      off[1] last_sig_coeff_x_prefix
//   off[2] last_sig_coeff_y_prefix  off[3] coded_sub_block_flag
//   off[4] sig_coeff_flag           off[5] coeff_abs_level_greater1_flag
//   off[6] coeff_abs_level_greater2_flag
extern "C" int hevc_native_decode_residual(
    const uint8_t* data, int64_t nbytes,
    int64_t* io_bytepos, int32_t* io_range, int32_t* io_offset,
    int32_t* io_bitbuf, int32_t* io_nbits,
    uint8_t* ctx, const int32_t* off,
    int32_t log2_size, int32_t c_idx, int32_t scan_idx,
    int32_t sign_data_hiding, int32_t ts_allowed, int32_t tq_bypass,
    const int32_t* sub_scan,   // [nsb*nsb][2] (xS, yS)
    const int32_t* coef_scan,  // [16][2] (xP, yP)
    const int32_t* pos_of_xy,  // [size*size] global scan position
    int32_t* levels,           // out [size*size], caller-zeroed or not
    int32_t* ts_flag_out) {
    Cabac cb = {data, *io_bytepos, nbytes, *io_range, *io_offset,
                *io_bitbuf, *io_nbits};
    Cabac* c = &cb;
    const int size = 1 << log2_size;
    memset(levels, 0, sizeof(int32_t) * size * size);

    int ts_flag = 0;
    if (ts_allowed && !tq_bypass)
        ts_flag = decode_bin(c, ctx + off[0] + (c_idx ? 1 : 0));
    *ts_flag_out = ts_flag;

    // ---- last significant coefficient position ----
    int coff, cshift;
    if (c_idx == 0) {
        coff = 3 * (log2_size - 2) + ((log2_size - 1) >> 2);
        cshift = (log2_size + 1) >> 2;
    } else {
        coff = 15;
        cshift = log2_size - 2;
    }
    int cmax = (log2_size << 1) - 1;
    int px = 0;
    while (px < cmax && decode_bin(c, ctx + off[1] + coff + (px >> cshift)))
        px++;
    int py = 0;
    while (py < cmax && decode_bin(c, ctx + off[2] + coff + (py >> cshift)))
        py++;
    int last_x, last_y;
    if (px > 3) {
        int nb = (px >> 1) - 1;
        last_x = ((2 + (px & 1)) << nb) + decode_bypass_bits(c, nb);
    } else {
        last_x = px;
    }
    if (py > 3) {
        int nb = (py >> 1) - 1;
        last_y = ((2 + (py & 1)) << nb) + decode_bypass_bits(c, nb);
    } else {
        last_y = py;
    }
    if (scan_idx == 2) {  // SCAN_VERT
        int t = last_x;
        last_x = last_y;
        last_y = t;
    }

    const int nsb = (size >> 2) > 0 ? (size >> 2) : 1;
    int last_pos = pos_of_xy[last_y * size + last_x];
    int last_sb = last_pos >> 4, last_n = last_pos & 15;
    uint8_t csbf[64];  // up to 8x8 sub-blocks (32x32 TB)
    memset(csbf, 0, nsb * nsb);

    int c1 = 1;  // greater1 state, persists across sub-blocks
    int sig_pos[16];
    for (int i = last_sb; i >= 0; i--) {
        int xs = sub_scan[2 * i], ys = sub_scan[2 * i + 1];
        int infer_dc = 0;
        int sbf;
        if (i > 0 && i < last_sb) {
            int right = (xs + 1 < nsb) ? csbf[ys * nsb + xs + 1] : 0;
            int below = (ys + 1 < nsb) ? csbf[(ys + 1) * nsb + xs] : 0;
            int cx = (right + below > 0 ? 1 : 0) + (c_idx ? 2 : 0);
            sbf = decode_bin(c, ctx + off[3] + cx);
            infer_dc = 1;
        } else {
            sbf = 1;
        }
        csbf[ys * nsb + xs] = (uint8_t)sbf;
        if (!sbf)
            continue;

        // significant_coeff_flag, descending scan position
        int nsig = 0;
        int n_start;
        if (i == last_sb) {
            sig_pos[nsig++] = last_n;
            n_start = last_n - 1;
        } else {
            n_start = 15;
        }
        for (int n = n_start; n > 0; n--) {
            int xp = coef_scan[2 * n], yp = coef_scan[2 * n + 1];
            int cx = sig_ctx(log2_size, c_idx, (xs << 2) + xp,
                             (ys << 2) + yp, scan_idx, csbf, nsb);
            if (decode_bin(c, ctx + off[4] + cx)) {
                sig_pos[nsig++] = n;
                infer_dc = 0;
            }
        }
        if (n_start >= 0) {
            if (infer_dc) {
                sig_pos[nsig++] = 0;  // inferred significant DC
            } else {
                int cx = sig_ctx(log2_size, c_idx, xs << 2, ys << 2,
                                 scan_idx, csbf, nsb);
                if (decode_bin(c, ctx + off[4] + cx))
                    sig_pos[nsig++] = 0;
            }
        }
        if (nsig == 0)
            continue;

        // greater1 flags (first 8 significant coeffs)
        int ctx_set = ((i > 0 && c_idx == 0) ? 2 : 0) + (c1 == 0 ? 1 : 0);
        c1 = 1;
        int gt1[16];
        int gt2_target = -1;
        int n_gt1 = nsig < 8 ? nsig : 8;
        for (int m = 0; m < n_gt1; m++) {
            int base = (c_idx ? 16 : 0) + 4 * ctx_set + c1;
            int f = decode_bin(c, ctx + off[5] + base);
            gt1[m] = f;
            if (f) {
                if (gt2_target < 0)
                    gt2_target = sig_pos[m];
                c1 = 0;
            } else if (c1 > 0 && c1 < 3) {
                c1++;
            }
        }
        int gt2 = 0;
        if (gt2_target >= 0)
            gt2 = decode_bin(c, ctx + off[6] + (c_idx ? 4 : 0) + ctx_set);

        // signs (bypass; possibly one hidden)
        int first_nz = sig_pos[nsig - 1], last_nz = sig_pos[0];
        int hidden = (sign_data_hiding && !tq_bypass &&
                      (last_nz - first_nz) >= 4);
        int nsigns = hidden ? nsig - 1 : nsig;
        int signs[16];
        for (int m = 0; m < nsigns; m++)
            signs[m] = decode_bypass(c);

        // remaining levels
        int rice = 0;
        int sum_abs = 0;
        int lvls[16];
        for (int m = 0; m < nsig; m++) {
            int lvl = 1;
            int threshold;
            if (m < 8) {
                lvl += gt1[m];
                if (sig_pos[m] == gt2_target)
                    lvl += gt2;
                threshold = (sig_pos[m] == gt2_target) ? 3 : 2;
            } else {
                threshold = 1;
            }
            if (lvl == threshold)
                lvl += decode_remaining(c, rice);
            if (lvl > (3 << rice))
                rice = rice < 4 ? rice + 1 : 4;
            lvls[m] = lvl;
            sum_abs += lvl;
        }
        for (int m = 0; m < nsig; m++) {
            int n = sig_pos[m];
            int xp = coef_scan[2 * n], yp = coef_scan[2 * n + 1];
            int sgn;
            if (hidden && m == nsig - 1)
                sgn = (sum_abs & 1) ? -1 : 1;
            else
                sgn = signs[m] ? -1 : 1;
            levels[((ys << 2) + yp) * size + (xs << 2) + xp] = sgn * lvls[m];
        }
    }

    *io_bytepos = c->bytepos;
    *io_range = c->range;
    *io_offset = c->offset;
    *io_bitbuf = c->bitbuf;
    *io_nbits = c->nbits;
    return 0;
}
