// Native streaming FLAC encoder for the audio serving edge.
//
// The reference links libFLAC++ and encodes each listener's int16 mono
// stream at compression level 5 (reference: src/signal.cpp:17-28,
// src/audio.cpp:38-52).  This image has no libFLAC, so this is a
// from-scratch encoder emitting spec-conformant FLAC at level-5-like
// quality: LPC predictors (Tukey(0.5) apodization, Levinson-Durbin,
// orders <= 8 -- libFLAC level 5's max_lpc_order) with error-feedback
// coefficient quantization, fixed predictors (orders 0-4), CONSTANT
// subframes, and an exact Rice partition-order search (orders 0-6);
// per subframe the cheaper of the best-fixed and best-LPC encodings
// is emitted, each under its own best partitioning.  16-bit mono or
// 2-channel stereo (the device-side WBFM stereo path) with per-frame
// adaptive channel decorrelation (independent / left-side /
// right-side / mid-side, chosen by an order-2 cost estimate like
// libFLAC's adaptive mid-side); streamable subset (sample rate coded
// in each frame header), fixed blocksize.
//
// C ABI (used from Python via ctypes, one encoder per audio client):
//   void*   phantom_flac_create(int sample_rate, int blocksize,
//                               int channels /* 1 or 2 */)
//   int     phantom_flac_process(void*, const int16_t* interleaved,
//                                int n_total, uint8_t* out, int cap)
//   int     phantom_flac_process_chunks(void*, const int16_t*, int
//                                nchunks, int chunk_len, uint8_t* out,
//                                int cap, int* sizes)
//   int     phantom_flac_finish(void*, uint8_t* out, int cap)
//   int     phantom_flac_take(void*, uint8_t* out, int cap)
//     (process*/finish return -(needed) when `out` is too small; the
//      encoded bytes stay stashed and take() retrieves them)
//   void    phantom_flac_set_lpc(void*, int enabled)  // A/B measuring
//   void    phantom_flac_destroy(void*)
//
// Build: make -C csrc   (produces libphantomhost.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int KMAX = 15;           // rice parameters 0..14 (15 = escape,
                                   // never needed for 16-bit input)
constexpr int MAX_PART_ORDER = 6;  // rice partition orders searched
constexpr int MAX_LPC_ORDER = 8;   // libFLAC compression level 5
constexpr int QLP_PRECISION = 15;  // 4-bit field codes precision-1 <= 14

// Exact Rice cost/partition plan for one subframe's residuals.
// u = zigzag residuals for sample positions [order, n); partition
// boundaries are at SAMPLE positions (multiples of n>>p), so the
// first partition is `order` samples short (RFC 9639 9.2.7).
struct RicePlan {
    int porder = 0;
    uint64_t bits = 0;             // 2+4 header + per-partition 4+data
    std::vector<uint8_t> ks;       // parameter per partition
};

RicePlan plan_rice(const std::vector<uint64_t> &u, int n, int order) {
    int pmax = 0;
    while (pmax < MAX_PART_ORDER && (n % (1 << (pmax + 1))) == 0 &&
           (n >> (pmax + 1)) > order)
        pmax++;
    int parts = 1 << pmax;
    int psize = n >> pmax;
    // exact per-k unary+remainder sums at the deepest level:
    // bits(part, k) = cnt*(k+1) + sum_i(u_i >> k).  v>>k is 0 for
    // k >= bit_width(v), so the k loop stops there (typical residuals
    // are a few bits; this is the encoder's hottest loop)
    std::vector<uint64_t> sums((size_t)parts * KMAX, 0);
    std::vector<uint32_t> cnt(parts, 0);
    for (int j = 0; j < parts; j++) {
        int start = std::max(j * psize, order);  // only partition 0 is
        int stop = (j + 1) * psize;              // shortened: psize>order
        uint64_t *s = &sums[(size_t)j * KMAX];
        cnt[j] = (uint32_t)(stop - start);
        for (int i = start; i < stop; i++) {
            uint64_t v = u[i - order];
            int hb = v ? 64 - __builtin_clzll(v) : 0;
            if (hb > KMAX) hb = KMAX;
            for (int k = 0; k < hb; k++) s[k] += v >> k;
        }
    }
    RicePlan best;
    best.bits = ~0ull;
    for (int p = pmax;; p--) {
        int np = 1 << p;
        uint64_t total = 6;
        std::vector<uint8_t> ks(np);
        for (int j = 0; j < np; j++) {
            uint64_t bb = ~0ull;
            int bk = 0;
            const uint64_t *s = &sums[(size_t)j * KMAX];
            for (int k = 0; k < KMAX; k++) {
                uint64_t b = (uint64_t)cnt[j] * (uint32_t)(k + 1) + s[k];
                if (b < bb) { bb = b; bk = k; }
            }
            ks[j] = (uint8_t)bk;
            total += 4 + bb;
        }
        if (total < best.bits) {
            best.bits = total;
            best.porder = p;
            best.ks = std::move(ks);
        }
        if (p == 0) break;
        for (int j = 0; j < np / 2; j++) {  // merge partition pairs
            for (int k = 0; k < KMAX; k++)
                sums[(size_t)j * KMAX + k] =
                    sums[(size_t)(2 * j) * KMAX + k] +
                    sums[(size_t)(2 * j + 1) * KMAX + k];
            cnt[j] = cnt[2 * j] + cnt[2 * j + 1];
        }
    }
    return best;
}

// Quantized-LPC candidate for one subframe.
struct LpcCand {
    bool ok = false;
    int order = 0;
    int shift = 0;
    int32_t qlp[MAX_LPC_ORDER] = {0};
};

struct BitWriter {
    std::vector<uint8_t> buf;
    uint64_t acc = 0;
    int nbits = 0;

    void put(uint32_t val, int bits) {
        // append `bits` bits (msb first)
        acc = (acc << bits) | (uint64_t)(val & ((bits == 32) ? 0xFFFFFFFFu : ((1u << bits) - 1)));
        nbits += bits;
        while (nbits >= 8) {
            nbits -= 8;
            buf.push_back((uint8_t)(acc >> nbits));
        }
    }
    void put_unary(uint32_t q) {
        while (q >= 32) { put(0, 32); q -= 32; }
        // q zero bits then a 1
        put(1, (int)q + 1);
    }
    void align_zero() {
        if (nbits) put(0, 8 - nbits);
    }
};

// byte-at-a-time tables for the FLAC CRCs (poly 0x07 / 0x8005, both
// init 0); same values as the bitwise loops, 8x fewer iterations over
// every frame byte
struct CrcTables {
    uint8_t t8[256];
    uint16_t t16[256];
    CrcTables() {
        for (int i = 0; i < 256; i++) {
            uint8_t c = (uint8_t)i;
            for (int b = 0; b < 8; b++)
                c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07)
                               : (uint8_t)(c << 1);
            t8[i] = c;
            uint16_t w = (uint16_t)(i << 8);
            for (int b = 0; b < 8; b++)
                w = (w & 0x8000) ? (uint16_t)((w << 1) ^ 0x8005)
                                 : (uint16_t)(w << 1);
            t16[i] = w;
        }
    }
};
const CrcTables CRC;

uint8_t crc8(const uint8_t *d, size_t n) {
    uint8_t crc = 0;
    for (size_t i = 0; i < n; i++) crc = CRC.t8[crc ^ d[i]];
    return crc;
}

uint16_t crc16(const uint8_t *d, size_t n) {
    uint16_t crc = 0;
    for (size_t i = 0; i < n; i++)
        crc = (uint16_t)((crc << 8) ^ CRC.t16[((crc >> 8) ^ d[i]) & 0xFF]);
    return crc;
}

// frame-number coding: UTF-8-style, up to 31 bits (FLAC frame header)
void put_coded_number(BitWriter &bw, uint32_t v) {
    if (v < 0x80) {
        bw.put(v, 8);
    } else if (v < 0x800) {
        bw.put(0xC0 | (v >> 6), 8);
        bw.put(0x80 | (v & 0x3F), 8);
    } else if (v < 0x10000) {
        bw.put(0xE0 | (v >> 12), 8);
        bw.put(0x80 | ((v >> 6) & 0x3F), 8);
        bw.put(0x80 | (v & 0x3F), 8);
    } else if (v < 0x200000) {
        bw.put(0xF0 | (v >> 18), 8);
        bw.put(0x80 | ((v >> 12) & 0x3F), 8);
        bw.put(0x80 | ((v >> 6) & 0x3F), 8);
        bw.put(0x80 | (v & 0x3F), 8);
    } else if (v < 0x4000000) {
        bw.put(0xF8 | (v >> 24), 8);
        bw.put(0x80 | ((v >> 18) & 0x3F), 8);
        bw.put(0x80 | ((v >> 12) & 0x3F), 8);
        bw.put(0x80 | ((v >> 6) & 0x3F), 8);
        bw.put(0x80 | (v & 0x3F), 8);
    } else {
        bw.put(0xFC | (v >> 30), 8);
        bw.put(0x80 | ((v >> 24) & 0x3F), 8);
        bw.put(0x80 | ((v >> 18) & 0x3F), 8);
        bw.put(0x80 | ((v >> 12) & 0x3F), 8);
        bw.put(0x80 | ((v >> 6) & 0x3F), 8);
        bw.put(0x80 | (v & 0x3F), 8);
    }
}

struct FlacEncoder {
    int sample_rate;
    int blocksize;
    int channels = 1;
    uint32_t frame_number = 0;
    bool header_sent = false;
    std::vector<int16_t> pending;   // interleaved when channels == 2
    std::vector<int32_t> chbuf[2];  // de-interleave / decorrelation
                                    // scratch (side channel is 17-bit)
    std::vector<int64_t> residual;  // scratch (fixed-predictor residual)
    std::vector<int64_t> lpcres;    // scratch (LPC residual)
    std::vector<uint64_t> uzz;      // scratch (zigzag residual)
    std::vector<double> window;     // Tukey(0.5) apodization cache
    int window_n = -1;
    bool lpc_enabled = true;        // phantom_flac_set_lpc: fixed-only
                                    // mode for A/B measurement
    std::vector<uint8_t> stash;     // encoded bytes awaiting pickup when
    //                                 the caller's buffer was too small
    //                                 (input is consumed before the size
    //                                 is known; see phantom_flac_take)

    void write_streaminfo(std::vector<uint8_t> &out) {
        out.insert(out.end(), {'f', 'L', 'a', 'C'});
        // metadata header: last-block=1, type=0 (STREAMINFO), len=34
        out.push_back(0x80);
        out.push_back(0);
        out.push_back(0);
        out.push_back(34);
        BitWriter bw;
        bw.put(blocksize, 16);      // min blocksize
        bw.put(blocksize, 16);      // max blocksize
        bw.put(0, 24);              // min framesize unknown
        bw.put(0, 24);              // max framesize unknown
        bw.put(sample_rate, 20);
        bw.put(channels - 1, 3);
        bw.put(15, 5);              // bps - 1 = 15
        bw.put(0, 4);               // total samples high (unknown)
        bw.put(0, 32);              // total samples low
        for (int i = 0; i < 16; i++) bw.put(0, 8);  // MD5 unknown
        out.insert(out.end(), bw.buf.begin(), bw.buf.end());
    }

    // order-2 fixed-difference residual cost estimate for one channel
    // candidate -- the adaptive stereo-decorrelation decision (libFLAC
    // level 5 style: estimate, don't exhaustively encode all four)
    static uint64_t est_channel_bits(const int32_t *x, int n) {
        if (n < 3) return 16u * (unsigned)n;
        uint64_t usum = 0;
        for (int i = 2; i < n; i++) {
            int64_t v = (int64_t)x[i] - 2 * (int64_t)x[i - 1]
                        + (int64_t)x[i - 2];
            usum += (uint64_t)((v << 1) ^ (v >> 63));
        }
        uint64_t nres = (uint64_t)(n - 2);
        uint64_t best = ~0ull;
        for (int k = 0; k < KMAX; k++)
            best = std::min(best, nres * (uint64_t)(k + 1) + (usum >> k));
        return best;
    }

    // best fixed predictor order by minimal sum of |residual|
    int best_order(const int32_t *x, int n) {
        // running difference chains in int64
        uint64_t best_sum = ~0ull;
        int best = 0;
        std::vector<int64_t> d(x, x + n);
        for (int order = 0; order <= 4; order++) {
            if (order > 0) {
                for (int i = n - 1; i >= order; i--) d[i] = d[i] - d[i - 1];
            }
            if (n <= order)
                break;
            uint64_t s = 0;
            for (int i = order; i < n; i++)
                s += (uint64_t)(d[i] < 0 ? -d[i] : d[i]);
            if (s < best_sum) {
                best_sum = s;
                best = order;
            }
        }
        return best;
    }

    void compute_residual(const int32_t *x, int n, int order) {
        residual.assign(x, x + n);
        for (int o = 0; o < order; o++)
            for (int i = n - 1; i >= o + 1; i--)
                residual[i] -= residual[i - 1];
    }

    // Tukey(0.5) window -- libFLAC level 5's default apodization.
    const std::vector<double> &tukey(int n) {
        if (window_n != n) {
            window.resize(n);
            double edge = 0.25 * (n - 1);  // p/2 * (n-1), p = 0.5
            for (int i = 0; i < n; i++) {
                double w = 1.0;
                if (i < edge)
                    w = 0.5 * (1.0 + std::cos(M_PI * (i / edge - 1.0)));
                else if (i > (n - 1) - edge)
                    w = 0.5 * (1.0 + std::cos(
                        M_PI * ((n - 1 - i) / edge - 1.0)));
                window[i] = w;
            }
            window_n = n;
        }
        return window;
    }

    // Windowed autocorrelation -> Levinson-Durbin -> order pick by the
    // prediction-error bit estimate -> error-feedback quantization.
    LpcCand analyze_lpc(const int32_t *x, int n) {
        LpcCand c;
        if (n < 4 * MAX_LPC_ORDER) return c;
        const std::vector<double> &w = tukey(n);
        std::vector<double> wd(n);
        for (int i = 0; i < n; i++) wd[i] = w[i] * x[i];
        double autoc[MAX_LPC_ORDER + 1];
        for (int lag = 0; lag <= MAX_LPC_ORDER; lag++) {
            double s = 0;
            for (int i = lag; i < n; i++) s += wd[i] * wd[i - lag];
            autoc[lag] = s;
        }
        if (!(autoc[0] > 0)) return c;
        double a[MAX_LPC_ORDER] = {0};
        double cand[MAX_LPC_ORDER][MAX_LPC_ORDER];
        double cerr[MAX_LPC_ORDER];
        double err = autoc[0];
        int max_m = 0;
        for (int m = 1; m <= MAX_LPC_ORDER; m++) {
            double acc = autoc[m];
            for (int j = 1; j < m; j++) acc -= a[j - 1] * autoc[m - j];
            double k = acc / err;
            if (!std::isfinite(k)) break;
            double na[MAX_LPC_ORDER];
            na[m - 1] = k;
            for (int j = 0; j < m - 1; j++) na[j] = a[j] - k * a[m - 2 - j];
            std::memcpy(a, na, sizeof(double) * m);
            err *= (1.0 - k * k);
            if (!(err > 0)) err = 1e-9;
            std::memcpy(cand[m - 1], a, sizeof(double) * m);
            cerr[m - 1] = err;
            max_m = m;
        }
        if (max_m == 0) return c;
        // estimated total bits: warmup+coef header grows with order,
        // residual shrinks ~0.5*log2(err) per sample (constant terms
        // cancel in the argmin)
        double best_est = 1e300;
        int best_m = 1;
        for (int m = 1; m <= max_m; m++) {
            double bps = 0.5 * std::log2(std::max(cerr[m - 1], 1e-9) / n);
            double est = (double)m * (16 + QLP_PRECISION) +
                         (double)(n - m) * std::max(bps, 0.0);
            if (est < best_est) { best_est = est; best_m = m; }
        }
        const double *lp = cand[best_m - 1];
        double cmax = 0;
        for (int j = 0; j < best_m; j++)
            cmax = std::max(cmax, std::fabs(lp[j]));
        if (!(cmax > 0)) return c;
        int e;
        std::frexp(cmax, &e);            // cmax < 2^e
        int shift = (QLP_PRECISION - 1) - e;
        if (shift > 15) shift = 15;      // tiny coefs: cap the 5-bit field
        if (shift < 0) return c;         // unstable filter; use fixed
        const int32_t qmax = (1 << (QLP_PRECISION - 1)) - 1;
        double fb = 0;                   // error feedback (libFLAC-style)
        for (int j = 0; j < best_m; j++) {
            double v = lp[j] * (double)(1 << shift) + fb;
            int32_t q = (int32_t)std::lround(v);
            q = std::min(std::max(q, -qmax - 1), qmax);
            fb = v - q;
            c.qlp[j] = q;
        }
        c.order = best_m;
        c.shift = shift;
        c.ok = true;
        return c;
    }

    void lpc_residual(const int32_t *x, int n, const LpcCand &c) {
        lpcres.resize(n);
        for (int i = c.order; i < n; i++) {
            int64_t pred = 0;
            for (int j = 0; j < c.order; j++)
                pred += (int64_t)c.qlp[j] * x[i - 1 - j];
            lpcres[i] = (int64_t)x[i] - (pred >> c.shift);
        }
    }

    // zigzag res[order..n) into uzz
    void zigzag(const std::vector<int64_t> &res, int n, int order) {
        uzz.resize(n - order);
        for (int i = order; i < n; i++) {
            int64_t v = res[i];
            uzz[i - order] = (uint64_t)((v << 1) ^ (v >> 63));
        }
    }

    void write_residual(BitWriter &bw, const std::vector<uint64_t> &u,
                        int n, int order, const RicePlan &plan) {
        bw.put(0, 2);                    // residual method: rice 4-bit
        bw.put(plan.porder, 4);
        int psize = n >> plan.porder;
        for (int part = 0; part < (1 << plan.porder); part++) {
            int k = plan.ks[part];
            bw.put(k, 4);
            int start = part == 0 ? order : part * psize;
            int stop = (part + 1) * psize;
            for (int i = start; i < stop; i++) {
                uint64_t uu = u[i - order];
                bw.put_unary((uint32_t)(uu >> k));
                if (k) bw.put((uint32_t)(uu & ((1u << k) - 1)), k);
            }
        }
    }

    // Best of CONSTANT / best-fixed / best-LPC, each rice-partitioned.
    // bps = 16, or 17 for a stereo-decorrelation side channel.
    void encode_subframe(const int32_t *x, int n, int bps, BitWriter &bw) {
        bool constant = true;
        for (int i = 1; i < n; i++)
            if (x[i] != x[0]) { constant = false; break; }
        if (constant) {
            bw.put(0, 1);
            bw.put(0, 6);                // CONSTANT subframe
            bw.put(0, 1);
            bw.put((uint32_t)x[0], bps);
            return;
        }
        // fixed candidate (the round-4 encoder's path)
        int forder = best_order(x, n);
        compute_residual(x, n, forder);
        zigzag(residual, n, forder);
        RicePlan fplan = plan_rice(uzz, n, forder);
        std::vector<uint64_t> fzz;
        uint64_t fbits = 8 + (uint64_t)forder * bps + fplan.bits;
        // LPC candidate
        LpcCand c = lpc_enabled ? analyze_lpc(x, n) : LpcCand{};
        RicePlan lplan;
        uint64_t lbits = ~0ull;
        if (c.ok) {
            fzz = std::move(uzz);        // keep the fixed zigzags
            lpc_residual(x, n, c);
            zigzag(lpcres, n, c.order);
            lplan = plan_rice(uzz, n, c.order);
            lbits = 8 + (uint64_t)c.order * bps + 4 + 5 +
                    (uint64_t)c.order * QLP_PRECISION + lplan.bits;
        }
        if (c.ok && lbits < fbits) {
            bw.put(0, 1);
            bw.put(0x20 | (c.order - 1), 6);   // LPC subframe
            bw.put(0, 1);                      // no wasted bits
            for (int i = 0; i < c.order; i++)
                bw.put((uint32_t)x[i], bps);   // warmup
            bw.put(QLP_PRECISION - 1, 4);
            bw.put(c.shift, 5);
            for (int j = 0; j < c.order; j++)
                bw.put((uint32_t)c.qlp[j], QLP_PRECISION);
            write_residual(bw, uzz, n, c.order, lplan);
        } else {
            const std::vector<uint64_t> &fu = c.ok ? fzz : uzz;
            bw.put(0, 1);
            bw.put(0x08 | forder, 6);          // fixed subframe
            bw.put(0, 1);
            for (int i = 0; i < forder; i++)
                bw.put((uint32_t)x[i], bps);
            write_residual(bw, fu, n, forder, fplan);
        }
    }

    // n = per-channel sample count; x = interleaved frame
    void encode_frame(const int16_t *x, int n, std::vector<uint8_t> &out) {
        BitWriter bw;
        // ---- frame header ----
        bw.put(0x3FFE, 14);          // sync
        bw.put(0, 1);                // reserved
        bw.put(0, 1);                // fixed blocksize strategy
        bool std_bs = (n == blocksize);
        int bs_code;
        if (std_bs) {
            // 256 * 2^(c-8) table when possible
            bs_code = -1;
            for (int c = 8; c <= 15; c++)
                if (n == (256 << (c - 8))) { bs_code = c; break; }
            if (n == 192) bs_code = 1;
            for (int c = 2; c <= 5; c++)
                if (n == (576 << (c - 2))) bs_code = c;
            if (bs_code < 0) bs_code = (n <= 256) ? 6 : 7;
        } else {
            bs_code = (n <= 256) ? 6 : 7;  // blocksize-1 at header end
        }
        bw.put(bs_code, 4);
        // sample rate: 13 = 16-bit Hz; rates past 65535 Hz (the WBFM
        // 192 kHz profile) need 14 = 16-bit daHz; else 0 = STREAMINFO
        int sr_code = sample_rate <= 0xFFFF ? 13
                    : (sample_rate % 10 == 0 && sample_rate / 10 <= 0xFFFF)
                        ? 14 : 0;
        bw.put(sr_code, 4);
        // channel assignment: 0 = mono; stereo picks per frame among
        // independent (1) / left-side (8) / right-side (9) / mid-side
        // (10) by the order-2 cost estimate -- libFLAC level 5's
        // adaptive stereo decorrelation.  Stereo FM audio is mono-
        // dominant, so the side channel is usually near-silent.
        int assign = 0;
        if (channels == 2) {
            chbuf[0].resize(n);
            chbuf[1].resize(n);
            for (int i = 0; i < n; i++) {
                chbuf[0][i] = x[2 * i];
                chbuf[1][i] = x[2 * i + 1];
            }
            std::vector<int32_t> mid(n), sidev(n);
            for (int i = 0; i < n; i++) {
                int32_t l0 = chbuf[0][i], r0 = chbuf[1][i];
                sidev[i] = l0 - r0;
                mid[i] = (l0 + r0) >> 1;
            }
            uint64_t el = est_channel_bits(chbuf[0].data(), n);
            uint64_t er = est_channel_bits(chbuf[1].data(), n);
            uint64_t em = est_channel_bits(mid.data(), n);
            uint64_t es = est_channel_bits(sidev.data(), n) + n;  // +1 bit
            uint64_t costs[4] = {el + er, el + es, es + er, em + es};
            int codes[4] = {1, 8, 9, 10};
            assign = 1;
            uint64_t bc = costs[0];
            for (int i = 1; i < 4; i++)
                if (costs[i] < bc) { bc = costs[i]; assign = codes[i]; }
            if (assign == 8) {           // left-side: ch0=left, ch1=side
                chbuf[1] = std::move(sidev);
            } else if (assign == 9) {    // right-side: ch0=side, ch1=right
                chbuf[0] = std::move(sidev);
            } else if (assign == 10) {   // mid-side
                chbuf[0] = std::move(mid);
                chbuf[1] = std::move(sidev);
            }
        }
        bw.put(assign, 4);
        bw.put(4, 3);                // sample size: 16 bps
        bw.put(0, 1);                // reserved
        put_coded_number(bw, frame_number);
        if (bs_code == 6) bw.put(n - 1, 8);
        else if (bs_code == 7) bw.put(n - 1, 16);
        if (sr_code == 13) bw.put(sample_rate, 16);
        else if (sr_code == 14) bw.put(sample_rate / 10, 16);
        uint8_t c8 = crc8(bw.buf.data(), bw.buf.size());
        bw.put(c8, 8);

        // ---- one subframe per channel ----
        if (channels == 1) {
            chbuf[0].assign(x, x + n);
            encode_subframe(chbuf[0].data(), n, 16, bw);
        } else {
            // chbuf holds the decorrelated pair; the SIDE channel (ch1
            // for left-side/mid-side, ch0 for right-side) is 17-bit
            for (int ch = 0; ch < 2; ch++) {
                int bps = 16 + ((assign == 9 && ch == 0)
                                || (assign >= 8 && assign != 9 && ch == 1));
                encode_subframe(chbuf[ch].data(), n, bps, bw);
            }
        }
        bw.align_zero();
        uint16_t c16 = crc16(bw.buf.data(), bw.buf.size());
        bw.put(c16 >> 8, 8);
        bw.put(c16 & 0xFF, 8);
        out.insert(out.end(), bw.buf.begin(), bw.buf.end());
        frame_number++;
    }

    // Encode into `o` (appending).  The input IS consumed here, so the
    // size-vs-cap decision must happen on a buffer the encoder keeps --
    // returning "too small" after dropping the bytes would corrupt the
    // client's FLAC stream.
    void process_vec(const int16_t *samples, int n,
                     std::vector<uint8_t> &o) {
        if (!header_sent) {
            write_streaminfo(o);
            header_sent = true;
        }
        pending.insert(pending.end(), samples, samples + n);
        size_t pos = 0;
        size_t need = (size_t)blocksize * channels;
        while (pending.size() - pos >= need) {
            encode_frame(pending.data() + pos, blocksize, o);
            pos += need;
        }
        pending.erase(pending.begin(), pending.begin() + pos);
    }

    // Copy stash to out, or return -(needed) with the stash KEPT so the
    // caller can retry with a bigger buffer (phantom_flac_take).
    int drain(uint8_t *out, int cap) {
        if ((int)stash.size() > cap) return -(int)stash.size();
        memcpy(out, stash.data(), stash.size());
        int n = (int)stash.size();
        stash.clear();
        return n;
    }

    int process(const int16_t *samples, int n, uint8_t *out, int cap) {
        stash.clear();
        process_vec(samples, n, stash);
        return drain(out, cap);
    }

    int finish(uint8_t *out, int cap) {
        stash.clear();
        if (!header_sent) {
            write_streaminfo(stash);
            header_sent = true;
        }
        if (!pending.empty()) {
            // drop a trailing partial interleave group, if any
            int n = (int)(pending.size() / channels);
            if (n > 0) encode_frame(pending.data(), n, stash);
            pending.clear();
        }
        return drain(out, cap);
    }
};

}  // namespace

extern "C" {

void *phantom_flac_create(int sample_rate, int blocksize, int channels) {
    if (channels < 1 || channels > 2) return nullptr;
    // blocksize: 16-bit STREAMINFO/frame-header field, and 0 would make
    // process_vec's need==0 an infinite loop; sample_rate: 20-bit
    // STREAMINFO field (the frame header falls back to code 0 =
    // get-from-STREAMINFO when no 16-bit code fits)
    if (blocksize < 1 || blocksize > 0xFFFF) return nullptr;
    if (sample_rate < 1 || sample_rate >= (1 << 20)) return nullptr;
    auto *e = new FlacEncoder();
    e->sample_rate = sample_rate;
    e->blocksize = blocksize;
    e->channels = channels;
    return e;
}

int phantom_flac_process(void *enc, const int16_t *samples, int n,
                         uint8_t *out, int cap) {
    return ((FlacEncoder *)enc)->process(samples, n, out, cap);
}

int phantom_flac_finish(void *enc, uint8_t *out, int cap) {
    return ((FlacEncoder *)enc)->finish(out, cap);
}

// Encode `nchunks` consecutive chunks of `chunk_len` interleaved
// samples in ONE call, recording the bytes emitted per chunk into
// sizes[].  Bit-identical to nchunks separate process() calls (same
// encoder state stream, split at the same points); exists because the
// serving edge makes one call per listener per step instead of one
// per hop (the reference posts a per-hop job per client,
// websocket.cpp:180-182 -- here the hop loop runs native).  Returns
// total bytes, or -(needed) when `out` is too small -- the encoded
// bytes are then retained and phantom_flac_take retrieves them (the
// input is already consumed, so dropping them would corrupt the
// stream).
int phantom_flac_process_chunks(void *enc, const int16_t *samples,
                                int nchunks, int chunk_len,
                                uint8_t *out, int cap, int *sizes) {
    auto *e = (FlacEncoder *)enc;
    e->stash.clear();
    for (int i = 0; i < nchunks; i++) {
        size_t before = e->stash.size();
        e->process_vec(samples + (size_t)i * chunk_len, chunk_len,
                       e->stash);
        sizes[i] = (int)(e->stash.size() - before);
    }
    return e->drain(out, cap);
}

// Retry pickup after a -(needed) return from process/process_chunks/
// finish, with a buffer of at least `needed` bytes.
int phantom_flac_take(void *enc, uint8_t *out, int cap) {
    return ((FlacEncoder *)enc)->drain(out, cap);
}

// Disable/enable the LPC path (fixed predictors only when 0) -- used
// by tools/flac_bench.py to measure the LPC compression gain A/B.
void phantom_flac_set_lpc(void *enc, int enabled) {
    ((FlacEncoder *)enc)->lpc_enabled = enabled != 0;
}

void phantom_flac_destroy(void *enc) { delete (FlacEncoder *)enc; }

}  // extern "C"
