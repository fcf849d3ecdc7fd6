// Native streaming FLAC encoder for the audio serving edge.
//
// The reference links libFLAC++ and encodes each listener's int16 mono
// stream at compression level 5 (reference: src/signal.cpp:17-28,
// src/audio.cpp:38-52).  This image has no libFLAC, so this is a
// from-scratch encoder emitting spec-conformant FLAC: fixed predictors
// (orders 0-4) with Rice-coded residuals, 16-bit mono or independent
// 2-channel stereo (the device-side WBFM stereo path), streamable
// subset (sample rate coded in each frame header), fixed blocksize.
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
//   void    phantom_flac_destroy(void*)
//
// Build: make -C csrc   (produces libphantomhost.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

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

uint8_t crc8(const uint8_t *d, size_t n) {
    uint8_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= d[i];
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
    }
    return crc;
}

uint16_t crc16(const uint8_t *d, size_t n) {
    uint16_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= (uint16_t)d[i] << 8;
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
    }
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
    std::vector<int16_t> chbuf;     // deinterleave scratch
    std::vector<int64_t> residual;  // scratch
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

    // best fixed predictor order by minimal sum of |residual|
    int best_order(const int16_t *x, int n) {
        // running difference chains in int64
        uint64_t best_sum = ~0ull;
        int best = 0;
        std::vector<int64_t> d(x, x + n), nd(n);
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
            // early exit: higher orders rarely win after a big jump up
        }
        return best;
    }

    void compute_residual(const int16_t *x, int n, int order) {
        residual.assign(x, x + n);
        for (int o = 0; o < order; o++)
            for (int i = n - 1; i >= o + 1; i--)
                residual[i] -= residual[i - 1];
    }

    static int best_rice_param(const int64_t *r, int n) {
        if (n == 0) return 0;
        uint64_t usum = 0;
        for (int i = 0; i < n; i++) {
            int64_t v = r[i];
            usum += (uint64_t)((v << 1) ^ (v >> 63));
        }
        // bits(k) = n*(k+1) + sum(u >> k); minimize over k
        int best_k = 0;
        uint64_t best_bits = ~0ull;
        for (int k = 0; k < 30; k++) {
            uint64_t bits = (uint64_t)n * (uint64_t)(k + 1) + (usum >> k);
            if (bits < best_bits) {
                best_bits = bits;
                best_k = k;
            }
            if ((usum >> k) == 0) break;
        }
        return std::min(best_k, 14);  // 4-bit rice parameter, 15 = escape
    }

    // fixed-order subframe with a single rice partition
    void encode_subframe(const int16_t *x, int n, BitWriter &bw) {
        int order = best_order(x, n);
        bw.put(0, 1);                          // zero pad
        bw.put(0x08 | order, 6);               // fixed subframe, order
        bw.put(0, 1);                          // no wasted bits
        for (int i = 0; i < order; i++)
            bw.put((uint16_t)x[i], 16);        // warmup (signed 16)
        compute_residual(x, n, order);
        const int64_t *res = residual.data() + order;
        int nres = n - order;
        int k = best_rice_param(res, nres);
        bw.put(0, 2);                          // residual method: rice 4-bit
        bw.put(0, 4);                          // partition order 0
        bw.put(k, 4);
        for (int i = 0; i < nres; i++) {
            int64_t v = res[i];
            uint64_t u = (uint64_t)((v << 1) ^ (v >> 63));
            bw.put_unary((uint32_t)(u >> k));
            if (k) bw.put((uint32_t)(u & ((1u << k) - 1)), k);
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
        // channel assignment: 0 = mono, 1 = independent L/R stereo
        bw.put(channels - 1, 4);
        bw.put(4, 3);                // sample size: 16 bps
        bw.put(0, 1);                // reserved
        put_coded_number(bw, frame_number);
        if (bs_code == 6) bw.put(n - 1, 8);
        else if (bs_code == 7) bw.put(n - 1, 16);
        if (sr_code == 13) bw.put(sample_rate, 16);
        else if (sr_code == 14) bw.put(sample_rate / 10, 16);
        uint8_t c8 = crc8(bw.buf.data(), bw.buf.size());
        bw.put(c8, 8);

        // ---- one subframe per channel (x is interleaved) ----
        for (int ch = 0; ch < channels; ch++) {
            const int16_t *s = x;
            if (channels > 1) {
                chbuf.resize(n);
                for (int i = 0; i < n; i++) chbuf[i] = x[i * channels + ch];
                s = chbuf.data();
            }
            encode_subframe(s, n, bw);
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

void phantom_flac_destroy(void *enc) { delete (FlacEncoder *)enc; }

}  // extern "C"
