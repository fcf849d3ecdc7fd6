"""Straight-line NumPy oracle of the reference spectral noise reducer.

Port of jsdsp/lib/NR_spectral.c (nr_spectral_init / nr_spectral_process)
with the frame size generalized from the hard-coded 256 to F (the TPU
build uses F = audio_fft_size/2; see ops/nr.py docstring).  Like
tests/oracle.py this is deliberately a 1:1 translation of the C --
including the 2F-1-b conjugate-index quirk (NR_spectral.c:328), the
unused edge averages of the gain smoothing (:289-314), and the
ifft-with-1/N convention of arm_cfft_f32(ifftFlag=1).  Single channel.
"""

import numpy as np

PSTHR = 0.99
PNSAF = 0.01
PSINI = 0.5
PSPRI = 0.5


class SpectralNROracle:
    def __init__(self, half: int, final_gain=1.0, alpha=0.95,
                 asnr_db=30.0):
        f = half
        self.F = f
        self.final_gain = final_gain
        self.alpha = alpha
        self.xih1 = 10.0 ** (asnr_db / 10.0)
        self.xih1r = 1.0 / (1.0 + self.xih1) - 1.0
        self.pfac = (1.0 / PSPRI - 1.0) * (1.0 + self.xih1)
        # tinc-derived smoothing factors collapse exactly (c:84-88)
        self.ax = 0.8
        self.ap = 0.9
        self.sqrt_hann = np.sin(np.pi * np.arange(f) / (f - 1))

        self.first_time = 1
        self.init_counter = 0
        self.last_sample_buffer = np.zeros(f)
        self.last_ifft_result = np.zeros(f)
        self.nest = np.zeros(f)
        self.xt = np.zeros(f)
        self.pslp = np.zeros(f)
        self.hk_old = np.zeros(f)
        self.g = np.zeros(f)

    def process_frame(self, cur: np.ndarray) -> np.ndarray:
        """One F-sample half-frame in, F samples out (50 % OLA)."""
        F = self.F
        snr_prio_min = 10.0 ** (-30 / 10.0)
        NR_width = 4

        if self.first_time == 1:  # c:121-130
            self.last_sample_buffer[:] = 0.0
            self.g[:] = 1.0
            self.hk_old[:] = 1.0
            self.nest[:] = 0.0
            self.pslp[:] = 0.5
            self.first_time = 2

        buf = np.zeros(2 * F, np.complex128)
        buf[:F] = self.last_sample_buffer
        buf[F:] = cur
        self.last_sample_buffer = cur.copy()
        win = np.repeat(self.sqrt_hann, 2)        # c:155 sqrtHann[i/2]
        buf *= win

        z = np.fft.fft(buf)                       # arm_cfft forward
        x_pow = np.abs(z[:F]) ** 2

        # NB: sequential ifs like the C -- on the 20th frame the ft==2
        # block promotes to 3 and the ft==3 block runs the SAME frame
        if self.first_time == 2:                  # c:168-181
            self.nest += 0.05 * x_pow
            self.xt = PSINI * self.nest
            self.init_counter += 1
            if self.init_counter > 19:
                self.first_time = 3

        if self.first_time == 3:                  # c:183-316
            ph1y = 1.0 / (1.0 + self.pfac
                          * np.exp(self.xih1r * x_pow / self.xt))
            self.pslp = self.ap * self.pslp + (1 - self.ap) * ph1y
            ph1y = np.where(self.pslp > PSTHR, 1.0 - PNSAF,
                            np.minimum(ph1y, 1.0))
            xtr = (1 - ph1y) * x_pow + ph1y * self.xt
            self.xt = self.ax * self.xt + (1 - self.ax) * xtr

            snr_post = np.maximum(np.minimum(x_pow / self.xt, 1000.0),
                                  snr_prio_min)
            snr_prio = np.maximum(
                self.alpha * self.hk_old
                + (1 - self.alpha) * np.maximum(snr_post - 1.0, 0.0), 0.0)

            vad_lo, vad_hi = 1, F
            for b in range(vad_lo, vad_hi):
                v = snr_prio[b] * snr_post[b] / (1.0 + snr_prio[b])
                self.g[b] = max(1.0 / snr_post[b]
                                * np.sqrt(0.7212 * v + v * v), 0.001)
                self.hk_old[b] = snr_post[b] * self.g[b] ** 2

            pre = x_pow[vad_lo:vad_hi].sum()
            post = (self.g[vad_lo:vad_hi] ** 2
                    * x_pow[vad_lo:vad_hi]).sum()
            pr = post / pre
            if pr > 0.4:
                nn = 1
            else:
                nn = 1 + 2 * int(0.5 + NR_width * (1.0 - pr / 0.4))
            scratch = self.nest  # c reuses NR_Nest as scratch (:280)
            for b in range(vad_lo + nn // 2, vad_hi - nn // 2):
                scratch[b] = self.g[b - nn // 2: b + nn // 2 + 1].mean()
            # c:289-314: edge averages computed into scratch, never
            # copied back to G -- reproduced by simply not copying them
            self.g[vad_lo + nn // 2: vad_hi - nn // 2] = (
                scratch[vad_lo + nn // 2: vad_hi - nn // 2])

        # spectral weighting, conjugate index 2F-1-b quirk (c:323-332)
        for b in range(1, F):
            z[b] *= self.g[b]
            z[2 * F - b - 1] *= self.g[b]

        y = np.fft.ifft(z)                        # arm_cfft inverse, 1/N
        y = y.real * win
        out = np.round((y[:F] + self.last_ifft_result) * self.final_gain)
        self.last_ifft_result = y[F:].copy()
        return out

    def process(self, x: np.ndarray) -> np.ndarray:
        F = self.F
        assert x.size % F == 0
        return np.concatenate([
            self.process_frame(x[i: i + F]) for i in range(0, x.size, F)
        ])
