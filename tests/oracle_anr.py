"""Straight-line NumPy oracle of the reference wdsp ANR (LMS) filter.

1:1 port of jsdsp/lib/ANR.c (wdsp_anr_create / wdsp_anr_filter),
ring buffer and all -- including the transcribed leak-index quirk
(ANR.c:100-105) that pins lidx at its 120.0 floor.  Single channel.
"""

import numpy as np

DLINE_SIZE = 512
MASK = DLINE_SIZE - 1


class ANROracle:
    def __init__(self, nr_type: int, taps: int, dly: int, gain: float,
                 leakage: float):
        self.nr_type = nr_type        # 0 = notch, 1 = NR
        self.taps = taps
        self.delay = dly
        self.two_mu = gain
        self.gamma = leakage
        self.in_idx = 0
        self.d = np.zeros(DLINE_SIZE)
        self.w = np.zeros(DLINE_SIZE)
        self.lidx = 120.0
        self.lidx_min = 120.0
        self.lidx_max = 200.0
        self.ngamma = 0.001
        self.den_mult = 6.25e-10
        self.lincr = 1.0
        self.ldecr = 3.0

    def process(self, x: np.ndarray) -> np.ndarray:
        out = np.empty_like(x, dtype=float)
        for i in range(x.size):
            self.d[self.in_idx] = x[i]
            y = 0.0
            sigma = 0.0
            for j in range(self.taps):
                idx = (self.in_idx + j + self.delay) & MASK
                y += self.w[j] * self.d[idx]
                sigma += self.d[idx] * self.d[idx]
            inv_sigp = 1.0 / (sigma + 1e-10)
            error = self.d[self.in_idx] - y
            out[i] = error if self.nr_type == 0 else y * 4.0

            nel = abs(error * (1.0 - self.two_mu * sigma * inv_sigp))
            nev = abs(self.d[self.in_idx]
                      - (1.0 - self.two_mu * self.ngamma) * y
                      - self.two_mu * error * sigma * inv_sigp)
            if nev < nel:
                # verbatim ANR.c:100-105 (the else-if nesting quirk)
                self.lidx += self.lincr
                if self.lidx > self.lidx_max:
                    self.lidx = self.lidx_max
                else:
                    self.lidx -= self.ldecr
                    if self.lidx < self.lidx_min:
                        self.lidx = self.lidx_min
            self.ngamma = (self.gamma * (self.lidx ** 2)
                           * (self.lidx ** 2) * self.den_mult)
            c0 = 1.0 - self.two_mu * self.ngamma
            c1 = self.two_mu * error * inv_sigp
            for j in range(self.taps):
                idx = (self.in_idx + j + self.delay) & MASK
                self.w[j] = c0 * self.w[j] + c1 * self.d[idx]
            self.in_idx = (self.in_idx + MASK) & MASK
        return out
