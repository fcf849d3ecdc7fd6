"""Straight-line NumPy oracle of the reference Wild noise blanker.

1:1 port of jsdsp/lib/NB.c (wild_nb_init / wild_nb_blank) in its
WORKING_BUFFER configuration, including:

- per-frame LPC via the transcribed Levinson-Durbin (R[0] inflation,
  NB.c:122),
- arm_fir semantics: the FIR state is RE-INITIALIZED each frame
  (NB.c:156,167), so both filters start from zero history every call,
- arm_var_f32 = unbiased variance (divide by n-1),
- lpc_power = sum of squares of lpcs[0..order-1] -- EXCLUDING
  lpcs[order] (NB.c:177 passes `order`, not order+1),
- the impulse search's skip-ahead (search_pos += PL on detection,
  NB.c:198) and 20-impulse cap,
- sequential in-place repairs (a later impulse's prediction basis can
  include an earlier impulse's repaired samples).

Single channel.  Frame length is the caller's chunk (the browser
passes its audio-buffer length, NoiseProcessing.js:40).
"""

import numpy as np

N_IMPULSE_COUNT = 20


class WildNBOracle:
    def __init__(self, thresh: float, taps: int, samples: int):
        self.thresh = thresh
        self.taps = taps                      # lpc order
        self.impulse_samples = samples
        il = samples | 1
        self.PL = (il - 1) // 2
        self.wb = None                        # working buffer

    def process(self, samps: np.ndarray) -> np.ndarray:
        nsamps = samps.size
        order = self.taps
        il = self.impulse_samples | 1
        PL = self.PL
        if self.wb is None:
            self.wb = np.zeros(2 * PL + 2 * order + nsamps)
        wb = self.wb
        wb[2 * PL + 2 * order:] = samps

        # linear crossfade windows (NB.c:103-106)
        wbw = np.arange(il) / (il - 1)
        wfw = wbw[::-1].copy()

        # autocorrelation over the frame (from offset order+PL)
        base = wb[order + PL:]
        r = np.array([np.dot(base[:nsamps - i], base[i:nsamps])
                      for i in range(order + 1)])
        r[0] *= 1.0 + 1.0e-9
        lpcs = np.zeros(order + 1)
        lpcs[0] = 1.0
        alfa = r[0]
        for m in range(1, order + 1):
            s = sum(lpcs[u] * r[m - u] for u in range(1, m))
            k = -(r[m] + s) / alfa
            any_ = [lpcs[v] + k * lpcs[m - v] for v in range(1, m)]
            lpcs[1:m] = any_
            lpcs[m] = k
            alfa *= 1.0 - k * k
        rev = lpcs[::-1].copy()

        # inverse filter then matched filter; arm_fir with FRESH zero
        # state each call == causal conv over zero-left-padded input
        def fir(coeffs, x):
            xp = np.concatenate([np.zeros(coeffs.size - 1), x])
            # arm_fir: y[n] = sum_k c[k] * x[n-k] with coeffs applied
            # reversed relative to numpy convolve "full"; use direct def
            return np.convolve(xp, coeffs[::-1], mode="valid")

        tempsamp = fir(rev, wb[order + PL: order + PL + nsamps])
        tempsamp = fir(lpcs, tempsamp)

        sigma2 = np.var(tempsamp, ddof=1)
        lpc_power = np.sum(lpcs[:order] ** 2)   # excludes lpcs[order]
        thr = self.thresh * np.sqrt(sigma2 * lpc_power)

        positions = []
        search_pos = order + PL
        while search_pos < nsamps and len(positions) < N_IMPULSE_COUNT:
            if abs(tempsamp[search_pos]) > thr:
                positions.append(search_pos - order)
                search_pos += PL
            search_pos += 1

        # prediction transfer functions: negated coefficients
        lpcs[1:order + 1] *= -1.0
        rev[:order] *= -1.0

        for pos in positions:
            rfw = np.zeros(il + order)
            rbw = np.zeros(il + order)
            for k in range(order):
                rfw[k] = wb[pos + k]
                rbw[il + k] = wb[order + PL + pos + PL + k + 1]
            for i in range(il):
                rfw[i + order] = np.dot(rev[:order], rfw[i: i + order])
                rbw[il - i - 1] = np.dot(lpcs[1: 1 + order],
                                         rbw[il - i: il - i + order])
            patch = wfw * rfw[order: order + il] + wbw * rbw[:il]
            wb[order + pos: order + pos + il] = patch

        out = wb[order + PL: order + PL + nsamps].copy()
        wb[: 2 * order + 2 * PL] = wb[nsamps: nsamps + 2 * order + 2 * PL]
        return out
