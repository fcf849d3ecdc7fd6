"""Analysis window builders.

Semantics match the reference window builders (reference:
src/utils/dsp.cpp:6-24) exactly:

- Hann: ``w[i] = 0.5 * (1 - cos(2*pi*i / N))`` -- note the denominator is
  ``N`` (periodic Hann), not ``N - 1``.
- Blackman-Harris: 4-term with ``N - 1`` denominators.


Windows are returned as host numpy arrays: inside jit they lower to
embedded constants without a device round-trip (a device-resident
closure constant forces a device->host fetch during MLIR lowering,
which is pathological on remote-tunneled backends).
"""

from __future__ import annotations

import numpy as np


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window of length ``n`` (reference src/utils/dsp.cpp:6-11)."""
    i = np.arange(n, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))
    return w.astype(dtype)


def blackman_harris_window(n: int, dtype=np.float32) -> np.ndarray:
    """4-term Blackman-Harris window (reference src/utils/dsp.cpp:13-24)."""
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    i = np.arange(n, dtype=np.float64)
    t = 2.0 * np.pi * i / (n - 1)
    w = a0 - a1 * np.cos(t) + a2 * np.cos(2 * t) - a3 * np.cos(3 * t)
    return w.astype(dtype)
