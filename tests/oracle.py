"""NumPy oracle: an independent, straight-line re-implementation of the
reference DSP semantics (per SURVEY.md section 4's test strategy) used
as the golden model for the TPU kernels.

Every function here is written directly from the reference C++
(file:line cites inline), favouring obviousness over speed.  The TPU
implementations must match these within tight float tolerances.
"""

from __future__ import annotations

import numpy as np

LOG2_TO_DB = 0.3010299956639812 * 20.0
DB_PER_OCTAVE = 6.020599913279624


# ------------------------------------------------------------------ windows

def hann(n: int) -> np.ndarray:
    i = np.arange(n)
    return (0.5 * (1 - np.cos(2 * np.pi * i / n))).astype(np.float32)


# ------------------------------------------------------------ sample convert

def convert_samples(raw: np.ndarray, fmt: str) -> np.ndarray:
    """src/samplereader.cpp:29-66."""
    if fmt == "u8":
        return ((raw.view(np.uint8).astype(np.int32) - 128) / 128.0).astype(np.float32)
    if fmt == "s8":
        return (raw.view(np.int8).astype(np.int32) / 128.0).astype(np.float32)
    if fmt == "u16":
        return ((raw.view(np.uint16).astype(np.int32) - 32768) / 32768.0).astype(np.float32)
    if fmt == "s16":
        return (raw.view(np.int16).astype(np.int32) / 32768.0).astype(np.float32)
    if fmt == "u32":
        return ((raw.view(np.uint32).astype(np.int64) - 2**31) / 2**31).astype(np.float32)
    if fmt == "s32":
        return (raw.view(np.int32).astype(np.int64) / 2**31).astype(np.float32)
    if fmt == "f32":
        return raw.view(np.float32)
    if fmt == "f64":
        return raw.view(np.float64).astype(np.float32)
    raise ValueError(fmt)


# ------------------------------------------------------- spectrum + quantize

def forward_spectrum(frame: np.ndarray, is_real: bool) -> np.ndarray:
    """Windowless FFT + 1/N normalize (window applied by caller).

    FFTW forward unnormalized; reference divides by N in
    power_and_quantize (src/fft_impl.cpp:34-35) making the spectrum X/N.
    """
    n = frame.shape[-1]
    if is_real:
        return (np.fft.rfft(frame) / n).astype(np.complex64)
    return (np.fft.fft(frame) / n).astype(np.complex64)


def quantize_power(p: np.ndarray, power_offset: int) -> np.ndarray:
    """src/fft_impl.cpp:24-44 with exact log (see quantize.py docstring)."""
    with np.errstate(divide="ignore"):
        db = np.log2(p) * LOG2_TO_DB + 127.0 + power_offset * DB_PER_OCTAVE
    db = np.where(p > 0, db, -128.0)
    return np.clip(np.trunc(db), -128, 127).astype(np.int8)


def waterfall_pyramid(spec: np.ndarray, is_real: bool, size_log2: int,
                      levels: int) -> list[np.ndarray]:
    """Display-order power + pyramid (src/fft_impl.cpp:144-172).

    spec: normalized spectrum, natural FFT order ([N] c2c or [N/2+1] r2c).
    """
    n = spec.shape[-1] if not is_real else (spec.shape[-1] - 1) * 2
    r = n if not is_real else n // 2
    base_idx = 0 if is_real else n // 2 + 1
    p = (spec.real**2 + spec.imag**2)[..., :r]
    p = np.roll(p, -base_idx, axis=-1)
    out = [quantize_power(p, size_log2)]
    for i in range(levels - 1):
        p = p[..., 0::2] + p[..., 1::2]
        out.append(quantize_power(p, size_log2 - i - 1))
    return out


# --------------------------------------------------------------- demodulator

class OracleChannel:
    """Per-client demod state machine: direct port of
    AudioClient::send_audio (src/signal.cpp:102-298), envelope-AM
    (non-liquid) variant."""

    def __init__(self, audio_fft_size: int, is_real: bool,
                 fft_result_size: int):
        self.a = audio_fft_size
        self.is_real = is_real
        self.r_size = fft_result_size
        self.ssb_prev = np.zeros(audio_fft_size // 2, np.float32)
        self.cplx_prev = np.zeros(audio_fft_size // 2, np.complex64)
        self.fm_prev = np.complex64(0)

    def send_audio(self, buf: np.ndarray, frame_num: int, l: int, r: int,
                   mid: float, mode: str) -> tuple[np.ndarray, float]:
        """buf: the extended spectrum slice starting at
        (l + base_idx) % R, length >= audio_fft_size (like the pointer
        handed to send_audio in src/websocket.cpp:180-182).
        Returns (audio[A/2], avg_power)."""
        a = self.a
        half = a // 2
        audio_r = r - l
        m_rel = int(np.floor(mid)) - l
        m_idx = int(np.floor(mid))

        avg_power = float(np.sum(np.abs(buf[:audio_r]) ** 2))

        parity = (frame_num % 2 == 1) and (
            (m_idx % 2 == 0 and not self.is_real)
            or (m_idx % 2 == 1 and self.is_real)
        )

        if mode in ("USB", "LSB"):
            fin = np.zeros(a, np.complex64)
            if mode == "USB":
                copy_l = max(0, m_rel)
                copy_r = min(audio_r, m_rel + a)
                if copy_r >= copy_l:
                    fin[copy_l - m_rel : copy_r - m_rel] = buf[copy_l:copy_r]
            else:
                copy_l = max(0, m_rel - a + 1)
                copy_r = min(audio_r, m_rel + 1)
                if copy_r >= copy_l:
                    # reversed: source bin b -> index m_rel - b
                    src = buf[copy_l:copy_r][::-1]
                    fin[m_rel - copy_r + 1 : m_rel - copy_l + 1] = src
            # FFTW c2r of size a reads bins [0, a/2]; unnormalized
            wave = np.fft.irfft(fin[: half + 1], n=a) * a
            if mode == "LSB":
                wave = wave[::-1]
            if parity:
                wave = -wave
            out = wave[:half] + self.ssb_prev
            self.ssb_prev = wave[half:].astype(np.float32).copy()
            audio = out.astype(np.float32)
        else:  # AM / FM
            fin = np.zeros(a, np.complex64)
            pos_l = max(0, m_rel)
            pos_r = min(audio_r, m_rel + half)
            if pos_r >= pos_l:
                fin[pos_l - m_rel : pos_r - m_rel] = buf[pos_l:pos_r]
            neg_l = max(0, m_rel - half + 1)
            neg_r = min(audio_r, m_rel)
            if neg_r >= neg_l:
                fin[a - (m_rel - neg_l) : a - (m_rel - neg_r)] = buf[neg_l:neg_r]
            prev_sample = self.fm_prev
            wave = np.fft.ifft(fin) * a
            if parity:
                wave = -wave
            out = (wave[:half] + self.cplx_prev).astype(np.complex64)
            self.cplx_prev = wave[half:].astype(np.complex64).copy()
            self.fm_prev = out[-1]
            if mode == "AM":
                audio = np.sqrt(out.real**2 + out.imag**2).astype(np.float32)
            else:
                shifted = np.concatenate([[prev_sample], out[:-1]])
                audio = np.angle(out * np.conj(shifted)).astype(np.float32)
        audio = np.nan_to_num(audio, nan=0.0)
        return audio, avg_power


# ------------------------------------------------------------------- DC/AGC

class OracleDCBlocker:
    """src/utils.h:139-169: two cascaded moving averages."""

    def __init__(self, delay: int):
        self.d = delay
        self.buf1 = np.zeros(delay, np.float64)  # circular, front = newest
        self.buf2 = np.zeros(delay, np.float64)

    def process(self, x: np.ndarray) -> np.ndarray:
        out = np.empty_like(x)
        for i, s in enumerate(x):
            self.buf1 = np.roll(self.buf1, 1)
            self.buf1[0] = s
            ma1 = self.buf1.mean()
            self.buf2 = np.roll(self.buf2, 1)
            self.buf2[0] = ma1
            ma2 = self.buf2.mean()
            out[i] = self.buf1[self.d - 1] - ma2
        return out


class OracleAGC:
    """src/utils/audioprocessing.cpp:5-73."""

    def __init__(self, desired=0.2, attack_ms=50.0, release_ms=300.0,
                 lookahead_ms=200.0, sr=12000):
        self.w = int(lookahead_ms * sr / 1000.0)
        self.attack = 1 - np.exp(-1.0 / (attack_ms * 1e-3 * sr))
        self.release = 1 - np.exp(-1.0 / (release_ms * 1e-3 * sr))
        self.desired = desired
        self.gain = 0.0
        self.buf: list[float] = []

    def process(self, x: np.ndarray) -> np.ndarray:
        out = np.empty_like(x)
        for i, s in enumerate(x):
            self.buf.append(float(s))
            if len(self.buf) > self.w:
                self.buf.pop(0)
            if len(self.buf) == self.w:
                cur = self.buf[0]
                peak = max(abs(v) for v in self.buf)
                desired_gain = self.desired / (peak + 1e-10)
                if desired_gain < self.gain:
                    self.gain = self.gain - self.attack * (self.gain - desired_gain)
                else:
                    self.gain = self.gain + self.release * (desired_gain - self.gain)
                out[i] = cur * self.gain
            else:
                out[i] = 0.0
        return out


def float_to_int16(x: np.ndarray, mult: float = 65536 / 4) -> np.ndarray:
    """src/utils/dsp.cpp:152-165."""
    v = (x * mult + 32768.5).astype(np.float64)
    v = np.floor(v) - 32768
    return np.clip(v, -32768, 32767).astype(np.int16)


def extend_spectrum(spec: np.ndarray, is_real: bool, fft_result_size: int,
                    audio_max_fft_size: int) -> np.ndarray:
    """The DC-wrap tail memcpy (src/fft.cpp:91-98)."""
    r, a = fft_result_size, audio_max_fft_size
    s = spec[:r]
    tail = np.zeros(a, s.dtype) if is_real else s[:a]
    return np.concatenate([s, tail])
