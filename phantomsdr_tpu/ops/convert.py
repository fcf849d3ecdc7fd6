"""On-device sample-format conversion.

The reference converts raw SDR samples to float on the host CPU
(reference: src/samplereader.cpp:29-66): unsigned integer types are
XOR'd with their sign bit (an unsigned->signed recentre) and every
integer type is scaled by ``signed_max + 1`` into [-1, 1).

TPU-native departure: we ship the *raw* integer bytes to the device and
convert there -- at 35 MSPS IQ that is 70 MB/s of u8 over PCIe instead
of 280 MB/s of f32, and the conversion itself is a trivially fused VPU
op. The converted values are bit-identical to the reference's
(``(x ^ 0x80 as s8) / 128 == (int(x) - 128) / 128`` etc.).

Supported formats (reference src/spectrumserver.cpp:349-363 plus the
explicit template instantiations in src/samplereader.cpp:72-81):
u8, s8, u16, s16, u32, s32, f32, f64.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# format name -> (numpy dtype of raw wire data, scale divisor or None for float)
SAMPLE_FORMATS: dict[str, tuple[np.dtype, float | None]] = {
    "u8": (np.dtype(np.uint8), 128.0),
    "s8": (np.dtype(np.int8), 128.0),
    "u16": (np.dtype(np.uint16), 32768.0),
    "s16": (np.dtype(np.int16), 32768.0),
    "u32": (np.dtype(np.uint32), 2147483648.0),
    "s32": (np.dtype(np.int32), 2147483648.0),
    "f32": (np.dtype(np.float32), None),
    "f64": (np.dtype(np.float64), None),
}


def wire_dtype(fmt: str) -> np.dtype:
    """Numpy dtype of the raw sample stream for a given format string."""
    return SAMPLE_FORMATS[fmt][0]


def bytes_per_sample(fmt: str) -> int:
    return SAMPLE_FORMATS[fmt][0].itemsize


def device_dtype(fmt: str) -> np.dtype:
    """Dtype we ship to the device.

    Unsigned ints are shipped as their bit-identical signed reinterpretation
    after the sign-bit XOR is folded into an on-device subtract, so we can
    ship the raw unsigned array directly (JAX supports uint dtypes).
    f64 is converted to f32 host-side (TPU has no f64 path worth using).
    """
    d = SAMPLE_FORMATS[fmt][0]
    if d == np.float64:
        return np.dtype(np.float32)
    return d


def host_preconvert(raw: np.ndarray, fmt: str) -> np.ndarray:
    """Host-side step: reinterpret raw bytes as the wire dtype.

    Only f64 needs an actual host conversion (downcast to f32); everything
    else is a zero-copy view.
    """
    d = SAMPLE_FORMATS[fmt][0]
    arr = raw.view(d) if raw.dtype != d else raw
    if d == np.float64:
        return arr.astype(np.float32)
    return arr


def to_float(x: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """Device-side conversion to normalized float32 in [-1, 1).

    Matches reference src/samplereader.cpp:29-40: unsigned types are
    recentred by subtracting 2^(bits-1); all integer types divide by
    2^(bits-1); floats pass through (scale 1.0).
    """
    d, scale = SAMPLE_FORMATS[fmt]
    if scale is None:
        return x.astype(jnp.float32)
    if d.kind == "u":
        if d.itemsize >= 4:
            # u32: recentre in the INTEGER domain (XOR sign bit, bitcast
            # to signed) exactly like the reference, then cast.  Casting
            # to f32 first would round 32-bit values to the 24-bit
            # mantissa BEFORE the subtract: 0x80000001 would become 0.0
            # instead of 2^-31.
            signbit = jnp.array(1 << (8 * d.itemsize - 1), x.dtype)
            x = jax.lax.bitcast_convert_type(
                jnp.bitwise_xor(x, signbit),
                jnp.dtype(f"int{8 * d.itemsize}"))
            return x.astype(jnp.float32) * (1.0 / scale)
        # u8/u16 fit the f32 mantissa exactly; subtract after cast
        return (x.astype(jnp.float32) - scale) * (1.0 / scale)
    return x.astype(jnp.float32) * (1.0 / scale)


# 0/1 selection matrix for the MXU de-interleave below: even input
# positions land in columns 0..127 (I), odd in 128..255 (Q)
_DEINT_SEL = np.zeros((256, 256), np.float32)
for _i in range(128):
    _DEINT_SEL[2 * _i, _i] = 1.0
    _DEINT_SEL[2 * _i + 1, 128 + _i] = 1.0


def iq_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved IQ float stream -> complex64.  x has even length.

    The naive ``x.reshape(-1, 2)`` costs TPU dearly: XLA materializes
    the [N, 2] f32 with the minor dim tile-padded 2 -> 128 lanes (64x
    HBM blowup -- 19.6 GB at hop_batch 72, an OOM; ~10 GB of padding
    traffic at 36).  Instead, rows of 256 interleaved scalars are
    de-interleaved by one 0/1-matrix matmul on the MXU (same trick as
    the waterfall pyramid pair-sums, ops/quantize.py): each output is
    exactly one input element (precision HIGHEST), measured bit-exact
    and 3.25x faster (13.4 -> 4.1 ms at [37 hops, 2^19] on v5e)."""
    if x.shape[0] % 256 == 0:
        m = x.reshape(-1, 256)
        y = jax.lax.dot_general(
            m, jnp.asarray(_DEINT_SEL), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return jax.lax.complex(y[:, :128].reshape(-1),
                               y[:, 128:].reshape(-1))
    x2 = x.reshape(-1, 2)
    return jax.lax.complex(x2[:, 0], x2[:, 1])
