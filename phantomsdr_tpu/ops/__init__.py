from . import windows, convert, quantize, fft, channelizer, agc  # noqa: F401
