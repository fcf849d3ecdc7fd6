"""phantomsdr_tpu: a TPU-native wideband spectrum server DSP core.

A from-scratch JAX/XLA/Pallas re-design of the PhantomSDR spectrum
distributor's capabilities: streaming real/IQ samples through a large
50%-overlap sliding FFT, per-listener frequency-domain channelization
and demodulation (USB/LSB/AM/FM), int8-dB waterfall pyramid, and a
websocket serving edge wire-compatible with the reference frontend.
"""

from .config import ServerConfig, load_config, config_from_dict  # noqa: F401
from .pipeline import HopPipeline, HopState, HopOutputs  # noqa: F401
from .ops.channelizer import (  # noqa: F401
    ChannelTable, MODE_USB, MODE_LSB, MODE_AM, MODE_FM,
)

__version__ = "0.1.0"
