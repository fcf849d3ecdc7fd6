"""Empirical validation of the html/zstd.js decoder design (via its
Python mirror, tests/zstd_mirror.py) against the REAL libzstd
compressor, across the format features a stock waterfall stream can
contain: raw/RLE/compressed blocks, 1- and 4-stream Huffman literals,
direct and FSE-compressed weights, treeless (repeat-table) literals,
predefined/RLE/compressed/repeat sequence tables, repeat offsets,
cross-block match windows, checksums, multi-frame and skippable
frames, and arbitrary wire chunking."""

import zstandard
import numpy as np
import pytest

from tests.zstd_mirror import ZstdStream, ZstdError
from phantomsdr_tpu.runtime.codecs import ZstdStream as ServerZstd

R = np.random.default_rng(42)


def roundtrip_stream(messages, level=3, dribble=None):
    """Compress per-message with flush (the server's exact mode), feed
    the wire bytes to the mirror decoder, compare per-message."""
    c = zstandard.ZstdCompressor(level=level).compressobj()
    d = ZstdStream()
    for msg in messages:
        wire = c.compress(msg) + c.flush(zstandard.COMPRESSOBJ_FLUSH_BLOCK)
        if dribble:
            got = b"".join(d.push(wire[i:i + dribble])
                           for i in range(0, len(wire), dribble))
        else:
            got = d.push(wire)
        assert got == msg


def _shapes():
    text = b"The quick brown fox jumps over the lazy dog. " * 150
    return {
        "text": text,
        "random": R.integers(0, 256, 9000, dtype=np.uint8).tobytes(),
        "zeros": b"\x00" * 4096,
        "rle_byte": b"\x7f" * 3000,
        "periodic": bytes(range(251)) * 40,
        "waterfall_db": np.clip(R.normal(-70, 6, 4096), -128,
                                127).astype(np.int8).tobytes(),
        "tiny": b"x",
        "empty_then_data": b"",
        "big": (text + R.integers(0, 256, 500,
                                  dtype=np.uint8).tobytes()) * 60,
    }


@pytest.mark.parametrize("level", [1, 3, 6, 12, 19])
@pytest.mark.parametrize("shape", sorted(_shapes()))
def test_single_message(level, shape):
    data = _shapes()[shape]
    c = zstandard.ZstdCompressor(level=level).compressobj()
    wire = c.compress(data) + c.flush(zstandard.COMPRESSOBJ_FLUSH_BLOCK)
    assert ZstdStream().push(wire) == data


@pytest.mark.parametrize("level", [1, 3, 19])
def test_streaming_waterfall_like(level):
    """The real use: a long-lived stream of similar ~4 kB rows.  Later
    rows compress with treeless literals + repeat tables + cross-
    message match offsets -- the decoder must carry table and window
    state across push() calls exactly."""
    base = np.clip(R.normal(-70, 6, 4096), -128, 127).astype(np.int8)
    messages = []
    for k in range(40):
        row = base + R.integers(-2, 3, 4096).astype(np.int8)
        row[100 + 7 * k] = 40  # a moving carrier
        messages.append(row.tobytes())
    roundtrip_stream(messages, level=level)


class _LiteralsSpy(ZstdStream):
    """Counts (ltype, size_format) of every literals section decoded --
    lets a test PROVE a given literals shape was actually exercised."""

    def __init__(self):
        super().__init__()
        self.literal_kinds = []

    def _literals(self, d, p, end):
        b0 = d[p]
        self.literal_kinds.append((b0 & 3, (b0 >> 2) & 3))
        return super()._literals(d, p, end)


@pytest.mark.parametrize("level", [1, 3, 6, 9, 19])
def test_treeless_single_stream_literals(level):
    """Regression (round-5 advisor finding): RFC 8878 3.1.1.3.1.2 says
    Size_Format 00 means ONE Huffman stream for BOTH Compressed and
    Treeless literals.  libzstd emits treeless single-stream whenever it
    reuses a tree on a <256 B literal section -- exactly the long-lived
    waterfall shape (mostly-match rows + a little fresh compressible
    content).  The old `ltype==2 and sf==0` condition decoded these as
    4 streams and died with 'corrupt 4-stream literals' mid-stream."""
    rng = np.random.default_rng(7)
    row = rng.integers(0, 40, 2048, dtype=np.uint8).tobytes()
    c = zstandard.ZstdCompressor(level=level).compressobj()
    d = _LiteralsSpy()
    assert d.push(c.compress(row)
                  + c.flush(zstandard.COMPRESSOBJ_FLUSH_BLOCK)) == row
    hit = False
    for k in range(12):  # mostly-match follow-ups with ~80 fresh bytes
        nxt = bytearray(row)
        pos = int(rng.integers(0, 2048 - 80))
        nxt[pos:pos + 80] = rng.integers(0, 40, 80, dtype=np.uint8).tobytes()
        row = bytes(nxt)
        wire = c.compress(row) + c.flush(zstandard.COMPRESSOBJ_FLUSH_BLOCK)
        assert d.push(wire) == row  # old code: ZstdError here
        hit = hit or (3, 0) in d.literal_kinds
    assert hit, "probe never produced treeless Size_Format-00 literals"


def test_dribble_chunking():
    """Wire bytes arriving 7 at a time must decode identically --
    frame header, block headers and block bodies all straddle pushes."""
    msgs = [_shapes()["text"], _shapes()["waterfall_db"],
            _shapes()["periodic"]]
    roundtrip_stream(msgs, level=3, dribble=7)


def test_server_zstdstream_compatible():
    """Decode the server's OWN compressor class output (codecs.py
    ZstdStream) -- the exact wire the frontend sees."""
    enc = ServerZstd()
    dec = ZstdStream()
    rows = [np.clip(R.normal(-65, 7, 2048), -128, 127)
            .astype(np.int8).tobytes() for _ in range(25)]
    for row in rows:
        assert dec.push(enc.compress(row)) == row


def test_oneshot_frames_with_content_size():
    for level in (1, 3, 22):
        data = _shapes()["big"]
        wire = zstandard.compress(data, level)
        assert ZstdStream().push(wire) == data


def test_checksummed_frame():
    c = zstandard.ZstdCompressor(level=3, write_checksum=True)
    data = _shapes()["text"]
    wire = c.compress(data)
    d = ZstdStream()
    assert d.push(wire) == data
    assert d.buf == b"" and not d.need_checksum
    # and again with the checksum bytes dribbled across pushes
    d = ZstdStream()
    got = b"".join(d.push(wire[i:i + 5]) for i in range(0, len(wire), 5))
    assert got == data and d.buf == b"" and not d.need_checksum


def test_multiple_frames_back_to_back():
    a, b = _shapes()["text"], _shapes()["random"]
    wire = zstandard.compress(a, 3) + zstandard.compress(b, 5)
    assert ZstdStream().push(wire) == a + b


def test_skippable_frame():
    payload = b"\x50\x2a\x4d\x18" + (8).to_bytes(4, "little") + b"metadata"
    wire = payload + zstandard.compress(b"after skip", 3)
    assert ZstdStream().push(wire) == b"after skip"


def test_bad_magic_raises():
    with pytest.raises(ZstdError):
        ZstdStream().push(b"\x00\x01\x02\x03" + b"\x00" * 16)


def test_truncation_is_silent_until_completion():
    """A partial message yields no output and no error; completing it
    yields the data (the websocket never truncates, but the state
    machine must be re-entrant at every byte)."""
    data = _shapes()["periodic"]
    wire = zstandard.compress(data, 3)
    d = ZstdStream()
    assert d.push(wire[:len(wire) // 2]) == b""
    assert d.push(wire[len(wire) // 2:]) == data


def test_huge_highly_compressible():
    """> 128 kB of regenerated data forces multiple blocks per frame
    and long matches (match lengths through the ML extra-bits tail)."""
    data = (b"abcdefgh" * 70000)  # 560 kB
    wire = zstandard.compress(data, 3)
    assert ZstdStream().push(wire) == data


def test_incompressible_multiblock():
    """> 128 kB of random data forces RAW blocks mid-frame."""
    data = R.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    wire = zstandard.compress(data, 1)
    assert ZstdStream().push(wire) == data


def test_window_history_trim():
    """Matches reaching back through a long-lived stream must survive
    the decoder's history trimming (hist capped at 2x window, cut back
    to window).  A 1 kB window (ZstdCompressionParameters) forces the
    trim path ~70x over 140 kB of rotated-repeat messages -- the
    default 2 MB window never trims in the other tests."""
    params = zstandard.ZstdCompressionParameters(window_log=10,
                                                 compression_level=3)
    c = zstandard.ZstdCompressor(compression_params=params).compressobj()
    d = ZstdStream()
    base = bytes(R.integers(0, 64, 700, dtype=np.uint8))
    for i in range(200):
        msg = base[i % 17:] + base[:i % 17]
        wire = c.compress(msg) + c.flush(zstandard.COMPRESSOBJ_FLUSH_BLOCK)
        assert d.push(wire) == msg, f"message {i} diverged"
    assert d.window_size == 1024
    assert len(d.hist) <= 2 * d.window_size  # the cap actually binds


def test_fuzz_corruption_is_contained():
    """Single-byte corruptions of valid wire bytes must either decode
    (the byte was don't-care / produced consistent-but-wrong output)
    or raise ZstdError -- never an uncontrolled exception, and never
    unbounded output (128 kB/block cap)."""
    rng = np.random.default_rng(9)
    data = b"the quick brown fox " * 300
    wire = bytearray(zstandard.compress(data, 3))
    for _ in range(600):
        w = bytearray(wire)
        i = int(rng.integers(4, len(w)))  # keep the magic intact
        w[i] = int(rng.integers(0, 256))
        d = ZstdStream()
        try:
            out = d.push(bytes(w))
            assert len(out) <= (1 << 17) + len(data)
        except ZstdError:
            pass


def test_mirror_matches_js():
    """The shipped html/zstd.js must textually track this mirror's
    structure (no JS runtime in this image to execute it)."""
    from pathlib import Path

    js = (Path(__file__).resolve().parent.parent / "html"
          / "zstd.js").read_text()
    for marker in [
        "0xFD2FB528",            # frame magic
        "(size >> 1) + (size >> 3) + 3",   # FSE spread step
        "rep = [1, 4, 8]",       # repeat-offset init
        "65539",                 # ML_BASE tail (RFC table)
        "fseReadCounts",         # FSE normalized-count parser
        "hufReadWeights",        # huffman description parser
        "needChecksum",          # split-checksum state
        "sf === 0 ? 1 : 4",      # treeless+compressed single-stream rule
        "counts.length > maxSymbols + 1",  # FSE count bound containment
        "llcode < 36",           # sequence symbol-code validation
        "raw literals overrun block",      # literal-section bounds
        "literal size too large",          # 128 kB regenerated-size cap
        "RLE literal byte missing",
        "skippable frame too large",       # 4 GB buffering containment
        "truncated huffman description",   # direct-weights bounds too
        "saveOv",                          # peek preserves overflow
    ]:
        assert marker in js, f"html/zstd.js missing mirror marker {marker}"


def test_corrupt_literal_sections_are_contained():
    """Hand-crafted corrupt literal sections must raise ZstdError, not
    silently consume the next block's bytes or amplify output (the
    round-5 containment pass; JS lockstep via the textual markers)."""
    magic = b"\x28\xb5\x2f\xfd"
    fhd = b"\x20\x64"  # single-segment, FCS=100

    # raw literals (ltype 0, sf 1) claiming rs=4095 in a 2-byte block
    blk = (1 | (2 << 1) | (2 << 3)).to_bytes(3, "little")
    with pytest.raises(ZstdError, match="overrun|truncated|corrupt"):
        ZstdStream().push(magic + fhd + blk + b"\xf4\xff")

    # RLE literals (ltype 1, sf 3) claiming rs=0xFFFFF (> 128 kB cap)
    blk = (1 | (2 << 1) | (4 << 3)).to_bytes(3, "little")
    with pytest.raises(ZstdError, match="too large"):
        ZstdStream().push(magic + fhd + blk + b"\xfd\xff\xff\x41")


def test_huge_skippable_frame_is_rejected():
    """A corrupt skippable-frame size must not buffer toward 4 GB."""
    hdr = b"\x50\x2a\x4d\x18" + (0xFFFFFFFF).to_bytes(4, "little")
    with pytest.raises(ZstdError, match="skippable"):
        ZstdStream().push(hdr)
