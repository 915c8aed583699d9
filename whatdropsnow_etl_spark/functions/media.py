"""Real byte-level media codecs: 24-bit BMP and 16-bit PCM WAV.

The multimodal operators' decode step was honestly stubbed while no
media library ships in the runtime — but two production formats
need none: BMP (Windows device-independent bitmap, uncompressed
24-bit) and WAV (RIFF PCM) are plain struct-packed headers over raw
arrays, fully decodable with the standard library plus numpy. These
codecs upgrade the multimodal path from "plumbing with a fake
decoder" to "real bytes in, verified pixels/samples out" for one
image and one audio format; richer formats (JPEG/PNG/MP3) still
require external libs and keep the explicit NotImplementedError.

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


def encode_wav16(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Minimal RIFF/WAVE, mono 16-bit PCM."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_chunk), b"WAVE")
    return riff + fmt + data_chunk


def decode_wav16(payload: bytes) -> dict:
    """Parse mono 16-bit PCM WAV: rate, sample count, exact integer
    energy (sum of squared samples)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only mono 16-bit PCM WAV")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=clen // 2, offset=pos)
        pos += clen + (clen % 2)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    s = samples.astype(np.int64)
    return {
        "sample_rate": int(rate),
        "n_samples": int(s.size),
        "energy": int((s * s).sum()),
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
    """Linear-interpolation resample of a mono 16-bit PCM WAV to
    ``out_rate`` — real DSP on real bytes, numpy-vectorized.

    Output sample j sits at source position j * in_rate / out_rate,
    tracked as an EXACT integer rational (num = j * in_rate;
    k = num // out_rate; frac = (num % out_rate) / out_rate), so
    sample alignment is bit-reproducible — only the interpolated
    VALUE touches float64, and it rounds half-to-even back to int16.
    n_out = (n_in - 1) * out_rate // in_rate + 1: the last output
    sample never reads past the final source sample.
    """
    import numpy as np

    # chunk-walk like decode_wav16 — never string-search for b"data"
    # (raw PCM bytes can contain it)
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only mono 16-bit PCM WAV")
        elif cid == b"data":
            samples = np.frombuffer(
                payload, dtype="<i2", count=clen // 2, offset=pos
            ).astype(np.float64)
        pos += clen + (clen % 2)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    n_in = samples.size
    if n_in == 0 or rate == out_rate:
        return encode_wav16(out_rate, samples.astype(np.int64))
    n_out = (n_in - 1) * out_rate // rate + 1
    j = np.arange(n_out, dtype=np.int64)
    num = j * rate
    k = num // out_rate
    frac = (num % out_rate).astype(np.float64) / float(out_rate)
    k2 = np.minimum(k + 1, n_in - 1)
    vals = samples[k] * (1.0 - frac) + samples[k2] * frac
    out = np.clip(np.rint(vals), -32768, 32767).astype(np.int64)
    return encode_wav16(out_rate, out)
