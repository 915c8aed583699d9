"""Multimodal columns: opaque binary payloads + typed metadata.

Reference parity: the engine treats media as opaque attribute blobs
(SURVEY §2.3 multimodal row); here images/audio/video are a
``binary`` column plus a metadata struct, processed with
``mapInPandas`` — the Arrow-batched slow-path escape hatch the rest
of this package deliberately avoids. The Spark-side plumbing
(schema, batch iteration, partition-parallel execution) is real and
tested; the pixel/sample decode itself is stubbed because no media
libraries ship in this environment (``decoder="pil"`` raises
NotImplementedError until Pillow is installed; the default
deterministic feature extractor exercises the full data path and
has an exact SQL twin).

Scale: mapInPandas streams Arrow batches executor-side — state is
one batch (~10k rows), not one partition, so 100 TB of media flows
through without materializing partitions in Python memory. Payload
bytes never shuffle: extraction is a narrow map; only the small
feature rows move on.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, payload_md5 string,"
    " fake_width bigint, fake_height bigint"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive an opaque binary payload column + typed metadata.

    Stands in for reading real media blobs: payload bytes are the
    UTF-8 encoding of the text (deterministic, content-addressed),
    metadata is a struct the way an image table would carry
    (format, n_bytes). Fully JVM-side.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: pretend dimensions
    derived from byte length (SQL-twin-able)."""
    n = len(payload)
    return 64 + n % 512, 64 + (n * 7) % 512


def _pil_decode(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed; "
            "use decoder='fake' for the deterministic stand-in"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height


_DECODERS = {"fake": _fake_decode, "pil": _pil_decode}


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    Input: (doc_id, payload binary, meta struct). Output one feature
    row per payload: byte count, content md5, decoded dimensions.
    The decode callable runs per-row inside an Arrow batch — the
    batch loop, not the row loop, crosses the JVM/Python boundary.
    """
    decode = _DECODERS[decoder]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        for batch in it:
            payloads = batch["payload"]
            dims = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """attach_binary_payload ∘ extract_features, the end-to-end
    multimodal pipeline over a text-backed corpus."""
    return extract_features(attach_binary_payload(df, text_col, id_col))


RESIZE_SCHEMA = (
    "doc_id bigint, src_width bigint, src_height bigint,"
    " out_width bigint, out_height bigint, resized_md5 string"
)


def resize_images(
    df: DataFrame, out_w: int = 224, out_h: int = 224, decoder: str = "fake"
) -> DataFrame:
    """Image-resize plumbing via mapInPandas.

    Input: (doc_id, payload, meta) as produced by
    attach_binary_payload. The pixel resample itself is stubbed (no
    imaging libs in this environment): the deterministic stand-in
    reports source dims from the decoder and a content-addressed
    output id md5(payload_md5 || '@WxH') — exactly the dataflow a
    real resampler has (payload in, payload-derived artifact out),
    so batch shape, schema, and partition parallelism are all
    exercised and SQL-twin-checked. Swap ``decoder='pil'`` for real
    decoding once Pillow exists.
    """
    decode = _DECODERS[decoder]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        for batch in it:
            payloads = batch["payload"]
            dims = [decode(p) for p in payloads]
            suffix = f"@{out_w}x{out_h}"
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "src_width": [d[0] for d in dims],
                    "src_height": [d[1] for d in dims],
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_md5": payloads.map(
                        lambda p: hashlib.md5(
                            (hashlib.md5(p).hexdigest() + suffix).encode()
                        ).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, n_frames bigint, frame_md5 string"


def sample_frames(
    df: DataFrame, every_n: int = 5, bytes_per_frame: int = 100
) -> DataFrame:
    """Video frame-sampling plumbing via mapInPandas (1 input row →
    many frame rows; the output batch is NOT row-aligned with the
    input batch, which is the part built-in exprs can't express
    without first materializing every frame).

    The codec is stubbed: a payload of n bytes stands in for a
    ``n // bytes_per_frame + 1``-frame clip, and each sampled frame
    (every ``every_n``-th) yields a content-addressed
    md5(payload_md5 || ':' || idx). A real decoder (pyav/ffmpeg)
    drops into the same loop without touching the Spark plumbing.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        for batch in it:
            ids, idxs, totals, hashes = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                pmd5 = hashlib.md5(payload).hexdigest()
                n_frames = len(payload) // bytes_per_frame + 1
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    hashes.append(
                        hashlib.md5(f"{pmd5}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_frames": totals,
                    "frame_md5": hashes,
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def attach_mjpeg_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL motion-JPEG clip per doc: ``2 + id % 6``
    complete JFIF frames concatenated back-to-back (the classic
    MJPEG container shape — each frame an independent SOI..EOI
    stream). Frame dimensions are per-clip (``4 + id % 13`` ×
    ``3 + id % 7``), the flat color varies per frame
    (``(id + 11i, 3id + 17i, 7id + 23i) % 256``), and frames
    alternate between baseline-sequential and progressive encoding
    on ``(id + i) % 2`` — so a frame-sampling pass must hit BOTH
    decode paths across the corpus. Every generation parameter is a
    pure function of (id, frame index), so a SQL oracle predicts
    exactly what a CORRECT per-frame decoder must recover."""

    def gen(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        from ..functions.jpeg import (
            encode_jpeg_baseline,
            encode_jpeg_progressive,
        )

        for batch in it:
            payloads = []
            for did in batch["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                clip = bytearray()
                for i in range(2 + did % 6):
                    rgb = (
                        (did + 11 * i) % 256,
                        (did * 3 + 17 * i) % 256,
                        (did * 7 + 23 * i) % 256,
                    )
                    enc = (
                        encode_jpeg_baseline
                        if (did + i) % 2 == 0
                        else encode_jpeg_progressive
                    )
                    clip += enc(w, h, rgb)
                payloads.append(bytes(clip))
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "payload": payloads}
            )

    # the id relation arrives as however few partitions the source
    # parquet had (ONE at bench scale) — spread it first or clip
    # synthesis AND every downstream per-frame decode run serially
    # in a single task (measured sf0.1: 8.0 -> ~2 s wall for
    # sample_frames_mjpeg). A real media table is already split
    # across blob files; the repartition models that read
    # parallelism for the synthesized family.
    sc = df.sparkSession.sparkContext
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .repartition(sc.defaultParallelism)
        .mapInPandas(gen, schema="doc_id bigint, payload binary")
    )


MJPEG_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_frames bigint,"
    " width bigint, height bigint, sum_rgb bigint"
)


def sample_frames_mjpeg(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: split an MJPEG clip at its JFIF
    frame boundaries and fully DECODE every ``every_n``-th frame
    (sequential or progressive — ``functions.jpeg`` handles both),
    emitting per-frame dimensions and exact per-pixel RGB sums.
    Replaces the r7 stub (``sample_frames``): the Spark plumbing is
    the same 1-row→N-rows ``mapInPandas``, but the codec is now the
    in-tree JPEG decoder, not a hash.

    Skipped frames are never entropy-decoded — the boundary scan is
    a byte search for the EOI marker, so sampling cost scales with
    frames SAMPLED plus a linear scan, not frames present. (EOI
    cannot occur inside entropy data — byte stuffing reserves
    0xFF00/RSTn — so the scan is exact for JFIF streams without
    opaque segment payloads embedding it, which all our encoders
    guarantee.) Payload bytes never shuffle; only the small metadata
    rows move on."""

    def go(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        from ..functions.jpeg import decode_jpeg

        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload)
                bounds = []
                start = 0
                while start < len(payload):
                    idx = payload.index(b"\xff\xd9", start)
                    bounds.append((start, idx + 2))
                    start = idx + 2
                n_frames = len(bounds)
                for i in range(0, n_frames, every_n):
                    lo, hi = bounds[i]
                    d = decode_jpeg(payload[lo:hi])
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_idx": i,
                            "n_frames": n_frames,
                            "width": d["width"],
                            "height": d["height"],
                            "sum_rgb": d["sum_r"]
                            + d["sum_g"]
                            + d["sum_b"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames",
                    "width", "height", "sum_rgb",
                ],
            )

    return media.mapInPandas(go, schema=MJPEG_FRAME_SCHEMA)


MEDIA_SCHEMA = (
    "doc_id bigint, format string, width bigint, height bigint,"
    " sum_rgb bigint, sample_rate bigint, n_samples bigint, energy bigint"
)


def attach_media_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL media bytes per doc — a solid-color image for
    even ids (24-bit BMP when id % 16 == 0, GIF87a with real LZW
    when id % 16 == 8 — row-interlaced for id % 32 == 24 — JPEG
    when id % 8 == 4 —
    baseline-sequential with a restart interval when id % 16 == 4,
    PROGRESSIVE (SOF2, the r8 decoder's multi-scan annex-G path)
    when id % 16 == 12 — 8-bit RGB PNG when id % 4 == 2,
    cycling through all five PNG scanline filters, SEQUENTIAL when
    id % 8 == 2 and Adam7 INTERLACED when id % 8 == 6 (r9: the
    seven-pass un-filter+scatter path is exercised end to end), a
    constant-amplitude PCM WAV for odd ids — mono 16-bit, stereo
    16-bit, mono 8-bit or stereo 24-bit cycling on id % 8 (r8:
    real corpora aren't all mono 16-bit), with id % 16 == 9 carved
    out as IEEE float32 (r9: format tag 3, amplitude k/1024 so the
    decoder's half-to-even int16-scale quantizer recovers EXACTLY
    32k) — with every
    generation parameter a pure function of the id. The payloads are
    genuine format-conformant binaries (any external BMP/PNG/JPEG/
    WAV reader opens them); because the parameters are id-derived, a
    SQL oracle can predict what a CORRECT decoder must recover,
    making the binary decode itself oracle-checkable (image
    w/h/pixel-sum formulas are format-independent by construction;
    the JPEG branch's expected color is the closed-form
    YCbCr round-trip of the id color, mirrored with ``round_even``
    in the oracle since every rounding in the codec is
    half-to-even).
    """

    def gen(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        from ..functions.jpeg import (
            encode_jpeg_baseline,
            encode_jpeg_progressive,
        )
        from ..functions.media import (
            encode_bmp24,
            encode_gif87a,
            encode_png_rgb8,
            encode_ppm,
            encode_wav_float32,
            encode_wav_pcm,
        )

        for batch in it:
            payloads = []
            for did in batch["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w, h = 4 + did % 13, 3 + did % 7
                    rgb = (did % 256, (did * 3) % 256, (did * 7) % 256)
                    if did % 16 == 8:
                        # r9: GIF87a with REAL LZW (interlaced rows
                        # for half the class) — same solid color, so
                        # every oracle formula is format-independent
                        payloads.append(
                            encode_gif87a(
                                w, h, rgb, interlace=(did % 32 == 24)
                            )
                        )
                    elif did % 8 == 0:
                        # r10: ids ≡ 16 (mod 32) are binary netpbm
                        # P6 PPM — same solid color, so every oracle
                        # formula stays format-independent, but the
                        # decoder walks the tokenized-ASCII-header
                        # path (with a comment line to exercise the
                        # spec's `#` skip)
                        if did % 32 == 16:
                            hdr_px = encode_ppm(w, h, rgb)
                            payloads.append(
                                hdr_px[:3]
                                + b"# synthetic asset\n"
                                + hdr_px[3:]
                            )
                        else:
                            payloads.append(encode_bmp24(w, h, rgb))
                    elif did % 8 == 4:
                        # both decode to the same closed-form color,
                        # so the oracle is mode-independent — but the
                        # decoder walks entirely different entropy
                        # paths (single sequential scan vs 5-scan
                        # successive approximation)
                        if did % 16 == 4:
                            payloads.append(
                                encode_jpeg_baseline(
                                    w, h, rgb, restart_interval=1
                                )
                            )
                        else:
                            payloads.append(
                                encode_jpeg_progressive(w, h, rgb)
                            )
                    else:
                        # r9: ids ≡ 2 (mod 8) stay sequential, ids
                        # ≡ 6 (mod 8) are Adam7 INTERLACED — same
                        # pixels either way (the oracle's w/h/sum
                        # formulas are layout-independent), but the
                        # decoder walks the seven-pass scatter path
                        payloads.append(
                            encode_png_rgb8(
                                w,
                                h,
                                rgb,
                                filter_type=(did // 2) % 5,
                                interlace=1 if did % 8 == 6 else 0,
                            )
                        )
                else:
                    # real audio corpora aren't all mono 16-bit
                    # (r8): cycle mono16 / stereo16 / mono8 /
                    # stereo24 on id % 8 with closed-form amplitudes
                    rate = 8000 + (did % 3) * 4000
                    n = 50 + did % 100
                    amp = 100 + did % 1000
                    if did % 16 == 9:
                        # r9: IEEE float32 WAV (format tag 3) —
                        # amplitude k/1024 quantizes to the EXACT
                        # int16-scale integer 32k on decode, so the
                        # oracle's energy formula stays closed-form;
                        # k <= 999 keeps 32k under int16 for the
                        # resample re-encode
                        payloads.append(
                            encode_wav_float32(
                                rate,
                                np.full(n, (100 + did % 900) / 1024.0),
                            )
                        )
                        continue
                    if did % 8 == 1:
                        sig = np.full(n, amp, dtype=np.int64)
                        bits = 16
                    elif did % 8 == 3:
                        sig = np.stack(
                            [
                                np.full(n, amp, dtype=np.int64),
                                np.full(n, amp + 7, dtype=np.int64),
                            ],
                            axis=1,
                        )
                        bits = 16
                    elif did % 8 == 5:
                        # 1..120: straddles the VAD threshold (50),
                        # so BOTH active and silent clips exist
                        sig = np.full(n, 1 + did % 120, dtype=np.int64)
                        bits = 8
                    else:
                        a24 = amp * 250
                        sig = np.stack(
                            [
                                np.full(n, a24, dtype=np.int64),
                                np.full(n, a24 + 1000, dtype=np.int64),
                            ],
                            axis=1,
                        )
                        bits = 24
                    payloads.append(encode_wav_pcm(rate, sig, bits=bits))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


MEDIA_QUARANTINE_SCHEMA = MEDIA_SCHEMA + ", error string"


def media_probe(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL byte-level media probe: sniff the magic bytes and decode
    BMP, PNG, GIF (r9: full LZW + palette lookup, interlace honored)
    or JPEG (dimensions + exact per-channel pixel sums,
    reported as one combined ``sum_rgb``; the PNG path is a full
    inflate + un-filter + CRC-check decode, the JPEG path a full
    sequential OR progressive entropy decode — DQT/DHT parse,
    canonical Huffman, multi-scan successive-approximation assembly,
    dequant, IDCT, YCbCr→RGB — in ``functions.jpeg``) or
    WAV (rate, sample count, exact integer PCM energy) with the
    pure-stdlib codecs in ``functions.media``.
    One Arrow-batched narrow map — payload bytes never shuffle, only
    the small metadata rows move on. Unknown formats raise (a
    corrupt blob in a media table is a data bug, not a row to drop
    silently). Emits MEDIA_SCHEMA with NULLs in the
    other modality's columns.

    ``on_error="quarantine"`` (r10) is the 100 TB operational mode:
    one corrupt blob must not kill a week-long job, and SILENTLY
    dropping it hides data bugs — so every per-payload decode error
    (truncation, bad magic, a gated mode like an animated GIF or a
    non-255-maxval PPM) becomes a ROW with NULL metrics and the
    exception rendered in an ``error`` column (schema
    MEDIA_QUARANTINE_SCHEMA; clean rows carry error NULL). The
    caller splits on ``error IS NULL`` — metrics one way, the
    quarantine relation to triage the other (the CSV corrupt-row
    quarantine convention from sources/files.py applied to blobs).
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine: {on_error}")
    quarantine = on_error == "quarantine"

    def probe(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        from ..functions.jpeg import decode_jpeg_baseline
        from ..functions.media import (
            decode_bmp24,
            decode_gif,
            decode_png_rgb8,
            decode_ppm,
            decode_wav16,
        )

        def decode_one(did, payload):
                if (
                    payload[:2] == b"BM"
                    or payload[:4] == b"\x89PNG"
                    or payload[:2] == b"\xff\xd8"
                    or payload[:4] == b"GIF8"
                    or payload[:2] == b"P6"
                ):
                    if payload[:4] == b"\x89PNG":
                        fmt, d = "png", decode_png_rgb8(payload)
                    elif payload[:4] == b"GIF8":
                        # r9: real LZW decode, sequential AND
                        # row-interlaced (functions/media.py)
                        fmt, d = "gif", decode_gif(payload)
                    elif payload[:2] == b"\xff\xd8":
                        # r7/r8: real JPEG decode, sequential AND
                        # progressive (functions/jpeg.py — Huffman +
                        # annex-G multi-scan + IDCT)
                        fmt, d = "jpeg", decode_jpeg_baseline(payload)
                    elif payload[:2] == b"P6":
                        # r10: binary netpbm — tokenized ASCII header
                        fmt, d = "ppm", decode_ppm(payload)
                    else:
                        fmt, d = "bmp", decode_bmp24(payload)
                    return {
                        "doc_id": did,
                        "format": fmt,
                        "width": d["width"],
                        "height": d["height"],
                        "sum_rgb": d["sum_r"] + d["sum_g"] + d["sum_b"],
                        "sample_rate": None,
                        "n_samples": None,
                        "energy": None,
                    }
                elif payload[:4] == b"RIFF":
                    d = decode_wav16(payload)
                    return {
                        "doc_id": did,
                        "format": "wav",
                        "width": None,
                        "height": None,
                        "sum_rgb": None,
                        "sample_rate": d["sample_rate"],
                        "n_samples": d["n_samples"],
                        "energy": d["energy"],
                    }
                else:
                    raise ValueError(f"unknown media magic for doc {did}")

        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload)
                if not quarantine:
                    rows.append(decode_one(did, payload))
                    continue
                try:
                    row = decode_one(did, payload)
                    row["error"] = None
                except Exception as e:  # noqa: BLE001 — quarantine
                    row = {
                        "doc_id": did,
                        "format": None,
                        "width": None,
                        "height": None,
                        "sum_rgb": None,
                        "sample_rate": None,
                        "n_samples": None,
                        "energy": None,
                        "error": f"{type(e).__name__}: {e}",
                    }
                rows.append(row)
            yield pd.DataFrame(rows)

    schema = MEDIA_QUARANTINE_SCHEMA if quarantine else MEDIA_SCHEMA
    return media.mapInPandas(probe, schema=schema)


MEDIA_RESIZE_SCHEMA = (
    "doc_id bigint, src_width bigint, src_height bigint,"
    " out_width bigint, out_height bigint, out_sum_rgb bigint"
)


def media_resize(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL image resize over the BMP, PNG and GIF payloads: decode
    pixels (PNG: inflate + un-filter; GIF: LZW + palette),
    nearest-neighbor gather
    to (out_w, out_h), re-encode IN THE SOURCE FORMAT, then decode
    the RESULT to report its dimensions and exact pixel sums
    — the round-trip proves the resampled bytes are themselves a
    valid image, not just that a resize function ran. Non-image
    payloads (the WAV half of the media table) are filtered out
    JVM-side before the Python boundary, and so are JPEGs (r7):
    re-encoding a LOSSY format after a resize silently degrades
    pixels, so the lossless-format round-trip contract deliberately
    excludes it — decode JPEG once (media_probe's decoder), resize
    the pixels, and land a lossless format instead. Narrow Arrow
    map; only metadata rows move on.
    """

    def go(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        from ..functions.media import (
            decode_bmp24,
            decode_gif,
            decode_png_rgb8,
            decode_ppm,
            resize_bmp24_nearest,
            resize_gif_nearest,
            resize_png_rgb8_nearest,
            resize_ppm_nearest,
        )

        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload)
                if payload[:4] == b"\x89PNG":
                    dec, rsz = decode_png_rgb8, resize_png_rgb8_nearest
                elif payload[:4] == b"GIF8":
                    dec, rsz = decode_gif, resize_gif_nearest
                elif payload[:2] == b"P6":
                    dec, rsz = decode_ppm, resize_ppm_nearest
                else:
                    dec, rsz = decode_bmp24, resize_bmp24_nearest
                src = dec(payload)
                resized = rsz(payload, out_w, out_h)
                d = dec(resized)
                rows.append(
                    {
                        "doc_id": did,
                        "src_width": src["width"],
                        "src_height": src["height"],
                        "out_width": d["width"],
                        "out_height": d["height"],
                        "out_sum_rgb": d["sum_r"] + d["sum_g"] + d["sum_b"],
                    }
                )
            yield pd.DataFrame(rows)

    imgs = media.where(
        F.startswith(F.col("payload"), F.lit(b"BM"))
        | F.startswith(F.col("payload"), F.lit(b"\x89PNG"))
        | F.startswith(F.col("payload"), F.lit(b"GIF8"))
        | F.startswith(F.col("payload"), F.lit(b"P6"))
    )
    return imgs.mapInPandas(go, schema=MEDIA_RESIZE_SCHEMA)


MEDIA_RESAMPLE_SCHEMA = (
    "doc_id bigint, src_rate bigint, n_src bigint,"
    " out_rate bigint, n_out bigint, energy_out bigint"
)


def media_resample(media: DataFrame, out_rate: int = 16000) -> DataFrame:
    """REAL audio resample over the WAV payloads: decode PCM,
    linear-interpolate to ``out_rate``, re-encode, then decode the
    RESULT for its rate/length/energy — the media_resize round-trip
    contract applied to audio (the resampled bytes must themselves
    be a valid WAV a third-party reader opens). Sample-rate
    normalization is the first step of every audio training
    pipeline (ASR/TTS corpora standardize to one rate before
    featurization).

    Non-WAV payloads filter out JVM-side before the Python
    boundary (startswith on the RIFF magic — a codegen'd byte
    compare); the Arrow batch carries only (id, payload) and only
    metadata rows move on. Position arithmetic is exact-integer
    rational (functions/media.resample_wav16), so output length and
    constant-signal energy are formula-predictable — which is what
    makes a REAL byte-level resampler SQL-oracle-checkable.
    """

    def go(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        from ..functions.media import decode_wav16, resample_wav16

        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload)
                src = decode_wav16(payload)
                out = decode_wav16(resample_wav16(payload, out_rate))
                rows.append(
                    {
                        "doc_id": did,
                        "src_rate": src["sample_rate"],
                        "n_src": src["n_samples"],
                        "out_rate": out["sample_rate"],
                        "n_out": out["n_samples"],
                        "energy_out": out["energy"],
                    }
                )
            yield pd.DataFrame(rows)

    wavs = media.where(F.startswith(F.col("payload"), F.lit(b"RIFF")))
    return wavs.mapInPandas(go, schema=MEDIA_RESAMPLE_SCHEMA)


MEDIA_VAD_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_active bigint, max_run bigint"
)


def media_silence_report(
    media: DataFrame,
    frame: int = 32,
    hop: int = 16,
    threshold: int = 50,
) -> DataFrame:
    """Energy-threshold voice-activity framing over the WAV
    payloads — the VAD trim/segment pass ASR corpora run before
    featurization (silence wastes tokens; long active runs are the
    usable utterances).

    A frame is ACTIVE when its exact integer energy exceeds the
    mean-square threshold: sum(s^2) > threshold^2 * frame_len — all
    int64 arithmetic on decoded PCM (energy summed over ALL
    channels; frames index TIME, so a window is frame_len PCM
    frames regardless of channel count), no float anywhere, so the
    report is bit-deterministic and (for the id-derived synthetic
    payloads) closed-form predictable. Frames start at multiples of
    ``hop``; the last partial frame is dropped (the standard
    framing convention). Emits per doc: total frames, active
    frames, and the LONGEST consecutive active run (the usable-
    segment length a cutter would keep).
    """

    def go(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        from ..functions.media import decode_wav_samples

        thr = threshold * threshold * frame
        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                payload = bytes(payload)
                _, _, frames_arr = decode_wav_samples(payload)
                n = frames_arr.shape[0]
                n_frames = max((n - frame) // hop + 1, 0) if n >= frame else 0
                active = np.zeros(n_frames, dtype=bool)
                for i in range(n_frames):
                    seg = frames_arr[i * hop : i * hop + frame]
                    active[i] = int((seg * seg).sum()) > thr
                max_run = run = 0
                for a in active:
                    run = run + 1 if a else 0
                    max_run = max(max_run, run)
                rows.append(
                    {
                        "doc_id": did,
                        "n_frames": n_frames,
                        "n_active": int(active.sum()),
                        "max_run": max_run,
                    }
                )
            yield pd.DataFrame(rows)

    wavs = media.where(F.startswith(F.col("payload"), F.lit(b"RIFF")))
    return wavs.mapInPandas(go, schema=MEDIA_VAD_SCHEMA)


ANIMATION_SCHEMA = (
    "doc_id bigint, n_frames bigint, width bigint, height bigint,"
    " sum_rgb bigint"
)


def attach_animation_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL animated-GIF payload per row (r10): the
    attach_media_assets convention extended to multi-frame video-ish
    assets — n_frames = 2 + id%3 full-frame solid-color frames,
    dimensions and every frame's color pure functions of (id, frame)
    so the DuckDB oracle predicts in closed form what the LZW
    decoder must recover. Frames share one global palette; the
    encoder is functions.media.encode_gif89a_frames (graphic-control
    extension per frame — exactly the layout decode_gif's animation
    gate rejects, so the frame decoder is the only honest path)."""

    def gen(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd  # noqa: PLC0415

        from ..functions.media import encode_gif89a_frames

        for batch in it:
            payloads = []
            for did in batch["doc_id"]:
                did = int(did)
                n_frames = 2 + did % 3
                w, h = 3 + did % 5, 2 + did % 4
                frames = [
                    (
                        (did * 5 + f * 11) % 256,
                        (did * 7 + f * 13) % 256,
                        (did * 11 + f * 17) % 256,
                    )
                    for f in range(n_frames)
                ]
                payloads.append(encode_gif89a_frames(w, h, frames))
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "payload": payloads}
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


def media_animation_probe(media: DataFrame) -> DataFrame:
    """REAL multi-frame decode over animated GIF payloads (r10):
    every frame goes through the full LZW + palette machinery
    (functions.media.decode_gif_frames — extension-aware block walk,
    named gates on transparency / sub-rectangle frames / local
    palettes), reporting frame count, logical-screen dimensions and
    the exact integer pixel sum ACROSS frames. One Arrow-batched
    narrow map — payload bytes never shuffle."""

    def probe(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd  # noqa: PLC0415

        from ..functions.media import decode_gif_frames

        for batch in it:
            rows = []
            for did, payload in zip(batch["doc_id"], batch["payload"]):
                d = decode_gif_frames(bytes(payload))
                rows.append(
                    {
                        "doc_id": did,
                        "n_frames": d["n_frames"],
                        "width": d["width"],
                        "height": d["height"],
                        "sum_rgb": d["sum_r"] + d["sum_g"] + d["sum_b"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(probe, schema=ANIMATION_SCHEMA)
