"""Pure-stdlib MJPEG-AVI container codec (RIFF walk, no external libs).

The AVI/RIFF layout (public Microsoft 'AVI RIFF File Reference' / OpenDML):

    'RIFF' <size> 'AVI '
      LIST 'hdrl'
        'avih' 56-byte MainAVIHeader (usec/frame, total frames, w, h, ...)
        LIST 'strl'
          'strh' 56-byte stream header (fccType='vids', handler='MJPG',
                 scale/rate -> fps, length = frame count)
          'strf' 40-byte BITMAPINFOHEADER (biCompression='MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes>   one chunk per frame, even-padded
        ...
      'idx1' index (fourcc, flags, offset-into-movi, size) per frame

Paired with `functions/jpeg.py` this gives REAL video frame decode for
MJPEG payloads -- every '00dc' chunk is a complete baseline JPEG -- where
MP4 frame decode stays codec-blocked (functions/mp4.py parses the ISO-BMFF
container but H.264 needs ffmpeg). The reference has no media surface;
this is task-brief scope (multimodal columns for a training-data pipeline).

Malformed input raises ValueError (the codec-level error contract shared
by decode_wav/decode_png/decode_jpeg/parse_mp4), so fallback_fake /
skip_malformed paths catch AVI failures uniformly.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<IIIIIIIIII"  # first 10 dwords of MainAVIHeader (+ 4 reserved)


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    if len(fourcc) != 4:
        raise ValueError(f"bad fourcc {fourcc!r}")
    pad = b"\x00" if len(data) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> a minimal valid MJPEG AVI (with idx1 index)."""
    if fps <= 0:
        raise ValueError(f"fps must be positive: {fps}")
    usec_per_frame = round(1_000_000 / fps)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        _AVIH_FMT,
        usec_per_frame,
        max_bytes * fps,  # dwMaxBytesPerSec (advisory)
        0,                # padding granularity
        0x10,             # AVIF_HASINDEX
        len(frames),
        0,                # initial frames
        1,                # streams
        max_bytes,        # suggested buffer size
        width,
        height,
    ) + b"\x00" * 16      # dwReserved[4]

    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0, -1)  # scale=1, rate=fps, quality=-1
        + struct.pack("<I", 0)           # dwSampleSize
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    idx_entries = []
    for f in frames:
        # offset convention: from the 'movi' fourcc (offset 4 = first chunk)
        idx_entries.append((len(movi_payload) + 4, len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)

    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
            for off, size in idx_entries
        ),
    )

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, duration_s, frames}.

    `frames` is the list of '00dc'/'00db' chunk payloads in stream order
    (for MJPEG each one is a complete baseline JPEG). Walks the top-level
    RIFF chunks plus the hdrl/movi LISTs; unknown chunks are skipped, so
    files with extra segments (JUNK, INFO, odml) still parse."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI signature)")

    avih = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal avih
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                list_type = buf[data_start:data_start + 4]
                if list_type in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(buf, data_start + 4, data_end)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("short avih header")
                avih = struct.unpack(_AVIH_FMT, buf[data_start:data_start + 40])
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed/uncompressed frame
                frames.append(buf[data_start:data_end])
            pos = data_end + (size & 1)  # skip pad byte

    (riff_size,) = struct.unpack("<I", payload[4:8])
    walk(payload, 12, min(8 + riff_size, len(payload)))

    if avih is None:
        raise ValueError("AVI missing avih header")
    usec_per_frame, _, _, _, total_frames, _, _, _, width, height = avih
    fps = 1_000_000 / usec_per_frame if usec_per_frame else 0.0
    n_frames = len(frames) or total_frames
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": n_frames,
        "duration_s": n_frames / fps if fps else 0.0,
        "frames": frames,
    }
