"""Multimodal (image/audio/video) columns for training-data pipelines.

Design (brief §"Multimodal columns"): media rides as an opaque ``binary``
column plus a typed metadata struct; decode / feature-extract / resize /
frame-sample are Arrow-batched ``mapInPandas`` stages so a 100 TB corpus
streams through Python in columnar batches without ever materializing
rows on the driver.

Two codec tiers:

* the deterministic FAKE containers (`FIMG`/`FAUD`/`FVID` packets whose
  geometry derives from md5(doc_id)) — cheap, fully oracle-checkable;
* REAL public formats, dependency-free: uncompressed 24-bit BMP,
  8-bit PNG (zlib IDAT, all five scanline filters — stdlib zlib only),
  16-bit PCM WAV, and uncompressed-DIB RIFF AVI encode/decode in pure
  NumPy (:func:`encode_bmp` / :func:`decode_bmp` / :func:`encode_png` /
  :func:`decode_png` / :func:`encode_wav` / :func:`decode_wav` /
  :func:`encode_avi` / :func:`decode_avi`), wired through the same
  mapInPandas plumbing (:func:`pack_real_media` /
  :func:`decode_media_real`).  Round 10 closed the video gap (real
  AVIs any standard player opens); round 13 adds the compressed-image
  path (PNG greyscale/truecolor/alpha decode — the common lossless web
  format, so externally-sourced thumbnails decode too, not just our
  own BMPs).

Geometry in both tiers is reproducible from the id alone, which is what
lets the DuckDB oracle check the full pack→decode loop.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "pack_fake_media",
    "decode_media",
    "decode_media_sql",
    "resize_images",
    "sample_frames",
    "audio_features",
    "encode_bmp",
    "decode_bmp",
    "encode_png",
    "decode_png",
    "encode_wav",
    "decode_wav",
    "encode_avi",
    "decode_avi",
    "pack_real_media",
    "decode_media_real",
    "decode_media_real_sql",
    "decode_image_real",
    "ahash64",
    "image_ahash",
    "hamming64",
    "sample_frames_real",
    "sample_frames_real_sql",
]

_MAGIC = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}
_KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = ("doc_id long, media_type string, media binary, "
                "width int, height int, sample_rate int, n_frames int")


def _h32(doc_id: int, salt: str) -> int:
    """Engine-portable draw: int(md5(f'{id}:{salt}')[:8 hex], 16)."""
    return int(hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8], 16)


def _geometry(doc_id: int) -> tuple[str, int, int, int, int]:
    kind = _KINDS[_h32(doc_id, "kind") % 3]
    width = 16 + _h32(doc_id, "w") % 240
    height = 16 + _h32(doc_id, "h") % 240
    sample_rate = 8000 + (_h32(doc_id, "sr") % 5) * 8000
    n_frames = 1 + _h32(doc_id, "f") % 300
    return kind, width, height, sample_rate, n_frames


def _payload(doc_id: int, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{doc_id}:p{i}".encode()).digest()
        i += 1
    return out[:n]


def _pack_one(doc_id: int) -> tuple[str, bytes, int, int, int, int]:
    kind, w, h, sr, nf = _geometry(doc_id)
    if kind == "image":
        body = _payload(doc_id, min(w * h, 4096))
        blob = _MAGIC[kind] + struct.pack(">II", w, h) + body
    elif kind == "audio":
        n_samples = sr // 4  # quarter second
        body = _payload(doc_id, min(n_samples, 4096))
        blob = _MAGIC[kind] + struct.pack(">II", sr, n_samples) + body
    else:
        body = _payload(doc_id, min(nf * 16, 4096))
        blob = _MAGIC[kind] + struct.pack(">I", nf) + body
    return kind, blob, w, h, sr, nf


def pack_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake media blob + metadata per row.

    Stand-in for an upstream binary ingest (tar/webdataset → parquet);
    geometry is a pure function of the id so downstream checks are exact.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            packed = [_pack_one(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [p[0] for p in packed],
                "media": [p[1] for p in packed],
                "width": pd.Series([p[2] for p in packed], dtype="int32"),
                "height": pd.Series([p[3] for p in packed], dtype="int32"),
                "sample_rate": pd.Series([p[4] for p in packed],
                                         dtype="int32"),
                "n_frames": pd.Series([p[5] for p in packed], dtype="int32"),
            })

    from ..operators.partitioners import scale_out

    # scale out the id column BEFORE the generator: a few-split input
    # otherwise serializes the whole pack->decode chain on one task
    # (mapInPandas preserves partitioning downstream; round-8 finding)
    return scale_out(df.select(id_col), probe=df) \
        .mapInPandas(gen, schema=MEDIA_SCHEMA)


_DECODE_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                  "sample_rate int, n_samples int, n_frames int, "
                  "n_bytes long, mean_byte double")


def decode_media(media: DataFrame) -> DataFrame:
    """Parse blobs back into typed metadata + a cheap content feature.

    The decode reads ONLY the binary column (header + body) — it must
    round-trip what :func:`pack_fake_media` wrote, independently of the
    metadata columns.  `mean_byte` is a stand-in for real pixel/sample
    statistics (the part a real library would produce).
    """
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                magic, rest = blob[:4], blob[4:]
                w = h = sr = ns = nf = None
                if magic == b"FIMG":
                    kind = "image"
                    w, h = struct.unpack(">II", rest[:8])
                    body = rest[8:]
                elif magic == b"FAUD":
                    kind = "audio"
                    sr, ns = struct.unpack(">II", rest[:8])
                    body = rest[8:]
                elif magic == b"FVID":
                    kind = "video"
                    (nf,) = struct.unpack(">I", rest[:4])
                    body = rest[4:]
                else:
                    continue  # undecodable blob → dropped (P2 analogue)
                mean = float(sum(body)) / len(body) if body else 0.0
                rows.append((int(doc_id), kind, w, h, sr, ns, nf,
                             len(blob), mean))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "width", "height", "sample_rate",
                "n_samples", "n_frames", "n_bytes", "mean_byte"])

    return media.select("doc_id", "media").mapInPandas(
        dec, schema=_DECODE_SCHEMA)


def decode_media_sql(ids_table: str, id_col: str = "doc_id") -> str:
    """DuckDB oracle for the *metadata* half of pack→decode.

    Recomputes the geometry (width/height/rate/frames/byte-length) from
    the id with the same md5 arithmetic as :func:`_geometry` — an
    independent derivation that the packed-then-decoded values must hit.
    Content stats (`mean_byte`) are not SQL-reproducible and stay
    pytest-covered.
    """
    def h(salt: str) -> str:
        return (f"(('0x' || substr(md5({id_col}::VARCHAR || ':{salt}'), "
                f"1, 8))::BIGINT)")

    kind = (f"(['image', 'audio', 'video'])[({h('kind')} % 3) + 1]")
    w = f"(16 + {h('w')} % 240)"
    hh = f"(16 + {h('h')} % 240)"
    sr = f"(8000 + ({h('sr')} % 5) * 8000)"
    nf = f"(1 + {h('f')} % 300)"
    ns = f"({sr} // 4)"
    body = (f"CASE WHEN {kind} = 'image' THEN least({w} * {hh}, 4096) "
            f"WHEN {kind} = 'audio' THEN least({ns}, 4096) "
            f"ELSE least({nf} * 16, 4096) END")
    hdr = f"CASE WHEN {kind} = 'video' THEN 8 ELSE 12 END"
    return (
        f"SELECT {id_col} AS doc_id, {kind} AS media_type, "
        f"cast(CASE WHEN {kind} = 'image' THEN {w} END as int) AS width, "
        f"cast(CASE WHEN {kind} = 'image' THEN {hh} END as int) AS height, "
        f"cast(CASE WHEN {kind} = 'audio' THEN {sr} END as int) AS sample_rate, "
        f"cast(CASE WHEN {kind} = 'audio' THEN {ns} END as int) AS n_samples, "
        f"cast(CASE WHEN {kind} = 'video' THEN {nf} END as int) AS n_frames, "
        f"cast({body} + {hdr} as bigint) AS n_bytes "
        f"FROM {ids_table}"
    )


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Re-encode image blobs at a new geometry (fake nearest-neighbour).

    Non-image rows pass through untouched — the standard mixed-modality
    map shape.  A real implementation swaps `_payload` for PIL resize;
    batch structure and schema are already production-shaped.
    """
    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for i, (doc_id, kind) in enumerate(
                    zip(pdf["doc_id"], pdf["media_type"])):
                if kind != "image":
                    continue
                body = _payload(int(doc_id),
                                min(target_w * target_h, 4096))
                out.loc[out.index[i], "media"] = (
                    _MAGIC["image"] + struct.pack(">II", target_w, target_h)
                    + body)
                out.loc[out.index[i], "width"] = target_w
                out.loc[out.index[i], "height"] = target_h
            yield out

    return media.mapInPandas(rs, schema=media.schema)


def sample_frames(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Explode video blobs into every k-th frame index (fake frame grab).

    One output row per sampled frame — the flatMap shape a real
    video-sampling stage has; `frame_fingerprint` stands in for the
    decoded frame tensor.
    """
    def smp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, blob in zip(pdf["doc_id"], pdf["media_type"],
                                          pdf["media"]):
                if kind != "video":
                    continue
                (nf,) = struct.unpack(">I", bytes(blob)[4:8])
                for fi in range(0, nf, every_k):
                    fp = hashlib.md5(
                        f"{int(doc_id)}:frame{fi}".encode()).hexdigest()
                    rows.append((int(doc_id), fi, fp))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_fingerprint"])

    return media.mapInPandas(
        smp, schema="doc_id long, frame_idx int, frame_fingerprint string")


def audio_features(media: DataFrame) -> DataFrame:
    """Duration + amplitude-proxy features for audio rows."""
    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, blob in zip(pdf["doc_id"], pdf["media_type"],
                                          pdf["media"]):
                if kind != "audio":
                    continue
                blob = bytes(blob)
                sr, ns = struct.unpack(">II", blob[4:12])
                body = blob[12:]
                rms = (sum(b * b for b in body) / len(body)) ** 0.5 \
                    if body else 0.0
                rows.append((int(doc_id), sr, ns, ns / sr, rms))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_samples", "duration_s", "rms"])

    return media.mapInPandas(
        feat, schema="doc_id long, sample_rate int, n_samples int, "
                     "duration_s double, rms double")


# ---------------------------------------------------------------------------
# REAL codecs — dependency-free NumPy implementations of two public
# container formats: BMP (Windows DIB, uncompressed 24-bit BI_RGB,
# bottom-up, 4-byte row stride) and WAV (RIFF/WAVE, 16-bit little-endian
# PCM).  Format layout is public knowledge (BITMAPFILEHEADER +
# BITMAPINFOHEADER; RIFF 'fmt '/'data' chunks).  These close the stub the
# fake `FIMG`/`FAUD` codec stood in for: the Spark plumbing is identical,
# only the bytes are now a format any external tool can read.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an uncompressed 24-bit
    BMP (BI_RGB, bottom-up rows, BGR byte order, 4-byte-aligned stride)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp wants an (h, w, 3) uint8 array")
    h, w, _ = px.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    body = rows.tobytes()
    file_size = 14 + 40 + len(body)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


def decode_bmp(data: bytes) -> "tuple[int, int, 'np.ndarray']":
    """Decode an uncompressed 24-bit BMP → ``(width, height, (h, w, 3)
    uint8 RGB array)``.  Handles both bottom-up (positive height) and
    top-down (negative height) DIBs; rejects compressed / non-24-bit."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (data_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h_signed, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    stride = (3 * w + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=h * stride, offset=data_off)
    rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    px = rows[:, :, ::-1]  # BGR → RGB
    if h_signed > 0:
        px = px[::-1]  # bottom-up → top-down
    return w, h, np.ascontiguousarray(px)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _paeth_vec(a, b, c):
    """Vectorized Paeth predictor (PNG spec §9.4) over int16 arrays
    (a=left, b=up, c=upper-left)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


def encode_png(pixels: "np.ndarray", *, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an 8-bit truecolor
    PNG (the public PNG spec: signature + IHDR + one zlib IDAT +
    IEND, CRC-32 per chunk).  ``filter_type`` applies ONE of the five
    scanline filters (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) to
    every row — the non-zero settings exist so tests can exercise
    every :func:`decode_png` unfilter path; real-world encoders pick
    per-row, and decoders must invert all five regardless."""
    import numpy as np
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png wants an (h, w, 3) uint8 array")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad PNG filter {filter_type}")
    h, w, _ = px.shape
    bpp, stride = 3, 3 * w
    raw = px.reshape(h, stride).astype(np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    zero = np.zeros(bpp, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([zero, cur[:-bpp]])
        upleft = np.concatenate([zero, prev[:-bpp]])
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - (left + prev) // 2
        else:
            f = cur - _paeth_vec(left, prev, upleft)
        lines.append(bytes([filter_type])
                     + (f % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> "tuple[int, int, 'np.ndarray']":
    """Decode a PNG → ``(width, height, (h, w, 3) uint8 RGB array)``.

    Supports 8-bit greyscale (color type 0), truecolor (2) and
    truecolor+alpha (6), non-interlaced — the common web/lossless
    cases; 16-bit, palette and Adam7 are rejected loudly.  Alpha is
    dropped, grey replicated to RGB, ancillary chunks skipped, IDAT
    segments concatenated per spec.  All five scanline filters are
    inverted: None/Up/Sub vectorized (Sub is a per-lane cumsum mod
    256), Average/Paeth per-pixel — they depend on the just-
    reconstructed left neighbour, and blobs here are thumbnail-scale
    (the Arrow-batch decode host amortizes the Python row loop)."""
    import numpy as np
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: missing signature")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + clen]
        if ctype == b"IHDR":
            w, h, depth, ct, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or ct not in (0, 2, 6) or comp or filt or ilace:
                raise ValueError(f"unsupported PNG: depth={depth} "
                                 f"color={ct} interlace={ilace}")
            meta = (w, h, ct)
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if meta is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, ct = meta
    ch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * ch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # normalize to the malformed-blob contract every caller's
        # (ValueError, struct.error) handler honors — a truncated
        # download must be DROPPED by the decode hosts, not crash the
        # executor task (round-13 review finding)
        raise ValueError(f"corrupt PNG: {e}") from None
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: scanline size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.int16)
    for y in range(h):
        f, cur = int(ftypes[y]), rows[y]
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int16)
        if f == 0:
            rec = cur
        elif f == 1:
            rec = (cur.reshape(w, ch).astype(np.int64).cumsum(axis=0)
                   % 256).reshape(stride).astype(np.int16)
        elif f == 2:
            rec = (cur + up) % 256
        elif f in (3, 4):
            rec = cur.copy()
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(up[x])
                if f == 3:
                    rec[x] = (rec[x] + (a + b) // 2) % 256
                else:
                    c = int(up[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = (a if pa <= pb and pa <= pc
                          else b if pb <= pc else c)
                    rec[x] = (rec[x] + pr) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return w, h, np.ascontiguousarray(px)


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM RIFF/WAVE file."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> "tuple[int, int, 'np.ndarray']":
    """Decode a PCM RIFF/WAVE file → ``(sample_rate, channels, int16
    array)``.  Walks the chunk list (so extra chunks like LIST are
    skipped); rejects non-PCM or non-16-bit encodings."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, sr, ch, bits, body = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH",
                                                               payload, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            body = payload
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or body is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    return sr, ch, np.frombuffer(body, dtype="<i2").copy()


def encode_avi(frames: "np.ndarray", fps: int = 10) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 RGB array as an uncompressed
    RIFF AVI ('vids'/'DIB ' stream: raw bottom-up 24-bit BGR frames in
    '00db' chunks, BITMAPINFOHEADER strf, idx1 keyframe index) — the
    video analogue of :func:`encode_bmp`/:func:`encode_wav`, readable
    by any standard player/decoder.  Layout is public knowledge (the
    RIFF AVI file format: 'hdrl' (avih + strl(strh, strf)) + 'movi' +
    'idx1').  Total size is the closed form ``232 + n·(24 + stride·h)``
    with the BMP 4-byte row stride — the DuckDB oracle recomputes it."""
    import numpy as np

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.shape[0] < 1:
        raise ValueError("encode_avi wants an (n, h, w, 3) uint8 array")
    n, h, w, _ = fr.shape
    stride = (3 * w + 3) // 4 * 4
    fb = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(form: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", form + payload)

    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fb, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0,
                       0, 1, fps, 0, n, fb, 0, 0, 0, 0, w, h)
    avih = struct.pack("<14I", 1_000_000 // fps, fb * fps, 0, 0x10,
                       n, 0, 1, fb, w, h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = np.zeros((n, h, stride), dtype=np.uint8)
    body[:, :, : 3 * w] = fr[:, ::-1, :, ::-1].reshape(n, h, 3 * w)
    movi_items = b"".join(chunk(b"00db", body[i].tobytes())
                          for i in range(n))
    movi = lst(b"movi", movi_items)
    idx1 = b"".join(b"00db" + struct.pack("<III", 0x10, 4 + i * (8 + fb),
                                          fb) for i in range(n))
    payload = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_avi(data: bytes) -> "tuple[int, int, 'np.ndarray']":
    """Decode an uncompressed 24-bit 'DIB ' RIFF AVI →
    ``(width, height, (n, h, w, 3) uint8 RGB array)``.  Walks the RIFF
    chunk tree (extra chunks/LISTs are skipped); rejects compressed or
    non-24-bit streams."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            yield cid, pos + 8, clen
            pos += 8 + clen + (clen & 1)

    w = h = None
    frames: list = []

    def scan(lo: int, hi: int) -> None:
        nonlocal w, h
        for cid, off, clen in walk(lo, hi):
            if cid == b"LIST":
                scan(off + 4, off + clen)
            elif cid == b"strf" and w is None:
                (_sz, w_, h_, _pl, bpp, comp) = struct.unpack_from(
                    "<IiiHHI", data, off)
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI: bpp={bpp} compression={comp}")
                w, h = w_, abs(h_)
            elif cid == b"00db":
                frames.append((off, clen))

    scan(12, len(data))
    if w is None or not frames:
        raise ValueError("truncated AVI: missing strf/movi frames")
    stride = (3 * w + 3) // 4 * 4
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (off, clen) in enumerate(frames):
        # Validate each '00db' chunk against the strf geometry BEFORE
        # reading: a truncated or inconsistent AVI would otherwise read
        # bytes from adjacent chunks (clen too small) or die with an
        # opaque numpy buffer error (chunk runs past EOF) instead of
        # the clean ValueError the other malformed paths raise
        # (ADVICE r10).
        if clen < h * stride or off + h * stride > len(data):
            raise ValueError(
                f"truncated AVI frame {i}: chunk len {clen} / "
                f"{len(data) - off} bytes available, need {h * stride}")
        raw = np.frombuffer(data, dtype=np.uint8, count=h * stride,
                            offset=off)
        rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
        out[i] = rows[::-1, :, ::-1]  # bottom-up BGR → top-down RGB
    return w, h, out


def _video_geometry(w: int, h: int, nf: int) -> tuple[int, int, int]:
    """Real-AVI bounded geometry from the md5 draws: 8..32 px frames,
    1..8 frames — bounds the blob like the image/audio caps."""
    return 8 + w % 25, 8 + h % 25, 1 + nf % 8


def _real_pack_one(doc_id: int) -> tuple[str, bytes, int, int, int, int]:
    """Deterministic REAL-format blob per id: same md5 geometry as the
    fake codec (so the DuckDB oracle recomputes it from the id), but the
    bytes are genuine BMP/WAV/AVI that any external decoder reads
    (round 10 closed the video gap with the uncompressed-DIB AVI
    codec).  Images cap at 64×64, audio at 4096 samples, video at
    32×32×8 frames to bound blob size, mirroring the fake codec's cap."""
    import numpy as np

    kind, w, h, sr, nf = _geometry(doc_id)
    if kind == "image":
        w, h = 8 + w % 57, 8 + h % 57  # 8..64: real pixels, bounded bytes
        raw = _payload(doc_id, w * h * 3)
        px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        return kind, encode_bmp(px), w, h, 0, 0
    if kind == "audio":
        n_samples = min(sr // 4, 4096)
        raw = _payload(doc_id, n_samples * 2)
        samples = np.frombuffer(raw, dtype="<i2")
        return kind, encode_wav(samples, sr), 0, 0, sr, 0
    vw, vh, nfr = _video_geometry(w, h, nf)
    raw = _payload(doc_id, nfr * vh * vw * 3)
    fr = np.frombuffer(raw, dtype=np.uint8).reshape(nfr, vh, vw, 3)
    return kind, encode_avi(fr), vw, vh, 0, nfr


def pack_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Like :func:`pack_fake_media` but the blobs are REAL BMP/WAV bytes
    (video remains the fake container).  Geometry is still a pure md5
    function of the id, keeping the decode oracle-checkable."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            packed = [_real_pack_one(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [p[0] for p in packed],
                "media": [p[1] for p in packed],
                "width": pd.Series([p[2] for p in packed], dtype="int32"),
                "height": pd.Series([p[3] for p in packed], dtype="int32"),
                "sample_rate": pd.Series([p[4] for p in packed],
                                         dtype="int32"),
                "n_frames": pd.Series([p[5] for p in packed], dtype="int32"),
            })

    from ..operators.partitioners import scale_out

    # scale out the id column BEFORE the generator: a few-split input
    # otherwise serializes the whole pack->decode chain on one task
    # (mapInPandas preserves partitioning downstream; round-8 finding)
    return scale_out(df.select(id_col), probe=df) \
        .mapInPandas(gen, schema=MEDIA_SCHEMA)


_DECODE_REAL_SCHEMA = ("doc_id long, media_type string, width int, "
                       "height int, sample_rate int, n_samples int, "
                       "n_frames int, n_bytes long, mean_px double")


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode: sniff each blob's container magic (``BM`` → BMP,
    PNG signature → PNG, ``RIFF`` → WAV/AVI, ``FVID`` → fake video)
    and parse it with the NumPy codecs above — metadata comes only
    from the BYTES, never from the sidecar columns.  `mean_px` is the
    mean decoded pixel value / the mean |sample| (true content
    statistics, not header fields).  Undecodable blobs are dropped
    (the malformed-filter P2 analogue)."""
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                try:
                    if blob[:2] == b"BM":
                        w, h, px = decode_bmp(blob)
                        rows.append((int(doc_id), "image", w, h, None, None,
                                     None, len(blob), float(px.mean())))
                    elif blob[:8] == _PNG_SIG:
                        w, h, px = decode_png(blob)
                        rows.append((int(doc_id), "image", w, h, None, None,
                                     None, len(blob), float(px.mean())))
                    elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                        sr, _ch, s = decode_wav(blob)
                        rows.append((int(doc_id), "audio", None, None, sr,
                                     len(s), None, len(blob),
                                     float(np.abs(s.astype(np.int64)).mean())))
                    elif blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                        w, h, fr = decode_avi(blob)
                        rows.append((int(doc_id), "video", w, h, None,
                                     None, len(fr), len(blob),
                                     float(fr.mean())))
                    elif blob[:4] == b"FVID":
                        (nf,) = struct.unpack(">I", blob[4:8])
                        rows.append((int(doc_id), "video", None, None, None,
                                     None, nf, len(blob), None))
                except (ValueError, struct.error):
                    continue
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "width", "height", "sample_rate",
                "n_samples", "n_frames", "n_bytes", "mean_px"])

    return media.select("doc_id", "media").mapInPandas(
        dec, schema=_DECODE_REAL_SCHEMA)


def decode_media_real_sql(ids_table: str, id_col: str = "doc_id") -> str:
    """DuckDB oracle for the REAL pack→decode loop: recompute the
    md5-derived geometry AND the exact container byte length (BMP:
    14+40+h·stride with 4-byte-aligned stride; WAV: 44+2·n_samples;
    AVI: 232+n_frames·(24+stride·h) — headers + per-frame '00db'
    chunk + idx1 entry) from the id alone.  Content stats (`mean_px`)
    are not SQL-reproducible and stay pytest-covered bit-exactly."""
    def h(salt: str) -> str:
        return (f"(('0x' || substr(md5({id_col}::VARCHAR || ':{salt}'), "
                f"1, 8))::BIGINT)")

    kind = (f"(['image', 'audio', 'video'])[({h('kind')} % 3) + 1]")
    w = f"(8 + (16 + {h('w')} % 240) % 57)"
    hh = f"(8 + (16 + {h('h')} % 240) % 57)"
    sr = f"(8000 + ({h('sr')} % 5) * 8000)"
    nf = f"(1 + (1 + {h('f')} % 300) % 8)"
    vw = f"(8 + (16 + {h('w')} % 240) % 25)"
    vh = f"(8 + (16 + {h('h')} % 240) % 25)"
    ns = f"least({sr} // 4, 4096)"
    stride = f"((3 * {w} + 3) // 4 * 4)"
    vstride = f"((3 * {vw} + 3) // 4 * 4)"
    nbytes = (f"CASE WHEN {kind} = 'image' THEN 54 + {hh} * {stride} "
              f"WHEN {kind} = 'audio' THEN 44 + 2 * {ns} "
              f"ELSE 232 + {nf} * (24 + {vstride} * {vh}) END")
    width = (f"CASE WHEN {kind} = 'image' THEN {w} "
             f"WHEN {kind} = 'video' THEN {vw} END")
    height = (f"CASE WHEN {kind} = 'image' THEN {hh} "
              f"WHEN {kind} = 'video' THEN {vh} END")
    return (
        f"SELECT {id_col} AS doc_id, {kind} AS media_type, "
        f"cast({width} as int) AS width, "
        f"cast({height} as int) AS height, "
        f"cast(CASE WHEN {kind} = 'audio' THEN {sr} END as int) "
        f"AS sample_rate, "
        f"cast(CASE WHEN {kind} = 'audio' THEN {ns} END as int) "
        f"AS n_samples, "
        f"cast(CASE WHEN {kind} = 'video' THEN {nf} END as int) AS n_frames, "
        f"cast({nbytes} as bigint) AS n_bytes "
        f"FROM {ids_table}"
    )


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode — resolved: BMP blobs are decoded by the
    dependency-free NumPy codec (:func:`decode_bmp`) via
    :func:`decode_media_real`; no imaging library needed.  Kept as the
    image-only projection of the mixed-modality decode."""
    return decode_media_real(media).where("media_type = 'image'")


def ahash64(pixels: "np.ndarray") -> int:
    """64-bit average-hash (aHash) of an ``(h, w, 3)`` uint8 RGB array
    — the classic perceptual image fingerprint: 8×8 nearest-neighbour
    downsample of the integer grayscale ``(r+g+b)//3``, each cell's
    bit set iff its value ≥ the floor-mean of the 64 cells.  All
    integer arithmetic → bit-identical on any platform.  Bit (row r,
    col c) is ``63 − (8r + c)``; returned as a non-negative int
    (callers store it in a BIGINT via the signed wrap)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    gray = px.astype(np.int64).sum(axis=2) // 3
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(8) * w) // 8
    cells = gray[np.ix_(ri, ci)]
    mean = int(cells.sum()) // 64
    bits = (cells >= mean).astype(np.uint64).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_ahash(media: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Perceptual fingerprints for the image rows of a real-format
    media frame: decode each BMP or PNG and emit its :func:`ahash64`
    — the near-dup blocking key for image dedup (equal hashes ⇒
    candidate pair; Hamming distance ranks near-misses).  Non-image
    and undecodable rows are dropped.  Output: ``(id_col, ahash)``
    with the hash as a signed BIGINT (the unsigned 64-bit value
    wrapped).  The hash is computed on decoded PIXELS, so the same
    image stored as BMP and as PNG collides — cross-container image
    dedup works by construction.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, blob in zip(pdf[id_col], pdf["media"]):
                blob = bytes(blob)
                try:
                    if blob[:2] == b"BM":
                        _w, _h, px = decode_bmp(blob)
                    elif blob[:8] == _PNG_SIG:
                        _w, _h, px = decode_png(blob)
                    else:
                        continue
                except (ValueError, struct.error):
                    continue
                ids.append(int(doc_id))
                h = ahash64(px)
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "ahash": pd.Series(hashes, dtype="int64")})

    return media.select(id_col, "media").mapInPandas(
        fn, schema=f"{id_col} long, ahash long")


def hamming64(a: Column, b: Column) -> Column:
    """Column expr: Hamming distance between two 64-bit hashes stored
    as signed BIGINTs (XOR then popcount via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def sample_frames_real(media: DataFrame, every_k: int = 10, *,
                       id_col: str = "doc_id") -> DataFrame:
    """REAL video frame sampling (round 10 — the real-codec analogue of
    :func:`sample_frames`): decode each RIFF-AVI blob with
    :func:`decode_avi` and emit every k-th DECODED frame with its
    :func:`ahash64` perceptual fingerprint — the flatMap shape of a
    production frame-extraction stage, with the fingerprint computed
    from actual pixels (scene-dedup blocking key), not a stand-in
    hash.  Non-video and undecodable rows are dropped.  Output:
    ``(id_col, frame_idx, n_frames, frame_ahash)``; `frame_ahash` is
    the signed-BIGINT wrap of the unsigned hash."""
    def smp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, nfs, hs = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf["media"]):
                blob = bytes(blob)
                if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
                    continue
                try:
                    _w, _h, fr = decode_avi(blob)
                except (ValueError, struct.error):
                    continue
                for fi in range(0, len(fr), every_k):
                    a = ahash64(fr[fi])
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    nfs.append(len(fr))
                    hs.append(a - (1 << 64) if a >= (1 << 63) else a)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_frames": pd.Series(nfs, dtype="int32"),
                "frame_ahash": pd.Series(hs, dtype="int64")})

    return media.select(id_col, "media").mapInPandas(
        smp, schema=f"{id_col} long, frame_idx int, n_frames int, "
                    f"frame_ahash long")


def sample_frames_real_sql(ids_table: str, every_k: int = 10,
                           id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`sample_frames_real` MINUS the content
    fingerprint (pixel hashes are pytest-covered bit-exactly, like
    `mean_px`): recompute which ids are video, their real-AVI frame
    count (1..8), and the sampled frame indices from the id alone."""
    def h(salt: str) -> str:
        return (f"(('0x' || substr(md5(t.{id_col}::VARCHAR || ':{salt}'), "
                f"1, 8))::BIGINT)")

    kind = f"(['image', 'audio', 'video'])[({h('kind')} % 3) + 1]"
    nf = f"(1 + (1 + {h('f')} % 300) % 8)"
    return (
        f"SELECT t.{id_col} AS {id_col}, CAST(j AS INT) AS frame_idx, "
        f"CAST({nf} AS INT) AS n_frames "
        f"FROM {ids_table} t "
        f"CROSS JOIN (SELECT range AS j FROM range(0, 8)) "
        f"WHERE {kind} = 'video' AND j < {nf} AND j % {every_k} = 0"
    )
