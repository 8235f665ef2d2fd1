"""Multimodal (image/audio/video) columns for training-data pipelines.

Design (brief §"Multimodal columns"): media rides as an opaque ``binary``
column plus a typed metadata struct; decode / feature-extract / resize /
frame-sample are Arrow-batched ``mapInPandas`` stages so a 100 TB corpus
streams through Python in columnar batches without ever materializing
rows on the driver.

This container has no image/audio libraries, so the *codec* is a
deterministic fake (`FIMG`/`FAUD`/`FVID` packets whose geometry derives
from md5(doc_id)); the real-library path is stubbed behind
``decode_image_real`` (NotImplementedError, clearly marked).  Everything
Spark-side — schema, batch iteration, UDF signatures, partition safety —
is real and tested.  The fake geometry is reproducible from the id alone,
which is what lets the DuckDB oracle check the full pack→decode loop.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_SCHEMA",
    "pack_fake_media",
    "decode_media",
    "decode_media_sql",
    "resize_images",
    "sample_frames",
    "audio_features",
    "decode_image_real",
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

    return df.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


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


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode via PIL — STUB: the container ships no imaging
    libraries.  Swap `_MAGIC`-fake parsing for `PIL.Image.open` here when
    deploying somewhere with `pillow`; the mapInPandas contract is
    identical to :func:`decode_media`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs pillow; use decode_media (fake codec) "
            "in this environment") from exc
    raise NotImplementedError("real decode path not implemented yet")
