"""Multimodal (image/audio/video) columns — real Ray plumbing, stubbed codecs.

Treats media as opaque ``binary`` payload columns with typed metadata,
processed by actor-pool ``map_batches`` stages (small batches — payloads are
large), exactly the layout a 100 TB media pipeline needs.  The container
ships no image/audio libraries, so:

- a deterministic toy codec ``RAW1`` (header ``RAW1 | u16 w | u16 h | u8 c``
  + raw pixels) exercises the full decode -> transform -> feature path with
  real bytes;
- real formats (JPEG/PNG/WAV/...) raise a clearly-marked
  ``NotImplementedError`` in ``decode_payload`` — the schema, batch sizing,
  actor signatures and output layout around them are the real deliverable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAGIC = b"RAW1"


# ---- toy codec -------------------------------------------------------------


def encode_raw1(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return (
        MAGIC
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + int(c).to_bytes(1, "little")
        + arr.astype(np.uint8).tobytes()
    )


def decode_payload(payload: bytes) -> np.ndarray:
    """Decode a media payload to an (h, w, c) uint8 array.

    Only the deterministic ``RAW1`` toy format is implemented in this
    container; real codecs are stubbed.
    """
    if payload[:4] == MAGIC:
        w = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        c = payload[8]
        return np.frombuffer(payload, np.uint8, count=h * w * c, offset=9).reshape(
            h, w, c
        )
    raise NotImplementedError(
        "real media codecs (JPEG/PNG/WAV) are unavailable in this container — "
        "STUB: plug a decoder in here; the surrounding Ray pipeline is real"
    )


# ---- synthetic media table -------------------------------------------------


def synth_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic media table: (media_id, kind, width, height, channels,
    n_frames, payload).  Video payloads are n_frames concatenated RAW1
    frames."""
    ids, kinds, ws, hs, cs, nfs, payloads = [], [], [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng([seed, 7, i])
        w, h = int(rng.integers(16, 65)), int(rng.integers(16, 65))
        c = 3
        nf = int(rng.integers(4, 17)) if kind == "video" else 1
        frames = [
            encode_raw1(rng.integers(0, 256, (h, w, c)).astype(np.uint8))
            for _ in range(nf)
        ]
        ids.append(i)
        kinds.append(kind)
        ws.append(w)
        hs.append(h)
        cs.append(c)
        nfs.append(nf)
        payloads.append(b"".join(frames))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "n_frames": pa.array(nfs, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _split_frames(payload: bytes) -> list[bytes]:
    out = []
    off = 0
    view = memoryview(payload)
    while off < len(view):
        assert bytes(view[off:off + 4]) == MAGIC
        w = int.from_bytes(view[off + 4:off + 6], "little")
        h = int.from_bytes(view[off + 6:off + 8], "little")
        c = view[off + 8]
        size = 9 + w * h * c
        out.append(bytes(view[off:off + size]))
        off += size
    return out


# ---- actor-pool stages -----------------------------------------------------


class DecodeFeatures:
    """payload batch -> per-media features (mean/std/byte-histogram-hash).

    Stateful stage shape: a real model would load in ``__init__``; small
    ``batch_size`` because payloads are large binary cells.
    """

    def __init__(self):
        self.bins = np.arange(0, 257, 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, hhash = [], [], []
        for payload in batch["payload"].to_pylist():
            frame = decode_payload(_split_frames(payload)[0])
            means.append(float(frame.mean()))
            stds.append(float(frame.std()))
            hist, _ = np.histogram(frame, bins=self.bins)
            hhash.append(int(hist.astype(np.uint64).sum() % (1 << 31)))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mean_px": pa.array(means, pa.float64()),
                "std_px": pa.array(stds, pa.float64()),
                "hist_hash": pa.array(hhash, pa.int64()),
            }
        )


class Resize:
    """Nearest-neighbor resize to max_side (deterministic, stride-sampled)."""

    def __init__(self, max_side: int = 32):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, out_w, out_h = [], [], []
        for payload in batch["payload"].to_pylist():
            frame = decode_payload(_split_frames(payload)[0])
            h, w, _ = frame.shape
            scale = max(h, w) / self.max_side
            if scale > 1:
                ys = (np.arange(int(h / scale)) * scale).astype(int)
                xs = (np.arange(int(w / scale)) * scale).astype(int)
                frame = frame[ys][:, xs]
            out_payload.append(encode_raw1(frame))
            out_h.append(frame.shape[0])
            out_w.append(frame.shape[1])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "payload": pa.array(out_payload, pa.binary()),
            }
        )


class FrameSample:
    """Every k-th frame of a video payload -> one row per sampled frame."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            fs = _split_frames(payload)
            for j in range(0, len(fs), self.k):
                ids.append(mid)
                fidx.append(j)
                frames.append(fs[j])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


# ---- pipelines -------------------------------------------------------------


def media_features(sf_dir: str, n: int = 200):
    """Image pipeline: synth table -> decode+features actor pool.

    Returns the streaming Dataset — callers consume with iter_batches /
    write_parquet; nothing materializes on the driver.
    """
    import ray.data

    from ..util import stage_fn

    ds = ray.data.from_arrow(synth_media_table(n, kind="image"))
    return ds.map_batches(
        stage_fn(DecodeFeatures), batch_format="pyarrow", batch_size=32
    )


def video_frame_sample(sf_dir: str, n: int = 64):
    """Video pipeline: synth videos -> frame-sample -> per-frame metadata.

    Returns the streaming Dataset of (media_id, frame_idx, frame_bytes);
    the byte-size projection runs inside map_batches (zero-copy Arrow
    value_lengths), not on the driver.
    """
    import ray.data

    from ..util import stage_fn

    def frame_meta(batch: pa.Table) -> pa.Table:
        col = batch["frame"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sizes = pa.compute.binary_length(col).cast(pa.int64())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "frame_bytes": sizes,
            }
        )

    ds = ray.data.from_arrow(synth_media_table(n, kind="video"))
    return ds.map_batches(
        stage_fn(FrameSample), batch_format="pyarrow", batch_size=16
    ).map_batches(frame_meta, batch_format="pyarrow")


def media_consistency(sf_dir: str):
    """Golden pinning for the (non-SQL-expressible) media pipelines: the
    synthetic payloads are seed-deterministic, so these aggregate
    invariants are constants — the oracle inlines them as VALUES, turning
    both rows-only media paths into a hash-checked row.

    (n_images, hist_hash_sum, n_sampled_frames, frame_bytes_sum)
    """
    from ray.data.aggregate import Count, Sum

    f = media_features(sf_dir).aggregate(
        Count(alias_name="n_images"), Sum("hist_hash", alias_name="hist_hash_sum")
    )
    v = video_frame_sample(sf_dir).aggregate(
        Count(alias_name="n_sampled_frames"),
        Sum("frame_bytes", alias_name="frame_bytes_sum"),
    )
    return pa.table(
        {
            "n_images": pa.array([int(f["n_images"])], pa.int64()),
            "hist_hash_sum": pa.array([int(f["hist_hash_sum"])], pa.int64()),
            "n_sampled_frames": pa.array([int(v["n_sampled_frames"])], pa.int64()),
            "frame_bytes_sum": pa.array([int(v["frame_bytes_sum"])], pa.int64()),
        }
    )


def media_consistency_sql_oracle() -> str:
    # golden constants of the seed-42 synthetic media tables (see
    # media_consistency docstring)
    return """
        SELECT CAST(200 AS BIGINT) AS n_images,
               CAST(943404 AS BIGINT) AS hist_hash_sum,
               CAST(171 AS BIGINT) AS n_sampled_frames,
               CAST(857982 AS BIGINT) AS frame_bytes_sum
    """
