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


# ---- perceptual-hash dedup ---------------------------------------------


def synth_media_with_dups(
    n: int = 200, n_dups: int = 8, seed: int = 42
) -> pa.Table:
    """The seed-deterministic image table plus ``n_dups`` planted
    near-duplicate rows: dup i copies image (i * 7) % n with a +-1
    perturbation on ~1%% of its pixels (media_id = n + i) — close enough
    that a perceptual hash must link the pair."""
    base = synth_media_table(n, seed=seed, kind="image")
    rows = {c: base[c].to_pylist() for c in base.column_names}
    for i in range(n_dups):
        src = (i * 7) % n
        frame = decode_payload(rows["payload"][src]).astype(np.int16)
        rng = np.random.default_rng([seed, 99, i])
        mask = rng.random(frame.shape) < 0.01
        noise = rng.integers(-1, 2, frame.shape, dtype=np.int16)
        frame = np.clip(frame + mask * noise, 0, 255).astype(np.uint8)
        rows["media_id"].append(n + i)
        rows["kind"].append("image")
        rows["width"].append(frame.shape[1])
        rows["height"].append(frame.shape[0])
        rows["channels"].append(frame.shape[2])
        rows["n_frames"].append(1)
        rows["payload"].append(encode_raw1(frame))
    return pa.table(
        {c: pa.array(rows[c], base.schema.field(c).type) for c in base.column_names}
    )


def ahash64(frame: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 box-mean -> bit per cell
    (cell mean > mean of the 64 cell means).  Pure numpy, deterministic."""
    gray = frame.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.round(np.linspace(0, h, 9)).astype(int)
    xs = np.round(np.linspace(0, w, 9)).astype(int)
    cells = np.empty((8, 8), np.float64)
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    return int(np.packbits(bits).view(">u8")[0])


PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3


class _AHashStage:
    """payload batch -> (media_id, band, band_val, ahash) x 4 rows — the
    16-bit-band pigeonhole blocking of ``simhash_dedup`` applied to image
    average-hashes (Hamming <= 3 over 64 bits guarantees one exact band
    match, so blocking recall is 1)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, bvals, hashes = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            hv = ahash64(decode_payload(_split_frames(payload)[0]))
            for b in range(PHASH_BANDS):
                ids.append(mid)
                bands.append(b)
                bvals.append((hv >> (16 * b)) & 0xFFFF)
                hashes.append(hv)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_val": pa.array(bvals, pa.int32()),
                "ahash": pa.array(np.array(hashes, np.uint64).view(np.int64)),
            }
        )


def media_phash_dedup(
    sf_dir: str, n: int = 200, n_dups: int = 8, max_hamming: int = PHASH_MAX_HAMMING
):
    """Near-duplicate IMAGE pairs by perceptual hash: (a, b, hamming) for
    every pair with Hamming(ahash) <= max_hamming, a < b.

    Same shuffle shape as ``dedup.simhash_dedup`` — per-image signing is an
    actor-pool map (codec state in the stage), blocking is a 4x16-bit band
    groupby (full recall at Hamming <= 3 by pigeonhole), the in-bucket
    verify is the exact 64-bit XOR popcount, and a final distinct collapses
    pairs that collide in several bands.  Only (band_val, media_id, ahash)
    rows — 24 bytes — cross the shuffle; payload bytes never do.
    """
    import ray.data

    from ..util import stage_fn

    def bucket_pairs(group: pa.Table) -> pa.Table:
        from ..functions.minhash import hamming64

        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = group["media_id"].to_numpy(zero_copy_only=False)
        hv = group["ahash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids)
        ids, hv = ids[order], hv[order]
        keep_first = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ids, hv = ids[keep_first], hv[keep_first]
        if len(ids) < 2:
            return empty
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = hamming64(hv[ii], hv[jj])
        sel = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[ii][sel], pa.int64()),
                "b": pa.array(ids[jj][sel], pa.int64()),
                "hamming": pa.array(ham[sel], pa.int64()),
            }
        )

    ds = ray.data.from_arrow(synth_media_with_dups(n, n_dups))
    pairs = (
        ds.map_batches(stage_fn(_AHashStage), batch_format="pyarrow", batch_size=32)
        .groupby(["band", "band_val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair collides in up to 4 bands — collapse to distinct rows (the
    # house pairs_table collect: pair results are the caller-facing output)
    from ..util import pairs_table

    return pairs_table(pairs, extra_cols=("hamming",))


def media_phash_dedup_sql_oracle() -> str:
    # golden rows of the seed-42 planted-duplicate table (the payloads are
    # not SQL-decodable): each planted variant i (media_id 200 + i) links
    # back to its source (i * 7) %% 200 at Hamming 0, and no other pair
    # collides; brute-force all-pairs equality and planted recall are
    # pinned in tests/test_pipelines.py::
    # test_media_phash_dedup_planted_and_bruteforce
    rows = ", ".join(f"({(i * 7) % 200}, {200 + i}, 0)" for i in range(8))
    return f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(hamming AS BIGINT) AS hamming
        FROM (VALUES {rows}) t(a, b, hamming)
    """


def media_features_sql_oracle(n: int = 200) -> str:
    """ROW-LEVEL oracle for :func:`media_features`: the synthetic media
    table is seed-deterministic and sf-independent, so the expected
    (media_id, mean_px, std_px, hist_hash) rows are recomputed HERE, at
    oracle-build time, by an independent driver-side pass over the same
    payloads, and inlined as VALUES — pinning the distributed actor-pool
    decode+feature path row for row (doubles inlined via string->DOUBLE
    casts, which round-trip exactly; numeric literals would parse as
    DECIMAL and lose bits)."""
    bins = np.arange(0, 257, 16)
    t = synth_media_table(n, kind="image")
    rows = []
    for mid, payload in zip(
        t["media_id"].to_pylist(), t["payload"].to_pylist()
    ):
        fr = decode_payload(_split_frames(payload)[0])
        hist, _ = np.histogram(fr, bins=bins)
        rows.append(
            f"({mid}, CAST('{float(fr.mean())!r}' AS DOUBLE),"
            f" CAST('{float(fr.std())!r}' AS DOUBLE),"
            f" {int(hist.astype(np.uint64).sum() % (1 << 31))})"
        )
    values = ",\n               ".join(rows)
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id, mean_px, std_px,
               CAST(hist_hash AS BIGINT) AS hist_hash
        FROM (VALUES {values})
             v(media_id, mean_px, std_px, hist_hash)
    """


def video_frame_sample_sql_oracle(n: int = 64, every_k: int = 4) -> str:
    """ROW-LEVEL oracle for :func:`video_frame_sample`: expected rows are
    derived from the seed-deterministic per-video METADATA only (w, h,
    n_frames) — frame_idx enumerates every k-th frame and frame_bytes is
    the RAW1 framing arithmetic 9 + w*h*3 — so the SQL independently pins
    the distributed frame-split/sample/length path without touching the
    engine's splitter."""
    t = synth_media_table(n, kind="video")
    rows = []
    for mid, nf, w, h in zip(
        t["media_id"].to_pylist(),
        t["n_frames"].to_pylist(),
        t["width"].to_pylist(),
        t["height"].to_pylist(),
    ):
        for j in range(0, nf, every_k):
            rows.append(f"({mid}, {j}, {9 + w * h * 3})")
    values = ",\n               ".join(rows)
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(frame_bytes AS BIGINT) AS frame_bytes
        FROM (VALUES {values}) v(media_id, frame_idx, frame_bytes)
    """


# ---- audio (PCM toy codec) -------------------------------------------------

PCM_MAGIC = b"PCMA"


def encode_pcma(samples: np.ndarray, rate: int, channels: int) -> bytes:
    """Toy PCM container: ``PCMA | u32 rate | u16 ch | u32 n | int16 LE``
    interleaved samples — the audio sibling of RAW1 (real WAV/MP3/FLAC
    decoding is stubbed in :func:`decode_payload`; this deterministic
    container exercises the full decode -> feature path with real bytes)."""
    s = np.ascontiguousarray(samples.astype("<i2"))
    n = len(s) // channels
    return (
        PCM_MAGIC
        + int(rate).to_bytes(4, "little")
        + int(channels).to_bytes(2, "little")
        + int(n).to_bytes(4, "little")
        + s.tobytes()
    )


def decode_pcma(payload: bytes) -> tuple[np.ndarray, int, int]:
    """-> (interleaved int16 samples, rate, channels)."""
    if payload[:4] != PCM_MAGIC:
        raise NotImplementedError(
            "real audio codecs (WAV/MP3/FLAC) are unavailable in this "
            "container — STUB: plug a decoder in here; the surrounding Ray "
            "pipeline is real"
        )
    rate = int.from_bytes(payload[4:8], "little")
    ch = int.from_bytes(payload[8:10], "little")
    n = int.from_bytes(payload[10:14], "little")
    samples = np.frombuffer(payload, "<i2", count=n * ch, offset=14)
    return samples, rate, ch


def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic audio table: (media_id, kind, sample_rate, channels,
    n_samples, payload)."""
    rates = [8000, 16000, 44100]
    ids, rs, cs, ns, payloads = [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng([seed, 11, i])
        rate = rates[int(rng.integers(0, len(rates)))]
        ch = int(rng.integers(1, 3))
        nsamp = int(rng.integers(1_000, 8_001))
        samples = rng.integers(-32768, 32768, nsamp * ch).astype(np.int16)
        ids.append(i)
        rs.append(rate)
        cs.append(ch)
        ns.append(nsamp)
        payloads.append(encode_pcma(samples, rate, ch))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "sample_rate": pa.array(rs, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "n_samples": pa.array(ns, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class AudioFeatures:
    """payload batch -> integer-exact per-clip features: duration,
    peak amplitude, channel-0 zero crossings, total energy.

    Actor-pool stage shape like :class:`DecodeFeatures`; every feature is
    an integer so the oracle comparison is exact (no float tolerance)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, peak, zc, energy = [], [], [], []
        for payload in batch["payload"].to_pylist():
            samples, rate, ch = decode_pcma(payload)
            s = samples.astype(np.int64)
            n = len(s) // ch
            dur.append(n * 1_000_000 // rate)
            peak.append(int(np.abs(s).max(initial=0)))
            c0 = s[::ch]
            zc.append(int(((c0[1:] >= 0) != (c0[:-1] >= 0)).sum()))
            energy.append(int((s * s).sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_us": pa.array(dur, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "zero_crossings": pa.array(zc, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
            }
        )


def audio_features(sf_dir: str, n: int = 200):
    """Audio pipeline: synth PCM table -> decode+features actor pool.
    Returns the streaming Dataset (consume with iter_batches /
    write_parquet) — the audio sibling of :func:`media_features`."""
    import ray.data

    from ..util import stage_fn

    ds = ray.data.from_arrow(synth_audio_table(n))
    return ds.map_batches(
        stage_fn(AudioFeatures), batch_format="pyarrow", batch_size=32
    )


def audio_features_sql_oracle(n: int = 200) -> str:
    """ROW-LEVEL oracle for :func:`audio_features`: expected rows are
    recomputed HERE by an independent numpy pass over the same
    seed-deterministic payloads and inlined as VALUES — every feature is
    integer, so the driver comparison is exact."""
    t = synth_audio_table(n)
    rows = []
    for mid, payload in zip(
        t["media_id"].to_pylist(), t["payload"].to_pylist()
    ):
        rate = int.from_bytes(payload[4:8], "little")
        ch = int.from_bytes(payload[8:10], "little")
        nsamp = int.from_bytes(payload[10:14], "little")
        s = np.frombuffer(payload, "<i2", count=nsamp * ch, offset=14).astype(
            np.int64
        )
        c0 = s[::ch]
        rows.append(
            "({}, {}, {}, {}, {})".format(
                mid,
                nsamp * 1_000_000 // rate,
                int(np.abs(s).max(initial=0)),
                int(((c0[1:] >= 0) != (c0[:-1] >= 0)).sum()),
                int((s * s).sum()),
            )
        )
    values = ",\n               ".join(rows)
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(duration_us AS BIGINT) AS duration_us,
               CAST(peak AS BIGINT) AS peak,
               CAST(zero_crossings AS BIGINT) AS zero_crossings,
               CAST(energy AS BIGINT) AS energy
        FROM (VALUES {values})
             v(media_id, duration_us, peak, zero_crossings, energy)
    """
