"""Multimodal column plumbing (SURVEY.md §2.C C5).

Images/audio/video are opaque ``binary`` columns plus typed metadata; the
heavy per-item work (decode, resize, feature-extract, frame-sample) runs
as Arrow-batched ``mapInPandas`` stages so executors stream record
batches through Python without per-row overhead.

The default codecs are STUBBED: this container has no media libraries,
so ``decode_image`` raises ``NotImplementedError`` unless a decoder
callable is injected (tests inject a deterministic fake). One REAL codec
ships pure-stdlib: ``functions/png_codec.py`` (minimal PNG from the
public spec — zlib + struct only) plugs in as
``decode_features(df, decoder=png_codec.png_decoder)`` /
``resize_stage(df, n, resizer=png_codec.png_resizer)`` and is tested end
to end on real PNG bytes. Everything Spark-side — schemas, batch
iteration, partitioning by payload size, UDF signatures — is real and
tested; swapping in Pillow/ffmpeg is a pure Python change invisible to
the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# schema of a decoded-feature row; the contract between decode stages
FEATURE_SCHEMA = (
    "item_id long, mime string, n_bytes int, width int, height int, feature_norm double"
)


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode an image payload -> (width, height, feature vector).

    STUB: no media libs in this environment. Inject a decoder via
    ``decode_features(..., decoder=...)`` or monkeypatch this function.
    """
    raise NotImplementedError(
        "image decoding requires a media library (e.g. Pillow); "
        "inject a decoder callable instead"
    )


def fake_decoder(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder for tests: derives a 4-dim 'feature'
    from payload bytes. Same shape/contract as a real decoder."""
    n = len(payload)
    w, h = (n % 64) + 1, (n % 48) + 1
    feat = [float(payload[i % n]) / 255.0 if n else 0.0 for i in range(4)]
    return w, h, feat


def to_multimodal(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a source column as an opaque binary payload + metadata —
    the storage schema for media columns."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("item_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
    )


def decode_features(
    df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """The decode/feature-extract stage: mapInPandas over payload batches.

    Each Arrow batch is decoded in Python; output is a typed feature row
    per item. At scale, repartition by expected payload size first so
    batches are even and executor memory is bounded.
    """
    decode = decoder or decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload, mime in zip(pdf["item_id"], pdf["payload"], pdf["mime"]):
                if payload is None:
                    continue  # NULL asset: nothing to decode
                w, h, feat = decode(bytes(payload))
                norm = sum(x * x for x in feat) ** 0.5
                rows.append((item_id, mime, len(payload), w, h, norm))
            yield pd.DataFrame(
                rows,
                columns=["item_id", "mime", "n_bytes", "width", "height", "feature_norm"],
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stage(
    df: DataFrame,
    target_bytes: int,
    resizer: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """The resize/transcode stage: payload -> smaller payload, metadata
    updated in place. Runs as mapInPandas so a real transcoder (Pillow
    thumbnail, ffmpeg scale) drops in without touching the plan. The
    default stand-in truncates — deterministic and library-free."""
    shrink = resizer or (lambda b, n: b[:n])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                None if p is None else bytes(shrink(bytes(p), target_bytes))
                for p in pdf["payload"]
            ]
            out["n_bytes"] = [
                None if p is None else len(p) for p in out["payload"]
            ]
            yield out

    return df.mapInPandas(run, schema="item_id long, payload binary, mime string, n_bytes int")


def audio_energy_stage(
    df: DataFrame, frame: int = 256, hop: int = 128
) -> DataFrame:
    """The audio feature-extraction stage (decode → overlapping analysis
    windows → per-window energy): a 1→N mapInPandas explosion emitting
    one row per hop-spaced window. 'Decode' here treats the payload as
    8-bit PCM samples (the deterministic stand-in for a soundfile/ffmpeg
    decoder, which this container lacks); energy is the integer
    sum((s-128)^2) over the window, so the oracle restates it exactly.
    The batch shape — decode and window entirely inside Arrow batches,
    partial trailing windows included — is what must hold at 100 TB."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, energies = [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL asset: no samples, no windows
                s = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(s)
                i = 0
                while i * hop < n:
                    w = s[i * hop : i * hop + frame]
                    ids.append(item_id)
                    idxs.append(i)
                    lens.append(len(w))
                    energies.append(int(((w - 128) ** 2).sum()))
                    i += 1
            yield pd.DataFrame(
                {"item_id": ids, "win_idx": idxs, "n_samples": lens, "energy": energies}
            )

    return df.mapInPandas(
        run, schema="item_id long, win_idx int, n_samples int, energy long"
    )


def sample_frames(df: DataFrame, frame_size: int = 32, stride: int = 2) -> DataFrame:
    """The frame-sampling stage (video → every ``stride``-th frame): a
    1→N mapInPandas explosion emitting one row per sampled frame with a
    content digest. Frames here are fixed-size payload slices — the
    deterministic stand-in for a real demuxer; the batch shape (explode
    inside Arrow batches, no driver involvement) is the part that has to
    be right at 100 TB."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, digests = [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL asset: no frames
                b = bytes(payload)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    ids.append(item_id)
                    idxs.append(i)
                    lens.append(len(fr))
                    digests.append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(
                {"item_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_sha": digests}
            )

    return df.mapInPandas(
        run, schema="item_id long, frame_idx int, frame_len int, frame_sha string"
    )


def make_avghash_udf(n_bands: int, n_pixels: int = 64):
    """Arrow-batched average-hash: text payload -> n_bands packed
    sign-bit integers of (n_pixels/n_bands) bits. The exact integer
    mirror of retrieval_ext's Column-expression builder and its DuckDB
    oracle (64 evenly-spaced codepoint samples, mean threshold,
    MSB-first pack) — property-tested equal in tests/test_retrieval_ext.

    This is the hot path: the nested higher-order Column expression
    evaluates INTERPRETED (it falls out of whole-stage codegen) and,
    worse, un-materialized hash columns get inlined into the band-join
    predicate and recomputed per candidate pair — measured ~20x the
    total query time at sf0.1. The Arrow stage materializes the eight
    ints once per row, exactly like the minhash pipeline
    (functions/text.py)."""
    from pyspark.sql.types import ArrayType, IntegerType

    bits = n_pixels // n_bands

    @F.pandas_udf(ArrayType(IntegerType()))
    def avghash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:  # NULL payload -> empty-payload hash (all-zero bands)
                t = ""
            n = len(t)
            if n == 0:
                px = [0] * n_pixels
            else:
                px = [ord(t[(i * n) // n_pixels]) for i in range(n_pixels)]
            mean = sum(px) / float(n_pixels)
            hs = []
            for b in range(n_bands):
                acc = 0
                for x in px[b * bits : (b + 1) * bits]:
                    acc = acc * 2 + (1 if x > mean else 0)
                hs.append(acc)
            out.append(hs)
        return pd.Series(out)

    return avghash
