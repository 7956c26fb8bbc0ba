"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The decode step itself is STUBBED — Pillow/ffmpeg are not in this
container (reference analogue: content_type_images, playwrightcrawler.py:
3771-3939, which needs PIL). What IS real and tested here is everything
Spark-side: schemas, the mapInPandas batch shape, partition sizing, and a
deterministic fallback "decoder" so the pipeline runs end-to-end. On a
real cluster you flip ``decoder=`` to a PIL/ffmpeg callable and nothing
else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resolution", T.LongType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("decode_error", T.StringType()),
])


def real_decode(payload: bytes) -> tuple[int, int]:
    """The production decode hook. Requires PIL — not available here."""
    raise NotImplementedError(
        "image decode requires Pillow; not installed in this sandbox. "
        "Pass decoder=fake_decode for the deterministic test path."
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: derives a stable (width, height) from the
    payload hash so tests exercise the full plumbing repeatably."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def extract_media_metadata(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "html",
    media_type: str = "image",
    decoder: Callable[[bytes], tuple[int, int]] = real_decode,
) -> DataFrame:
    """mapInPandas over (url, payload): hashes + byte counts always; width/
    height via the decode hook, errors captured per-row not per-task (the
    reference's per-image error taxonomy, :3896-3930)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = {
                    "url": url,
                    "media_type": media_type,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                    "width": None,
                    "height": None,
                    "resolution": None,
                    "decode_ok": False,
                    "decode_error": None,
                }
                try:
                    w, h = decoder(payload)
                    meta.update(width=w, height=h, resolution=w * h, decode_ok=True)
                except NotImplementedError as e:
                    meta["decode_error"] = "decoder_unavailable"
                except Exception as e:  # corrupt payloads must not kill tasks
                    meta["decode_error"] = type(e).__name__
                rows.append(meta)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(url_col, bin_col).mapInPandas(process, MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, ts_col: str = "warc_ts") -> DataFrame:
    """Video frame-sampling *plan* (which frames to pull) as pure SQL —
    the decode of those frames is the stubbed step."""
    return df.withColumn(
        "sample_frames",
        F.sequence(F.lit(0), F.lit(every_n * 9), F.lit(every_n)),
    )
