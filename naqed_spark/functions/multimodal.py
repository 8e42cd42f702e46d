"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` payload columns with a typed
metadata struct alongside (SURVEY.md §2-K `llm_multimodal_struct` /
`llm_multimodal_binary`). Decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas`` — one Python
process per partition, media bytes never widened into JVM rows, schema and
batch shape identical to what a real decoder would use.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this container, so
`decode_image` raises ``NotImplementedError`` unless PIL is importable, and
the pipeline runs `fake_features` — a deterministic stand-in with the same
signature and output schema, so the Spark-side plumbing (partitioning, UDF
boundary, schema) is fully real and tested.

At 100 TB: payloads dominate storage — keep them in their own parquet column
(columnar pruning skips them unless selected), size
`spark.sql.files.maxPartitionBytes` so one partition's payloads fit executor
memory, and never collect payload columns to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, n_frames long, feat_hash long"
)

try:  # pragma: no cover - PIL absent in this container by design
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def decode_image(payload: bytes):
    """Real decode path (requires PIL). STUB in this environment."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_features for the "
            "deterministic test path"
        )
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_features(doc_id: int, payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic decode stand-in: byte length, first byte, a 256-byte
    'frame sample' count, and a multiplicative feature hash — everything a
    real extractor's harness needs, with none of the codecs."""
    if payload is None:
        # a missing payload (failed fetch, pruned media) carries NULL
        # features — never a crash; real decoders hit this constantly
        return (doc_id, None, None, None, None)
    n = len(payload)
    return (
        doc_id,
        n,
        payload[0] if n else -1,
        1 + n // 256,
        (n * 2654435761) % 1000003,
    )


def extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) -> FEATURE_SCHEMA rows."""
    for pdf in batches:
        if pdf.empty:
            continue
        rows = [
            fake_features(i, p) for i, p in zip(pdf["doc_id"], pdf["payload"])
        ]
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "first_byte", "n_frames", "feat_hash"],
        )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int, frame_md5 string"
FRAME_LEN = 32  # bytes per sampled frame
FRAME_STRIDE = 64  # byte stride between frame starts
MAX_FRAMES = 4  # sample at most this many frames per payload


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) -> FRAME_SCHEMA rows.

    The frame-sample plumbing of a video pipeline: strided fixed-length
    byte windows of the payload, one row per sampled frame, fingerprinted
    (a real sampler would decode the frame here instead of hashing it).
    Payloads shorter than one frame emit no rows."""
    import hashlib

    import numpy as np

    for pdf in batches:
        if pdf.empty:
            continue
        ids, idxs, offs, digs = [], [], [], []
        for i, p in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(p)
            for k in range(MAX_FRAMES):
                off = k * FRAME_STRIDE
                if off + FRAME_LEN > len(p):
                    break
                ids.append(i)
                idxs.append(k)
                offs.append(off)
                digs.append(hashlib.md5(p[off:off + FRAME_LEN]).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_idx": np.asarray(idxs, dtype=np.int32),
                "frame_off": np.asarray(offs, dtype=np.int32),
                "frame_md5": digs,
            }
        )
