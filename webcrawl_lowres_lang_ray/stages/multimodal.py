"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
``media_type`` string and a ``meta`` JSON string — the same shape the crawl
uses for ``html:binary``.  The Ray-side plumbing (schemas, small batch
sizes for wide rows, actor-pool stage signatures, output layout) is real
and tested; the actual decode kernels are STUBBED because no image/audio
libraries exist in this container:

* ``DecodeStage(fake=True)``  — deterministic fake decoder (shape/duration
  derived from the payload bytes) so pipelines are testable end-to-end;
* ``DecodeStage(fake=False)`` — raises NotImplementedError at the decode
  call, marking exactly where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd

MEDIA_SCHEMA_COLS = ["media_id", "media_type", "payload", "meta"]


def synth_media_batch(n: int, seed: int = 7) -> pd.DataFrame:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mtype = ["image/png", "audio/wav", "video/mp4"][i % 3]
        payload = rng.bytes(256 + (i % 5) * 128)
        rows.append(
            (i, mtype, payload, json.dumps({"source": f"synth-{i % 4}"}))
        )
    return pd.DataFrame(rows, columns=MEDIA_SCHEMA_COLS)


def _fake_decode(media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: metadata derived from a
    content digest, so results are stable across processes and runs."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    if media_type.startswith("image/"):
        return {"width": 64 + h[0] % 192, "height": 64 + h[1] % 192, "channels": 3}
    if media_type.startswith("audio/"):
        return {"sample_rate": 16000, "duration_ms": 100 + int.from_bytes(h[2:4], "little") % 5000}
    return {"frames": 10 + h[4] % 290, "fps": 24}


class DecodeStage:
    """Actor-pool decode/feature-extract stage over wide binary rows.

    Run with a small batch_size (wide rows): e.g.
    ``ds.map_batches(DecodeStage, fn_constructor_kwargs={"fake": True},
    batch_format="pandas", batch_size=16, concurrency=4)``.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, media_type: str, payload: bytes) -> dict:
        if self.fake:
            return _fake_decode(media_type, payload)
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, absent in this container"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            json.dumps(self._decode(mt, p), sort_keys=True)
            for mt, p in zip(batch["media_type"], batch["payload"])
        ]
        out = batch.drop(columns=["payload"]).copy()  # drop wide bytes early
        out["features"] = feats
        out["payload_bytes"] = np.array(
            [len(p) for p in batch["payload"]], dtype=np.int64
        )
        return out


class FrameSampleStage:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    (decode itself stubbed via DecodeStage semantics)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, mt, p in zip(batch["media_id"], batch["media_type"], batch["payload"]):
            if not mt.startswith("video/"):
                continue
            meta = _fake_decode(mt, p) if self.fake else None
            if meta is None:
                raise NotImplementedError("real frame sampling needs ffmpeg")
            for f in range(0, meta["frames"], self.every_n):
                rows.append((int(mid), f))
        return pd.DataFrame(rows, columns=["media_id", "frame_idx"])
