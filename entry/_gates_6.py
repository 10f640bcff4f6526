"""Round-5 gate callables: evidence-hardening round — the float
spherical-k-means IVF variant kept user-visible after the
``knn_cosine_ivf`` gate moved onto the deterministic hash-min
quantizer, plus the PPM image-feature oracle route.  Go through
__ray_entry__ — do not import directly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dcs_ray.sources.io import read_parquet_sized
from entry._helpers import _CACHE_ROOT, _index_dir


def _q_sloppy_phrase_rank(sf_dir: str) -> pa.Table:
    """Sloppy-phrase ranking (Lucene PhraseQuery-with-slop role, byte
    gaps): docs ranked by Σ SLOPPY_SCALE // gap over ordered
    ('spark' → 'join') occurrence pairs within a 40-byte window —
    closer pairs weigh more, integer division keeps the whole score
    SQL-replayable bit-for-bit (the positional sections supply exact
    byte offsets; companions: proximity_search = unordered #uwN counts,
    ordered_window_search = ordered #N counts)."""
    from dcs_ray.search import search_phrase_sloppy

    idx = _index_dir(sf_dir, "trigram")
    return search_phrase_sloppy(idx, ("spark", "join"), window=40, k=10)


def _q_image_features_mixed(sf_dir: str):
    """REAL decode path over a MIXED corpus: deterministic P6 PPM,
    zlib-compressed PNG, baseline-JPEG (4:2:0 + restart markers), and
    GIF89a (LZW, palette-quantized) images (same pixel recipes),
    sniffed and decoded per row by the dependency-free parsers in an
    actor pool → per-channel stats + luma grid features. Rows-only BY
    NATURE: the 4:2:0 gradient JPEG decode has no closed-form pixels.
    The PPM arm is hash-gated via ``image_features``, PNG/GIF via
    ``image_features_lossless``, flat-tile JPEG via
    ``image_features_jpeg``; pytest pins cross-codec equality."""
    import ray.data

    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_gif_media,
        synthesize_jpeg_media,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    ppm = synthesize_ppm_media(32)
    png = synthesize_png_media(32)
    png = png.set_column(
        png.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 64), pa.int64()),
    )
    jpg = synthesize_jpeg_media(32)
    jpg = jpg.set_column(
        jpg.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(64, 96), pa.int64()),
    )
    gif = synthesize_gif_media(32)
    gif = gif.set_column(
        gif.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(96, 128), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm, png, jpg, gif]))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=32,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("media_id")


def _q_knn_ivf_kmeans(sf_dir: str) -> pa.Table:
    """The production float quantizer route: IVF ANN with spherical
    k-means++ coarse training (bounded deterministic-seed sample, 10
    Lloyd iterations) — sampled float seeding is not SQL-expressible,
    so this entry is rows-only; the deterministic twin
    ``knn_cosine_ivf`` (hash-min init) carries the hash gate for the
    identical probe-and-merge machinery, and recall vs brute force is
    asserted in ``tests/test_simsearch.py``."""
    from dcs_ray.functions.simsearch import knn_cosine_ivf

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    t = knn_cosine_ivf(
        emb, np.array([q0]), k=10,
        index_dir=os.path.join(_CACHE_ROOT, f"{name}_ivfann"),
    )
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cos_sim": t["cos_sim"],
        }
    )
