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
from entry._helpers import _CACHE_ROOT


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
