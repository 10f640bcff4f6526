"""dcs_ray — a Ray-Data-native inverted-index build + BM25 top-k engine.

A from-scratch rebuild of the semantics of Debian Code Search (dcs)
— posting-list construction, segment merge, compressed posting format,
candidate generation + scoring + global top-k — expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches.

Reference semantics (file:line cites throughout) come from the public
Debian/dcs repo; the architecture here is Ray Data, not a port.
"""

__version__ = "0.1.0"

from dcs_ray.codec import varint_encode, varint_decode  # noqa: F401
