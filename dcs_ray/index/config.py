"""Index build configuration."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class IndexConfig:
    """Configuration for an index build.

    At 100 TB scale: size ``num_partitions`` so one partition's documents
    (~total_bytes / num_partitions) fit comfortably in a worker heap
    (256–512 MiB of text → P ≈ 200k–400k for 100 TB), and
    ``num_shards`` so one merged shard's index serves from one node
    (dcs used 6 shards of 1–16 GiB each, ``howto/update-the-index.md:49``).
    """

    num_partitions: int = 8
    num_shards: int = 2
    mode: str = "words"  # "words" (BM25) | "trigram" (dcs candidate mode)
    text_col: str = "text"
    url_col: str = "url"
    id_col: str | None = None  # explicit global doc-id column (e.g. documents.doc_id)
    id_max: int | None = None  # max value of id_col (computed if None); range
    # partitioning on ids keeps doc ids ascending across partitions so the
    # shard merge stays pure concatenation
    positional: bool = False  # keep positional sections (phrase / verify)
    dedup_latest: bool = True  # newest warc_ts per url wins (querymanager.go:688-747)
    ts_col: str = "warc_ts"
    # extra per-doc metadata columns carried into doc_meta.parquet — the
    # in-index attributes that keyword filters (package:/path:/-negation,
    # sourcebackend.go:28-129) and the static rank prior
    # (ranking/pre-ranking.go:54-103) are evaluated against at query time
    meta_cols: tuple = ()
    # posting-body codec: "bitpack" (fixed-width FOR blocks — dcs's
    # TurboPFor role; default: ~half the bytes of varint on web text and
    # ~1.3× faster decode), "svbyte" (Stream-VByte: 2-bit length codes
    # in a control stream separate from the data bytes, per-block varint
    # fallback for ≥2^32 values), "ef" (Elias-Fano doc ids: fixed-width
    # low bits + unary high bits, Vigna '13 — size a closed form of
    # (n, id span) only, so the ef_posting_sizes oracle replays it per
    # term in SQL), or "varint" (LEB128). Blocks are
    # self-describing, so segments of different codecs even merge
    # together (an old varint index updates in place consistently —
    # update_partition re-reads the stored codec from the manifest).
    codec: str = "bitpack"
    # BM25 parameters (north rule)
    k1: float = 1.2
    b: float = 0.75
    # merge fan-in per salt group when concatenating hot-term runs
    merge_group_size: int = 64
    # CPU reservation per build task. On a single shared box, running one
    # memory-bandwidth-heavy task per hardware thread collides with the
    # driver's streaming-executor threads on SMT siblings (measured: 128
    # identical tasks burn 231 CPU-s at 24-way but 642 CPU-s at 32-way on
    # a 16-core/32-thread host). 1.25 leaves ~20% of lanes for the
    # driver/raylet; on a multi-node cluster the driver is not on worker
    # nodes and 1.0 is right.
    task_num_cpus: float = 1.0
    # Retry application-level exceptions in the segment-build / shard-
    # merge tasks (Ray retries SYSTEM failures — dead worker, OOM-killed
    # process — on its own; this opts the same tasks into retrying
    # transient APPLICATION errors such as a flaky filesystem or an
    # upstream UDF hiccup). Safe because both stages are idempotent:
    # write_segment/merge land via tmp-dir + atomic rename, and a
    # concurrently-finished output wins (segment.py:269). At 256 nodes
    # transient task loss is routine — a multi-hour build should absorb
    # it, not abort; the resume path remains the backstop for driver
    # loss.
    task_max_retries: int = 0

    def validate(self) -> "IndexConfig":
        assert self.mode in ("words", "trigram")
        assert self.codec in ("varint", "bitpack", "svbyte", "ef")
        assert self.num_partitions >= self.num_shards >= 1
        # latest-crawl dedup is partition-local; it is only globally exact
        # when a url's every crawl lands in one partition — i.e. url-hash
        # partitioning. Id-range partitioning gives different ids to
        # different crawls of one url and would silently miss duplicates.
        assert not (self.dedup_latest and self.id_col is not None), (
            "dedup_latest requires url-hash partitioning (id_col=None)"
        )
        return self
