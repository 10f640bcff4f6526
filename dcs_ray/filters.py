"""Ingest-time document filtering — the rebuild of dcs ``filter.Ignored``
(F1, ``internal/filter/filter.go:74-125``; tunable lists at 16-32).

dcs drops files by ignored dirnames/filenames/suffixes, a manpage-suffix
heuristic, a hard 1 GiB cap and a 64 KiB cap for "only small files"
suffixes, all before tokenization. The web-page analogue filters on url
suffix/segment, language and text size. Everything is one vectorized
``map_batches`` predicate over Arrow compute kernels — rows are never
visited in Python."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# web analogues of dcs's ignored_suffixes / only_small_files_suffixes
IGNORED_URL_SUFFIXES = (".css", ".js", ".map", ".ico", ".woff", ".woff2")
IGNORED_URL_SEGMENTS = ("/.git/", "/node_modules/")
MAX_TEXT_CHARS = 1 << 30  # dcs errTooLarge, 1 GiB
MIN_TEXT_CHARS = 3        # indexability floor (write.go:138-147)
SMALL_ONLY_SUFFIXES = (".svg", ".json", ".csv")  # indexed only when small
SMALL_ONLY_MAX_CHARS = 64 << 10  # dcs 64 KiB cap


def ignored_mask(
    batch: pa.Table,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
    ignored_suffixes: tuple = IGNORED_URL_SUFFIXES,
    ignored_segments: tuple = IGNORED_URL_SEGMENTS,
    ignored_langs: tuple = (),
    min_chars: int = MIN_TEXT_CHARS,
    max_chars: int = MAX_TEXT_CHARS,
    small_only_suffixes: tuple = SMALL_ONLY_SUFFIXES,
    small_only_max_chars: int = SMALL_ONLY_MAX_CHARS,
) -> np.ndarray:
    """Boolean keep-mask for one batch (True = indexable). Columns that a
    table lacks simply skip their predicate, so the same operator serves
    ``pages`` (url+lang) and bare ``documents`` tables."""
    n = len(batch)
    keep = np.ones(n, dtype=bool)
    cols = set(batch.column_names)
    if text_col in cols:
        ln = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False)
        keep &= (ln >= min_chars) & (ln <= max_chars)
    if url_col in cols:
        urls = batch[url_col]
        for suf in ignored_suffixes:
            keep &= ~pc.ends_with(urls, pattern=suf).to_numpy(zero_copy_only=False)
        for seg in ignored_segments:
            keep &= ~pc.match_substring(urls, seg).to_numpy(zero_copy_only=False)
        if small_only_suffixes and text_col in cols:
            small_only = np.zeros(n, dtype=bool)
            for suf in small_only_suffixes:
                small_only |= pc.ends_with(urls, pattern=suf).to_numpy(
                    zero_copy_only=False
                )
            keep &= ~(small_only & (ln > small_only_max_chars))
    if ignored_langs and lang_col in cols:
        keep &= ~pc.is_in(
            batch[lang_col], value_set=pa.array(list(ignored_langs))
        ).to_numpy(zero_copy_only=False)
    return keep


def filter_ignored(ds: ray.data.Dataset, **kwargs) -> ray.data.Dataset:
    """Dataset stage: drop non-indexable documents (F1)."""

    def apply(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(ignored_mask(batch, **kwargs)))

    return ds.map_batches(apply, batch_format="pyarrow")
