"""oracle_sql(): ordered merge of the split part dicts.

Parts are dict literals (one per module) so the AST-level
duplicate-key guard in tests/test_entry_window.py can walk
each one; the merge itself hard-fails on any overlap.
"""

from entry._oracle_1 import part_1
from entry._oracle_2 import part_2

ORACLE_PARTS = [part_1, part_2]


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for p in ORACLE_PARTS:
        d = p()
        dup = out.keys() & d.keys()
        if dup:
            raise ValueError(f"duplicate oracle keys across parts: {sorted(dup)}")
        out.update(d)
    return out
