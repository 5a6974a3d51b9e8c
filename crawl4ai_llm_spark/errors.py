"""Error taxonomy mirroring the reference storage interface.

Parity: reference ``crawl4ai_llm/storage/base.py:9-27`` defines
StorageError → {StorageConnectionError, ProductNotFoundError,
DuplicateProductError}. The new engine keeps the same names and raise
semantics (verified behaviors in SURVEY.md §2.2) so contract tests port 1:1.
"""

from __future__ import annotations


class StorageError(Exception):
    """Base class for all storage errors (ref base.py:9-11)."""


class StorageConnectionError(StorageError):
    """Storage backend unreachable / unwritable (ref base.py:14-16)."""


class ProductNotFoundError(StorageError):
    """Requested record id(s) absent (ref base.py:19-21).

    Batch variants list ALL missing ids, matching the reference's
    all-or-nothing precheck (ref json_storage.py:360-361, 467-471, 575-581).
    """

    def __init__(self, missing_ids: list[str] | str):
        if isinstance(missing_ids, str):
            missing_ids = [missing_ids]
        self.missing_ids = missing_ids
        super().__init__(f"Product(s) not found: {', '.join(missing_ids)}")


class DuplicateProductError(StorageError):
    """Insert would collide with existing (or intra-batch) ids.

    The reference detects existing-id duplicates (json_storage.py:195-197,
    250-254) but NOT intra-batch duplicates — executing it shows intra-batch
    dups silently corrupt the record file (SURVEY.md §2.2 D2). The new engine
    rejects both, deterministically.
    """

    def __init__(self, dup_ids: list[str] | str, truncated: bool = False):
        if isinstance(dup_ids, str):
            dup_ids = [dup_ids]
        self.dup_ids = dup_ids
        self.truncated = truncated
        suffix = " (sample: first by id; more conflicts exist)" if truncated else ""
        super().__init__(f"Duplicate product id(s): {', '.join(dup_ids)}{suffix}")


class NearDuplicateContentError(DuplicateProductError):
    """Insert would near-duplicate already-stored CONTENT — the reference's
    D1 duplicate semantics (id collision ⇒ DuplicateProductError,
    json_storage.py:195-197) generalized to content similarity via the
    persisted MinHash band-key index (operators/dedup_store.DedupIndex;
    ``ProductStore.save_products_df(reject_near_dups=...)``).

    ``pairs``: sample of (new_id, stored_id, jaccard), sorted by new_id.
    Subclasses DuplicateProductError so existing handlers keep working;
    ``dup_ids`` holds the offending NEW ids.
    """

    def __init__(self, pairs: list[tuple[str, str, float]], truncated: bool = False):
        self.pairs = pairs
        dup_ids = sorted({p[0] for p in pairs})
        detail = "; ".join(f"{n}~{o} (J={j:.3f})" for n, o, j in pairs[:5])
        suffix = " (sample; more conflicts exist)" if truncated else ""
        StorageError.__init__(
            self, f"Near-duplicate content: {detail}{suffix}"
        )
        self.dup_ids = dup_ids
        self.truncated = truncated
