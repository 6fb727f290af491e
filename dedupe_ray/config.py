"""Engine configuration.

Mirrors the reference's field/variable definitions and fixed hyperparameters
(reference: backend/dedupe_script.py:159-162,184-194 and backend/main.py:82-112)
as plain dataclasses. A field config is ``{'field', 'type', 'has_missing'}`` in
the reference; here it is :class:`FieldConfig`.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

# Missing-value sentinel — the literal string the reference preprocess maps
# empty / NaN cells to (backend/dedupe_script.py:18-31). Part of observable
# output semantics, so kept verbatim.
MISSING = "N/A"

FIELD_TYPES = ("String", "Text", "Price", "DateTime", "Exact")


@dataclass(frozen=True)
class FieldConfig:
    """One matching field (reference variable definition, dedupe_script.py:266-286)."""

    field: str
    type: str = "String"
    has_missing: bool = True

    def __post_init__(self) -> None:
        if self.type not in FIELD_TYPES:
            raise ValueError(f"unknown field type {self.type!r}; one of {FIELD_TYPES}")


@dataclass
class EngineConfig:
    """Pipeline tunables.

    Defaults track the reference's fixed hyperparameters
    (backend/main.py:101-112, backend/dedupe_script.py:184-194) where one
    exists; scale knobs (salting, caps, batch sizes) are new — the reference
    is single-process and has no equivalents.
    """

    fields: list[FieldConfig] = dc_field(default_factory=list)

    # --- reference-mirrored knobs ---
    similarity_threshold: float = 0.5  # dedupe_script.py:186 default
    max_training_rows: int = 400  # dedupe_script.py:193
    max_training_pairs: int = 100  # main.py:108
    max_training_matches: int = 5  # main.py:106
    max_training_distincts: int = 5  # main.py:107
    recall_weight: float = 1.0  # dedupe_script.py:190
    sample_size: int = 1500  # [lib] prepare_training default
    blocked_proportion: float = 0.9  # [lib] prepare_training default

    # --- scale knobs (Ray-native; no reference equivalent) ---
    # Blocks larger than this are capped: within-cap pairs are emitted from a
    # deterministic (sorted doc_id) prefix plus salted cells; see blocking.py.
    max_block_size: int = 1024
    # Records-side broadcast join limit: below this row count the record table
    # is ray.put() once (shared-memory Arrow) and looked up map-side; above
    # it, Dataset.join hash-joins. Short-string entity records are ~200 B/row
    # → 2M rows ≈ 400 MB in the object store, comfortably broadcastable on a
    # production node; the shuffle join is the 10⁹+-row path.
    broadcast_record_limit: int = 2_000_000
    # Connected components: below this edge count a driver-side union-find is
    # exact and fast; above it, distributed min-label propagation runs.
    cc_driver_edge_limit: int = 5_000_000
    # dedupe's max_components analogue: split components larger than this by
    # re-thresholding their weakest edges ([lib: dedupe/clustering.py]).
    max_component_size: int = 30_000
    # Scoring stage batch size (distance kernels are batched DPs — bigger
    # batches amortize per-task overhead; memory per batch is tiny).
    score_batch_size: int = 16384
    score_concurrency: int = 8
    # Block-explode / preprocess batch size.
    map_batch_size: int = 8192
    # L2 regularization strength for the pairwise logistic classifier
    # (sklearn LogisticRegression C=1.0 equivalent: lambda = 1/C).
    l2_lambda: float = 1.0
    # Hard-negative audit: number of synthetic same-address different-name
    # pairs added as distinct labels at classifier fit time (0 disables).
    # Symmetric to the typo audit: a ~100-pair label set almost never
    # samples the "shared name frame + same postal/city, different coined
    # token" NON-duplicate class, so the classifier over-credits the shared
    # frame (the round-2 2M residual: 2,746 such extra pairs).
    hard_negative_audit: int = 150
    # Random seed for sampling stages.
    seed: int = 42

    def field_names(self) -> list[str]:
        return [f.field for f in self.fields]

    @staticmethod
    def auto_detect(columns: list[str]) -> "EngineConfig":
        """Reference field auto-detection: every column becomes a String field
        with has_missing=True (backend/dedupe_script.py:159-162)."""
        return EngineConfig(
            fields=[FieldConfig(field=c, type="String", has_missing=True) for c in columns]
        )
