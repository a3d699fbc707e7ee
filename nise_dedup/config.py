"""Pipeline configuration (SURVEY.md §3.1 step 1).

Every knob that affects output lives here so that ``config_hash`` uniquely
identifies a run's semantics — resumability (SURVEY §2 F5) refuses to reuse a
stage checkpoint written under a different hash, and the frozen oracle
(tests/oracle.py) is parameterized by the same dataclass so "identical
shingle/band/row signature configuration" (BASELINE.json north_rule) is
enforced by construction.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- signature stage (SURVEY §2.3) ---
    shingle_k: int = 9           # char k-gram width; 9 is a common choice for code
    num_perm: int = 128          # MinHash signature length n = bands * rows
    bands: int = 32              # LSH bands b
    rows: int = 4                # LSH rows per band r
    seed: int = 42               # master seed for all hash families

    # --- verification thresholds (SURVEY §2.5, frozen policy V4) ---
    # passed = (jaccard >= tau_jaccard)
    #        | (hamming <= tau_hamming)
    #        | (jaccard >= tau_lcs_gate
    #           & lcs_len >= max(tau_lcs_min_bytes,
    #                            tau_lcs_ratio * min(len_a, len_b)))
    tau_jaccard: float = 0.70    # exact shingle-set Jaccard
    tau_hamming: int = 3         # SimHash 64-bit Hamming distance (Manku '07)
    tau_lcs_gate: float = 0.35   # only run the O(n log^2 n) LCS when J >= gate
                                 # (a >=60%-of-both-files block implies shingle
                                 # J >= ~0.43, so 0.35 keeps margin while
                                 # skipping the weak-candidate mass)
    tau_lcs_ratio: float = 0.60  # LCS length >= ratio * min(len_a, len_b)
    tau_lcs_min_bytes: int = 512  # absolute floor: shared boilerplate headers
                                  # (license blocks etc.) must not LCS-merge
                                  # short files — the precision guard for the
                                  # `license` negative class in FIXTURES.md §B
    lcs_enabled: bool = True

    # --- skew discipline (SURVEY §2.4 L2) ---
    bucket_cap: int = 256        # max members per (band, key) bucket before salting
    max_bucket: int = 100_000    # hard cap: buckets larger than this are degenerate
                                 # (empty/boilerplate); dropped WITH a metrics row

    # --- execution ---
    arrow_batch_rows: int = 2048  # small batches: `content` can be megabytes
    shuffle_partitions: int = 64
    checkpoint_dir: str = ""      # stage manifests + CC checkpoints; "" = temp

    # --- normalization (SURVEY §2.2 R1) feeding SHINGLING/LCS ONLY; the
    # stored `content` and its sha256 are never mutated (BASELINE invariant).
    # "ws": rstrip each line, drop blank lines, join with \n — makes
    # whitespace-churn duplicates signature-identical. "none": raw bytes.
    normalize: str = "ws"

    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.num_perm != self.bands * self.rows:
            raise ValueError(
                f"num_perm ({self.num_perm}) must equal bands*rows "
                f"({self.bands}*{self.rows}={self.bands * self.rows})"
            )
        if self.shingle_k < 1:
            raise ValueError("shingle_k must be >= 1")

    def config_hash(self) -> str:
        """Deterministic hash of every semantic knob (stable key order)."""
        d = asdict(self)
        d.pop("extra", None)
        # execution-only knobs do not change output semantics
        for k in ("arrow_batch_rows", "shuffle_partitions", "checkpoint_dir"):
            d.pop(k, None)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
