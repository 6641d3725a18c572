"""spectral_time_series_ray — a Ray-Data-native time-series rollup,
downsample, and retention engine over Parquet transcript tables.

Built from scratch on the public Ray Data / Apache Arrow APIs, with
semantics matching the reference (jerryhan60/spectral-time-series):

- data model: long-format turn events ``(conv_id, turn_idx, role, text,
  tool, ts)`` (reference: dict-of-arrays data_entry,
  uni2ts/src/uni2ts/common/typing.py:38-48)
- per-series ordered transforms: gap-fill (LOCF / causal-mean,
  uni2ts/src/uni2ts/transform/imputation.py), polynomial
  preconditioning forward/reverse
  (uni2ts/src/uni2ts/transform/precondition.py)
- tiered 1m/1h/1d tumbling rollups (grouped masked-mean semantics,
  uni2ts/src/uni2ts/loss/packed/_base.py:76-106)
- Gorilla XOR float + delta-of-delta timestamp compression (Pelkonen
  et al., VLDB 2015 — absent from the reference, built from the paper)
- Welch / Lomb-Scargle spectral downsampling (fills the reference's
  unimplemented stubs, uni2ts/src/uni2ts/transform/resample.py:70-93)
"""

__version__ = "0.1.0"

TIERS = ("1m", "1h", "1d")

TIER_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
