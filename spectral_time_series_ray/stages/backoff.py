"""Per-batch failure backoff for actor-pool stages.

The reference retries a failed evaluation at half the batch size until
it fits (`uni2ts/cli/eval.py:39-76` — torch.cuda OOM halving loop).
Ray Data sizes blocks for memory, but a data-dependent failure (one
pathological row, an OOM inside a numeric kernel) would otherwise kill
the whole task and, after Ray's task retries, the job. This wrapper
gives any per-batch callable the same degradation contract:

- run the inner callable on the full batch;
- on exception, split the batch in half and retry each half
  recursively (so a single bad row costs O(log batch) attempts);
- rows that still fail at ``min_size`` are DEAD-LETTERED: counted,
  logged, and dropped from the output instead of failing the stage;
- if a batch dead-letters in full and the actor has never produced a
  successful output (no schema to emit), the error is re-raised —
  that is a systematic failure, not a bad row.

Use :func:`backoff_map_batches` to apply it to a Dataset stage; the
per-actor dead-letter total is appended to each emitted frame as the
``_dead_letter`` running-count column when ``expose_count=True``
(default False keeps the inner schema untouched).
"""

from __future__ import annotations

import logging

import pandas as pd

log = logging.getLogger(__name__)


class BatchBackoff:
    """Wrap a per-batch callable (class instance or function) with the
    halving-retry + dead-letter policy. Stateful inners are constructed
    ONCE here (actor semantics preserved)."""

    def __init__(
        self,
        inner,
        inner_args: tuple = (),
        inner_kwargs: dict | None = None,
        min_size: int = 1,
        expose_count: bool = False,
    ):
        self.inner = inner(*inner_args, **(inner_kwargs or {})) if isinstance(inner, type) else inner
        self.min_size = max(1, int(min_size))
        self.expose_count = expose_count
        self.dead_letters = 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = self._run(batch)
        if out is None:
            raise RuntimeError(
                "backoff: every row of the first batch failed — systematic "
                "stage failure, not a bad row; re-raising instead of "
                "silently emitting nothing"
            )
        if self.expose_count:
            out = out.copy()
            out["_dead_letter"] = self.dead_letters
        return out

    # returns None when nothing succeeded AND no schema is known yet
    def _run(self, batch: pd.DataFrame):
        try:
            out = self.inner(batch)
            self._template = out.iloc[:0]
            return out
        except Exception as e:  # noqa: BLE001 — policy: degrade, don't die
            n = len(batch)
            if n <= self.min_size:
                self.dead_letters += n
                log.warning(
                    "backoff: dead-lettering %d row(s) after failure at "
                    "min_size (%s: %s)", n, type(e).__name__, e,
                )
                return getattr(self, "_template", None)
            mid = n // 2
            log.info(
                "backoff: batch of %d failed (%s) — retrying as %d + %d",
                n, type(e).__name__, mid, n - mid,
            )
            left = self._run(batch.iloc[:mid])
            right = self._run(batch.iloc[mid:])
            parts = [p for p in (left, right) if p is not None]
            if not parts:
                return None
            return pd.concat(parts, ignore_index=True)


def backoff_map_batches(
    ds,
    stage,
    fn_constructor_args: tuple = (),
    fn_constructor_kwargs: dict | None = None,
    min_size: int = 1,
    expose_count: bool = False,
    **map_kwargs,
):
    """``ds.map_batches`` with the halving-retry policy around
    ``stage`` (a callable class — constructed once per actor — or a
    plain function). All other ``map_batches`` kwargs pass through."""
    return ds.map_batches(
        BatchBackoff,
        fn_constructor_args=(
            stage, fn_constructor_args, fn_constructor_kwargs, min_size, expose_count,
        ),
        batch_format="pandas",
        **map_kwargs,
    )
