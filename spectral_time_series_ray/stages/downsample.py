"""Spectral downsampling as a stateful actor-pool stage.

Fills the reference's unimplemented ``Downsample`` / ``Subsample``
slots (`uni2ts/src/uni2ts/transform/resample.py:70-93`) with real
implementations:

- ``method="welch"``  — Welch periodogram over REGULAR per-conversation
  rollup series (post gap-fill grids).
- ``method="lomb"``   — Lomb-Scargle over IRREGULAR series (raw
  inter-turn intervals; turn events are not on a grid, so FFT methods
  do not apply — SURVEY.md §7.4).

The downsample output is a fixed-size summary per conversation chunk:
the top-k (frequency, power) spectral bins — a lossy, constant-width
sketch of each conversation's temporal rhythm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.spectral import lomb_scargle, top_k_spectrum, welch_psd


class SpectralDownsampler:
    """map_batches actor: one spectral summary row per input chunk row.

    Frequency grid / Welch segment setup happens once per actor.
    """

    def __init__(
        self,
        method: str = "welch",
        top_k: int = 8,
        fs: float | None = None,
        nperseg: int = 256,
        n_freqs: int = 256,
        max_freq: float | None = None,
    ):
        assert method in ("welch", "lomb")
        self.method = method
        self.top_k = top_k
        self.fs = fs
        self.nperseg = nperseg
        self.n_freqs = n_freqs
        self.max_freq = max_freq

    def _one(self, ts_us: np.ndarray, vals: np.ndarray):
        if self.method == "welch":
            # regular grid: fs from the (constant) grid step unless given
            if self.fs is not None:
                fs = self.fs
            else:
                step = np.median(np.diff(ts_us)) / 1e6 if len(ts_us) > 1 else 1.0
                fs = 1.0 / max(step, 1e-12)
            freqs, power = welch_psd(vals, fs=fs, nperseg=self.nperseg)
        else:
            t = (ts_us - ts_us[0]) / 1e6 if len(ts_us) else ts_us.astype(float)
            if len(t) > 2:
                span = max(t[-1] - t[0], 1e-9)
                min_gap = max(np.min(np.diff(t)), 1e-6)
                hi = self.max_freq if self.max_freq else 0.5 / min_gap
                freqs = np.linspace(1.0 / span, hi, self.n_freqs)
                power = lomb_scargle(t, vals, freqs, normalize=True)
            else:
                freqs = np.array([])
                power = np.array([])
        return top_k_spectrum(freqs, power, k=self.top_k)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        f_out, p_out, peak_out = [], [], []
        for ts, vals in zip(batch["ts"], batch["values"]):
            ts = np.asarray(ts, dtype=np.int64)
            vals = np.asarray(vals, dtype=np.float64)
            ok = ~np.isnan(vals)
            f, p = self._one(ts[ok], vals[ok])
            f_out.append(f)
            p_out.append(p)
            peak_out.append(float(f[np.argmax(p)]) if len(f) else np.nan)
        out = batch.drop(columns=["ts", "values"]).copy()
        out["top_freqs"] = f_out
        out["top_power"] = p_out
        out["peak_freq"] = peak_out
        out["method"] = self.method
        return out


def spectral_downsample(
    chunk_ds,
    method: str = "welch",
    concurrency: int = 4,
    batch_size: int | None = None,
    **kwargs,
):
    """Actor-pool spectral summary over packed chunk rows
    (series.pack_series output).

    ``batch_size`` defaults by method cost: Lomb-Scargle is
    O(n_freqs x n_points) per chunk (~10-30 ms at 2048x128), so large
    batches starve the pool — 128-chunk batches turned a 794-chunk
    corpus into 7 tasks and the stage ran at ~1/8 of the pool's
    throughput; 16-chunk batches load-balance it. Welch is an FFT and
    stays at 128."""
    if batch_size is None:
        batch_size = 16 if method == "lomb" else 128
    return chunk_ds.map_batches(
        SpectralDownsampler,
        fn_constructor_kwargs={"method": method, **kwargs},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SeriesResampler:
    """Actor-pool resample stage over packed chunk rows (reference
    Subsample / GaussianFilterSubsample / Upsample declared-stubs,
    resample.py:70-93 — real implementations in
    ``functions/resample``). Emits the same chunk-row schema with
    resampled ts/values."""

    def __init__(self, factor: int = 4, mode: str = "gaussian"):
        from ..functions.resample import gaussian_subsample, subsample, upsample_linear

        assert mode in ("gaussian", "decimate", "upsample")
        self.factor = factor
        self.mode = mode
        self._fns = {
            "gaussian": gaussian_subsample,
            "decimate": subsample,
            "upsample": upsample_linear,
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fn = self._fns[self.mode]
        rows = []
        for conv_id, chunk_idx, ts_arr, values in zip(
            batch["conv_id"], batch["chunk_idx"], batch["ts"], batch["values"]
        ):
            ts = np.asarray(ts_arr, dtype=np.int64)
            vals = fn(np.asarray(values, dtype=np.float64), self.factor)
            if self.mode == "upsample":
                x_out = np.arange(len(vals), dtype=np.float64) / self.factor
                new_ts = np.interp(
                    x_out, np.arange(len(ts), dtype=np.float64), ts.astype(np.float64)
                ).astype(np.int64)
            else:
                new_ts = ts[:: self.factor][: len(vals)]
            rows.append(
                {
                    "conv_id": conv_id,
                    "chunk_idx": int(chunk_idx),
                    "n_points": len(vals),
                    "ts": new_ts,
                    "values": vals,
                }
            )
        return pd.DataFrame(rows)


def resample_series(chunk_ds, factor: int = 4, mode: str = "gaussian", concurrency: int = 2):
    """Resample packed chunk rows (see :class:`SeriesResampler`)."""
    return chunk_ds.map_batches(
        SeriesResampler,
        fn_constructor_kwargs={"factor": factor, "mode": mode},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


class Spectrogrammer:
    """Actor-pool STFT spectrogram per packed chunk row
    (`functions/spectral.stft_spectrogram`): emits the dominant
    frequency PER FRAME (excluding DC) plus total frame power — the
    time-frequency view of the conversation-rhythm series that the
    Welch path averages away.  Chunks shorter than one segment are
    flagged invalid rather than crashing the stage."""

    def __init__(self, nperseg: int = 64, noverlap: int | None = None):
        from ..functions.spectral import stft_spectrogram

        self.nperseg = nperseg
        self.noverlap = noverlap
        self._stft = stft_spectrogram

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dom, powr, n_frames, valid = [], [], [], []
        for v in batch["values"]:
            v = np.asarray(v, dtype=np.float64)
            if len(v) < self.nperseg:
                dom.append(np.empty(0)); powr.append(np.empty(0))
                n_frames.append(0); valid.append(False)
                continue
            _, freqs, p = self._stft(v, nperseg=self.nperseg, noverlap=self.noverlap)
            dom.append(freqs[1 + np.argmax(p[:, 1:], axis=1)])
            powr.append(p.sum(axis=1))
            n_frames.append(p.shape[0]); valid.append(True)
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["dominant_freq_per_frame"] = dom
        out["frame_power"] = powr
        out["n_frames"] = np.asarray(n_frames, dtype=np.int64)
        out["stft_valid"] = np.asarray(valid, dtype=bool)
        return out


def spectrogram_chunks(chunk_ds, nperseg: int = 64, noverlap: int | None = None,
                       concurrency: int = 4):
    """STFT spectrogram summary per packed chunk row."""
    return chunk_ds.map_batches(
        Spectrogrammer,
        fn_constructor_kwargs={"nperseg": nperseg, "noverlap": noverlap},
        batch_format="pandas", batch_size=256, concurrency=concurrency,
    )
