"""Gorilla compression as a stateful actor-pool stage.

``GorillaChunkEncoder`` / ``GorillaChunkDecoder`` are callable classes
for ``map_batches(cls, concurrency=N, batch_size=B)`` over chunk rows
produced by ``series.pack_series`` — setup in ``__init__`` (once per
actor), per-batch work in ``__call__`` (SURVEY.md §2.4 actor-pool
pattern; per-chunk state resets at conversation boundaries like the
reference's sample_id reset, `learnable_precondition.py:71-83`).

Values are quantized to a fixed decimal precision BEFORE encoding
(integer-valued floats XOR-compress to ~1-3 bytes/point; raw random
mantissas do not compress — see the Gorilla paper §4.1.2).
``quantize_digits=None`` keeps full precision (bit-exact roundtrip,
no compression win on noisy data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.gorilla import decode_chunk, encode_chunk


class GorillaChunkEncoder:
    def __init__(self, quantize_digits: int | None = 3):
        self.quantize_digits = quantize_digits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ts_out, val_out, bpp_out, n_out = [], [], [], []
        scale = None if self.quantize_digits is None else 10.0 ** self.quantize_digits
        for ts, vals in zip(batch["ts"], batch["values"]):
            ts = np.asarray(ts, dtype=np.int64)
            vals = np.asarray(vals, dtype=np.float64)
            if scale is not None:
                # round-half-even to fixed decimals, stored as integer-valued
                # floats so the XOR codec sees long trailing-zero runs
                vals = np.round(vals * scale)
            tb, vb, bpp = encode_chunk(ts, vals)
            ts_out.append(tb)
            val_out.append(vb)
            bpp_out.append(bpp)
            n_out.append(len(vals))
        out = batch.drop(columns=["ts", "values"]).copy()
        out["ts_bytes"] = ts_out
        out["val_bytes"] = val_out
        out["n_points"] = n_out
        out["bytes_per_point"] = bpp_out
        out["quantize_digits"] = self.quantize_digits if scale is not None else -1
        return out


class GorillaChunkDecoder:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ts_out, val_out = [], []
        for tb, vb, qd in zip(
            batch["ts_bytes"], batch["val_bytes"], batch["quantize_digits"]
        ):
            ts, vals = decode_chunk(tb, vb)
            if qd >= 0:
                vals = vals / (10.0**qd)
            ts_out.append(ts)
            val_out.append(vals)
        out = batch.drop(columns=["ts_bytes", "val_bytes"]).copy()
        out["ts"] = ts_out
        out["values"] = val_out
        return out


def compress_chunks(chunk_ds, quantize_digits: int | None = 3, concurrency: int = 4):
    """Actor-pool Gorilla encode over packed chunk rows."""
    return chunk_ds.map_batches(
        GorillaChunkEncoder,
        fn_constructor_kwargs={"quantize_digits": quantize_digits},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


class GorillaRoundtripVerifier:
    """Encode + decode + compare per chunk in one actor pass: emits
    (n_points, bytes_per_point, max_err, roundtrip_ok) where ok means
    timestamps are bit-exact and values are within the quantization
    half-step (exact when quantize_digits is None)."""

    def __init__(self, quantize_digits: int | None = 3):
        self.qd = quantize_digits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scale = None if self.qd is None else 10.0 ** self.qd
        tol = 0.0 if scale is None else 0.5 / scale + 1e-12
        rows = []
        for conv_id, chunk_idx, ts_arr, values in zip(
            batch["conv_id"], batch["chunk_idx"], batch["ts"], batch["values"]
        ):
            ts = np.asarray(ts_arr, dtype=np.int64)
            vals = np.asarray(values, dtype=np.float64)
            enc_vals = np.round(vals * scale) if scale is not None else vals
            tb, vb, bpp = encode_chunk(ts, enc_vals)
            ts2, vals2 = decode_chunk(tb, vb)
            if scale is not None:
                vals2 = vals2 / scale
            finite = np.isfinite(vals)
            err = float(np.abs(vals2[finite] - vals[finite]).max()) if finite.any() else 0.0
            ok = bool((ts2 == ts).all()) and err <= tol and (
                np.isfinite(vals) == np.isfinite(vals2)
            ).all()
            rows.append(
                {"conv_id": conv_id, "chunk_idx": int(chunk_idx),
                 "n_points": len(vals), "bytes_per_point": bpp,
                 "max_err": err, "roundtrip_ok": ok}
            )
        return pd.DataFrame(rows)


def verify_roundtrip_chunks(chunk_ds, quantize_digits: int | None = 3, concurrency: int = 4):
    """Distributed encode->decode->compare over packed chunk rows."""
    return chunk_ds.map_batches(
        GorillaRoundtripVerifier,
        fn_constructor_kwargs={"quantize_digits": quantize_digits},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


def decompress_chunks(enc_ds, concurrency: int = 4):
    return enc_ds.map_batches(
        GorillaChunkDecoder,
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


class PLAChunkVerifier:
    """Lossy bounded-error PLA compression (`functions/pla`, swing
    filter) per packed chunk in one actor pass: compress, reconstruct
    at the chunk's own timestamps, and emit (n_points, n_segments,
    points_per_segment, max_err, bound_ok). The eps guarantee is
    checked EXACTLY per chunk — bound_ok is the operator's contract,
    not a statistical summary. NaN samples (gap-fill disabled) are
    excluded from the fit and the check."""

    def __init__(self, eps: float = 0.1):
        self.eps = float(eps)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.pla import pla_compress, pla_max_error

        rows = []
        for conv_id, chunk_idx, ts_arr, values in zip(
            batch["conv_id"], batch["chunk_idx"], batch["ts"], batch["values"]
        ):
            ts = np.asarray(ts_arr, dtype=np.int64).astype(np.float64)
            vals = np.asarray(values, dtype=np.float64)
            m = np.isfinite(vals)
            t, v = ts[m], vals[m]
            if len(t):
                s0, v0, sl = pla_compress(t, v, self.eps)
                err = pla_max_error(t, v, s0, v0, sl)
                nseg = len(s0)
            else:
                err, nseg = 0.0, 0
            rows.append({
                "conv_id": conv_id, "chunk_idx": int(chunk_idx),
                "n_points": int(len(t)), "n_segments": nseg,
                "max_err": err,
                "bound_ok": bool(err <= self.eps + 1e-9),
            })
        return pd.DataFrame(rows)


def pla_verify_chunks(chunk_ds, eps: float = 0.1, concurrency: int = 4):
    """Distributed PLA compress->reconstruct->bound-check over chunks."""
    return chunk_ds.map_batches(
        PLAChunkVerifier,
        fn_constructor_kwargs={"eps": eps},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


def wavelet_verify_chunks(chunk_ds, keep_frac: float = 0.1):
    """Distributed Haar top-k compression with the Parseval contract
    checked EXACTLY per chunk (`functions/wavelet`): compress, zero
    the dropped coefficients, reconstruct, and assert that the L2
    reconstruction error over the padded signal EQUALS the dropped
    coefficient energy (orthonormal transform — the identity, not a
    bound) and that the real-prefix error is within the budget. Emits
    (n_points, n_kept, coef_frac, l2_budget, l2_err, parseval_ok).

    Stateless task map, not an actor pool: the per-chunk state is one
    float parameter, and a warm-worker task map avoids actor-pool
    spin-up for cheap-state stages.
    """
    from ..functions.wavelet import (
        haar_dwt,
        haar_idwt,
        pad_pow2,
        wavelet_compress,
        wavelet_reconstruct,
    )

    kf = float(keep_frac)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, chunk_idx, values in zip(
            batch["conv_id"], batch["chunk_idx"], batch["values"]
        ):
            vals = np.asarray(values, dtype=np.float64)
            vals = np.nan_to_num(vals, nan=0.0)  # gaps carry no energy
            comp = wavelet_compress(vals, keep_frac=kf)
            recon = wavelet_reconstruct(comp)
            err_real = float(np.sqrt(np.sum((vals - recon) ** 2)))
            # padded-signal identity: ||x_pad - x̂_pad||_2 == dropped_l2
            pad = pad_pow2(vals)
            c = haar_dwt(pad)
            kept = np.zeros(len(c))
            kept[comp["idx"]] = comp["coef"]
            err_pad = float(np.sqrt(np.sum((pad - haar_idwt(kept)) ** 2)))
            scale = max(1.0, comp["dropped_l2"])
            rows.append({
                "conv_id": conv_id, "chunk_idx": int(chunk_idx),
                "n_points": int(len(vals)), "n_kept": int(len(comp["idx"])),
                "coef_frac": float(len(comp["idx"]) / max(1, comp["n_pad"])),
                "l2_budget": comp["dropped_l2"],
                "l2_err": err_real,
                "parseval_ok": bool(
                    abs(err_pad - comp["dropped_l2"]) <= 1e-6 * scale
                    and err_real <= comp["dropped_l2"] + 1e-6 * scale
                ),
            })
        return pd.DataFrame(rows)

    return chunk_ds.map_batches(verify, batch_format="pandas", batch_size=256)
