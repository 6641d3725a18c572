"""embedding_conditioned_precondition: two planted AR(1) regimes must
separate into different clusters, recover their phi from the pooled
Yule-Walker solve, beat the single global filter, and reverse exactly
(the non-torch EmbeddingPrecondition analogue)."""

import numpy as np
import pandas as pd


def _chunks(ray_session):
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(3)
    rows = []
    n = 400
    for regime, phi in (("a", 0.85), ("b", -0.7)):
        for j in range(15):
            x = np.zeros(n)
            for t in range(1, n):
                x[t] = phi * x[t - 1] + rng.normal()
            rows.append(
                {
                    "conv_id": f"{regime}{j}",
                    "chunk_idx": 0,
                    "values": x.astype(np.float64),
                }
            )
    df = pd.DataFrame(rows)
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_two_regimes_recover(ray_session):
    from spectral_time_series_ray.stages.analytics import (
        embedding_conditioned_precondition,
    )

    ds = _chunks(ray_session)
    applied, coeffs, global_coeffs = embedding_conditioned_precondition(
        ds, n_clusters=2, order=1, feat_lags=6, iters=6, seed=5, concurrency=2
    )
    out = applied.to_pandas()
    a = out[out["conv_id"].str.startswith("a")]
    b = out[out["conv_id"].str.startswith("b")]
    # separation: disjoint majority clusters
    assert set(a["cluster"]) != set(b["cluster"])
    assert a["cluster"].nunique() == 1 and b["cluster"].nunique() == 1
    # phi recovery from the pooled cluster taps
    assert abs(float(a["cluster_coeffs"].iloc[0][0]) - 0.85) < 0.1
    assert abs(float(b["cluster_coeffs"].iloc[0][0]) + 0.7) < 0.1
    # the global filter pools both regimes and whitens neither as well
    assert (
        out["whitened_var_ratio_cluster"] < out["whitened_var_ratio_global"]
    ).all()
    # exact reversal
    assert (out["roundtrip_err"] < 1e-8).all()
    # the global taps sit between the regimes
    g1 = float(global_coeffs[0])
    assert -0.7 < g1 < 0.85
