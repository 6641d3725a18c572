"""FFD sequence-packing tests (reference PackCollate semantics,
loader.py:103-209)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.stages.packing import ffd_pack, pack_bins, packing_stats


def test_ffd_pack_hand_case():
    # capacity 10, lengths 8,7,3,2,2 -> FFD order 8,7,3,2,2:
    # 8->bin0, 7->bin1, 3->bin1(rem 3->0), 2->bin0(rem 2->0), 2->bin2
    lengths = np.array([8, 7, 3, 2, 2])
    bin_of, slot_of = ffd_pack(lengths, 10)
    fills = np.bincount(bin_of, weights=lengths)
    assert (fills <= 10).all()
    assert bin_of[0] == 0 and bin_of[1] == 1 and bin_of[2] == 1
    assert bin_of[3] == 0 and bin_of[4] == 2
    # slots count up within each bin
    for b in np.unique(bin_of):
        slots = np.sort(slot_of[bin_of == b])
        assert (slots == np.arange(1, len(slots) + 1)).all()


def test_ffd_pack_rejects_oversize():
    with pytest.raises(ValueError):
        ffd_pack(np.array([5, 11]), 10)
    with pytest.raises(ValueError):
        ffd_pack(np.array([0, 3]), 10)


@given(
    st.lists(st.integers(1, 100), min_size=1, max_size=300),
    st.integers(100, 400),
)
@settings(max_examples=50, deadline=None)
def test_ffd_pack_properties(lengths, cap):
    lengths = np.asarray(lengths)
    bin_of, slot_of = ffd_pack(lengths, cap)
    fills = np.bincount(bin_of, weights=lengths)
    assert (fills <= cap).all()  # capacity respected
    assert len(bin_of) == len(lengths)  # every sequence placed once
    # FFD guarantee: at most one bin is less than half full
    assert int((fills < cap / 2).sum()) <= 1
    for b in np.unique(bin_of):
        slots = np.sort(slot_of[bin_of == b])
        assert (slots == np.arange(1, len(slots) + 1)).all()


def test_pack_bins_stage(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "chunk_idx": np.zeros(n, dtype=np.int64),
            "n_points": rng.integers(50, 1500, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = pack_bins(ds, max_length=2048).to_pandas()
    assert len(out) == n
    per_bin = out.groupby("bin_id")["n_points"].sum()
    assert (per_bin <= 2048).all()
    # bin_fill column agrees with the actual bin totals
    chk = out.merge(per_bin.rename("fill"), on="bin_id")
    assert (chk["bin_fill"] == chk["fill"]).all()
    stats = packing_stats(out, 2048)
    assert stats["packed_padding_frac"] < stats["naive_padding_frac"]


def _sft_reference(df: pd.DataFrame) -> set[tuple]:
    """Brute-force nearest-preceding-user pairing."""
    want = set()
    for conv, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        last_user = None
        for _, r in g.iterrows():
            if r["role"] == "user":
                last_user = (int(r["turn_idx"]), r["text"])
            elif r["role"] == "assistant" and last_user is not None:
                want.add((conv, last_user[0], int(r["turn_idx"]),
                          last_user[1], r["text"]))
    return want


def test_sft_pairs_vs_bruteforce(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.packing import sft_pairs

    rng = np.random.default_rng(11)
    rows = []
    for c in range(40):
        n = int(rng.integers(1, 12))
        roles = rng.choice(["user", "assistant", "tool"], size=n)
        for t in range(n):
            rows.append((f"c{c:03d}", t, roles[t], f"text-{c}-{t}"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    # shuffled on disk: order must be restored by the stage
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)

    ds = ray.data.from_pandas(df).repartition(5)
    out = sft_pairs(ds, num_partitions=3).to_pandas()

    got = set(zip(out["conv_id"], out["prompt_turn_idx"].astype(int),
                  out["response_turn_idx"].astype(int),
                  out["prompt_text"], out["response_text"]))
    assert got == _sft_reference(df)
    # hashes match an independent recomputation of the emitted text
    from spectral_time_series_ray.functions.hashing import fnv1a_u64
    assert (out["prompt_hash"].to_numpy(np.int64)
            == fnv1a_u64(list(out["prompt_text"])).view(np.int64)).all()
    # each response turn appears at most once
    assert not out.duplicated(["conv_id", "response_turn_idx"]).any()
