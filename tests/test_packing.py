"""Sequence packing: capacity, completeness, determinism, efficiency."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.operators.packing import pack_sequences


@pytest.fixture()
def sized(spark):
    # 200 docs, lengths 1..400 cycling (some oversize vs L=256)
    rows = [(i, 1 + (i * 37) % 400) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]), dict(rows)


def test_pack_capacity_completeness_determinism(spark, sized):
    df, lens = sized
    L = 256
    out = pack_sequences(df, "doc_id", "n_tokens", L, shards=8).collect()
    # every doc exactly once
    assert sorted(r.id for r in out) == sorted(lens)
    # bins respect capacity except flagged oversize singletons
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for members in by_bin.values():
        total = sum(r.n_tokens for r in members)
        assert all(r.bin_fill == total for r in members)
        if any(r.oversize for r in members):
            assert len(members) == 1 and total > L
        else:
            assert total <= L
    # deterministic across invocations
    again = pack_sequences(df, "doc_id", "n_tokens", L, shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # different seed → different sharding, same capacity law
    other = pack_sequences(
        df, "doc_id", "n_tokens", L, shards=8, seed="epoch2"
    ).collect()
    assert {r.id for r in other} == set(lens)


def test_pack_efficiency_bound(spark, sized):
    """FFD within shards: total bins stay within 1.6x the global lower
    bound ceil(sum/L) on this corpus (shard-boundary loss included) —
    the padding-waste audit a training pipeline watches."""
    import math

    df, lens = sized
    L = 256
    out = pack_sequences(df, "doc_id", "n_tokens", L, shards=8).collect()
    regular = [r for r in out if not r.oversize]
    n_bins = len({r.bin_id for r in regular})
    lower = math.ceil(sum(r.n_tokens for r in regular) / L)
    assert n_bins <= math.ceil(1.6 * lower)


def test_pack_exact_fit_is_full_bin_not_oversize(spark, sized):
    """Boundary pin (r7 ADVICE): a doc of exactly context_len tokens is
    a perfect zero-padding fit — it must pack into a full, UNFLAGGED
    singleton bin, never the oversize isolate branch. The fixture
    contains one such doc (i=115 → 1 + 115*37 % 400 == 256)."""
    df, lens = sized
    L = 256
    exact = [i for i, ln in lens.items() if ln == L]
    assert exact, "fixture must contain an exact-fit doc"
    out = pack_sequences(df, "doc_id", "n_tokens", L, shards=8).collect()
    rows = {r.id: r for r in out}
    for i in exact:
        r = rows[i]
        assert not r.oversize
        assert r.bin_fill == L  # alone in a bin filled to capacity
    # and strictly-longer docs still isolate with the flag
    assert all(r.oversize for r in out if r.n_tokens > L)


def test_pack_rejects_bad_context(spark, sized):
    df, _ = sized
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", 0)
