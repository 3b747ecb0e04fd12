"""Decode-once host RAM cache for the ego JPEG path (VERDICT r04 #3).

The ego host pipeline is decode-bound (~75% of per-sample cost on the
1-core host, benchmarks/ego_host_profile.json: 28 samples/s cold vs 137
warm); data/ego._DecodeCache makes repeat frame accesses dict hits. These
tests pin that caching changes nothing about the pixels: cached and
uncached datasets produce bit-identical samples, the byte budget is
honored (cache full -> inserts stop, decode still works), and cached
arrays are immutable so a transform bug could never corrupt shared frames.
"""
import numpy as np
import pytest

from bmnas_tpu.data.ego import EgoDataset
from bmnas_tpu.data.synthetic import make_ego_synthetic


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego_cache")
    make_ego_synthetic(str(root), n_per_subset=6, frames=40, hw=64)
    return str(root)


def _ds(corpus, cache_gb, train=True):
    return EgoDataset(corpus, f"{corpus}/annotation.json", "training",
                      sample_size=32, sample_duration=8,
                      train_transform=train, num_workers=2,
                      host_decode_cache_gb=cache_gb)


@pytest.mark.quick
def test_cached_samples_bit_identical_and_hits_accumulate(corpus):
    plain = _ds(corpus, 0.0)
    cached = _ds(corpus, 1.0)
    assert plain.decode_cache_stats() is None
    for idx in range(len(plain)):
        a = plain.load_sample(idx, 1234 + idx)
        b = cached.load_sample(idx, 1234 + idx)
        for k in ("rgb", "depth", "label"):
            np.testing.assert_array_equal(a[k], b[k])
    stats1 = cached.decode_cache_stats()
    # replay the same seeds: identical temporal windows, all resident
    for idx in range(len(cached)):
        cached.load_sample(idx, 1234 + idx)
    stats2 = cached.decode_cache_stats()
    assert stats2["entries"] == stats1["entries"]
    assert stats2["hits"] > stats1["hits"]
    assert stats2["misses"] == stats1["misses"]  # no new decodes
    assert stats2["resident_gb"] <= stats2["budget_gb"]


@pytest.mark.quick
def test_budget_zero_headroom_stops_inserting_but_still_decodes(corpus):
    tiny = _ds(corpus, 1e-6)  # ~1 KB: nothing fits
    a = tiny.load_sample(0, 7)
    b = _ds(corpus, 0.0).load_sample(0, 7)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    stats = tiny.decode_cache_stats()
    assert stats["entries"] == 0 and stats["misses"] > 0


@pytest.mark.quick
def test_cached_arrays_are_readonly(corpus):
    cached = _ds(corpus, 1.0)
    cached.load_sample(0, 7)
    arr = next(iter(cached._decode_cache._map.values()))
    with pytest.raises((ValueError, RuntimeError)):
        arr[0, 0] = 0
