"""Offline shard writer/reader roundtrip."""

import numpy as np

from posecnn_tpu.data.shards import ShardReader, write_shards
from posecnn_tpu.data.synthetic import SyntheticSceneGenerator


def test_shard_roundtrip(tmp_path, rng):
    c, p, h, w = 4, 32, 48, 64
    points = (rng.rand(c, p, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, min_objects=1, max_objects=2,
        t_near=0.6, t_far=1.2, seed=5,
    )
    paths = write_shards(gen, str(tmp_path), num_samples=10, samples_per_shard=4)
    assert len(paths) == 3  # 4 + 4 + 2

    reader = ShardReader(str(tmp_path), c, gen.pixel_means, chromatic=True)
    s = reader.sample()
    assert s["image"].shape == (h, w, 3)
    assert s["label"].shape == (h, w)
    assert s["poses"].shape[1] == 13
    assert (s["label"] > 0).sum() > 20
    # background compositing replaces empty pixels
    bgs = np.full((2, h, w, 3), 200, np.uint8)
    reader_bg = ShardReader(str(tmp_path), c, gen.pixel_means, chromatic=False, backgrounds=bgs)
    s2 = reader_bg.sample()
    bg_px = s2["image"][s2["label"] == 0] + gen.pixel_means
    assert abs(bg_px.mean() - 200) < 2


def test_shard_reader_host_sharding(tmp_path, rng):
    c, p, h, w = 3, 16, 32, 32
    points = (rng.rand(c, p, 3).astype(np.float32) - 0.5) * 0.1
    extents = np.abs(points).max(1) * 2
    k = np.array([[60.0, 0, 16], [0, 60.0, 16], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=w, height=h,
                                  min_objects=1, max_objects=1, seed=2)
    write_shards(gen, str(tmp_path), num_samples=8, samples_per_shard=2)
    r0 = ShardReader(str(tmp_path), c, gen.pixel_means, process_index=0, process_count=2)
    r1 = ShardReader(str(tmp_path), c, gen.pixel_means, process_index=1, process_count=2)
    assert len(r0.paths) == 2 and len(r1.paths) == 2
    assert set(r0.paths).isdisjoint(r1.paths)


def test_prefetcher_factory_per_worker_producers():
    """Prefetcher(make_batch_factory=…) gives each worker its own
    producer; a shared make_batch with >1 worker is rejected (rng
    state races)."""
    import time

    import pytest

    from posecnn_tpu.data.pipeline import Prefetcher

    seen = []

    def factory(worker_id):
        def make():
            time.sleep(0.005)
            return {"wid": worker_id}

        return make

    p = Prefetcher(make_batch_factory=factory, queue_size=4, num_workers=2)
    got = {next(p)["wid"] for _ in range(12)}
    p.close()
    assert got <= {0, 1} and len(got) >= 1

    with pytest.raises(ValueError):
        Prefetcher(make_batch=lambda: {}, num_workers=2)
    with pytest.raises(ValueError):
        Prefetcher()
    # single shared producer with one worker is fine
    p1 = Prefetcher(make_batch=lambda: {"x": 1}, num_workers=1)
    assert next(p1)["x"] == 1
    p1.close()
