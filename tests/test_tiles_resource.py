"""TileManager (TileManager.h) + FileResource (FileResource.h) tests."""
import os
import sys

import numpy as np

from pislamfusion_tpu.io.tiles import (TileManager, tile_hash,
                                       lnglat_to_tile, tile_bounds)
from pislamfusion_tpu.core import resource


def test_tile_hash_unique():
    assert tile_hash(1, 2, 3) != tile_hash(2, 1, 3)
    assert tile_hash(5, 5, 5) == (5 << 48) | (5 << 24) | 5


def test_tile_manager_roundtrip(tmp_path, rng):
    tm = TileManager()
    for x in range(2):
        for y in range(2):
            img = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
            tm.set_tile(100 + x, 200 + y, 5, img)
    assert len(tm) == 4
    t = tm.get_tile(100, 200, 5)
    assert t is not None and t.image.shape == (256, 256, 3)
    # parent synthesis
    assert tm.build_parent_level(5) == 1
    p = tm.get_tile(50, 100, 4)
    assert p is not None
    # save / load
    n = tm.save(str(tmp_path))
    assert n == 5
    tm2 = TileManager.load(str(tmp_path))
    assert len(tm2) == 5
    np.testing.assert_array_equal(tm2.get_tile(100, 200, 5).image, t.image)


def test_tile_manager_lru():
    tm = TileManager(max_bytes=3 * 256 * 256 * 3)
    for i in range(5):
        tm.set_tile(i, 0, 3, np.zeros((256, 256, 3), np.uint8))
    assert len(tm) <= 3
    assert tm.get_tile(4, 0, 3) is not None   # newest kept
    assert tm.get_tile(0, 0, 3) is None       # oldest evicted


def test_lnglat_tile_mapping():
    x, y = lnglat_to_tile(116.35, 39.96, 15)
    (lng0, lat0), (lng1, lat1) = tile_bounds(x, y, 15)
    assert lng0 <= 116.35 <= lng1
    assert lat1 <= 39.96 <= lat0


def test_file_resource(tmp_path):
    resource.register("vocab/test.gbow", b"\x00\x01BINARY")
    assert resource.get("vocab/test.gbow") == b"\x00\x01BINARY"
    out = str(tmp_path / "sub" / "test.gbow")
    assert resource.export("vocab/test.gbow", out)
    assert open(out, "rb").read() == b"\x00\x01BINARY"
    assert resource.get("missing") is None
    # generated embedding module round-trip
    src = str(tmp_path / "data.bin")
    open(src, "wb").write(os.urandom(300))
    mod = str(tmp_path / "embedded_res.py")
    assert resource.generate_module(src, "embedded/data.bin", mod)
    sys.path.insert(0, str(tmp_path))
    try:
        import embedded_res  # noqa: F401
    finally:
        sys.path.remove(str(tmp_path))
    assert resource.get("embedded/data.bin") == open(src, "rb").read()


def test_memory_metric():
    """MemoryMetric.h parity surface: usage counters + callsite dumps."""
    from pislamfusion_tpu.core import memory_metric as mm
    mm.enable()
    try:
        blob = [bytearray(200_000) for _ in range(4)]
        assert mm.used_bytes() > 500_000
        assert mm.peak_bytes() >= mm.used_bytes()
        d = mm.dump_by_size(top=5)
        assert "callsite" in d and len(d.splitlines()) >= 2
        d2 = mm.dump_by_count(top=5)
        assert "callsite" in d2
        del blob
    finally:
        mm.disable()
    assert not mm.is_enabled()
    assert mm.dump_by_size() == "(memory metric disabled)"
