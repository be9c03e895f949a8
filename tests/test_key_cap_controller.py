"""Adaptive instance-budget (key_cap) controller.

Reference behavior being emulated: the CUDA rasterizer reallocates its key
buffer to each view's exact demand every call
(submodules/depth-diff-gaussian-rasterization/rasterize_points.cu
resizeFunctional) so no instance is ever dropped.  The static-shape XLA
port uses a fixed cap + depth-ranked overflow drop; the controller grows
the cap on sustained overflow and shrinks it when a big prune leaves the
binning phase oversized (mom_tpu/pipeline.py:_KeyCapController).
"""

import os

from mom_tpu.pipeline import _KeyCapController


def test_grow_needs_consecutive_overflow():
    c = _KeyCapController(1000)
    # one overflowing log interval is a spike, not a trend
    assert not c.update(instances=1000, overflow=200)
    assert not c.update(instances=1000, overflow=0)
    assert not c.update(instances=1000, overflow=200)
    assert c.cap == 1000
    # second consecutive -> grow to 1.3 x demand, 128-aligned
    assert c.update(instances=1000, overflow=200)
    want = ((int(1200 * 1.3) + 127) // 128) * 128
    assert c.cap == want


def test_small_overflow_tolerated():
    c = _KeyCapController(100_000)
    for _ in range(50):
        assert not c.update(instances=100_000, overflow=4_000)  # 4% < 5%
    assert c.cap == 100_000


def test_shrink_needs_long_low_demand():
    c = _KeyCapController(4_000_000)
    for i in range(7):
        assert not c.update(instances=700_000, overflow=0)
    assert c.update(instances=700_000, overflow=0)
    want = ((int(700_000 * 1.6) + 127) // 128) * 128
    assert c.cap == want
    # post-shrink occupancy ~62%: neither trigger fires again
    for _ in range(20):
        assert not c.update(instances=700_000, overflow=0)


def test_no_oscillation_after_grow():
    c = _KeyCapController(500_000)
    c.update(instances=500_000, overflow=200_000)
    assert c.update(instances=500_000, overflow=200_000)
    cap_after = c.cap
    # demand steady at the grow-time level: ~77% occupancy, stable
    for _ in range(30):
        assert not c.update(instances=700_000, overflow=0)
    assert c.cap == cap_after


def test_max_cap_pin(monkeypatch):
    monkeypatch.setenv("MOM_TPU_MAX_KEY_CAP", "1000000")
    c = _KeyCapController(999_936)  # 128-aligned, just under the pin
    for _ in range(10):
        c.update(instances=999_936, overflow=5_000_000)
    assert c.cap <= 1_000_000


def test_interrupted_shrink_streak_resets():
    c = _KeyCapController(4_000_000)
    for _ in range(7):
        assert not c.update(instances=700_000, overflow=0)
    # a demand burst (e.g. densification) resets the streak
    assert not c.update(instances=1_500_000, overflow=0)
    for _ in range(7):
        assert not c.update(instances=700_000, overflow=0)
    assert c.cap == 4_000_000


def test_resolve_key_cap_resume_never_shrinks():
    """train_4DGS.resolve_key_cap: a resume restores the checkpoint's
    established instance budget when it exceeds the mult-derived cap, and
    keeps the (larger) mult-derived cap otherwise (round-4 poisoning fix)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from train_4DGS import resolve_key_cap

    # fresh run: CHUNK-aligned mult-derived cap
    cap, restored = resolve_key_cap(143_243, 4.0, None)
    assert cap == ((143_243 * 4 + 127) // 128) * 128 and not restored

    # resume with a LARGER established budget: restore it (the poisoned-run
    # scenario: alive*4 = 573k vs checkpoint key_cap 1.97M)
    cap, restored = resolve_key_cap(143_243, 4.0,
                                    {"key_cap": 1_969_152})
    assert cap == 1_969_152 and restored

    # resume with a smaller checkpoint budget: mult-derived wins
    cap0, _ = resolve_key_cap(150_000, 7.0, None)
    cap, restored = resolve_key_cap(150_000, 7.0, {"key_cap": 1024})
    assert cap == cap0 and not restored

    # missing extras key behaves like a fresh run
    cap, restored = resolve_key_cap(1000, 4.0, {})
    assert cap == 4096 and not restored
