"""Registry rotation: the driver's correctness gate sees only the
first 50 of ``all_queries()``, so the ordering IS the coverage policy —
pin it. No Spark session needed (pure ordering logic)."""

from __future__ import annotations

from kafka_streams_reorder_timestamp_spark.operators import registry


def _with_history(monkeypatch, seen, failed, rows_only=frozenset()):
    monkeypatch.setattr(
        registry, "_driver_history", lambda: (seen, failed, rows_only)
    )
    monkeypatch.setattr(registry, "_ROTATION_CACHE", None)
    return registry._rotated_names()


def test_failed_queries_sort_first(monkeypatch):
    names = list(registry.REGISTRY)
    a, b, c = names[0], names[1], names[2]
    # c failed in the latest round it was seen; a was seen recently;
    # b never seen. Expected: failed < never-seen < seen.
    order = _with_history(monkeypatch, {a: 4, c: 4}, {c})
    assert order.index(c) < order.index(b) < order.index(a)


def test_least_recently_verified_first(monkeypatch):
    names = list(registry.REGISTRY)
    a, b = names[0], names[1]
    order = _with_history(monkeypatch, {a: 2, b: 4}, set())
    assert order.index(a) < order.index(b)


def test_ties_keep_registration_order(monkeypatch):
    names = list(registry.REGISTRY)
    order = _with_history(monkeypatch, {}, set())
    assert order == names  # all unseen -> pure registration order


def test_newly_oracled_rows_only_pin_just_after_failures(monkeypatch):
    """A query whose latest driver row was the weaker rows-only check
    but which now exports an oracle must jump to just after failures;
    one that still exports no oracle (approx-by-design) must NOT."""
    with_oracle = next(
        n for n in registry.REGISTRY if registry.REGISTRY[n].oracle is not None
    )
    no_oracle = next(
        n for n in registry.REGISTRY if registry.REGISTRY[n].oracle is None
    )
    other = next(
        n
        for n in registry.REGISTRY
        if n not in (with_oracle, no_oracle)
        and registry.REGISTRY[n].oracle is not None
    )
    seen = {with_oracle: 9, no_oracle: 9, other: 1}
    order = _with_history(
        monkeypatch, seen, {other}, {with_oracle, no_oracle}
    )
    # failed ≺ pinned(newly-oracled) ≺ never-seen tail; the approx
    # query keeps its seen-round rank (9 = most recent, sorts last).
    assert order.index(other) < order.index(with_oracle)
    assert order.index(with_oracle) < order.index(no_oracle)
    never_seen = next(
        n for n in registry.REGISTRY if n not in seen
    )
    assert order.index(with_oracle) < order.index(never_seen)


def test_rotation_is_cached_and_complete(monkeypatch):
    seen = {n: 1 for n in list(registry.REGISTRY)[:5]}
    first = _with_history(monkeypatch, seen, set())
    # second call must hit the cache (history raising would surface)
    monkeypatch.setattr(
        registry,
        "_driver_history",
        lambda: (_ for _ in ()).throw(AssertionError("not cached")),
    )
    assert registry._rotated_names() == first
    assert set(first) == set(registry.REGISTRY)


def test_real_artifacts_order_never_checked_first():
    """With the repo's actual CORRECTNESS_r*.json artifacts: every
    query the driver has never looked at, and every query whose latest
    driver row was rows-only but which now exports an oracle, must land
    inside the first 50 — the gate's window."""
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set()
    for fn in os.listdir(repo_root):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(repo_root, fn)) as f:
                seen.update(json.load(f))
    registry._ROTATION_CACHE = None
    order = registry._rotated_names()
    _, _, rows_only = registry._driver_history()
    never = [n for n in registry.REGISTRY if n not in seen]
    pinned = [
        n
        for n in rows_only
        if n in registry.REGISTRY and registry.REGISTRY[n].oracle is not None
    ]
    window = set(order[:50])
    missing = [n for n in never + pinned if n not in window]
    assert not missing, f"must-check queries outside the 50-window: {missing}"
