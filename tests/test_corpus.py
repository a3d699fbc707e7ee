"""Corpus generator determinism + shape contract (FIXTURES.md §B)."""

from __future__ import annotations

import hashlib

from nise_dedup import corpus as C


def _digest(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(repr((r.repo, r.path, r.commit, r.lang, r.content,
                       r.gt_cluster, r.dup_class)).encode())
    return h.hexdigest()


def test_deterministic_across_calls():
    assert _digest(C.generate("tiny", 42)) == _digest(C.generate("tiny", 42))
    assert _digest(C.generate("tiny", 42)) != _digest(C.generate("tiny", 43))


def test_shape_and_classes():
    rows = C.generate("tiny", 42)
    assert len(rows) >= C.SIZES["tiny"]
    classes = {r.dup_class for r in rows}
    assert {"exact", "ws", "comment", "rename", "edit", "block",
            "license", "unique", "skew"} <= classes
    for r in rows[:50]:
        assert r.lang in C.LANGS + ["py"]
        assert len(r.commit) == 40
        assert isinstance(r.content, str) and r.content
    # natural keys unique
    keys = {(r.repo, r.path, r.commit) for r in rows}
    assert len(keys) == len(rows)
    # positive clusters have >= 2 members
    from collections import Counter
    sizes = Counter(r.gt_cluster for r in rows if r.gt_cluster > 0)
    assert all(v >= 2 for v in sizes.values())


def test_exact_class_is_byte_identical():
    rows = C.generate("tiny", 42)
    from collections import defaultdict
    groups = defaultdict(list)
    for r in rows:
        if r.dup_class == "exact" and r.gt_cluster > 0:
            groups[r.gt_cluster].append(r.content)
    assert groups
    for members in groups.values():
        assert len(set(members)) == 1
