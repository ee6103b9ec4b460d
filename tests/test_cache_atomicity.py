"""Atomic publication of shared cache directories (VERDICT r5 #3).

The hazard: ``df.write.mode('overwrite').parquet(final_path)`` deletes
then rewrites IN PLACE, so a concurrent process sharing
``SPARK_GRAFT_CACHE_DIR`` can observe ``_SUCCESS`` belonging to a
half-overwritten directory.  ``_publish_cache_dir`` closes the window
with a single POSIX directory rename; these tests pin the invariant
(final exists => final is complete) under a concurrent reader, plus the
collision rules, without needing Spark -- the helper is pure filesystem.
"""

from __future__ import annotations

import os
import threading

from big_data_co2_emission_analysis_spark.queries.mlops import _publish_cache_dir


def _build_tmp(root: str, name: str, payload: dict[str, str]) -> str:
    tmp = os.path.join(root, name)
    os.makedirs(tmp)
    for fname, content in payload.items():
        with open(os.path.join(tmp, fname), "w") as fh:
            fh.write(content)
    return tmp


def test_publish_is_never_observed_incomplete(tmp_path):
    """A reader polling the final path as fast as it can must NEVER see
    the directory exist without its ready marker and full payload --
    across many publish cycles (each into a fresh generation dir, the
    way every cache guard uses it)."""
    root = str(tmp_path)
    violations: list[str] = []
    stop = threading.Event()
    final = os.path.join(root, "index_final")

    def _gen_id():
        # identity of the generation currently mounted at `final`:
        # publishes are renames of fresh tmp dirs, so each generation
        # has a distinct inode -- a stale read brackets to a DIFFERENT
        # id and is benign (the old isdir re-verify was itself racy:
        # under CPU load a full retire+publish cycle fit between the
        # two non-atomic checks and false-positived)
        try:
            st = os.stat(final)
            return (st.st_dev, st.st_ino)
        except FileNotFoundError:
            return None

    def reader() -> None:
        while not stop.is_set():
            before = _gen_id()
            if before is None:
                continue
            if not os.path.exists(os.path.join(final, "_SUCCESS")):
                # violation ONLY if the SAME generation is still
                # mounted: then the marker was genuinely missing from
                # a visible dir (renames carry the marker atomically)
                if _gen_id() == before:
                    violations.append("exists without _SUCCESS")
                    return
                continue
            try:
                with open(os.path.join(final, "part-0")) as fh:
                    if fh.read() != "data":
                        violations.append("partial payload visible")
                        return
            except FileNotFoundError:
                if _gen_id() == before:
                    violations.append("_SUCCESS before payload")
                    return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for gen in range(200):
            # writer protocol: slow multi-file build into tmp, one rename
            tmp = _build_tmp(root, f"b{gen}", {"part-0": "data", "_SUCCESS": ""})
            _publish_cache_dir(tmp, final)
            # retire the generation ATOMICALLY (rmtree would itself
            # create a half-deleted window and test the harness, not
            # the publish): rename away whole, delete off to the side
            grave = os.path.join(root, f"g{gen}")
            os.rename(final, grave)
    finally:
        stop.set()
        t.join()
    assert violations == []


def test_publish_collision_keeps_complete_winner(tmp_path):
    """Two builders raced: the loser's rename fails against a COMPLETE
    winner -- the winner's bytes survive untouched, the loser's tmp is
    cleaned up."""
    root = str(tmp_path)
    final = os.path.join(root, "idx")
    winner = _build_tmp(root, "w", {"part-0": "winner", "_SUCCESS": ""})
    _publish_cache_dir(winner, final)
    loser = _build_tmp(root, "l", {"part-0": "loser", "_SUCCESS": ""})
    _publish_cache_dir(loser, final)
    with open(os.path.join(final, "part-0")) as fh:
        assert fh.read() == "winner"
    assert not os.path.exists(loser)


def test_publish_replaces_incomplete_leftover(tmp_path):
    """A leftover final WITHOUT the ready marker (crashed old-code
    writer) is trusted by no cache guard, so a fresh publish replaces
    it."""
    root = str(tmp_path)
    final = _build_tmp(root, "idx", {"part-0": "halfdead"})  # no _SUCCESS
    fresh = _build_tmp(root, "f", {"part-0": "fresh", "_SUCCESS": ""})
    _publish_cache_dir(fresh, final)
    with open(os.path.join(final, "part-0")) as fh:
        assert fh.read() == "fresh"
    assert os.path.exists(os.path.join(final, "_SUCCESS"))


def test_publish_respects_nested_ready_marker(tmp_path):
    """The IVF/PQ index roots gate on a NESTED marker
    (centroids/_SUCCESS); a complete winner under that convention must
    also survive a losing publish."""
    root = str(tmp_path)
    final = os.path.join(root, "ivf")
    winner = os.path.join(root, "w")
    os.makedirs(os.path.join(winner, "centroids"))
    with open(os.path.join(winner, "centroids", "_SUCCESS"), "w"):
        pass
    with open(os.path.join(winner, "cells"), "w") as fh:
        fh.write("winner")
    _publish_cache_dir(winner, final, ready_marker="centroids/_SUCCESS")
    loser = os.path.join(root, "l")
    os.makedirs(os.path.join(loser, "centroids"))
    with open(os.path.join(loser, "cells"), "w") as fh:
        fh.write("loser")
    _publish_cache_dir(loser, final, ready_marker="centroids/_SUCCESS")
    with open(os.path.join(final, "cells")) as fh:
        assert fh.read() == "winner"
