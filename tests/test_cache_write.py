"""Unit tests for the fingerprint-cache publish/prune protocol in
lakehouse_sfc_spark/queries/layouts.py: errno-adjudicated atomic rename
(ADVICE r11 medium) and dead-pid tmp pruning (ADVICE r11 low).

Pure-filesystem tests — no Spark session; write_to is a plain directory
maker so the protocol is exercised in isolation.
"""

import os

import pytest

from lakehouse_sfc_spark.queries.layouts import (
    _atomic_cache_write,
    _tmp_builder_dead,
)


def _make(payload: str, success: bool = True):
    """A write_to callable materializing a dir with one payload file."""

    def write_to(p: str) -> None:
        os.makedirs(p)
        with open(os.path.join(p, "part-0"), "w") as fh:
            fh.write(payload)
        if success:
            open(os.path.join(p, "_SUCCESS"), "w").close()

    return write_to


def test_publish_into_empty_slot(tmp_path):
    path = str(tmp_path / "fp")
    _atomic_cache_write(_make("fresh"), path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert open(os.path.join(path, "part-0")).read() == "fresh"
    assert not [d for d in os.listdir(tmp_path) if ".tmp." in d]


def test_stale_partial_dir_is_evicted_and_replaced(tmp_path):
    """A crash-leftover partial dir (no _SUCCESS) squatting on the cache
    path must NOT win forever: the fresh build evicts it and publishes."""
    path = str(tmp_path / "fp")
    os.makedirs(path)
    with open(os.path.join(path, "part-0"), "w") as fh:
        fh.write("stale-partial")  # no _SUCCESS
    _atomic_cache_write(_make("fresh"), path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert open(os.path.join(path, "part-0")).read() == "fresh"


def test_losing_race_to_complete_sibling_discards_ours(tmp_path):
    """A COMPLETE dir already at path (concurrent builder won) is kept;
    our equivalent copy is discarded silently."""
    path = str(tmp_path / "fp")
    _make("winner")(path)
    _atomic_cache_write(_make("loser"), path)
    assert open(os.path.join(path, "part-0")).read() == "winner"
    assert not [d for d in os.listdir(tmp_path) if ".tmp." in d]


def test_unexpected_errno_reraises(tmp_path, monkeypatch):
    path = str(tmp_path / "fp")

    def boom(src, dst):
        raise OSError(13, "Permission denied")

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError):
        _atomic_cache_write(_make("x"), path)
    # tmp scratch cleaned up even on the raise path
    assert not [d for d in os.listdir(tmp_path) if ".tmp." in d]


def test_tmp_builder_dead_detection():
    fp = "abc123"
    # own pid: alive
    assert not _tmp_builder_dead(f"{fp}.tmp.{os.getpid()}", fp)
    # pid 1 exists but is not ours: PermissionError path -> alive
    # (in a container we may BE uid 0 and pid 1 is live -> still alive)
    assert not _tmp_builder_dead(f"{fp}.tmp.1", fp)
    # malformed suffix: prune
    assert _tmp_builder_dead(f"{fp}.tmp.notanumber", fp)
    # a pid far above pid_max on this box: dead
    dead = 2**22 + 12345
    assert _tmp_builder_dead(f"{fp}.tmp.{dead}", fp)
