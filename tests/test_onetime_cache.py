"""Cross-session one-time build cache (VERDICT r10 #3): hit/miss
behavior, stale-key invalidation, marker placement, and the parquet
frame round-trip."""

from __future__ import annotations

import os

import pytest

from tagtree_spark import onetime_cache as oc


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TAGTREE_ONETIME_CACHE", str(tmp_path / "cache"))
    return tmp_path


def test_cached_dir_builds_once_per_key(cache_env):
    calls = []

    def build(d):
        calls.append(d)
        with open(os.path.join(d, "artifact.txt"), "w") as f:
            f.write("payload")

    d1 = oc.cached_dir("x", "/sf", "v1", build)
    d2 = oc.cached_dir("x", "/sf", "v1", build)
    assert d1 == d2
    assert len(calls) == 1  # second call was a hit
    with open(os.path.join(d1, "artifact.txt")) as f:
        assert f.read() == "payload"


def test_cached_dir_stale_key_invalidation(cache_env):
    calls = []

    def build(d):
        calls.append(d)
        open(os.path.join(d, "a"), "w").close()

    d1 = oc.cached_dir("x", "/sf", "v1", build)
    d2 = oc.cached_dir("x", "/sf", "v2", build)  # version moved → rebuild
    d3 = oc.cached_dir("x", "/sf", "v1", build, params="p=2")  # params moved
    assert len({d1, d2, d3}) == 3
    assert len(calls) == 3
    # the old artifact is orphaned, never deleted under a reader's feet
    assert os.path.exists(os.path.join(d1, "a"))


def test_marker_is_a_sibling_not_inside_the_artifact(cache_env):
    """Byte-level readers glob the store dir — the commit marker must
    not appear among the builder's files."""

    def build(d):
        open(os.path.join(d, "segment-0"), "w").close()

    d = oc.cached_dir("wal", "/sf", "v1", build)
    assert os.listdir(d) == ["segment-0"]
    assert os.path.exists(d + ".complete")


def test_incomplete_build_is_not_committed(cache_env):
    def bad(d):
        open(os.path.join(d, "partial"), "w").close()
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        oc.cached_dir("x", "/sf", "v1", bad)

    built = []

    def good(d):
        built.append(d)
        open(os.path.join(d, "full"), "w").close()

    d = oc.cached_dir("x", "/sf", "v1", good)
    assert built and os.path.exists(os.path.join(d, "full"))
    assert not os.path.exists(os.path.join(d, "partial"))


def test_disabled_cache_builds_every_call(monkeypatch):
    monkeypatch.setenv("TAGTREE_ONETIME_CACHE", "0")
    calls = []

    def build(d):
        calls.append(d)

    d1 = oc.cached_dir("x", "/sf", "v1", build)
    d2 = oc.cached_dir("x", "/sf", "v1", build)
    assert d1 != d2 and len(calls) == 2


def test_source_version_tracks_code_changes():
    def f1():
        return 1

    def f2():
        return 2

    assert oc.source_version(f1) != oc.source_version(f2)
    assert oc.source_version(f1) == oc.source_version(f1)


def test_cached_frame_roundtrip_and_hit(cache_env, spark):
    builds = []

    def build_df():
        builds.append(1)
        return spark.range(5).selectExpr(
            "id", "CAST(id AS DOUBLE) / 3.0 AS x", "array(id, id * 2) AS arr"
        )

    a = oc.cached_frame(spark, "fr", "/sf", "v1", build_df).toPandas()
    b = oc.cached_frame(spark, "fr", "/sf", "v1", build_df).toPandas()
    assert len(builds) == 1
    # doubles and arrays round-trip bit-exactly through parquet
    assert [repr(v) for v in a["x"]] == [repr(v) for v in b["x"]]
    assert a["arr"].map(list).tolist() == b["arr"].map(list).tolist()
