"""Streaming heavy hitters (streaming/topk.py): drained stream's sketch
must equal the batch CMS over the same data; replay idempotent; compaction
preserves the answer with bounded segments."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-topk-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tokens(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["token"])


def test_streaming_heavy_hitters_match_batch_cms(spark, tmpdir):
    from tagtree_spark.operators.sketch import cms_estimates, cms_registers
    from tagtree_spark.streaming.topk import HeavyHittersSink, read_heavy_hitters

    sink = HeavyHittersSink(tmpdir, "token", cand_n=8)
    b0 = ["hot"] * 10 + ["warm"] * 4 + ["x1", "x2"]
    b1 = ["hot"] * 7 + ["warm"] * 5 + ["x3"]
    sink(_tokens(spark, b0), 0)
    sink(_tokens(spark, b1), 1)

    got = read_heavy_hitters(spark, tmpdir, k=3).collect()
    assert [r.value for r in got][:2] == ["hot", "warm"]

    # stream registers == batch registers over the concatenated data:
    # point estimates must agree exactly for every candidate
    all_df = _tokens(spark, b0 + b1)
    regs = cms_registers(all_df, "token")
    batch_est = {
        r.token: r.cms_est for r in cms_estimates(all_df, regs, "token").collect()
    }
    for r in got:
        assert r.cms_est == batch_est[r.value]

    # replay batch 1 (crash recovery): same segment rewritten, answer stable
    sink(_tokens(spark, b1), 1)
    again = read_heavy_hitters(spark, tmpdir, k=3).collect()
    assert [(r.value, r.cms_est) for r in again] == [(r.value, r.cms_est) for r in got]


def test_streaming_heavy_hitters_compaction(spark, tmpdir):
    from tagtree_spark.streaming.topk import HeavyHittersSink, read_heavy_hitters

    sink = HeavyHittersSink(tmpdir, "token", cand_n=4, compact_every=3)
    for b in range(5):
        sink(_tokens(spark, ["always"] * 3 + [f"only{b}"]), b)
    # batch 3 compacted segments 0-2 → base + deltas 3,4 per store
    for sub in ("regs", "cands"):
        segs = glob.glob(f"{tmpdir}/{sub}/seg-*")
        assert any(s.endswith("-base") for s in segs)
        assert len(segs) <= 3, segs
    top = read_heavy_hitters(spark, tmpdir, k=1).collect()
    assert top[0].value == "always" and top[0].cms_est >= 15
