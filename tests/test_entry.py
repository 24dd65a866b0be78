"""Smoke for the driver contract: entry() and the crawl-specific rows-only
queries run under an existing Ray session without calling ray.init."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as E

    return E


def test_entry_runs(entrymod):
    wide = entrymod.entry()
    assert len(wide) > 10
    assert "是否包含数据资产" in wide.columns


@pytest.mark.parametrize("name", ["crawl_frontier", "fetch_decode_stats", "wide_report",
                                  "image_features", "scheduled_crawl"])
def test_crawl_queries_run(entrymod, name):
    res = entrymod.queries()[name](SF)
    import ray.data as rd

    df = res.to_pandas() if isinstance(res, rd.Dataset) else res
    assert len(df) > 0
    assert len(df.columns) > 0
