from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_driven_etl_msc_research_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "engine-tests",
        master="local[8]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


def assert_pdf_equal(got, exp, cols=None):
    """dtype-tolerant frame equality (Spark int32 vs pandas int64 etc.)."""
    import pandas as pd

    cols = cols or list(exp.columns)
    g = got[cols].reset_index(drop=True).copy()
    e = exp[cols].reset_index(drop=True).copy()
    for c in cols:
        if str(g[c].dtype).startswith("int"):
            g[c] = g[c].astype("int64")
        if str(e[c].dtype).startswith("int"):
            e[c] = e[c].astype("int64")
        if "datetime" in str(g[c].dtype) or "datetime" in str(e[c].dtype):
            g[c] = pd.to_datetime(g[c], utc=True)
            e[c] = pd.to_datetime(e[c], utc=True)
    pd.testing.assert_frame_equal(g, e)


@pytest.fixture(params=["local", "object"])
def storage_factory(request):
    """Parameterizes table suites over BOTH storage backends: the POSIX
    default and the in-process fake object store (conditional PUT, no
    rename/link/mtime-walk).  Passing the factory (not an instance) lets a
    test build several handles on one root, like concurrent writers do."""
    from event_driven_etl_msc_research_spark.sinks.storage import (
        FakeObjectStorage,
        LocalFSStorage,
    )

    cls = LocalFSStorage if request.param == "local" else FakeObjectStorage
    return lambda root: cls(root)
