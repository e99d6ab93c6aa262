import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver brief requirement)."""
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """300-row deterministic fixture corpus written once per session."""
    import pyarrow.parquet as pq

    from extract_kit_ray.fixtures import make_pages_table

    d = tmp_path_factory.mktemp("pages")
    pq.write_table(make_pages_table(300), str(d / "pages-0.parquet"))
    return str(d)
