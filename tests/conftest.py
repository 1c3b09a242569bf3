import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from cies_ocr_java_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        app_name="cies-tests",
        master="local[8]",
        shuffle_partitions=8,
        # saveAsTable targets (bucketed-join tests) go to a temp warehouse,
        # never the repo working dir
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic 160-doc fixture corpus + golden outputs (seed=42)."""
    from tools.make_fixtures import generate, write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(generate(160, seed=42), out)
    return out
