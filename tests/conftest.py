"""Session-scoped Ray + shared tiny corpus/index fixtures."""

import numpy as np
import pytest
import ray
import ray.data

from index_ray.pipelines.build import BuildConfig, build_index
from index_ray.sources.corpus import generate_corpus, write_corpus

TINY_DOCS = 200
TINY_SEED = 42

TINY_CFG = dict(chunk_docs=100, num_parts=4, salt_docs=64, batch_size=64)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_tiny")
    write_corpus(str(d), TINY_DOCS, seed=TINY_SEED, n_files=3)
    return str(d)


@pytest.fixture(scope="session")
def tiny_corpus_table():
    return generate_corpus(TINY_DOCS, TINY_SEED)


@pytest.fixture(scope="session")
def tiny_index_dir(tiny_corpus_dir, tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("index_tiny")
    build_index(tiny_corpus_dir, str(d), BuildConfig(**TINY_CFG))
    return str(d)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus_table):
    from index_ray.pipelines.oracle import BruteForceBM25

    return BruteForceBM25(
        np.arange(TINY_DOCS), tiny_corpus_table["content"].to_pylist(), "code"
    )
